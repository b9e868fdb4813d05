"""Engine-exact fixed-point PCA 2D projection — the oracle-grade twin of
the MLlib PCA behind projection_2d (r12 VERDICT #3, closing the
c7_projection_pca rows-only gate).

Why MLlib PCA can't be oracled: eigenvectors carry a sign/rotation
ambiguity and the eigensolver's float arithmetic is engine-specific. This
module runs the whole pipeline in integer arithmetic so DuckDB can replay
it bit-level (the pagerank/HITS fixed-point convention, extended to an
eigenproblem):

1. quantize + integer min-max normalize features to z ∈ [0, 1e6]
   (operators/kmeans_exact.quantize_scalar_cols — micro-quantization then
   all-integer scaling, so both engines hold identical BIGINTs).
2. exact second-moment stats: n, s_i = Σz_i, p_ij = Σz_i·z_j (integer
   sums — commutative in any partitioning; one 1-row Spark aggregate).
3. covariance numerators C_ij = n·p_ij − s_i·s_j in arbitrary-precision
   ints (Python on the driver / HUGEINT in DuckDB), rescaled to the
   fixed-point matrix A_ij = floor(C_ij·1e9 / max|C|).
4. dominant eigenvector by L∞-normalized integer power iteration
   (T fixed iterations, NO convergence test — a replay must not branch
   on data): y = A·v; v' = floor(y·1e9 / max(|y|, 1)). Floor division is
   Python's `//`; the SQL twin uses an explicit floor-division CASE
   because DuckDB's `//` truncates toward zero on negatives.
5. sign canonicalization: flip so the first component of largest
   magnitude is positive (ties → lowest index).
6. Rayleigh λ̂ + rank-1 deflation in the same fixed point, then a second
   power iteration for PC2.
7. per-row projection with the resulting integer vectors:
   x_int = Σ(z_i − mean_i)·v_i  (≤ 4·10¹⁵ — inside both BIGINT and the
   2⁵³ exact-double window), emitted as x_int/1e15 with the shared
   _fround floor-rounding.

The result is a deterministic, engine-portable PCA whose x/y agree with
the float PCA to ~1e-9 of the normalized scale at convergence; the MLlib
path stays the production default (and keeps its own oracled invariants
companion c7_pca_invariants). Reference parity: projection_2d.py:17-135.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R = 10**9  # fixed-point scale for matrix entries and eigenvector components
T_ITERS = 30  # power-iteration count (fixed — replay must not branch on data)


# ---------------------------------------------------------------------
# Driver-side integer eigensolver (Python big ints — bit-twin of the SQL)
# ---------------------------------------------------------------------


def _v0(d: int) -> list[int]:
    """Deterministic asymmetric start vector (avoids starting orthogonal
    to PC1 the way an all-ones vector can with anti-correlated features)."""
    return [R // (j + 1) for j in range(d)]


def _matvec(A: list[list[int]], v: list[int]) -> list[int]:
    return [sum(A[i][j] * v[j] for j in range(len(v))) for i in range(len(A))]


def _power_iter(A: list[list[int]], d: int) -> list[int]:
    v = _v0(d)
    for _ in range(T_ITERS):
        y = _matvec(A, v)
        m = max(max(abs(c) for c in y), 1)
        v = [c * R // m for c in y]  # Python // floors — the SQL twin too
    # sign: first component of max magnitude becomes positive
    m = max(abs(c) for c in v)
    lead = next(c for c in v if abs(c) == m)
    if lead < 0:
        v = [-c for c in v]
    return v


def _fp_eig2(C: list[list[int]], d: int) -> tuple[list[int], list[int]]:
    """Top-2 fixed-point eigenvectors of the (integer) covariance
    numerator matrix C via power iteration + rank-1 deflation."""
    maxc = max(max(abs(x) for x in row) for row in C) or 1
    A = [[C[i][j] * R // maxc for j in range(d)] for i in range(d)]
    v1 = _power_iter(A, d)
    y = _matvec(A, v1)
    num = sum(v1[i] * y[i] for i in range(d))
    den = max(sum(c * c for c in v1), 1)
    lam = num // den  # ≈ R·λ̂ (same scale as A)
    A2 = [
        [A[i][j] - (lam * v1[i] * v1[j]) // den for j in range(d)]
        for i in range(d)
    ]
    v2 = _power_iter(A2, d)
    return v1, v2


# ---------------------------------------------------------------------
# Spark path
# ---------------------------------------------------------------------


def pca_fixed_point_project(
    df: DataFrame, feature_cols: list[str], id_col: str
) -> DataFrame:
    """Exact-mode 2D projection: (id, x, y) with engine-portable values
    (see module docstring). One 1-row stats aggregate + one flat per-row
    projection — no shuffle beyond the scan."""
    from workbench_spark.operators.kmeans_exact import quantize_scalar_cols

    d = len(feature_cols)
    z = quantize_scalar_cols(df.select(id_col, *feature_cols), feature_cols)
    zc = [F.element_at("__zq", i + 1) for i in range(d)]
    stats = z.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(zc[i]).alias(f"s{i}") for i in range(d)],
        *[
            F.sum(zc[i] * zc[j]).alias(f"p{i}{j}")
            for i in range(d)
            for j in range(i, d)
        ],
    ).first()  # 1-row sufficient-statistics aggregate (d + d(d+1)/2 scalars)
    n = int(stats["n"])
    s = [int(stats[f"s{i}"]) for i in range(d)]
    p = {}
    for i in range(d):
        for j in range(i, d):
            p[(i, j)] = p[(j, i)] = int(stats[f"p{i}{j}"])
    C = [[n * p[(i, j)] - s[i] * s[j] for j in range(d)] for i in range(d)]
    v1, v2 = _fp_eig2(C, d)
    mean = [s[i] // n for i in range(d)]

    def proj(v: list[int]):
        x_int = sum(
            ((zc[i] - F.lit(mean[i])) * F.lit(v[i]) for i in range(d)),
            start=F.lit(0).cast("long"),
        )
        return F.floor(
            (x_int.cast("double") / F.lit(1e15)) * F.lit(1e6) + F.lit(0.5)
        ) / F.lit(1e6)

    return z.select(id_col, proj(v1).alias("x"), proj(v2).alias("y"))


# ---------------------------------------------------------------------
# DuckDB replay (generated SQL)
# ---------------------------------------------------------------------


def _fdiv(a: str, b: str) -> str:
    """Floor division with a positive divisor — matches Python //."""
    return f"(CASE WHEN ({a}) >= 0 THEN ({a}) // ({b}) ELSE -((-({a}) + ({b}) - 1) // ({b})) END)"


def _iter_ctes(p: str, asrc: str, d: int) -> str:
    """Power-iteration CTE chain over the 1-row matrix CTE ``asrc``
    (columns a{i}{j} HUGEINT); emits {p}v0..{p}v{T} then the
    sign-canonicalized {p}fin (columns v0..v{d-1})."""
    v0 = ", ".join(f"CAST({c} AS HUGEINT) AS v{j}" for j, c in enumerate(_v0(d)))
    parts = [f"{p}v0 AS MATERIALIZED (SELECT {v0})"]
    for t in range(1, T_ITERS + 1):
        ys = ", ".join(
            "("
            + " + ".join(f"m.a{i}{j} * v.v{j}" for j in range(d))
            + f") AS y{i}"
            for i in range(d)
        )
        mx = "GREATEST(" + ", ".join(f"ABS(y{i})" for i in range(d)) + ", 1)"
        vs = ", ".join(f"{_fdiv(f'y{i} * {R}', 'm')} AS v{i}" for i in range(d))
        parts.append(
            f"{p}y{t} AS MATERIALIZED (SELECT {ys} FROM {asrc} m, {p}v{t - 1} v)"
        )
        parts.append(
            f"{p}v{t} AS MATERIALIZED (SELECT {vs} FROM "
            f"(SELECT *, {mx} AS m FROM {p}y{t}))"
        )
    mag = "GREATEST(" + ", ".join(f"ABS(v{i})" for i in range(d)) + ")"
    lead = "CASE " + " ".join(
        f"WHEN ABS(v{i}) = mg THEN v{i}" for i in range(d)
    ) + " END"
    vs_signed = ", ".join(f"v{i} * sg AS v{i}" for i in range(d))
    parts.append(
        f"{p}fin AS MATERIALIZED (SELECT {vs_signed} FROM "
        f"(SELECT *, CASE WHEN ({lead}) < 0 THEN -1 ELSE 1 END AS sg FROM "
        f"(SELECT *, {mag} AS mg FROM {p}v{T_ITERS})))"
    )
    return ",\n    ".join(parts)


def pca_replay_sql(table: str, feature_cols: list[str], id_col: str) -> str:
    """Full DuckDB replay of pca_fixed_point_project: quantize → stats →
    fixed-point eigenpair → per-row projection. All covariance/iteration
    arithmetic is HUGEINT; floor division is explicit (DuckDB `//`
    truncates; Python floors)."""
    d = len(feature_cols)
    qs = ", ".join(
        f"CAST(floor({c} * 1e6 + 0.5) AS BIGINT) AS q{i}"
        for i, c in enumerate(feature_cols)
    )
    mins = ", ".join(
        f"MIN(q{i}) AS mn{i}, GREATEST(MAX(q{i}) - MIN(q{i}), 1) AS rng{i}"
        for i in range(d)
    )
    zs = ", ".join(
        f"(q{i} - mn{i}) * 1000000 // rng{i} AS z{i}" for i in range(d)
    )
    sums = ", ".join(f"SUM(z{i}) AS s{i}" for i in range(d))
    prods = ", ".join(
        f"SUM(z{i} * z{j}) AS p{i}{j}" for i in range(d) for j in range(i, d)
    )
    covs = ", ".join(
        f"CAST(n AS HUGEINT) * p{min(i, j)}{max(i, j)} - CAST(s{i} AS HUGEINT) * s{j} AS c{i}{j}"
        for i in range(d)
        for j in range(d)
    )
    maxc = (
        "GREATEST("
        + ", ".join(f"ABS(c{i}{j})" for i in range(d) for j in range(d))
        + ", 1)"
    )
    amat = ", ".join(
        _fdiv(f"c{i}{j} * {R}", "mc") + f" AS a{i}{j}"
        for i in range(d)
        for j in range(d)
    )
    # Rayleigh + deflation for PC2
    ys = ", ".join(
        "(" + " + ".join(f"m.a{i}{j} * v.v{j}" for j in range(d)) + f") AS y{i}"
        for i in range(d)
    )
    num = " + ".join(f"v.v{i} * r.y{i}" for i in range(d))
    den = "GREATEST(" + " + ".join(f"v.v{i} * v.v{i}" for i in range(d)) + ", 1)"
    a2 = ", ".join(
        f"m.a{i}{j} - " + _fdiv("l.lam * v.v" + str(i) + f" * v.v{j}", "l.den")
        + f" AS a{i}{j}"
        for i in range(d)
        for j in range(d)
    )
    means = ", ".join(f"s{i} // n AS mean{i}" for i in range(d))

    def proj(vcte: str, alias: str) -> str:
        xi = " + ".join(f"(z.z{i} - st.mean{i}) * {vcte}.v{i}" for i in range(d))
        return (
            f"floor((CAST({xi} AS DOUBLE) / 1e15) * 1e6 + 0.5) / 1e6 AS {alias}"
        )

    return f"""
    WITH pq AS MATERIALIZED (SELECT {id_col}, {qs} FROM {table}),
    pmm AS MATERIALIZED (SELECT {mins} FROM pq),
    pz AS MATERIALIZED (SELECT {id_col}, {zs} FROM pq, pmm),
    pst AS MATERIALIZED (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, {sums}, {prods} FROM pz),
    pc AS MATERIALIZED (SELECT n, {covs}, {", ".join(f"s{i}" for i in range(d))} FROM pst),
    pa AS MATERIALIZED (SELECT {amat} FROM (SELECT *, {maxc} AS mc FROM pc)),
    {_iter_ctes("e1", "pa", d)},
    pray AS MATERIALIZED (
      SELECT ({num}) AS num, ({den}) AS den FROM pa m, e1fin v,
        (SELECT {ys} FROM pa m, e1fin v) r),
    plam AS MATERIALIZED (SELECT {_fdiv("num", "den")} AS lam, den FROM pray),
    pa2 AS MATERIALIZED (SELECT {a2} FROM pa m, e1fin v, plam l),
    {_iter_ctes("e2", "pa2", d)},
    pmean AS MATERIALIZED (SELECT n, {means} FROM pst)
    SELECT z.{id_col},
           {proj("v1", "x")},
           {proj("v2", "y")}
    FROM pz z, pmean st, e1fin v1, e2fin v2
    """
