"""Engine-exact fixed-point KMeans (Lloyd) — the oracle-grade twin of the
MLlib KMeans behind smart_aggregator / ivf_cosine_knn / semdedup.

Motivation (r11 VERDICT #3): MLlib KMeans (k-means|| init + float Lloyd)
is not replayable in another engine, which forced the three KMeans-backed
registry entries down to rows-only correctness gates. This module
implements Lloyd's algorithm entirely in integer arithmetic over
min-max-normalized quantized features, so cluster assignments are
bit-identical across engines AND across partitionings:

- quantize:  q = floor(x * 1e6 + 0.5) as BIGINT (one IEEE multiply —
  identical in Spark and DuckDB; reference convention: the micro-unit
  quantization used by every cross-row float sum in this repo).
- normalize: z = (q - min_q) * SCALE div (max_q - min_q), all-integer
  min-max to [0, SCALE] (keeps every later division NON-NEGATIVE, which
  sidesteps the Python-floors-vs-DuckDB-truncates `//` divergence).
- init:      the k DISTINCT z-vectors with the smallest md5 hex digest of
  their comma-joined decimal rendering (deterministic, order-free, no RNG
  — the portable-hash-draw convention of leakage_safe_split).
- assign:    argmin_c Σ_i (z_i - c_i)² with ties broken by lowest
  centroid index (integer squared distances — exact).
- update:    c'_i = SUM(z_i) div n per cluster (integer floor division on
  non-negative sums); an emptied cluster keeps its previous centroid.
- schedule:  `iters` assignment passes with `iters - 1` centroid updates
  in between and NO convergence test (a replay must not branch on data);
  the returned cells are consistent with the returned centroids.

Scale shape: one groupBy over N rows per iteration with k·d literal
integer expressions (map-side combinable, no join in the assignment — the
centroid table is baked into the projection as literals); the k-row
centroid state lives on the driver (bounded model, k ≤ 4096 — the dsir
k·B-model contract). Production callers default to MLlib (sampled fit,
battle-tested at high k); ``exact=True`` swaps in this twin — the same
convention as the ``exact=`` switches on the library stats.

kmeans_cte_sql() emits the DuckDB MATERIALIZED-CTE chain that replays the
identical computation for the oracle gate (the pagerank/HITS unrolled-
iteration pattern). Reference parity: smart_aggregator.py:13-94 (row
reduction), projections/IVF quantizers — the reference delegates to
sklearn/faiss seeds; here the determinism is engine-portable by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # normalized integer feature domain [0, SCALE]
MICRO = 1e6  # raw-value quantization (micro-units)


# ---------------------------------------------------------------------
# Quantization (Spark side)
# ---------------------------------------------------------------------


def _finite_or_null(c):
    """Non-finite doubles → NULL BEFORE quantizing: under ANSI-off,
    cast(floor(NaN·1e6) as long) silently yields 0 — which aliases the
    true minimum and corrupts the min-max normalization of every healthy
    row. NULL instead, and kmeans_fixed_point raises on it (r12 fuzz)."""
    d = c.cast("double")
    return F.when(F.isnan(d) | (F.abs(d) == F.lit(float("inf"))), None).otherwise(d)


def quantize_scalar_cols(df: DataFrame, cols: list[str]) -> DataFrame:
    """Micro-quantize ``cols`` to BIGINT (``__q_i``) and min-max-normalize
    to the integer ``__zq`` array<long> in [0, SCALE]. Constant columns
    normalize to 0 (rng clamped to 1 — same clamp in the SQL twin).
    Exact-mode contract: inputs must be finite non-null doubles — NaN/Inf
    quantize to NULL (never a silent 0) and kmeans_fixed_point fails loud
    on them; callers own the dropna. The SQL twins carry no guard: the
    curated parquet inputs the oracle gate reads contain no non-finite
    values, and on finite values the guarded expression is identical."""
    q = df.select(
        "*",
        *[
            F.floor(_finite_or_null(F.col(c)) * F.lit(MICRO) + F.lit(0.5))
            .cast("long")
            .alias(f"__q_{i}")
            for i, c in enumerate(cols)
        ],
    )
    # 1-row min/max aggregate (2·d scalars) — the zorder_col precedent
    mm = q.agg(
        *[
            x
            for i in range(len(cols))
            for x in (
                F.min(f"__q_{i}").alias(f"mn{i}"),
                F.max(f"__q_{i}").alias(f"mx{i}"),
            )
        ]
    ).first()
    zcols = []
    for i in range(len(cols)):
        mn = int(mm[f"mn{i}"])
        rng = max(int(mm[f"mx{i}"]) - mn, 1)
        zcols.append(F.expr(f"(__q_{i} - {mn}L) * {SCALE}L div {rng}L"))
    return q.withColumn("__zq", F.array(*zcols))


def quantize_array_col(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Array-column variant (embeddings): per-dimension micro-quantize +
    integer min-max-normalize into ``__zq`` array<long> in [0, SCALE]."""
    q = df.withColumn(
        "__q",
        F.transform(
            vec_col,
            lambda x: F.floor(_finite_or_null(x) * F.lit(MICRO) + F.lit(0.5)).cast(
                "long"
            ),
        ),
    )
    mm = q.agg(
        *[
            x
            for i in range(dim)
            for x in (
                F.min(F.element_at("__q", i + 1)).alias(f"mn{i}"),
                F.max(F.element_at("__q", i + 1)).alias(f"mx{i}"),
            )
        ]
    ).first()  # 1-row aggregate: 2·dim scalars
    zcols = []
    for i in range(dim):
        mn = int(mm[f"mn{i}"])
        rng = max(int(mm[f"mx{i}"]) - mn, 1)
        zcols.append(
            F.expr(f"(element_at(__q, {i + 1}) - {mn}L) * {SCALE}L div {rng}L")
        )
    return q.withColumn("__zq", F.array(*zcols))


# ---------------------------------------------------------------------
# Fixed-point Lloyd (Spark side)
# ---------------------------------------------------------------------


def centroid_scores(cents: list[list[int]]):
    """array<struct<d: long, c: int>> of integer squared distances from
    ``__zq`` to each literal centroid — flat projection, no join. Sorting
    the struct array is lexicographic = (distance, centroid-index)
    tiebreak; array_min gives the argmin, array_sort + slice gives the
    n-probe shortlist (IVF)."""
    return F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        "__zq",
                        F.array(*[F.lit(int(v)).cast("long") for v in c]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(i).alias("c"),
            )
            for i, c in enumerate(cents)
        ]
    )


def _assign(zdf: DataFrame, cents: list[list[int]]) -> DataFrame:
    return zdf.withColumn("__cell", F.array_min(centroid_scores(cents))["c"])


def kmeans_fixed_point(
    zdf: DataFrame, k: int, iters: int = 3
) -> tuple[DataFrame, list[list[int]]]:
    """Run fixed-point Lloyd over a frame carrying ``__zq`` (from the
    quantize helpers). Returns (frame + ``__cell`` int, centroids) with
    cells assigned against the RETURNED centroids. If fewer than k
    distinct vectors exist, k shrinks to that count (same LIMIT semantics
    in the SQL twin)."""
    zdf = zdf.localCheckpoint(eager=True)  # consumed iters+1 times (CLAUDE.md)
    rows = (
        zdf.select("__zq")
        .distinct()
        .withColumn(
            "__h",
            F.md5(F.concat_ws(",", F.transform("__zq", lambda x: x.cast("string")))),
        )
        # NULL-element vectors (non-finite inputs) sort FIRST so they are
        # guaranteed to land in the k-sample and fail loud below; with no
        # NULLs present (the contract) the flag is all-false and the
        # ordering is identical to the SQL twin's plain ORDER BY hash
        .withColumn("__hasnull", F.exists("__zq", lambda x: x.isNull()))
        .orderBy(F.col("__hasnull").desc(), F.col("__h"))
        .limit(k)
        .collect()
    )  # k-row bounded model pull (the pq_train/dsir k·B precedent)
    if any(v is None for r in rows for v in r["__zq"]):
        raise ValueError(
            "kmeans_fixed_point: non-finite feature values (NaN/Inf quantize "
            "to NULL) — exact mode requires finite inputs; dropna/filter first"
        )
    cents = [[int(v) for v in r["__zq"]] for r in rows]
    d = len(cents[0])
    for _ in range(iters - 1):
        a = _assign(zdf, cents)
        sums = a.groupBy("__cell").agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(F.element_at("__zq", i + 1)).alias(f"__s{i}") for i in range(d)],
        ).collect()  # ≤ k rows: the centroid-update model state
        by = {int(r["__cell"]): r for r in sums}
        cents = [
            [int(by[c][f"__s{i}"]) // int(by[c]["__n"]) for i in range(d)]
            if c in by
            else cents[c]
            for c in range(len(cents))
        ]
    return _assign(zdf, cents), cents


# ---------------------------------------------------------------------
# DuckDB replay (oracle side)
# ---------------------------------------------------------------------


def scalar_quantize_cte(table_expr: str, cols: list[str], prefix: str = "km") -> str:
    """CTE fragment quantizing scalar columns: emits {p}q (q0..qd-1 +
    passthrough of ``cols`` originals is NOT kept — q columns carry the
    state), {p}mm (mins/rngs), {p}z (zq list + q columns)."""
    p = prefix
    qs = ", ".join(
        f"CAST(floor({c} * 1e6 + 0.5) AS BIGINT) AS q{i}" for i, c in enumerate(cols)
    )
    mins = ", ".join(
        f"MIN(q{i}) AS mn{i}, GREATEST(MAX(q{i}) - MIN(q{i}), 1) AS rng{i}"
        for i in range(len(cols))
    )
    zs = ", ".join(f"(q{i} - mn{i}) * {SCALE} // rng{i}" for i in range(len(cols)))
    qcols = ", ".join(f"q{i}" for i in range(len(cols)))
    return f"""
    {p}q AS MATERIALIZED (SELECT {qs} FROM {table_expr}),
    {p}mm AS MATERIALIZED (SELECT {mins} FROM {p}q),
    {p}z AS MATERIALIZED (SELECT [{zs}] AS zq, {qcols} FROM {p}q, {p}mm)"""


def array_quantize_cte(
    table_expr: str, id_col: str, vec_col: str, dim: int, prefix: str = "km"
) -> str:
    """CTE fragment quantizing an array<float> column: emits {p}q (id, q)
    and {p}z (id, zq)."""
    p = prefix
    return f"""
    {p}q AS MATERIALIZED (
      SELECT {id_col} AS id,
             [CAST(floor({vec_col}[i]::DOUBLE * 1e6 + 0.5) AS BIGINT)
              for i in generate_series(1, {dim})] AS q
      FROM {table_expr}),
    {p}mm AS MATERIALIZED (
      SELECT idx, MIN(v) AS mn, GREATEST(MAX(v) - MIN(v), 1) AS rng
      FROM (SELECT UNNEST(q) AS v, UNNEST(range(1, {dim + 1})) AS idx FROM {p}q)
      GROUP BY idx),
    {p}z AS MATERIALIZED (
      SELECT id, list((v - mn) * {SCALE} // rng ORDER BY idx) AS zq
      FROM (SELECT id, UNNEST(q) AS v, UNNEST(range(1, {dim + 1})) AS idx
            FROM {p}q) u
      JOIN {p}mm USING (idx) GROUP BY id)"""


def dist_sql(d: int) -> str:
    """Integer squared distance between z.zq and c.cv (DuckDB) — the SQL
    twin of centroid_scores' fold; callers' CTEs must alias the vector
    relation ``z`` and the centroid relation ``c``."""
    return (
        f"list_sum(list_transform(range(1, {d + 1}), "
        "i -> (z.zq[i] - c.cv[i]) * (z.zq[i] - c.cv[i])))"
    )


def kmeans_cte_sql(
    k: int, iters: int, d: int, prefix: str = "km", by_id: bool = True
) -> str:
    """Unrolled fixed-point Lloyd as MATERIALIZED CTEs over {p}z.

    by_id=True expects {p}z(id, zq) and partitions the argmin by id;
    by_id=False expects {p}z(zq, ...) with no row identity — the argmin
    runs once per DISTINCT zq (assignment is a pure function of zq) and
    callers join {p}fin back on list-equality. Final CTEs: {p}fin
    (assignment under the final centroids) and {p}c{iters-1} (the final
    centroid table, for probing)."""
    p = prefix
    dist = dist_sql(d)
    src = f"{p}z" if by_id else f"(SELECT DISTINCT zq FROM {p}z)"
    key = "z.id" if by_id else "z.zq"
    keyout = "id, zq" if by_id else "zq"
    sums = ", ".join(
        f"CAST(SUM(z.zq[{i + 1}]) // COUNT(*) AS BIGINT)" for i in range(d)
    )
    join_back = "a.id = z.id" if by_id else "a.zq = z.zq"

    def assign(t: int, csrc: str) -> str:
        return f"""
    {p}a{t} AS MATERIALIZED (
      SELECT {keyout}, c AS cell FROM (
        SELECT z.*, c.c,
               ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY {dist} ASC, c.c ASC) AS rn
        FROM {src} z CROSS JOIN {csrc} c) z WHERE rn = 1)"""

    parts = [
        f"""
    {p}init AS MATERIALIZED (
      SELECT zq, md5(array_to_string(zq, ',')) AS h
      FROM (SELECT DISTINCT zq FROM {p}z) ORDER BY h LIMIT {k}),
    {p}c0 AS MATERIALIZED (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY h) - 1 AS INT) AS c, zq AS cv
      FROM {p}init)"""
    ]
    for t in range(1, iters):
        parts.append(assign(t, f"{p}c{t - 1}"))
        parts.append(
            f"""
    {p}c{t} AS MATERIALIZED (
      SELECT prev.c, COALESCE(u.cv, prev.cv) AS cv
      FROM {p}c{t - 1} prev LEFT JOIN (
        SELECT a.cell AS c, [{sums}] AS cv
        FROM {p}z z JOIN {p}a{t} a ON {join_back}
        GROUP BY a.cell) u USING (c))"""
        )
    parts.append(assign(iters, f"{p}c{iters - 1}"))
    parts.append(f"""
    {p}fin AS MATERIALIZED (SELECT * FROM {p}a{iters})""")
    return ",".join(parts)


# ---------------------------------------------------------------------
# Pure-Python twin (test oracle for unit tests, not the DuckDB gate)
# ---------------------------------------------------------------------


def python_twin(zrows: list[list[int]], k: int, iters: int = 3) -> list[int]:
    """Reference replay of the exact algorithm over materialized z-rows;
    returns the cell per input row. Used by tests to certify the Spark
    path bit-level at small N."""
    import hashlib

    distinct = sorted(
        {tuple(r) for r in zrows},
        key=lambda t: hashlib.md5(",".join(str(v) for v in t).encode()).hexdigest(),
    )
    cents = [list(t) for t in distinct[:k]]
    d = len(zrows[0])

    def assign_one(row: list[int]) -> int:
        best = min(
            (sum((row[i] - c[i]) ** 2 for i in range(d)), ci)
            for ci, c in enumerate(cents)
        )
        return best[1]

    for _ in range(iters - 1):
        cells = [assign_one(r) for r in zrows]
        for ci in range(len(cents)):
            members = [r for r, cell in zip(zrows, cells) if cell == ci]
            if members:
                n = len(members)
                cents[ci] = [sum(m[i] for m in members) // n for i in range(d)]
    return [assign_one(r) for r in zrows]
