"""EDA statistics operators (SURVEY §2.4 A1-A10, §2.6 O1-O3).

Reference semantics (all generated-SQL-to-Athena in the reference):
- row count            — athena_source.py:187-190
- distinct counts      — algorithms/sql/column_stats.py:13-23
- null counts          — algorithms/sql/column_stats.py:26-36
- zero counts          — algorithms/sql/column_stats.py:39-49
- descriptive stats    — algorithms/sql/descriptive_stats.py:14-83
- correlations         — algorithms/sql/correlations.py:14-91
- value_counts         — algorithms/sql/value_counts.py:13-63
- outliers             — algorithms/sql/outliers.py:20-216
- sample / smart_sample— algorithms/sql/sample_rows.py:13-52, athena_source.py:364-394

Spark-first design: each stat is ONE DataFrame aggregation pass (the
reference issues one Athena query per stat family; we fuse per family and
could fuse across families). All expressions are built-in pyspark.sql
functions → JVM-side, whole-stage-codegen'd, no Python in the hot path.

At 100 TB: these are map-side-combinable aggregations over a parquet scan
with column pruning — a single shuffle of tiny partial-agg state per
column. ``exact=False`` switches count-distinct and percentiles to the
sketch-based forms (approx_count_distinct / percentile_approx) which keep
constant-size state; exact mode exists for oracle hash-matching at test SF.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

NUMERIC_SPARK_TYPES = (
    T.DoubleType,
    T.FloatType,
    T.IntegerType,
    T.LongType,
    T.ShortType,
    T.ByteType,
    T.DecimalType,
)


def numeric_columns(df: DataFrame) -> list[str]:
    """Numeric columns per the reference's athena-type list
    (descriptive_stats.py:53 + outliers.py:86: double/float/int/bigint/
    smallint/tinyint/decimal)."""
    return [f.name for f in df.schema.fields if isinstance(f.dataType, NUMERIC_SPARK_TYPES)]


def string_bool_columns(df: DataFrame) -> list[str]:
    """String/boolean columns per value_counts.py:31."""
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.StringType, T.BooleanType))
    ]


# ---------------------------------------------------------------- A1
def row_count(df: DataFrame) -> int:
    return df.count()


# ---------------------------------------------------------------- A2
def distinct_counts(df: DataFrame, columns: list[str] | None = None, exact: bool = True) -> DataFrame:
    """COUNT(DISTINCT c) for every column in one pass (column_stats.py:13-23).

    One wide row, columns aliased ``<col>``. ``exact=False`` → HLL sketch
    (approx_count_distinct) for 100TB-scale single-pass profiling.
    """
    cols = columns or df.columns
    fn = F.countDistinct if exact else F.approx_count_distinct
    return df.agg(*[fn(c).alias(c) for c in cols])


# ---------------------------------------------------------------- A3
def null_counts(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """COUNT(CASE WHEN c IS NULL THEN 1 END) per column (column_stats.py:26-36)."""
    cols = columns or df.columns
    return df.agg(
        *[F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(c) for c in cols]
    )


# ---------------------------------------------------------------- A4
def zero_counts(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """COUNT(CASE WHEN c = 0 THEN 1 END) per numeric column (column_stats.py:39-49)."""
    cols = columns or numeric_columns(df)
    return df.agg(
        *[F.count(F.when(F.col(c) == 0, F.lit(1))).alias(c) for c in cols]
    )


# ---------------------------------------------------------------- A5
DESCRIPTIVE_STATS = ("min", "q1", "median", "q3", "max", "mean", "stddev")


def descriptive_stats(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
    accuracy: int = 1000,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Per numeric column: min, q1, median, q3, max, mean, stddev
    (descriptive_stats.py:14-83) — one aggregation pass, then unpivoted to
    one row per column: (column_name, min, q1, median, q3, max, mean, stddev).

    The reference uses Athena approx_percentile; for oracle hash-matching we
    default to exact ``percentile`` (linear interpolation — same contract as
    duckdb quantile_cont). ``exact=False`` uses percentile_approx (GK
    sketch, constant memory) — bounded-error at 100 TB.

    ``exact=False, sample_fraction=f`` replaces the sketch with EXACT
    percentiles of a seeded f-sample: the GK per-row insert dominates the
    whole stats pass (measured 1.0s of 1.1s at sf0.1; lowering accuracy
    stops helping below ~100 because insert cost, not merge, is the
    bottleneck), while a Bernoulli sample costs one RNG draw per row and
    the quantile rank error is ~1/(2·sqrt(n·f)) — at f·n = 1M rows that is
    ~0.05%, tighter than the accuracy=250 sketch. Size f so f·n stays
    ~1e6 per column (the exact-percentile buffer is the sample itself).
    Min/max/mean/stddev always come from the FULL data."""
    cols = columns or numeric_columns(df)
    pct_of = (
        (lambda c: f"percentile(CAST({c} AS DOUBLE), array(0.25, 0.5, 0.75))")
        if exact
        # sketch accuracy 1000 ≈ 0.1% rank error — 3x faster than the
        # 10000 default at test SF and bounded-memory at any scale
        else (lambda c: f"percentile_approx(CAST({c} AS DOUBLE), array(0.25, 0.5, 0.75), {accuracy})")
    )
    aggs = []
    for c in cols:
        d = F.col(c).cast("double")
        if exact:
            # oracle-grade mode: mean/stddev from EXACT integer sums of
            # micro-quantized values (q = floor(x·1e6 + 0.5), DECIMAL
            # sums). Headroom bound, not "any scale": Σq² fits
            # decimal(38,0) while n·(x·1e6)² < 1e38, i.e. |x| ≲ 1e10 over
            # 1e6 rows (or 1e7 over 1e12 rows) — far past TPC-H-like
            # magnitudes, but a column beyond it NULLs the sum silently
            # under ANSI-off rather than erroring, so the finisher reports
            # NULL mean/stddev with a non-null count. Finished by one fixed
            # double-op sequence below. Float avg/stddev low bits depend
            # on partition order; at a ROUND half-boundary that flips the
            # 6th decimal between layouts AND between engines (r13:
            # hostile-partitioning sweep caught exactly this on l_tax's
            # mean). Quantization error < 5e-7 per input — below the 6dp
            # the exact mode reports. Production mode keeps float
            # avg/stddev (exact enough, no decimal overhead).
            q = F.floor(d * F.lit(1e6) + F.lit(0.5)).cast("decimal(19,0)")
            aggs += [
                F.min(d).alias(f"{c}___min"),
                F.expr(pct_of(c)).alias(f"{c}___q"),
                F.max(d).alias(f"{c}___max"),
                F.sum(q).cast("decimal(38,0)").alias(f"{c}___s"),
                F.sum((q * q).cast("decimal(38,0)")).alias(f"{c}___qq"),
                F.count(q).alias(f"{c}___n"),
            ]
            continue
        aggs += [
            F.min(d).alias(f"{c}___min"),
            # one sketch per column for all three quantiles (3x fewer
            # aggregation buffers than three separate percentile calls)
            F.expr(pct_of(c)).alias(f"{c}___q"),
            F.max(d).alias(f"{c}___max"),
            F.avg(d).alias(f"{c}___mean"),
            F.stddev(d).alias(f"{c}___stddev"),
        ]
    if not exact and sample_fraction:
        # quantiles from the sample, everything else from the full frame:
        # two 1-row aggregate branches joined into one plan/action
        base = []
        qaggs = []
        for c in cols:
            d = F.col(c).cast("double")
            base += [
                F.min(d).alias(f"{c}___min"),
                F.max(d).alias(f"{c}___max"),
                F.avg(d).alias(f"{c}___mean"),
                F.stddev(d).alias(f"{c}___stddev"),
            ]
            qaggs.append(
                F.expr(
                    f"percentile(CAST({c} AS DOUBLE), array(0.25, 0.5, 0.75))"
                ).alias(f"{c}___q")
            )
        wide = df.agg(*base).crossJoin(
            df.sample(fraction=sample_fraction, seed=42).agg(*qaggs)
        )
    else:
        wide = df.agg(*aggs)
        if exact:
            for c in cols:
                s_d = F.col(f"{c}___s").cast("double")
                qq_d = F.col(f"{c}___qq").cast("double")
                n = F.col(f"{c}___n")
                wide = wide.withColumn(
                    f"{c}___mean", s_d / n / F.lit(1e6)
                ).withColumn(
                    f"{c}___stddev",
                    # n<=1 guard OUTSIDE the formula: 0/0 -> NULL, but
                    # greatest(NULL, 0.0) is 0.0 — without the when, a
                    # single-row column would report stddev 0.0 instead
                    # of NULL (sample stddev is undefined at n=1)
                    F.when(
                        n > 1,
                        F.sqrt(
                            F.greatest(
                                (qq_d - s_d * s_d / n) / (n - F.lit(1)),
                                F.lit(0.0),
                            )
                        )
                        / F.lit(1e6),
                    ),
                )
    # Unpivot driver-side structure (cols known statically; the agg row is 1 row)
    stack_args = ", ".join(
        f"'{c}', `{c}___min`, `{c}___q`[0], `{c}___q`[1], `{c}___q`[2],"
        f" `{c}___max`, `{c}___mean`, `{c}___stddev`"
        for c in cols
    )
    n = len(cols)
    fields = ", ".join(DESCRIPTIVE_STATS)
    return wide.selectExpr(
        f"stack({n}, {stack_args}) AS (column_name, {fields})"
    )


# ---------------------------------------------------------------- A6
def correlations(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns in ONE aggregation
    (correlations.py:14-91). Output: (column_1, column_2, correlation),
    both orientations like the reference's nested dict, sorted desc by |r|
    within column_1.
    """
    cols = columns or numeric_columns(df)
    aggs = []
    pairs = []
    for i, c in enumerate(cols):
        for d in cols[i + 1 :]:
            aggs.append(F.corr(F.col(c).cast("double"), F.col(d).cast("double")).alias(f"{c}__{d}"))
            pairs.append((c, d))
    wide = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', '{d}', `{c}__{d}`" for c, d in pairs)
    long = wide.selectExpr(
        f"stack({len(pairs)}, {stack_args}) AS (column_1, column_2, correlation)"
    )
    # both orientations (reference returns nested dict keyed both ways)
    sym = long.unionAll(
        long.select(
            F.col("column_2").alias("column_1"),
            F.col("column_1").alias("column_2"),
            "correlation",
        )
    )
    return sym.orderBy("column_1", F.abs(F.col("correlation")).desc(), "column_2")


# ---------------------------------------------------------------- A7
def value_counts(
    df: DataFrame, column: str, top_n: int = 20
) -> DataFrame:
    """Top-N + bottom-N value counts for one string/bool column
    (value_counts.py:13-63): GROUP BY c ORDER BY cnt DESC LIMIT 20
    UNION ALL ... ASC LIMIT 20, dedup'd. NULL → 'NaN' like the reference.
    Ties broken by value for determinism (reference relies on Athena's
    unstable ordering; we pin it).
    """
    counted = (
        df.select(F.coalesce(F.col(column).cast("string"), F.lit("NaN")).alias("value"))
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("count"))
    )
    top = counted.orderBy(F.col("count").desc(), F.col("value").asc()).limit(top_n)
    bottom = counted.orderBy(F.col("count").asc(), F.col("value").desc()).limit(top_n)
    return (
        top.unionAll(bottom)
        .dropDuplicates(["value"])
        .orderBy(F.col("count").desc(), F.col("value").asc())
    )


# ---------------------------------------------------------------- A8
def column_stats(df: DataFrame, exact: bool = True) -> dict:
    """Composite per-column stats dict (column_stats.py:52-121): dtype,
    unique, nulls, zeros (numeric), descriptive_stats (numeric).

    ONE aggregation job over one scan (the reference issues ~5 separate
    Athena queries; SURVEY §4 flags the fused pass): distinct/null/zero
    counts and the full descriptive block ride the same agg.
    """
    num_cols = numeric_columns(df)
    dtypes = dict(df.dtypes)
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    pct_of = (
        (lambda c: f"percentile(CAST({c} AS DOUBLE), array(0.25, 0.5, 0.75))")
        if exact
        else (lambda c: f"percentile_approx(CAST({c} AS DOUBLE), array(0.25, 0.5, 0.75), 1000)")
    )
    aggs = []
    for c in df.columns:
        aggs.append(distinct_fn(c).alias(f"{c}__uniq"))
        aggs.append(F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"{c}__nulls"))
    for c in num_cols:
        d = F.col(c).cast("double")
        aggs += [
            F.count(F.when(F.col(c) == 0, F.lit(1))).alias(f"{c}__zeros"),
            F.min(d).alias(f"{c}__min"),
            F.expr(pct_of(c)).alias(f"{c}__q"),
            F.max(d).alias(f"{c}__max"),
            F.avg(d).alias(f"{c}__mean"),
            F.stddev(d).alias(f"{c}__stddev"),
        ]
    row = df.agg(*aggs).first()
    out: dict = {}
    for c in df.columns:
        out[c] = {"dtype": dtypes[c], "unique": row[f"{c}__uniq"], "nulls": row[f"{c}__nulls"]}
        if c in num_cols:
            out[c]["num_zeros"] = row[f"{c}__zeros"]
            q = row[f"{c}__q"] or [None, None, None]
            out[c]["descriptive_stats"] = {
                "min": row[f"{c}__min"],
                "q1": q[0],
                "median": q[1],
                "q3": q[2],
                "max": row[f"{c}__max"],
                "mean": row[f"{c}__mean"],
                "stddev": row[f"{c}__stddev"],
            }
    return out


def column_stats_table(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """A8 as a DataFrame: the same fused one-scan aggregation as
    ``column_stats`` but returning the long form (one row per column:
    column, dtype, n_unique, n_nulls, n_zeros, min, q1, median, q3, max,
    mean, stddev) WITHOUT collecting to the driver — the scale-safe shape
    (the dict variant materializes driver-side; this one composes into
    further Spark plans and is DuckDB-oracle-able). Non-numeric columns
    carry NULL numeric stats. The single agg row pivots to long via one
    JVM-side inline(array(structs)) — no second scan, no shuffle beyond
    the aggregation's own."""
    cols = columns or df.columns
    num_cols = [c for c in numeric_columns(df) if c in cols]
    dtypes = dict(df.dtypes)
    distinct_fn = F.countDistinct if exact else F.approx_count_distinct
    pct_of = (
        (lambda c: f"percentile(CAST({c} AS DOUBLE), array(0.25, 0.5, 0.75))")
        if exact
        else (lambda c: f"percentile_approx(CAST({c} AS DOUBLE), array(0.25, 0.5, 0.75), 1000)")
    )
    aggs = []
    for c in cols:
        aggs.append(distinct_fn(c).alias(f"{c}__uniq"))
        aggs.append(F.count(F.when(F.col(c).isNull(), F.lit(1))).alias(f"{c}__nulls"))
    for c in num_cols:
        d = F.col(c).cast("double")
        if exact:
            # oracle-grade mean/stddev from exact integer sums — the
            # same partition-order-invariance recipe (and rationale) as
            # descriptive_stats' exact mode; see that function's note.
            q = F.floor(d * F.lit(1e6) + F.lit(0.5)).cast("decimal(19,0)")
            aggs += [
                F.count(F.when(F.col(c) == 0, F.lit(1))).alias(f"{c}__zeros"),
                F.min(d).alias(f"{c}__min"),
                F.expr(pct_of(c)).alias(f"{c}__q"),
                F.max(d).alias(f"{c}__max"),
                F.sum(q).cast("decimal(38,0)").alias(f"{c}__s"),
                F.sum((q * q).cast("decimal(38,0)")).alias(f"{c}__qq"),
                F.count(q).alias(f"{c}__n"),
            ]
            continue
        aggs += [
            F.count(F.when(F.col(c) == 0, F.lit(1))).alias(f"{c}__zeros"),
            F.min(d).alias(f"{c}__min"),
            F.expr(pct_of(c)).alias(f"{c}__q"),
            F.max(d).alias(f"{c}__max"),
            F.avg(d).alias(f"{c}__mean"),
            F.stddev(d).alias(f"{c}__stddev"),
        ]
    nd = F.lit(None).cast("double")
    structs = []
    for c in cols:
        is_num = c in num_cols
        structs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col(f"{c}__uniq").cast("long").alias("n_unique"),
                F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                (F.col(f"{c}__zeros").cast("long") if is_num else F.lit(None).cast("long")).alias("n_zeros"),
                (F.col(f"{c}__min") if is_num else nd).alias("min"),
                (F.col(f"{c}__q")[0] if is_num else nd).alias("q1"),
                (F.col(f"{c}__q")[1] if is_num else nd).alias("median"),
                (F.col(f"{c}__q")[2] if is_num else nd).alias("q3"),
                (F.col(f"{c}__max") if is_num else nd).alias("max"),
                (F.col(f"{c}__mean") if is_num else nd).alias("mean"),
                (F.col(f"{c}__stddev") if is_num else nd).alias("stddev"),
            )
        )
    wide = df.agg(*aggs)
    if exact:
        for c in num_cols:
            s_d = F.col(f"{c}__s").cast("double")
            qq_d = F.col(f"{c}__qq").cast("double")
            n = F.col(f"{c}__n")
            wide = wide.withColumn(
                f"{c}__mean", s_d / n / F.lit(1e6)
            ).withColumn(
                f"{c}__stddev",
                F.when(  # n<=1: NULL, not 0 (greatest would eat the 0/0 NULL)
                    n > 1,
                    F.sqrt(
                        F.greatest(
                            (qq_d - s_d * s_d / n) / (n - F.lit(1)), F.lit(0.0)
                        )
                    )
                    / F.lit(1e6),
                ),
            )
    return wide.select(F.inline(F.array(*structs)))


# ---------------------------------------------------------------- A9 / P4
def outlier_bounds(
    df: DataFrame,
    columns: list[str] | None = None,
    scale: float = 1.5,
    exact: bool = True,
    accuracy: int = 1000,
    sample_fraction: float | None = None,
) -> dict[str, tuple[float, float]]:
    """IQR outlier bounds per numeric column (outliers.py:20-120):
    [q1 - scale*IQR, q3 + scale*IQR]. Columns with <3 distinct values are
    skipped (reference skips unary/binary columns, outliers.py:95-104).
    One aggregation pass for quantiles + one for distinct gate.

    ``exact=False, sample_fraction=f``: q1/q3 come from EXACT percentiles
    of a seeded f-sample instead of the GK sketch — same trade as
    descriptive_stats(sample_fraction=): the sketch's per-row insert
    dominates, the sample's rank error (~1/(2·sqrt(n·f))) is tighter at
    f·n ≥ ~1e5, and IQR bounds tolerate tiny quantile shifts by
    construction (scale·IQR margins). Distinct gate stays on full data.
    """
    cols = columns or numeric_columns(df)
    if not cols:
        return {}
    if exact:
        pct_of = lambda c: f"percentile(CAST({c} AS DOUBLE), array(0.25, 0.75))"  # noqa: E731
    else:
        pct_of = lambda c: f"percentile_approx(CAST({c} AS DOUBLE), array(0.25, 0.75), {accuracy})"  # noqa: E731
    if not exact and sample_fraction:
        pct_of = lambda c: f"percentile(CAST({c} AS DOUBLE), array(0.25, 0.75))"  # noqa: E731
        qrow = df.sample(fraction=sample_fraction, seed=42).agg(
            *[F.expr(pct_of(c) + "[0]").alias(f"{c}___q1") for c in cols],
            *[F.expr(pct_of(c) + "[1]").alias(f"{c}___q3") for c in cols],
        ).first()
        nrow = df.agg(
            *[F.approx_count_distinct(c).alias(f"{c}___nd") for c in cols]
        ).first()
        row = {**qrow.asDict(), **nrow.asDict()}
    else:
        aggs = []
        for c in cols:
            aggs.append(F.expr(pct_of(c) + "[0]").alias(f"{c}___q1"))
            aggs.append(F.expr(pct_of(c) + "[1]").alias(f"{c}___q3"))
            # gate only asks "more than 2 distinct?" — HLL sketch is exact
            # enough at tiny cardinalities and avoids an exact-distinct
            # shuffle at scale
            aggs.append(F.approx_count_distinct(c).alias(f"{c}___nd"))
        row = df.agg(*aggs).first()
    bounds = {}
    for c in cols:
        if row[f"{c}___nd"] is None or row[f"{c}___nd"] <= 2:
            continue
        q1, q3 = row[f"{c}___q1"], row[f"{c}___q3"]
        if q1 is None or q3 is None:
            continue
        iqr = q3 - q1
        bounds[c] = (q1 - scale * iqr, q3 + scale * iqr)
    return bounds


def outliers(
    df: DataFrame,
    columns: list[str] | None = None,
    scale: float = 1.5,
    scan_limit: int = 5000,
    top_n_per_group: int = 10,
    order_cols: list[str] | None = None,
    exact: bool = True,
    sample_fraction: float | None = None,
) -> DataFrame:
    """Outlier rows labelled ``outlier_group`` = '{col}_low'/'{col}_high'
    (outliers.py:128-216): predicate scan with OR'd bound conditions
    (LIMIT scan_limit), then top-N rows per group ordered by the offending
    column (most extreme first).

    The predicate is pushed down to the parquet scan by Catalyst; the
    top-N is a per-group window over the (small, capped) scan result.
    ``order_cols`` pins a deterministic tiebreak for oracle matching.
    """
    bounds = outlier_bounds(
        df, columns, scale, exact=exact, sample_fraction=sample_fraction
    )
    if not bounds:
        return df.limit(0).withColumn("outlier_group", F.lit(""))
    conds = [
        (F.col(c) < lb) | (F.col(c) > ub) for c, (lb, ub) in bounds.items()
    ]
    scanned = df.filter(reduce(or_, conds))
    if scan_limit:
        scanned = scanned.limit(scan_limit)

    # label: first matching column, low before high (reference iterates columns)
    group_expr = None
    for c, (lb, ub) in reversed(list(bounds.items())):
        branch = F.when(F.col(c) < lb, F.lit(f"{c}_low")).when(
            F.col(c) > ub, F.lit(f"{c}_high")
        )
        group_expr = branch.otherwise(group_expr) if group_expr is not None else branch
    labelled = scanned.withColumn("outlier_group", group_expr)

    # top-N most extreme per group: low groups ascending, high groups descending
    tiebreak = [F.col(c) for c in (order_cols or [])]
    sort_val = None
    for c, (lb, ub) in bounds.items():
        lo = F.when(F.col("outlier_group") == f"{c}_low", F.col(c).cast("double"))
        hi = F.when(F.col("outlier_group") == f"{c}_high", -F.col(c).cast("double"))
        sort_val = (
            lo.otherwise(hi.otherwise(sort_val)) if sort_val is not None else lo.otherwise(hi)
        )
    w = Window.partitionBy("outlier_group").orderBy(F.col("__sortval").asc(), *tiebreak)
    return (
        labelled.withColumn("__sortval", sort_val)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= top_n_per_group)
        .drop("__sortval", "__rn")
    )


# ---------------------------------------------------------------- O3 / A10
def sample_rows(df: DataFrame, rows: int = 100, seed: int = 42, total: int | None = None) -> DataFrame:
    """Bernoulli sample targeting ``rows`` with the reference's 110% fudge +
    clamp (sample_rows.py:33-49). Deterministic under a fixed seed."""
    n = total if total is not None else df.count()
    if n <= rows:
        return df
    frac = min(1.0, max(rows / n * 1.1, 0.001))
    return df.sample(fraction=frac, seed=seed).limit(rows)


def deterministic_sample(df: DataFrame, key_col: str, mod: int = 100, keep: int = 5) -> DataFrame:
    """Hash-free deterministic sample: keep rows where key % mod < keep.
    Engine-portable (same rows in Spark and any SQL oracle) — this is the
    t2-checkable stand-in for Bernoulli sampling."""
    return df.filter((F.col(key_col) % mod) < keep)


def smart_sample(
    df: DataFrame,
    columns: list[str] | None = None,
    rows: int = 100,
    seed: int = 42,
) -> DataFrame:
    """Outliers ∪ sample, dedup on all columns except the group label
    (athena_source.py:364-394)."""
    out = outliers(df, columns).drop("outlier_group")
    samp = sample_rows(df, rows=rows, seed=seed)
    return out.unionAll(samp).dropDuplicates(df.columns)
