"""Model-evaluation metric operators (SURVEY §2.4 A14-A16).

Reference semantics:
- A14 regression metrics     — utils/metrics_utils.py:198-256
- A15 classification metrics — utils/metrics_utils.py:97-196
- A16 confusion matrix       — endpoint_core.py:1210-1250

All are pure aggregations over (target, prediction) columns — map-side
combinable, one shuffle of O(1) (regression) or O(#classes) (classification)
state. Spearman needs two rank windows (one shuffle each) + a corr agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def regression_metrics(
    df: DataFrame, target: str, prediction: str, exact: bool = False
) -> DataFrame:
    """A14 — one row: rmse, mae, medae, r2, spearman, support
    (metrics_utils.py:198-256). NaN/NULL predictions are dropped first
    (reference drops them at endpoint_core.py:1150-1163).

    ``exact=True`` (oracle mode — the r15 ROUND(SUM) audit conversion):
    rmse/mae/r2 run on integer-quantized sufficient statistics instead
    of raw float sums (|err| at 1e-6 units → BIGINT; err², y² at 1e-4
    units and y at 1e-2 units → decimal(38,0), the Σq² headroom
    convention: err² terms reach ~2.5e13 units, so BIGINT would overflow
    past ~sf1). Integer sums are order-invariant under any partitioning;
    the remaining divisions/sqrt see identical operands on both engines
    (IEEE sqrt is exactly rounded). spearman uses exact_midrank_corr
    (below) — integer sufficient statistics over the dyadic midranks,
    same order-invariance argument; built-in F.corr is the production
    path only (engines merge float partials even on integer inputs)."""
    d = df.select(
        F.col(target).cast("double").alias("y"),
        F.col(prediction).cast("double").alias("p"),
    ).filter(F.col("y").isNotNull() & F.col("p").isNotNull() & ~F.isnan("p") & ~F.isnan("y"))
    err = F.col("y") - F.col("p")
    # spearman = pearson corr of the two rank sequences (average ranks for
    # ties — matches scipy.spearmanr); rank() + count correction gives avg rank
    d = d.withColumn("ry", _avg_rank("y")).withColumn("rp", _avg_rank("p"))
    if exact:
        dec = "decimal(38,0)"
        s_e2 = F.sum(F.floor(err * err * F.lit(1e4) + F.lit(0.5)).cast(dec))
        s_abs = F.sum(F.floor(F.abs(err) * F.lit(1e6) + F.lit(0.5)).cast("long"))
        s_y = F.sum(F.floor(F.col("y") * F.lit(100) + F.lit(0.5)).cast("long"))
        s_y2 = F.sum(
            F.floor(F.col("y") * F.col("y") * F.lit(1e4) + F.lit(0.5)).cast(dec)
        )
        n = F.count(F.lit(1))
        return d.agg(
            F.sqrt(s_e2.cast("double") / n / F.lit(1e4)).alias("rmse"),
            (s_abs.cast("double") / n / F.lit(1e6)).alias("mae"),
            F.expr("percentile(abs(y - p), 0.5)").alias("medae"),
            (
                F.lit(1)
                - s_e2.cast("double")
                / (
                    s_y2.cast("double")
                    - s_y.cast("double") * s_y.cast("double") / n
                )
            ).alias("r2"),
            exact_midrank_corr(F.col("ry"), F.col("rp")).alias("spearman"),
            n.alias("support"),
        ).select("rmse", "mae", "medae", "r2", "spearman", "support")
    return d.agg(
        F.sqrt(F.avg(err * err)).alias("rmse"),
        F.avg(F.abs(err)).alias("mae"),
        F.expr("percentile(abs(y - p), 0.5)").alias("medae"),
        F.corr("ry", "rp").alias("spearman"),
        F.count(F.lit(1)).alias("support"),
        F.avg("y").alias("__ybar"),
        F.sum(err * err).alias("__sse"),
        F.sum(F.col("y") * F.col("y")).alias("__syy"),
    ).select(
        "rmse",
        "mae",
        "medae",
        # r2 = 1 - SSE / SST, SST = Σy² - n*ȳ²
        (1 - F.col("__sse") / (F.col("__syy") - F.col("support") * F.col("__ybar") * F.col("__ybar"))).alias("r2"),
        "spearman",
        "support",
    )


def exact_midrank_corr(rx, ry):
    """Pearson correlation of two MIDRANK columns from exact integer
    sufficient statistics (r15 — retires the audit's rank-corr pins):
    midranks are dyadic halves, so 2·r is an exactly-representable
    integer; Σx, Σy, Σx², Σy², Σxy accumulate as decimal(38,0) integers
    (order-invariant under any partitioning — per-term products (2r)²
    reach ~9e12 at sf1, and n·Σxy ~1e21 stays far inside decimal(38);
    DuckDB's twin runs the same sums in HUGEINT), and the final
    combination (n·Σxy − ΣxΣy)/(√(n·Σx²−Σx²̂)·√(n·Σy²−Σy²̂)) is one fixed
    sequence of IEEE-exact double ops on identical operands. The factor
    2 cancels in the ratio. Zero variance → NULL (the _safe_corr
    contract; both engines also NULL double /0 natively). Built-in
    F.corr stays the production path — engines may implement it with
    stable pairwise merges whose float intermediates are not
    order-exact even on integer inputs."""
    d = "decimal(38,0)"
    ix = (rx * 2).cast("long")
    iy = (ry * 2).cast("long")
    n = F.count(F.lit(1)).cast(d)
    sx, sy = F.sum(ix.cast(d)), F.sum(iy.cast(d))
    sxx = F.sum((ix * ix).cast(d))
    syy = F.sum((iy * iy).cast(d))
    sxy = F.sum((ix * iy).cast(d))
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    num = n * sxy - sx * sy
    return F.when(
        (dx == 0) | (dy == 0), F.lit(None).cast("double")
    ).otherwise(
        num.cast("double")
        / (F.sqrt(dx.cast("double")) * F.sqrt(dy.cast("double")))
    )


def exact_midrank_corr_sql(x: str, y: str) -> str:
    """DuckDB twin of exact_midrank_corr over midrank columns x, y."""
    ix, iy = f"CAST({x} * 2 AS HUGEINT)", f"CAST({y} * 2 AS HUGEINT)"
    n = "CAST(COUNT(*) AS HUGEINT)"
    sx, sy = f"SUM({ix})", f"SUM({iy})"
    sxx, syy, sxy = f"SUM({ix} * {ix})", f"SUM({iy} * {iy})", f"SUM({ix} * {iy})"
    dx = f"({n} * {sxx} - {sx} * {sx})"
    dy = f"({n} * {syy} - {sy} * {sy})"
    num = f"({n} * {sxy} - {sx} * {sy})"
    return (
        f"CASE WHEN {dx} = 0 OR {dy} = 0 THEN NULL ELSE "
        f"CAST({num} AS DOUBLE) / (sqrt(CAST({dx} AS DOUBLE)) * "
        f"sqrt(CAST({dy} AS DOUBLE))) END"
    )


def _avg_rank(col: str):
    """Average rank with ties (scipy 'average' method): rank() + (cnt-1)/2.

    SCALE NOTE: the unpartitioned ORDER BY window is a single task —
    exact at test SF, a bottleneck at billions of rows. There, compute
    approximate ranks from approx-quantile cut points (the
    ntile_buckets_scalable pattern) — Spearman is rank-correlation, so
    bucketed ranks converge quickly."""
    w = Window.orderBy(F.col(col))
    wg = Window.partitionBy(F.col(col))
    return F.rank().over(w) + (F.count(F.lit(1)).over(wg) - 1) / 2.0


def confusion_matrix(df: DataFrame, target: str, prediction: str) -> DataFrame:
    """A16 — long-form confusion matrix (target, prediction, count),
    NULL predictions dropped (endpoint_core.py:1210-1250). Pivot to wide
    client-side if needed; long form is the scale-safe shape."""
    return (
        df.filter(F.col(prediction).isNotNull())
        .groupBy(
            F.col(target).cast("string").alias("label"),
            F.col(prediction).cast("string").alias("prediction"),
        )
        .agg(F.count(F.lit(1)).alias("count"))
    )


def classification_metrics(df: DataFrame, target: str, prediction: str) -> DataFrame:
    """A15 — per-class precision/recall/f1/support from confusion counts
    (metrics_utils.py:97-196). One groupBy over (label, prediction) then a
    tiny self-aggregation on the confusion matrix (driver-scale: #classes²).
    """
    cm = confusion_matrix(df, target, prediction)
    tp = cm.filter(F.col("label") == F.col("prediction")).select(
        F.col("label").alias("class"), F.col("count").alias("tp")
    )
    actual = cm.groupBy("label").agg(F.sum("count").alias("support")).withColumnRenamed(
        "label", "class"
    )
    predicted = cm.groupBy("prediction").agg(F.sum("count").alias("pred_count")).withColumnRenamed(
        "prediction", "class"
    )
    out = (
        actual.join(predicted, "class", "full")
        .join(tp, "class", "left")
        .select(
            "class",
            F.coalesce(F.col("tp"), F.lit(0)).alias("tp"),
            F.coalesce(F.col("support"), F.lit(0)).alias("support"),
            F.coalesce(F.col("pred_count"), F.lit(0)).alias("pred_count"),
        )
    )
    precision = F.when(F.col("pred_count") > 0, F.col("tp") / F.col("pred_count")).otherwise(0.0)
    recall = F.when(F.col("support") > 0, F.col("tp") / F.col("support")).otherwise(0.0)
    return out.select(
        "class",
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            (precision + recall) > 0, 2 * precision * recall / (precision + recall)
        ).otherwise(0.0).alias("f1"),
        "support",
    )


def spearman_approx(
    df: DataFrame, col_a: str, col_b: str, buckets: int = 1000, relative_error: float = 1e-4
) -> DataFrame:
    """Scalable Spearman: Pearson correlation of BUCKETED ranks — each
    value is ranked by which approx-quantile bucket it falls in (midrank
    of the bucket). No global-order window: one approxQuantile pass per
    column + a map-side bucket lookup + one corr aggregate.

    Error ~ O(1/buckets) for continuous data; with 1000 buckets the
    difference from exact Spearman is <1e-3 on the test tables. This is
    the 100 TB path the exact _avg_rank window (single task) can't take.
    """
    probs = [i / buckets for i in range(1, buckets)]
    cuts_a = df.approxQuantile(col_a, probs, relative_error)
    cuts_b = df.approxQuantile(col_b, probs, relative_error)

    def bucket_expr(c: str, cuts: list) -> "F.Column":
        # binary-search-equivalent CASE chain is O(buckets) to build; use
        # width-array + array position via SQL for a compact expression
        arr = F.array(*[F.lit(float(x)) for x in cuts])
        # number of cut points <= value == bucket index (0..buckets-1)
        return F.size(F.filter(arr, lambda x: x <= F.col(c).cast("double")))

    ranked = df.select(
        bucket_expr(col_a, cuts_a).alias("__ba"),
        bucket_expr(col_b, cuts_b).alias("__bb"),
    )
    return ranked.agg(F.corr("__ba", "__bb").alias("spearman"))
