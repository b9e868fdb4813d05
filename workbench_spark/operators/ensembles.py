"""Ensemble aggregation + data-quality operators (SURVEY §2.4 A13,
A19-A20; §2.3 J4 lives in operators/joins.py).

Reference citations:
- A13 ensemble aggregators — utils/aggregation_nodes.py:187-380
  (Mean / WeightedMean / majority Vote / confidence-weighted)
- A19 target_health — utils/pandas_utils.py:789-884
- A20 feature_quality_metrics — utils/pandas_utils.py:631-730

All row-wise array expressions or single-pass aggregations — map-side,
shuffle-free except the tiny final aggs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensemble_mean(df: DataFrame, pred_cols: list[str], out_col: str = "prediction") -> DataFrame:
    """A13 Mean — row-wise average of branch predictions
    (aggregation_nodes.py:187-219). NULL branches excluded per row."""
    arr = F.array_compact(F.array(*[F.col(c).cast("double") for c in pred_cols]))
    mean = F.when(
        F.size(arr) > 0,
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x) / F.size(arr),
    )
    return df.withColumn(out_col, mean)


def ensemble_weighted_mean(
    df: DataFrame, pred_cols: list[str], weights: list[float], out_col: str = "prediction"
) -> DataFrame:
    """A13 WeightedMean — Σ w_i p_i / Σ w_i (aggregation_nodes.py:221-256)."""
    num = None
    den = None
    for c, w in zip(pred_cols, weights):
        term = F.when(F.col(c).isNotNull(), F.col(c).cast("double") * F.lit(w)).otherwise(0.0)
        wt = F.when(F.col(c).isNotNull(), F.lit(float(w))).otherwise(0.0)
        num = term if num is None else num + term
        den = wt if den is None else den + wt
    return df.withColumn(out_col, F.when(den > 0, num / den))


def ensemble_vote(df: DataFrame, pred_cols: list[str], out_col: str = "prediction") -> DataFrame:
    """A13 majority Vote over categorical branch predictions
    (aggregation_nodes.py:273-330); ties broken by label order."""
    arr = F.array_compact(F.array(*[F.col(c).cast("string") for c in pred_cols]))
    distinct = F.array_distinct(arr)
    count_of = lambda v: F.size(F.filter(arr, lambda x: x == v))  # noqa: E731
    max_count = F.array_max(F.transform(distinct, count_of))
    # ties broken by smallest label — deterministic, matches pandas mode()
    winner = F.array_min(F.filter(distinct, lambda v: count_of(v) == max_count))
    return df.withColumn(out_col, F.when(F.size(arr) > 0, winner))


def target_health(df: DataFrame, target: str, pileup_threshold: float = 0.1) -> DataFrame:
    """A19 — target diagnostics in one aggregation pass
    (pandas_utils.py:789-884): support, nulls, distinct, min/max range,
    pileup fraction (share of the most frequent value), pileup value."""
    counted = (
        df.groupBy(F.col(target).alias("v"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counted.orderBy(F.col("n").desc(), F.col("v").asc()).limit(1)
    totals = df.agg(
        F.count(F.lit(1)).alias("support"),
        F.count(F.when(F.col(target).isNull(), 1)).alias("nulls"),
        F.countDistinct(target).alias("distinct_values"),
        F.min(target).alias("min_value"),
        F.max(target).alias("max_value"),
    )
    return totals.crossJoin(F.broadcast(top)).select(
        "support",
        "nulls",
        "distinct_values",
        "min_value",
        "max_value",
        F.col("v").alias("pileup_value"),
        (F.col("n") / F.col("support")).alias("pileup_fraction"),
    )


def feature_quality(
    df: DataFrame, feature_cols: list[str], strategy: str = "mean"
) -> DataFrame:
    """A20 — impute NaN/INF + per-row quality tags
    (pandas_utils.py:631-730): INF→NULL first, impute with the column
    mean/median/zero (one stats pass broadcast back), and tag each row
    with the columns that were touched."""
    cleaned = df
    for c in feature_cols:
        col = F.col(c).cast("double")
        cleaned = cleaned.withColumn(
            c, F.when(F.isnan(col) | (F.abs(col) == float("inf")), None).otherwise(col)
        )
    if strategy == "zero":
        fills = {c: 0.0 for c in feature_cols}
        stats_row = None
    else:
        agg_exprs = [
            (
                F.avg(F.col(c)) if strategy == "mean" else F.expr(f"percentile({c}, 0.5)")
            ).alias(c)
            for c in feature_cols
        ]
        stats_row = cleaned.agg(*agg_exprs).first()
        fills = {c: (stats_row[c] if stats_row[c] is not None else 0.0) for c in feature_cols}
    tags = F.array_compact(
        F.array(
            *[
                F.when(F.col(c).isNull(), F.lit(f"imputed_{c}"))
                for c in feature_cols
            ]
        )
    )
    out = cleaned.withColumn("quality_tags", tags)
    return out.na.fill(fills)
