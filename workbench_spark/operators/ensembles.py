"""Ensemble aggregation + data-quality operators (SURVEY §2.4 A13,
A19-A20; §2.3 J4 lives in operators/joins.py).

Reference citations:
- A13 ensemble aggregators — utils/aggregation_nodes.py:187-380
  (Mean / WeightedMean / majority Vote / confidence-weighted)
- calibrated strategy aggregators — utils/aggregation_nodes.py:273-388
  (ConfidenceWeighted / InverseMaeWeighted / ScaledConfidenceWeighted /
  CalibratedConfidenceWeighted) with the shared math from
  utils/ensemble_utils.py:12-58 (conf_weights_with_fallback,
  ensemble_confidence)
- strategy simulation — utils/ensemble_simulator.py:344-458
  (ensemble_weights, strategy_comparison)
- A19 target_health — utils/pandas_utils.py:789-884
- A20 feature_quality_metrics — utils/pandas_utils.py:631-730

All row-wise array expressions or single-pass aggregations — map-side,
shuffle-free except the tiny final aggs. The strategy tier keeps the
reference's numpy formulas except the `+1e-12` denominator guard, which
breaks convexity (see _branch_weights) and is replaced by exact
normalization; the SQL oracles replay the exact same corrected formulas
bit-for-bit. Everything stays in whole-stage codegen — the per-row weight
math is a fixed-width expression over M branch columns, never a Python UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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


_STRATEGIES = ("confidence", "inverse_mae", "scaled_confidence", "calibrated_confidence")


def _branch_weights(
    conf: list[Column], raw: list[Column] | None, fallback: list[float]
) -> list[Column]:
    """conf_weights_with_fallback (ensemble_utils.py:12-25) as columns:
    normalize the raw per-row values, fall back to the static weights when
    the row sums to exactly 0.

    Deliberate divergence from the reference: its numpy formula divides by
    ``(sum + 1e-12)``, which makes the weights sum to ``1 - 1e-12/Σ`` — for
    tiny Σ the "weighted mean" lands OUTSIDE the hull of the branch
    predictions (Hypothesis found Σc ≈ 6e-5 pushing the result below every
    input). We divide exactly (``try_divide``), so the combination is a
    true convex combination for every Σ > 0, and fall back to the static
    weights only at Σ == 0 (where the reference's guard effectively lands
    anyway). Verified by tests/test_properties.py convexity property."""
    vals = raw if raw is not None else conf
    total = sum(vals[1:], vals[0])
    return [
        F.when(total == 0, F.lit(w)).otherwise(F.try_divide(v, total))
        for v, w in zip(vals, fallback)
    ]


def ensemble_strategy(
    df: DataFrame,
    pred_cols: list[str],
    conf_cols: list[str],
    strategy: str = "scaled_confidence",
    model_weights: list[float] | None = None,
    corr_scale: list[float] | None = None,
    optimal_alpha: float = 0.5,
) -> DataFrame:
    """Calibrated ensemble strategy aggregators
    (aggregation_nodes.py:310-388) as pure column expressions.

    Adds ``prediction`` (strategy-weighted branch combination),
    ``prediction_std`` (population std of the branches — numpy ddof=0),
    and ``confidence`` (ensemble_utils.py:27-58:
    α·1/(1+std) + (1−α)·Σ confᵢ·corrᵢ·wᵢ).

    strategy: ``confidence`` (per-row weights = normalized confidences),
    ``inverse_mae`` (static model_weights only), ``scaled_confidence``
    (confidence × model_weights, renormalized), ``calibrated_confidence``
    (confidence × |conf-error corr|, renormalized). Static model_weights
    are normalized to sum 1 exactly as _StrategyAggregator.__init__ does.
    """
    if strategy not in _STRATEGIES:
        raise ValueError(f"Unknown strategy: {strategy} (pick from {_STRATEGIES})")
    if len(pred_cols) != len(conf_cols):
        raise ValueError("pred_cols and conf_cols must align")
    m = len(pred_cols)
    if model_weights is None:
        model_weights = [1.0] * m
    if len(model_weights) != m:
        raise ValueError(f"got {m} branches but {len(model_weights)} weights")
    if any(w < 0 for w in model_weights) or sum(model_weights) <= 0:
        raise ValueError("model_weights must be non-negative and sum to > 0")
    total_w = float(sum(model_weights))
    mw = [float(w) / total_w for w in model_weights]
    cs = [1.0] * m if corr_scale is None else [float(c) for c in corr_scale]
    if len(cs) != m:
        raise ValueError("corr_scale shape must match model_weights shape")

    preds = [F.col(c).cast("double") for c in pred_cols]
    confs = [F.col(c).cast("double") for c in conf_cols]

    if strategy == "confidence":
        weights = _branch_weights(confs, None, mw)
    elif strategy == "inverse_mae":
        weights = [F.lit(w) for w in mw]
    elif strategy == "scaled_confidence":
        weights = _branch_weights(confs, [c * F.lit(w) for c, w in zip(confs, mw)], mw)
    else:  # calibrated_confidence
        weights = _branch_weights(confs, [c * F.lit(s) for c, s in zip(confs, cs)], mw)

    prediction = sum((p * w for p, w in zip(preds[1:], weights[1:])), preds[0] * weights[0])
    # population std via the sum/sumsq closed form: one linear pass over
    # the M branch columns instead of re-embedding the mean expression
    # M times (keeps the codegen'd expression tree O(M))
    psum = sum(preds[1:], preds[0])
    psumsq = sum((p * p for p in preds[1:]), preds[0] * preds[0])
    std = F.sqrt(F.greatest(F.lit(0.0), psumsq / m - (psum / m) * (psum / m)))
    cal_conf = sum(
        (c * F.lit(s * w) for c, s, w in zip(confs[1:], cs[1:], mw[1:])),
        confs[0] * F.lit(cs[0] * mw[0]),
    )
    confidence = F.lit(optimal_alpha) / (1.0 + std) + F.lit(1.0 - optimal_alpha) * cal_conf
    return (
        df.withColumn("prediction", prediction)
        .withColumn("prediction_std", std)
        .withColumn("confidence", confidence)
    )


def inverse_mae_weights(df: DataFrame, pred_cols: list[str], target: str) -> list[float]:
    """Suggested static ensemble weights ∝ 1/MAE per branch
    (ensemble_simulator.py:344-366) — one aggregation pass for every
    branch MAE, normalization on the driver (M scalars)."""
    row = df.agg(
        *[F.avg(F.abs(F.col(c) - F.col(target))).alias(c) for c in pred_cols]
    ).collect()[0]
    # clamp: a degenerate/leaky branch can hit MAE == 0 exactly — weight it
    # as 1/1e-12 rather than crash (the reference shares the raw-1/x flaw)
    inv = [1.0 / max(row[c], 1e-12) for c in pred_cols]
    total = sum(inv)
    return [w / total for w in inv]


def conf_error_corr(
    df: DataFrame, pred_cols: list[str], conf_cols: list[str], target: str
) -> list[float]:
    """Per-branch Pearson correlation of confidence vs |residual|
    (ensemble_simulator.py:213, the corr_scale input of the calibrated
    strategies) — all branches in one aggregation pass."""
    row = df.agg(
        *[
            _safe_corr(F.col(cc), F.abs(F.col(pc) - F.col(target))).alias(cc)
            for pc, cc in zip(pred_cols, conf_cols)
        ]
    ).collect()[0]
    return [float(row[cc]) if row[cc] is not None else 0.0 for cc in conf_cols]


def _safe_corr(x: Column, y: Column) -> Column:
    """Pearson corr that returns NULL (not an ANSI DIVIDE_BY_ZERO error)
    when either side has zero variance — a constant confidence column is a
    legitimate input here (it maps to corr_scale 0.0, the reference's
    COALESCE(abs(corr), 0) path). Same covar/σσ formula F.corr uses, so
    values agree with DuckDB's corr() to float precision."""
    return F.try_divide(F.covar_samp(x, y), F.stddev_samp(x) * F.stddev_samp(y))


def strategy_comparison(
    df: DataFrame, pred_cols: list[str], conf_cols: list[str], target: str
) -> DataFrame:
    """EnsembleSimulator.strategy_comparison (ensemble_simulator.py:368-456)
    distributively: rank seven ensemble strategies by MAE against the
    target. Two aggregation passes total — one for the per-branch MAE and
    conf-error correlations (the strategy parameters), one computing ALL
    seven strategy MAEs map-side in a single job — versus the reference's
    seven sequential pandas column materializations. Output: (strategy,
    mae) sorted best-first, ties broken by strategy name."""
    m = len(pred_cols)
    params = df.agg(
        *[F.avg(F.abs(F.col(c) - F.col(target))).alias(f"mae_{i}") for i, c in enumerate(pred_cols)],
        *[
            _safe_corr(F.col(cc), F.abs(F.col(pc) - F.col(target))).alias(f"corr_{i}")
            for i, (pc, cc) in enumerate(zip(pred_cols, conf_cols))
        ],
    ).collect()[0]
    maes = [params[f"mae_{i}"] for i in range(m)]
    inv = [1.0 / max(x, 1e-12) for x in maes]  # MAE==0 branch: clamp, don't crash
    mw = [w / sum(inv) for w in inv]
    cs = [abs(params[f"corr_{i}"]) if params[f"corr_{i}"] is not None else 0.0 for i in range(m)]
    best_i = min(range(m), key=lambda i: maes[i])
    worst_i = max(range(m), key=lambda i: maes[i])

    preds = [F.col(c).cast("double") for c in pred_cols]
    confs = [F.col(c).cast("double") for c in conf_cols]
    tgt = F.col(target).cast("double")

    def blended(weights: list[Column]) -> Column:
        return sum((p * w for p, w in zip(preds[1:], weights[1:])), preds[0] * weights[0])

    keep = [p for i, p in enumerate(preds) if i != worst_i]
    strategies: dict[str, Column] = {
        "Simple Mean": sum(preds[1:], preds[0]) / m,
        "Confidence-Weighted": blended(_branch_weights(confs, None, mw)),
        "Inverse-MAE Weighted": blended([F.lit(w) for w in mw]),
        f"Best Model Only ({pred_cols[best_i]})": preds[best_i],
        "Scaled Conf-Weighted": blended(
            _branch_weights(confs, [c * F.lit(w) for c, w in zip(confs, mw)], mw)
        ),
        "Calibrated Conf-Weighted": blended(
            _branch_weights(confs, [c * F.lit(s) for c, s in zip(confs, cs)], mw)
        ),
        f"Drop Worst ({pred_cols[worst_i]})": sum(keep[1:], keep[0]) / len(keep),
    }
    row = df.agg(
        *[
            F.avg(F.abs(expr - tgt)).alias(f"s_{i}")
            for i, expr in enumerate(strategies.values())
        ]
    ).collect()[0]
    out = df.sparkSession.createDataFrame(
        [(name, float(row[f"s_{i}"])) for i, name in enumerate(strategies)],
        "strategy string, mae double",
    )
    return out.orderBy("mae", "strategy")


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
