"""Classification-probability post-processing operators.

Reference citations (utils/pandas_utils.py):
- max_proba — pandas_utils.py:270-285 (max over *_proba columns)
- proba_to_conf — pandas_utils.py:287-307 (rescale [1/n, 1] → [0, 1])
- compute_confusion — pandas_utils.py:309-353 (residual-banded confusion
  score blending correctness with confidence)
- binary_accuracy — pandas_utils.py:213-242 ((TP+TN)/total over a
  positive/negative class partition)
- confidence_profile — pandas_utils.py:354-396 (binary accuracy per
  confidence quantile)

All row-wise pieces are plain column expressions (whole-stage codegen,
no Python per row). confidence_profile uses ``ntile`` over
(max_proba DESC, tiebreak) instead of the reference's ``pd.qcut``:
equal-count bins instead of value-quantile bins — identical for
continuous confidence scores, deterministic under ties (qcut merges
tied boundary values into one bin; ntile splits them by the tiebreak
column), and it runs as a single window + aggregation at any scale
instead of materializing N driver-side frames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _proba_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c.endswith("_proba") and c != "max_proba"]


def max_proba(df: DataFrame, proba_cols: list[str] | None = None) -> DataFrame:
    """Add ``max_proba`` = the max across probability columns
    (pandas_utils.py:270-285; columns ending in ``_proba`` by default)."""
    cols = proba_cols if proba_cols is not None else _proba_cols(df)
    if not cols:
        raise ValueError("max_proba: no *_proba columns found")
    return df.withColumn("max_proba", F.greatest(*[F.col(c) for c in cols]))


def proba_to_conf(df: DataFrame, proba_cols: list[str] | None = None) -> DataFrame:
    """Add ``confidence`` rescaling max_proba from [1/n_classes, 1] to
    [0, 1] (pandas_utils.py:287-307) — random-guess probability maps to
    confidence 0. No-op (like the reference) if max_proba is absent."""
    if "max_proba" not in df.columns:
        return df
    n = len(proba_cols if proba_cols is not None else _proba_cols(df))
    baseline = 1.0 / max(n, 2)
    return df.withColumn(
        "confidence", (F.col("max_proba") - baseline) / (1.0 - baseline)
    )


def compute_confusion(df: DataFrame, n_classes: int | None = None) -> DataFrame:
    """Add the banded ``confusion`` score (pandas_utils.py:309-353):
    residual level r owns band [r·bw, (r+1)·bw] with bw = 1/n_classes;
    correct rows (r=0) score (1−confidence)·bw, wrong rows score
    r·bw + confidence·bw. No-op when residual/confidence are missing."""
    if "residual" not in df.columns or "confidence" not in df.columns:
        return df
    if n_classes is None:
        n_classes = len(_proba_cols(df))
    n_classes = max(n_classes, 2)
    bw = 1.0 / n_classes
    r = F.col("residual").cast("double")
    conf = F.col("confidence")
    confusion = F.when(r == 0, (1 - conf) * bw).otherwise(r * bw + conf * bw)
    return df.withColumn("confusion", confusion)


def _is_positive(col: Column, positive_classes: list) -> Column:
    return col.isin(positive_classes)


def binary_accuracy_expr(
    target: str, prediction: str, positive_classes: list
) -> Column:
    """(TP+TN)/(TP+TN+FP+FN) as an aggregate expression
    (pandas_utils.py:213-242): a prediction is binary-correct when target
    and prediction fall on the same side of the positive/negative split."""
    agree = (
        _is_positive(F.col(target), positive_classes)
        == _is_positive(F.col(prediction), positive_classes)
    ).cast("int")
    return F.avg(agree)


def binary_accuracy(
    df: DataFrame,
    target: str,
    prediction: str,
    positive_classes: list,
    negative_classes: list | None = None,
) -> float:
    """Scalar binary accuracy. Rows whose target or prediction lies
    outside positive∪negative are excluded, exactly like the reference's
    confusion matrix restricted to ``labels=positive+negative``."""
    if negative_classes is not None:
        labels = list(positive_classes) + list(negative_classes)
        df = df.filter(F.col(target).isin(labels) & F.col(prediction).isin(labels))
    row = df.agg(binary_accuracy_expr(target, prediction, positive_classes)).collect()[0]
    return float(row[0])


def confidence_profile(
    df: DataFrame,
    target: str,
    prediction: str,
    positive_classes: list,
    negative_classes: list,
    quantiles: int = 10,
    tiebreak: str | None = None,
    scalable: bool = False,
) -> DataFrame:
    """Binary accuracy per confidence quantile (pandas_utils.py:354-396).

    Quantile 0 holds the highest-confidence rows (the reference reverses
    qcut's ordering the same way). One bucket pass + one aggregation — no
    driver-side frame list. Pass ``tiebreak`` (an id column) to pin the
    bin assignment of tied max_proba values.

    The default exact path uses ntile over a global ORDER BY window —
    a single task, fine for oracle runs at test SF. ``scalable=True``
    switches to approx-quantile cut points (the W4 pattern,
    windows.ntile_buckets_scalable): one lightweight quantile sketch +
    a map-side bucket assignment, fully parallel at any SF, with
    approximate bin boundaries.
    """
    labels = list(positive_classes) + list(negative_classes)
    scored = max_proba(df).filter(
        F.col(target).isin(labels) & F.col(prediction).isin(labels)
    )
    if scalable:
        probs = [i / quantiles for i in range(1, quantiles)]
        # descending bins: quantile 0 = highest confidence
        cuts = scored.approxQuantile("max_proba", probs, 1e-4)
        # chained when, highest cut first: p >= q90 → 0, p >= q80 → 1, ...
        bucket = F.when(F.col("max_proba") >= cuts[-1], F.lit(0))
        for i in range(1, len(cuts)):
            bucket = bucket.when(F.col("max_proba") >= cuts[-1 - i], F.lit(i))
        binned = scored.withColumn("quantile", bucket.otherwise(F.lit(quantiles - 1)))
    else:
        order = [F.col("max_proba").desc()]
        if tiebreak:
            order.append(F.col(tiebreak).asc())
        w = Window.orderBy(*order)
        binned = scored.withColumn("quantile", F.ntile(quantiles).over(w) - 1)
    return (
        binned.groupBy("quantile")
        .agg(binary_accuracy_expr(target, prediction, positive_classes).alias("binary_accuracy"))
        .orderBy("quantile")
    )
