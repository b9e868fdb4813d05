"""M8 — label-quality / noise detection (Confident Learning), Spark-native.

The reference delegates to the cleanlab package
(``/root/reference/src/workbench/algorithms/models/cleanlab_model.py:85-256``,
``noise_model.py``) — driver-side sklearn + cleanlab over a pandas pull.
This module implements the published Confident Learning algorithm the
package is built on (Northcutt, Jiang, Chuang — JAIR 2021) directly as
DataFrame operators, so it runs at any scale:

1. **self-confidence**: ``pred_probs[given_label]`` per row — cleanlab's
   default ``label_quality`` score (get_label_issues contract);
2. **per-class confident thresholds**: t_j = mean predicted probability
   of class j among rows GIVEN label j;
3. **confident joint**: each row is assigned to the class with the
   highest predicted probability among classes where prob ≥ t_j; counts
   over (given_label, assigned_label) estimate the noise matrix;
4. **label issues**: rows whose confident assignment differs from the
   given label (the off-diagonal mass), ranked worst-first by
   self-confidence — the same ordering ``label_issues()`` returns.

Input is long-form probabilities (id, class, prob) — the natural output
shape of any multi-class scorer — plus (id, given_label). Everything is
joins + aggregations: one shuffle for thresholds (tiny, broadcast back),
one for the confident argmax window, one for the joint counts. No
driver-side collect; the model that PRODUCES pred_probs is orthogonal
(MLlib, XGBoost, anything that writes a probability column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def class_thresholds(
    probs_long: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    class_col: str = "class",
    prob_col: str = "prob",
    label_col: str = "given_label",
) -> DataFrame:
    """t_j = E[prob_j | given_label = j] — per-class confident threshold
    (Confident Learning eq. 2). Output: (class, threshold). Tiny (one row
    per class): broadcast it into downstream joins."""
    return (
        probs_long.join(labels.select(id_col, label_col), id_col)
        .filter(F.col(class_col) == F.col(label_col))
        .groupBy(class_col)
        .agg(F.avg(prob_col).alias("threshold"))
    )


def label_quality_scores(
    probs_long: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    class_col: str = "class",
    prob_col: str = "prob",
    label_col: str = "given_label",
) -> DataFrame:
    """Per-row label-quality frame (the ``label_issues()`` surface):

    (id, given_label, self_confidence, predicted_label, is_label_issue)

    predicted_label = argmax_j {prob_j : prob_j ≥ t_j} (NULL when no
    class clears its threshold — the row is counted in no confident-joint
    cell, exactly cleanlab's treatment); is_label_issue = confidently
    assigned to a different class. Sort ascending by self_confidence for
    the reference's worst-first ordering; ties broken by id both here and
    in any oracle."""
    thr = class_thresholds(
        probs_long, labels, id_col, class_col, prob_col, label_col
    )
    confident = probs_long.join(F.broadcast(thr), class_col).filter(
        F.col(prob_col) >= F.col("threshold")
    )
    # argmax with deterministic (prob desc, class asc) tiebreak
    w = Window.partitionBy(id_col).orderBy(
        F.col(prob_col).desc(), F.col(class_col).asc()
    )
    assigned = (
        confident.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(F.col(id_col), F.col(class_col).alias("predicted_label"))
    )
    self_conf = (
        probs_long.join(labels.select(id_col, label_col), id_col)
        .filter(F.col(class_col) == F.col(label_col))
        .select(id_col, label_col, F.col(prob_col).alias("self_confidence"))
    )
    return (
        self_conf.join(assigned, id_col, "left")
        .withColumn(
            "is_label_issue",
            F.when(
                F.col("predicted_label").isNotNull()
                & (F.col("predicted_label") != F.col(label_col)),
                True,
            ).otherwise(False),
        )
    )


def confident_joint(
    probs_long: DataFrame,
    labels: DataFrame,
    id_col: str = "id",
    class_col: str = "class",
    prob_col: str = "prob",
    label_col: str = "given_label",
) -> DataFrame:
    """Confident-joint counts C[given][assigned] (Northcutt 2021 eq. 1):
    the unnormalized joint distribution of given vs true-estimated labels.
    Off-diagonal mass = estimated mislabeling. Output: (given_label,
    predicted_label, n)."""
    lq = label_quality_scores(
        probs_long, labels, id_col, class_col, prob_col, label_col
    )
    return (
        lq.filter(F.col("predicted_label").isNotNull())
        .groupBy(label_col, "predicted_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def noise_rate(
    probs_long: DataFrame,
    labels: DataFrame,
    **kw,
) -> DataFrame:
    """Dataset-level noise estimate (noise_model.py surface): off-diagonal
    fraction of the confident joint. One row: (n_confident, n_issues,
    noise_rate)."""
    cj = confident_joint(probs_long, labels, **kw)
    label_col = kw.get("label_col", "given_label")
    return cj.agg(
        F.sum("n").alias("n_confident"),
        F.sum(
            F.when(F.col(label_col) != F.col("predicted_label"), F.col("n")).otherwise(
                F.lit(0)
            )
        ).alias("n_issues"),
        F.round(
            F.sum(
                F.when(
                    F.col(label_col) != F.col("predicted_label"), F.col("n")
                ).otherwise(F.lit(0))
            )
            / F.sum("n"),
            6,
        ).alias("noise_rate"),
    )
