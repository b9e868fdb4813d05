"""Target-landscape / multi-task operators (SURVEY §2.10 M2/M3/M5).

Reference citations:
- M2 TargetLandscape — algorithms/dataframe/target_landscape.py:27-378:
  coincident duplicates, activity cliffs, isolated points, target
  gradients over the KNN neighborhood.
- M3 MultiTaskAlignment — multi_task_alignment.py:31-443: cross-task
  correlation on shared compounds.
- M5 FeatureSpider/RowTagger/TargetGradients — storage/feature_spider.py,
  row_tagger.py, target_gradients.py: pair predicates (dist<ε ∧ |Δy|>δ)
  → row tags.

All built on the KNN join from operators/similarity.py — pairs come from
a top-k neighbor join (broadcast or LSH), never a raw cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _knn_with_target(
    df: DataFrame, feature_cols: list[str], id_col: str, target: str, k: int,
    knn_method: str = "exact",
) -> DataFrame:
    from workbench_spark.operators.similarity import euclidean_knn

    knn = euclidean_knn(df, feature_cols, id_col, k=k, method=knn_method)
    y = df.select(F.col(id_col), F.col(target).cast("double").alias("__y"))
    return (
        knn.join(y.withColumnRenamed(id_col, "id").withColumnRenamed("__y", "y_self"), "id")
        .join(
            y.withColumnRenamed(id_col, "neighbor_id").withColumnRenamed("__y", "y_neighbor"),
            "neighbor_id",
        )
    )


def activity_cliffs(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    target: str,
    k: int = 5,
    max_distance: float = 0.5,
    min_delta: float = 1.0,
    knn_method: str = "exact",
) -> DataFrame:
    """M2/M5 — pairs that are close in feature space but far in target
    (dist ≤ ε ∧ |Δy| ≥ δ): the cliff predicate over the KNN join
    (target_landscape.py activity-cliff path, feature_spider.py:11-243).
    Output: (id, neighbor_id, distance, y_self, y_neighbor, delta)."""
    pairs = _knn_with_target(df, feature_cols, id_col, target, k, knn_method)
    return (
        pairs.withColumn("delta", F.abs(F.col("y_self") - F.col("y_neighbor")))
        .filter((F.col("distance") <= max_distance) & (F.col("delta") >= min_delta))
        .select("id", "neighbor_id", "distance", "y_self", "y_neighbor", "delta")
    )


def coincident_duplicates(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    target: str,
    k: int = 5,
    eps: float = 1e-9,
    knn_method: str = "exact",
) -> DataFrame:
    """M2 — coincident points: identical features (dist ≈ 0), any target
    (duplicate measurements; conflicting if targets differ)."""
    pairs = _knn_with_target(df, feature_cols, id_col, target, k, knn_method)
    return pairs.filter(F.col("distance") <= eps).select(
        "id", "neighbor_id", "y_self", "y_neighbor",
        F.abs(F.col("y_self") - F.col("y_neighbor")).alias("target_gap"),
    )


def isolated_points(
    df: DataFrame, feature_cols: list[str], id_col: str, min_distance: float, k: int = 1,
    knn_method: str = "exact",
) -> DataFrame:
    """M2 — rows whose nearest neighbor is farther than min_distance."""
    from workbench_spark.operators.similarity import euclidean_knn

    nn = euclidean_knn(df, feature_cols, id_col, k=k, method=knn_method)
    nearest = nn.groupBy("id").agg(F.min("distance").alias("nn_distance"))
    return nearest.filter(F.col("nn_distance") > min_distance)


def target_gradients(
    df: DataFrame, feature_cols: list[str], id_col: str, target: str, k: int = 5,
    knn_method: str = "exact",
) -> DataFrame:
    """M5 TargetGradients — per-row max |Δy|/distance over the KNN
    neighborhood (storage/target_gradients.py:12-120)."""
    pairs = _knn_with_target(df, feature_cols, id_col, target, k, knn_method)
    grad = F.abs(F.col("y_self") - F.col("y_neighbor")) / F.greatest(
        F.col("distance"), F.lit(1e-12)
    )
    return pairs.groupBy("id").agg(
        F.max(grad).alias("max_gradient"), F.avg(grad).alias("mean_gradient")
    )


def row_tags(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    target: str,
    k: int = 5,
    coincident_eps: float = 1e-9,
    cliff_distance: float = 0.5,
    cliff_delta: float = 1.0,
) -> DataFrame:
    """M5 RowTagger — tag each row 'coincident' / 'activity_cliff'
    (row_tagger.py:10-120) from one shared KNN join."""
    pairs = _knn_with_target(df, feature_cols, id_col, target, k)
    flags = pairs.groupBy("id").agg(
        F.max((F.col("distance") <= coincident_eps).cast("int")).alias("__co"),
        F.max(
            (
                (F.col("distance") <= cliff_distance)
                & (F.abs(F.col("y_self") - F.col("y_neighbor")) >= cliff_delta)
            ).cast("int")
        ).alias("__cl"),
    )
    tags = F.array_compact(
        F.array(
            F.when(F.col("__co") == 1, F.lit("coincident")),
            F.when(F.col("__cl") == 1, F.lit("activity_cliff")),
        )
    )
    return flags.select(F.col("id").alias(id_col), tags.alias("row_tags"))


def multi_task_alignment(
    task_frames: dict[str, DataFrame], id_col: str, target: str
) -> DataFrame:
    """M3 — pairwise cross-task correlation on shared ids
    (multi_task_alignment.py:31-443): inner-join each task pair on id,
    Pearson corr of targets + shared-support count.
    Output: (task_a, task_b, correlation, shared_rows)."""
    names = sorted(task_frames)
    rows = []
    spark = next(iter(task_frames.values())).sparkSession
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            ja = task_frames[a].select(
                F.col(id_col), F.col(target).cast("double").alias("__ya")
            )
            jb = task_frames[b].select(
                F.col(id_col), F.col(target).cast("double").alias("__yb")
            )
            stat = (
                ja.join(jb, id_col, "inner")
                .agg(
                    F.corr("__ya", "__yb").alias("correlation"),
                    F.count(F.lit(1)).alias("shared_rows"),
                )
                .first()
            )
            rows.append((a, b, stat["correlation"], stat["shared_rows"]))
    return spark.createDataFrame(
        rows, "task_a string, task_b string, correlation double, shared_rows bigint"
    )
