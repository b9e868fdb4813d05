"""ML-analysis operators built on aggregation/KNN (SURVEY §2.4 A11,
§2.9 C7, §2.10 M1/M2/M6/M7).

Reference citations:
- A11 smart_aggregator — algorithms/dataframe/smart_aggregator.py:13-94
  (MiniBatchKMeans row reduction + outlier isolation)
- C7 2D projection — algorithms/dataframe/projection_2d.py:17-135 (PCA
  native; UMAP/TSNE driver-side on samples in the reference)
- M1 residual features — algorithms/dataframe/residual_features.py:38-212
- M6 proximity graph — algorithms/graph/light/proximity_graph.py:23-120
- M7 group aggregate — algorithms/dataframe/storage/aggregation.py:10-50
- A22 Laplacian smoothness — laplacian_smoothness.py:14-60

Scale: KMeans/PCA are MLlib distributed implementations; the KNN joins
come from operators/similarity.py (broadcast or LSH — never a raw cross
product at scale).
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import PCA, StandardScaler, VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _assemble(df: DataFrame, feature_cols: list[str], scale: bool = True):
    va = VectorAssembler(inputCols=feature_cols, outputCol="__vec", handleInvalid="skip")
    out = va.transform(df)
    if scale:
        scaler = StandardScaler(
            inputCol="__vec", outputCol="__scaled", withMean=True, withStd=True
        ).fit(out)
        out = scaler.transform(out).drop("__vec").withColumnRenamed("__scaled", "__vec")
    return out


def smart_aggregator(
    df: DataFrame,
    feature_cols: list[str],
    target_rows: int = 50_000,
    agg: str = "mean",
    seed: int = 42,
    exact: bool = False,
    iters: int = 3,
) -> DataFrame:
    """A11 — reduce N rows to ~target_rows by KMeans clustering then
    per-cluster aggregation (smart_aggregator.py:13-94): numeric cols
    averaged (or first), plus aggregation_count. MLlib KMeans is the
    distributed replacement for MiniBatchKMeans.

    k is capped for tractability: MLlib KMeans cost is O(N·k·d); the
    reference's k=target_rows works for its 100k→50k single-node case but
    not at cluster scale — there, pre-reduce with a coarse hash/grid pass
    or hierarchical KMeans.

    ``exact=True`` (r12) swaps in the fixed-point integer Lloyd twin
    (operators/kmeans_exact.py): assignments and per-cluster means become
    bit-identical across engines and partitionings — the oracle-grade
    mode. Exact-mode output: per-cluster micro-quantized means of the
    feature columns (error < 1e-6 vs the float mean), a ``cluster`` id,
    and ``aggregation_count``; non-feature columns are not carried (their
    F.first() is nondeterministic by definition). Default stays MLlib.
    """
    n = df.count()
    if n <= target_rows and not exact:
        # exact mode NEVER takes this raw-rows shortcut: its oracle twin
        # (a11's generated SQL) clusters unconditionally, and both sides
        # shrink k to the distinct-vector count via the same LIMIT k, so
        # running Lloyd on a small N stays bit-identical (r12 ADVICE).
        return df.withColumn("aggregation_count", F.lit(1))
    k = min(target_rows, 4096)
    if exact:
        from workbench_spark.operators.kmeans_exact import (
            kmeans_fixed_point,
            quantize_scalar_cols,
        )

        z = quantize_scalar_cols(df.select(*feature_cols), feature_cols)
        assigned, _cents = kmeans_fixed_point(z, k=k, iters=iters)
        # integer micro-unit means: SUM(q) div n (truncating div matches
        # DuckDB's //), then one exact int→double division by 1e6
        return assigned.groupBy(F.col("__cell").alias("cluster")).agg(
            *[
                (F.expr(f"sum(__q_{i}) div count(1)").cast("double") / F.lit(1e6)).alias(c)
                for i, c in enumerate(feature_cols)
            ],
            F.count(F.lit(1)).alias("aggregation_count"),
        )
    assembled = _assemble(df, feature_cols)
    km = KMeans(k=k, seed=seed, featuresCol="__vec", predictionCol="__cluster").fit(assembled)
    clustered = km.transform(assembled).drop("__vec")
    agg_fn = F.avg if agg == "mean" else F.first
    other = [c for c in df.columns if c not in feature_cols]
    return clustered.groupBy("__cluster").agg(
        *[agg_fn(c).alias(c) for c in feature_cols],
        *[F.first(c).alias(c) for c in other],
        F.count(F.lit(1)).alias("aggregation_count"),
    ).drop("__cluster")


def projection_2d(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    method: str = "pca",
    seed: int = 42,
    sample_cap: int = 2000,
    perplexity: float = 30.0,
    exact: bool = False,
) -> DataFrame:
    """C7 — 2D projection for plots (projection_2d.py:17-135,
    projections.py:18-219).

    - ``pca``: MLlib PCA — distributed, exact, any scale (the default).
    - ``tsne``: the reference's own design is driver-side on a pandas
      pull (its plots project a sample); here: deterministic sample of
      ``sample_cap`` rows (lowest ids), pure-numpy exact t-SNE
      (operators/tsne.py — no sklearn in this container), output covers
      the sampled rows only. O(sample_cap²) — the cap is the contract.
    - ``umap``: refused — umap-learn is unavailable and the algorithm
      (fuzzy simplicial sets + SGD) is out of reimplementation scope;
      tsne is the supported sampled parity path.

    ``exact=True`` with method='pca' (r12) swaps in the fixed-point
    integer power-iteration PCA (operators/pca_exact.py): sign-canonical,
    engine-portable x/y — the oracle-grade mode. MLlib PCA stays the
    production default.
    """
    if exact and method == "pca":
        from workbench_spark.operators.pca_exact import pca_fixed_point_project

        return pca_fixed_point_project(df, feature_cols, id_col)
    if method == "umap":
        raise NotImplementedError(
            "umap requires umap-learn (not installed); use method='tsne' "
            "(sampled, driver-side — the reference's own execution shape) "
            "or the distributed 'pca'"
        )
    if method == "tsne":
        from workbench_spark.operators.tsne import tsne_embed

        sample = (
            df.select(id_col, *feature_cols)
            .dropna()
            .orderBy(F.col(id_col).asc())
            .limit(sample_cap)
            .toPandas()
        )
        Y = tsne_embed(
            sample[feature_cols].to_numpy(dtype=float),
            perplexity=perplexity,
            seed=seed,
        )
        sample = sample[[id_col]].copy()
        sample["x"] = Y[:, 0]
        sample["y"] = Y[:, 1]
        return df.sparkSession.createDataFrame(sample)
    if method != "pca":
        raise NotImplementedError(f"unknown projection method {method!r}")
    from pyspark.ml.functions import vector_to_array

    assembled = _assemble(df, feature_cols)
    pca = PCA(k=2, inputCol="__vec", outputCol="__proj").fit(assembled)
    out = pca.transform(assembled).withColumn("__arr", vector_to_array("__proj"))
    return out.select(
        id_col,
        F.element_at("__arr", 1).alias("x"),
        F.element_at("__arr", 2).alias("y"),
    )


def proximity_graph(
    df: DataFrame,
    feature_cols: list[str],
    id_col: str,
    k: int = 5,
    min_weight: float = 0.0,
    knn_method: str = "exact",
) -> DataFrame:
    """M6 — KNN edge list (proximity_graph.py:23-70): edges (src, dst,
    weight) with weight = 1/(1+distance), thresholded.
    knn_method='bucketed' swaps in the BRP-LSH equi-join path at scale."""
    from workbench_spark.operators.similarity import euclidean_knn

    knn = euclidean_knn(df, feature_cols, id_col, k=k, method=knn_method)
    edges = knn.select(
        F.col("id").alias("src"),
        F.col("neighbor_id").alias("dst"),
        (1.0 / (1.0 + F.col("distance"))).alias("weight"),
    )
    return edges.filter(F.col("weight") >= min_weight)


def laplacian_smoothness(
    edges: DataFrame, values: DataFrame, id_col: str, value_col: str
) -> DataFrame:
    """A22 — per-node Σ_j w_ij (y_i − y_j)² over a proximity graph +
    global xᵀLx/Σw (laplacian_smoothness.py:14-60). Two broadcast-able
    joins of the edge list against the node-value table."""
    vi = values.select(F.col(id_col).alias("src"), F.col(value_col).alias("__yi"))
    vj = values.select(F.col(id_col).alias("dst"), F.col(value_col).alias("__yj"))
    scored = (
        edges.join(vi, "src")
        .join(vj, "dst")
        .withColumn("__term", F.col("weight") * F.pow(F.col("__yi") - F.col("__yj"), 2))
    )
    return scored.groupBy(F.col("src").alias(id_col)).agg(
        F.sum("__term").alias("smoothness"),
        F.sum("weight").alias("total_weight"),
    )


def residual_features(
    preds: DataFrame,
    id_col: str,
    target: str,
    prediction: str,
    feature_cols: list[str],
    k: int = 5,
    knn_method: str = "exact",
) -> DataFrame:
    """M1 — neighbor-aggregated residual stats per row
    (residual_features.py:38-212): join each row's KNN neighborhood,
    aggregate |residual| of neighbors (mean/max), plus own residual.
    knn_method='bucketed' swaps in the BRP-LSH equi-join path at scale."""
    from workbench_spark.operators.similarity import euclidean_knn

    with_resid = preds.withColumn("__resid", F.col(target) - F.col(prediction))
    knn = euclidean_knn(with_resid, feature_cols, id_col, k=k, method=knn_method)
    neighbor_resid = knn.join(
        with_resid.select(F.col(id_col).alias("neighbor_id"), F.col("__resid").alias("__nr")),
        "neighbor_id",
    )
    agg = neighbor_resid.groupBy("id").agg(
        F.avg(F.abs(F.col("__nr"))).alias("neighbor_mean_abs_residual"),
        F.max(F.abs(F.col("__nr"))).alias("neighbor_max_abs_residual"),
        F.stddev(F.col("__nr")).alias("neighbor_residual_stddev"),
    )
    return (
        with_resid.select(
            F.col(id_col), F.col("__resid").alias("residual")
        )
        .join(agg.withColumnRenamed("id", id_col), id_col, "left")
    )


def group_aggregate(
    df: DataFrame, group_col: str, feature_cols: list[str], exact: bool = False
) -> DataFrame:
    """M7 — mean features per group (aggregation.py:10-50).

    ``exact=True`` (oracle-grade, the library-stats convention): means
    from exact integer sums of micro-quantized values instead of float
    avg — partition-order-invariant and engine-replayable (float AVG low
    bits follow the shuffle layout; on grid-valued data the mean can sit
    exactly on a ROUND half-boundary, the r13 hostile-sweep flip class).
    Quantization error < 5e-7 per input. Default stays float avg."""
    if exact:
        qs = {
            c: F.floor(F.col(c).cast("double") * F.lit(1e6) + F.lit(0.5)).cast(
                "decimal(19,0)"
            )
            for c in feature_cols
        }
        return df.groupBy(group_col).agg(
            *[
                (
                    F.sum(qs[c]).cast("decimal(38,0)").cast("double")
                    / F.count(F.col(c))
                    / F.lit(1e6)
                ).alias(c)
                for c in feature_cols
            ],
            F.count(F.lit(1)).alias("n"),
        )
    return df.groupBy(group_col).agg(
        *[F.avg(c).alias(c) for c in feature_cols], F.count(F.lit(1)).alias("n")
    )


def uq_from_neighbors(
    preds: DataFrame,
    id_col: str,
    prediction: str,
    feature_cols: list[str],
    k: int = 5,
    z: float = 1.645,
    knn_method: str = "exact",
) -> DataFrame:
    """M4 — uncertainty quantification from neighbor spread
    (algorithms/dataframe/uq_model_v{0,1,2}.py, simplified v0 semantics):
    per-row sigma = stddev of the KNN neighborhood's predictions; interval
    = prediction ± z*sigma. Rows with degenerate neighborhoods fall back
    to the global prediction stddev.
    knn_method='bucketed' swaps in the BRP-LSH equi-join path at scale."""
    from workbench_spark.operators.similarity import euclidean_knn

    knn = euclidean_knn(preds, feature_cols, id_col, k=k, method=knn_method)
    neighbor_preds = knn.join(
        preds.select(
            F.col(id_col).alias("neighbor_id"), F.col(prediction).alias("__np")
        ),
        "neighbor_id",
    )
    spread = neighbor_preds.groupBy("id").agg(
        F.stddev("__np").alias("__sigma"), F.avg("__np").alias("neighbor_mean_pred")
    )
    global_sigma = preds.agg(F.stddev(prediction).alias("__gs"))
    return (
        preds.select(F.col(id_col), F.col(prediction))
        .join(spread.withColumnRenamed("id", id_col), id_col, "left")
        .crossJoin(F.broadcast(global_sigma))
        .select(
            id_col,
            prediction,
            F.coalesce(F.col("__sigma"), F.col("__gs")).alias("uq_sigma"),
            (F.col(prediction) - z * F.coalesce(F.col("__sigma"), F.col("__gs"))).alias("lower_bound"),
            (F.col(prediction) + z * F.coalesce(F.col("__sigma"), F.col("__gs"))).alias("upper_bound"),
            "neighbor_mean_pred",
        )
    )


def label_balance_audit(df, label_col: str):
    """Class-balance panel for a training view — the pre-train hygiene
    check (imbalance drives weightCol/resampling decisions): one row with
    (n_classes, n_rows, majority_frac, imbalance_ratio, entropy,
    normalized_entropy). Entropy is Σ -p ln p over observed classes,
    normalized by ln(n_classes) (1.0 = perfectly balanced); NULL labels
    count as a class of their own (they WILL reach the trainer).

    Determinism: per-class terms come from exact integer counts; the
    entropy sum is an integer-quantized commutative fold (nano units — a
    1e6-class vocabulary still sums exactly)."""
    from pyspark.sql import functions as F

    counts = df.groupBy(
        F.coalesce(F.col(label_col).cast("string"), F.lit("__null__")).alias("__l")
    ).agg(F.count(F.lit(1)).alias("c"))
    total = counts.agg(F.sum("c").alias("n")).first()["n"] or 0
    fr = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    p = F.col("c").cast("double") / F.lit(float(total))
    q9 = F.floor((-p * F.log(p)) * F.lit(1e9) + F.lit(0.5)).cast("long")
    agg = counts.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.max("c").alias("__maxc"),
        F.min("c").alias("__minc"),
        F.sum(q9).alias("__h9"),
    )
    ent = F.col("__h9").cast("double") / F.lit(1e9)
    return agg.select(
        "n_classes",
        F.lit(total).cast("long").alias("n_rows"),
        fr(F.col("__maxc").cast("double") / F.lit(float(total))).alias("majority_frac"),
        fr(F.col("__maxc").cast("double") / F.col("__minc")).alias("imbalance_ratio"),
        fr(ent).alias("entropy"),
        fr(
            F.when(F.col("n_classes") > 1, ent / F.log(F.col("n_classes").cast("double")))
            .otherwise(F.lit(0.0))
        ).alias("normalized_entropy"),
    )
