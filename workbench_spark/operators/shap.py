"""Distributed TreeSHAP for MLlib tree ensembles.

The reference ships SHAP two ways: values computed at training time and
retrieved from S3 artifacts (utils/shap_utils.py:23-125) and a direct
TreeExplainer pass over prediction results (utils/shapley_values.py:22-102,
via the `shap` package). Neither the shap package nor its xgboost models
exist here, so this module implements the underlying published algorithm —
path-dependent TreeSHAP (Lundberg, Erion & Lee, "From local explanations
to global understanding with explainable AI for trees", Nature MI 2020;
Algorithm 2) — directly on the JVM tree structures of fitted MLlib
GBT/RandomForest models:

- the fitted ensemble is walked ONCE on the driver through py4j
  (feature index, threshold, children, per-node training cover from
  ``impurityStats().count()``, node mean) into plain Python tuples;
- the extracted forest rides the closure into an Arrow-batched pandas
  UDF, so scoring is embarrassingly parallel over rows — no shuffle, no
  driver round-trips, cluster-size scalable exactly like inference;
- per row and tree, the EXTEND/UNWIND recursion attributes
  f(x) − E[f] exactly across features (the additivity identity
  Σ φ_i = f(x) − E[f] holds to float precision and is asserted in
  tests, alongside a brute-force Shapley cross-check on a small tree).

Path-dependent semantics: conditional expectations follow the tree's own
training cover proportions (the classic TreeExplainer default,
feature_perturbation="tree_path_dependent"). Continuous splits only —
MLlib categorical splits raise NotImplementedError loudly rather than
mis-attributing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# ------------------------------------------------------------ extraction

#: leaf: ("L", value); internal: ("I", feature, threshold, left, right,
#: cover_left, cover_right) — covers are the TRAINING row counts of each
#: child, the weights path-dependent TreeSHAP splits expectations by.
TreeNode = tuple


def _walk(java_node) -> TreeNode:
    cls = java_node.getClass().getSimpleName()
    if "Leaf" in cls:
        return ("L", float(java_node.prediction()))
    split = java_node.split()
    scls = split.getClass().getSimpleName()
    if "Continuous" not in scls:
        raise NotImplementedError(
            f"categorical split ({scls}) — TreeSHAP here supports continuous "
            "splits; one-hot categorical features upstream (F7) instead"
        )
    left, right = java_node.leftChild(), java_node.rightChild()
    return (
        "I",
        int(split.featureIndex()),
        float(split.threshold()),
        _walk(left),
        _walk(right),
        float(left.impurityStats().count()),
        float(right.impurityStats().count()),
    )


def extract_ensemble(model) -> tuple[list[tuple[float, TreeNode]], float]:
    """(weighted trees, expected_value) from a fitted GBTRegressionModel /
    RandomForestRegressionModel (or their pipeline stages).

    GBT predicts Σ w_m·t_m(x); RF regression averages trees (MLlib stores
    unit weights, so the 1/M lands in the per-tree weight here). The
    expected value is the cover-weighted leaf mean, which for MLlib's
    variance-impurity trees equals the root node's stored mean.

    GBTClassificationModel works identically with attribution on the
    MARGIN scale: Σφ + E = F(x) = rawPrediction[1] (probability =
    sigmoid(2·F), so margin attributions order log-odds contributions —
    the same scale shap's TreeExplainer uses for binary GBMs).
    RandomForestClassifier predicts by class-distribution vote, not an
    additive margin, and raises."""
    name = type(model).__name__
    trees = model.trees
    if "GBT" in name:
        weights = list(model.treeWeights)
    elif "RandomForestRegress" in name:
        weights = [1.0 / len(trees)] * len(trees)
    elif "RandomForestClassif" in name:
        raise NotImplementedError(
            "RandomForestClassifier votes over class distributions — no "
            "additive margin to attribute; use GBTClassifier for SHAP"
        )
    else:
        raise NotImplementedError(f"not a tree ensemble: {name}")
    out = []
    base = 0.0
    for w, t in zip(weights, trees):
        root = t._call_java("rootNode")
        out.append((float(w), _walk(root)))
        base += float(w) * float(root.prediction())
    return out, base


# ------------------------------------------------------------ TreeSHAP

def _tree_shap(tree: TreeNode, x, phi: dict[int, float], scale: float) -> None:
    """Path-dependent TreeSHAP (Lundberg 2020, Alg. 2) for one tree.
    The path is a list of [feature, zero_fraction, one_fraction, pweight]."""

    def extend(path, pz, po, pi):
        # deep-copy rows: hot and cold child recursions each extend the
        # SAME parent path; shared row objects would let the first child
        # corrupt the second's weights
        path = [row[:] for row in path] + [[pi, pz, po, 0.0]]
        ln = len(path) - 1
        path[ln][3] = 1.0 if ln == 0 else 0.0
        for i in range(ln - 1, -1, -1):
            path[i + 1][3] += po * path[i][3] * (i + 1) / (ln + 1)
            path[i][3] = pz * path[i][3] * (ln - i) / (ln + 1)
        return path

    def unwind(path, i):
        ln = len(path) - 1
        path = [row[:] for row in path]
        po, pz = path[i][2], path[i][1]
        n = path[ln][3]
        for j in range(ln - 1, -1, -1):
            if po != 0:
                t = path[j][3]
                path[j][3] = n * (ln + 1) / ((j + 1) * po)
                n = t - path[j][3] * pz * (ln - j) / (ln + 1)
            else:
                path[j][3] = path[j][3] * (ln + 1) / (pz * (ln - j))
        for j in range(i, ln):
            path[j][0], path[j][1], path[j][2] = (
                path[j + 1][0], path[j + 1][1], path[j + 1][2],
            )
        return path[:-1]

    def unwound_sum(path, i):
        ln = len(path) - 1
        po, pz = path[i][2], path[i][1]
        total = 0.0
        n = path[ln][3]
        for j in range(ln - 1, -1, -1):
            if po != 0:
                t = n * (ln + 1) / ((j + 1) * po)
                total += t
                n = path[j][3] - t * pz * (ln - j) / (ln + 1)
            else:
                total += path[j][3] * (ln + 1) / (pz * (ln - j))
        return total

    def recurse(node, path, pz, po, pi):
        path = extend(path, pz, po, pi)
        if node[0] == "L":
            v = node[1]
            for i in range(1, len(path)):
                w = unwound_sum(path, i)
                phi[path[i][0]] = phi.get(path[i][0], 0.0) + scale * w * (
                    path[i][2] - path[i][1]
                ) * v
            return
        _, feat, thresh, left, right, cov_l, cov_r = node
        cov = cov_l + cov_r
        hot, cold, cov_hot, cov_cold = (
            (left, right, cov_l, cov_r)
            if x[feat] <= thresh
            else (right, left, cov_r, cov_l)
        )
        iz = io = 1.0
        k = next(
            (i for i in range(1, len(path)) if path[i][0] == feat), None
        )
        if k is not None:
            iz, io = path[k][1], path[k][2]
            path = unwind(path, k)
        recurse(hot, path, iz * cov_hot / cov, io, feat)
        recurse(cold, path, iz * cov_cold / cov, 0.0, feat)

    recurse(tree, [], 1.0, 1.0, -1)


def shap_values_rows(
    forest: list[tuple[float, TreeNode]], rows, n_features: int
):
    """Per-row SHAP vectors for an extracted forest (plain Python — the
    worker-side kernel of the Spark stage, also used directly in tests)."""
    out = []
    for x in rows:
        phi: dict[int, float] = {}
        for w, tree in forest:
            _tree_shap(tree, x, phi, w)
        out.append([phi.get(i, 0.0) for i in range(n_features)])
    return out


# ------------------------------------------------------------ Spark stage

def shap_values(
    model,
    df: DataFrame,
    feature_cols: list[str],
    prefix: str = "shap_",
) -> DataFrame:
    """Add per-feature SHAP columns (``shap_<feature>``) + ``shap_base``
    (the ensemble expected value) to ``df``. The forest is extracted once
    driver-side and rides the UDF closure (a few KB); each partition
    scores independently — the same scale shape as model inference."""
    forest, base = extract_ensemble(model)
    fields = ", ".join(f"`{prefix}{c}` double" for c in feature_cols)
    n = len(feature_cols)

    @pandas_udf(fields)
    def compute(*cols: pd.Series) -> pd.DataFrame:
        rows = list(zip(*[c.astype(float).tolist() for c in cols]))
        vals = shap_values_rows(forest, rows, n)
        return pd.DataFrame(vals, columns=[f"{prefix}{c}" for c in feature_cols])

    out = df.withColumn("__shap", compute(*[F.col(c) for c in feature_cols]))
    return out.select("*", "__shap.*").drop("__shap").withColumn(
        "shap_base", F.lit(base)
    )


def shap_importance(
    shap_df: DataFrame, feature_cols: list[str], prefix: str = "shap_"
) -> DataFrame:
    """Global importance = mean |SHAP| per feature, descending — the
    ranking shap_utils.get_shap_importance returns from the S3 artifact.
    One aggregation over the scored frame."""
    aggs = [
        F.avg(F.abs(F.col(f"{prefix}{c}"))).alias(c) for c in feature_cols
    ]
    row = shap_df.agg(*aggs).collect()[0]
    pairs = sorted(
        ((c, float(row[c])) for c in feature_cols), key=lambda t: -t[1]
    )
    spark = shap_df.sparkSession
    return spark.createDataFrame(pairs, "feature string, importance double")


# ------------------------------------------------------------ linear SHAP

def linear_shap_values(
    model,
    df: DataFrame,
    feature_cols: list[str],
    prefix: str = "shap_",
) -> DataFrame:
    """Exact Shapley attribution for linear models under feature
    independence: φ_i = w_i·(x_i − E[x_i]) with base = f(E[x]) — the
    closed form shap's LinearExplainer computes (Štrumbelj & Kononenko
    2014 reduce to this for linear f). E[x] is estimated on ``df``
    itself (pass the training frame for training-distribution
    attributions). Pure JVM expressions: one tiny aggregate for the
    means (broadcast cross-join) + a projection — no Python at all,
    unlike the tree path which needs per-row recursion."""
    coefs = model.coefficients.toArray().tolist()
    intercept = float(model.intercept)
    if len(coefs) != len(feature_cols):
        raise ValueError("coefficient/feature arity mismatch")
    means = df.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"__mu_{c}") for c in feature_cols]
    )
    out = df.crossJoin(F.broadcast(means))
    base = F.lit(intercept)
    for c, w in zip(feature_cols, coefs):
        out = out.withColumn(
            f"{prefix}{c}",
            F.lit(w) * (F.col(c).cast("double") - F.col(f"__mu_{c}")),
        )
        base = base + F.lit(w) * F.col(f"__mu_{c}")
    return out.withColumn("shap_base", base).drop(
        *[f"__mu_{c}" for c in feature_cols]
    )
