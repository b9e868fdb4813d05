"""TreeSHAP (operators/shap.py): brute-force Shapley cross-check on a
hand-built tree, exact additivity on fitted MLlib GBT/RF ensembles, and
the Spark stage + Model API surfaces."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from workbench_spark.operators.shap import (
    extract_ensemble,
    shap_importance,
    shap_values,
    shap_values_rows,
)

# hand tree: f0<=5 -> (f1<=3 -> 1.0 | 2.0, covers 10/30) | 5.0, covers 40/60
HAND_TREE = (
    "I", 0, 5.0,
    ("I", 1, 3.0, ("L", 1.0), ("L", 2.0), 10.0, 30.0),
    ("L", 5.0),
    40.0, 60.0,
)


def _exp_cond(tree, x, s):
    """Path-dependent conditional expectation: follow x for features in
    s, split by training cover otherwise — the semantics TreeSHAP
    attributes against."""
    if tree[0] == "L":
        return tree[1]
    _, f, th, left, right, cl, cr = tree
    if f in s:
        return _exp_cond(left if x[f] <= th else right, x, s)
    return (cl * _exp_cond(left, x, s) + cr * _exp_cond(right, x, s)) / (cl + cr)


def _brute_shapley(tree, x, n):
    phis = [0.0] * n
    for i in range(n):
        for k in range(n):
            for s in itertools.combinations([j for j in range(n) if j != i], k):
                w = (
                    math.factorial(len(s))
                    * math.factorial(n - len(s) - 1)
                    / math.factorial(n)
                )
                phis[i] += w * (
                    _exp_cond(tree, x, set(s) | {i}) - _exp_cond(tree, x, set(s))
                )
    return phis


def test_treeshap_equals_brute_force_shapley():
    forest = [(1.0, HAND_TREE)]
    for x in [(2.0, 2.0), (2.0, 4.0), (7.0, 1.0), (6.0, 3.0), (5.0, 3.0)]:
        brute = _brute_shapley(HAND_TREE, x, 2)
        fast = shap_values_rows(forest, [x], 2)[0]
        assert fast == pytest.approx(brute, abs=1e-12), x


def test_treeshap_efficiency_identity_hand_tree():
    base = _exp_cond(HAND_TREE, None, set())
    for x in [(2.0, 2.0), (7.0, 1.0)]:
        phi = shap_values_rows([(1.0, HAND_TREE)], [x], 2)[0]
        fx = _exp_cond(HAND_TREE, x, {0, 1})
        assert sum(phi) == pytest.approx(fx - base, abs=1e-12)


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="session")
def training_df(spark):
    df = spark.range(2000).select(
        (F.col("id") % 10).cast("double").alias("a"),
        (F.col("id") % 7).cast("double").alias("b"),
        (F.col("id") % 4).cast("double").alias("c"),
    )
    return df.withColumn(
        "label",
        2.0 * F.col("a") + F.col("b") * F.col("b") - 3.0 * F.col("c")
        + F.col("a") * F.col("c"),
    )


@pytest.mark.parametrize("algo", ["gbt", "rf"])
def test_additivity_on_fitted_ensembles(spark, training_df, algo):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor, RandomForestRegressor

    va = VectorAssembler(inputCols=["a", "b", "c"], outputCol="features")
    est = (
        GBTRegressor(maxIter=8, maxDepth=4, seed=7)
        if algo == "gbt"
        else RandomForestRegressor(numTrees=5, maxDepth=4, seed=2)
    )
    m = est.fit(va.transform(training_df))
    forest, base = extract_ensemble(m)
    rows = [(3.0, 2.0, 1.0), (9.0, 6.0, 3.0), (0.0, 0.0, 0.0), (5.0, 4.0, 2.0)]
    sdf = spark.createDataFrame(rows, "a double, b double, c double")
    preds = m.transform(va.transform(sdf)).select("prediction").collect()
    for phi, p in zip(shap_values_rows(forest, rows, 3), preds):
        assert sum(phi) + base == pytest.approx(p["prediction"], abs=1e-9)


def test_spark_stage_and_importance(spark, training_df):
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import GBTRegressor

    va = VectorAssembler(inputCols=["a", "b", "c"], outputCol="features")
    m = GBTRegressor(maxIter=8, maxDepth=4, seed=7).fit(va.transform(training_df))
    scored = shap_values(m, training_df.limit(300), ["a", "b", "c"])
    assert {"shap_a", "shap_b", "shap_c", "shap_base"} <= set(scored.columns)
    # distributed additivity: phi sum + base == prediction for every row
    preds = m.transform(va.transform(training_df.limit(300)))
    joined = scored.withColumn(
        "phi_sum",
        F.col("shap_a") + F.col("shap_b") + F.col("shap_c") + F.col("shap_base"),
    )
    pd_scored = joined.toPandas().sort_values(["a", "b", "c"])
    pd_preds = preds.select("a", "b", "c", "prediction").toPandas().sort_values(
        ["a", "b", "c"]
    )
    assert pd_scored["phi_sum"].to_numpy() == pytest.approx(
        pd_preds["prediction"].to_numpy(), abs=1e-9
    )
    # importance ranking matches label construction: b (squared) > a > c
    imp = {r["feature"]: r["importance"]
           for r in shap_importance(scored, ["a", "b", "c"]).collect()}
    assert imp["b"] > imp["a"] > imp["c"] > 0


def test_model_api_shap(spark, training_df, tmp_path):
    from workbench_spark.api.model import Model, shap_importance as mi, shap_values as mv

    m = Model.train(
        training_df, "shap_test_model", target="label",
        features=["a", "b", "c"], algo="gbt",
        hyperparams={"maxIter": 5, "maxDepth": 3, "seed": 11},
        spark=spark, warehouse=str(tmp_path),
    )
    scored = mv(m, training_df.limit(50))
    assert "shap_a" in scored.columns
    ranking = mi(m, training_df.limit(50))
    assert ranking[0][0] in {"a", "b"} and ranking[-1][1] >= 0


def test_gbt_classifier_margin_additivity(spark, training_df):
    """Binary GBT: Σφ + base equals the MARGIN (rawPrediction[1]) exactly;
    probability = sigmoid(2·margin)."""
    from pyspark.ml.classification import GBTClassifier, RandomForestClassifier
    from pyspark.ml.feature import VectorAssembler

    df = training_df.withColumn(
        "cls", (F.col("a") + F.col("b") > 8).cast("double")
    )
    va = VectorAssembler(inputCols=["a", "b", "c"], outputCol="features")
    m = GBTClassifier(maxIter=6, maxDepth=3, seed=5, labelCol="cls").fit(
        va.transform(df)
    )
    forest, base = extract_ensemble(m)
    rows = [(3.0, 2.0, 1.0), (9.0, 6.0, 0.0), (1.0, 1.0, 3.0)]
    sdf = spark.createDataFrame(rows, "a double, b double, c double")
    raw = m.transform(va.transform(sdf)).select("rawPrediction").collect()
    for phi, r in zip(shap_values_rows(forest, rows, 3), raw):
        assert sum(phi) + base == pytest.approx(r["rawPrediction"][1], abs=1e-9)
    # RF classifier has no additive margin: loud refusal, not mis-attribution
    rf = RandomForestClassifier(numTrees=3, maxDepth=3, seed=5, labelCol="cls").fit(
        va.transform(df)
    )
    with pytest.raises(NotImplementedError):
        extract_ensemble(rf)


def test_linear_shap_closed_form(spark, training_df):
    """Linear model: phi_i = w_i(x_i - mean); additivity equals the model
    prediction exactly, all JVM-side."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    from workbench_spark.operators.shap import linear_shap_values

    va = VectorAssembler(inputCols=["a", "b", "c"], outputCol="features")
    m = LinearRegression().fit(va.transform(training_df))
    scored = linear_shap_values(m, training_df.limit(200), ["a", "b", "c"])
    preds = m.transform(va.transform(training_df.limit(200))).select(
        "a", "b", "c", "prediction"
    )
    j = scored.join(preds, ["a", "b", "c"]).withColumn(
        "err",
        F.abs(
            F.col("shap_a") + F.col("shap_b") + F.col("shap_c")
            + F.col("shap_base") - F.col("prediction")
        ),
    )
    assert j.agg(F.max("err")).collect()[0][0] < 1e-9
