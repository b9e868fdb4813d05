"""SyntheticDataGenerator tests — behavioral parity with the reference
generator (reference utils/synthetic_data_generator.py:11-405) is
shape-level: same columns, same distributions, same correlation
structure, measured statistically rather than bit-compared (the
reference delegates to sklearn/numpy's global RNG, which a distributed
generator cannot and should not reproduce)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="session")
def gen(spark):
    from workbench_spark.api.synthetic import SyntheticDataGenerator

    return SyntheticDataGenerator(spark, seed=42)


def test_ml_data_regression_shape(gen):
    df = gen.ml_data(n_samples=500, n_features=4, target_type="regression")
    assert df.columns == [f"feature_{i}" for i in range(4)] + ["target"]
    assert df.count() == 500
    # informative features correlate with the target; noise features don't
    corrs = df.agg(
        *[F.corr(f"feature_{i}", "target").alias(f"c{i}") for i in range(4)]
    ).collect()[0]
    assert abs(corrs["c0"]) > 0.2 and abs(corrs["c1"]) > 0.2
    assert abs(corrs["c3"]) < 0.15  # last two features are noise


def test_ml_data_classification_balanced(gen):
    df = gen.ml_data(n_samples=600, n_features=4, target_type="classification")
    counts = {r["target"]: r["count"] for r in df.groupBy("target").count().collect()}
    assert set(counts) == {0, 1}
    # score threshold at 0 over a zero-mean score → roughly balanced
    assert 0.35 < counts[1] / 600 < 0.65


def test_ml_data_rejects_unknown_target(gen):
    with pytest.raises(ValueError):
        gen.ml_data(target_type="ordinal")


def test_confidence_data_shape(gen):
    df = gen.confidence_data(n_samples=400)
    assert df.columns == ["feature_1", "target"]
    # 7/8 dense + 1/8 sparse + 54 coincident-x probe rows
    assert df.count() == 400 + 54
    rng = df.agg(F.min("feature_1").alias("lo"), F.max("feature_1").alias("hi")).collect()[0]
    assert rng["lo"] == pytest.approx(-10.0)
    assert rng["hi"] == pytest.approx(10.0)
    # the sparse tail thins out: fewer points in [7.5, 10] than [5, 7.5]
    hi_half = df.filter("feature_1 >= 7.5 and feature_1 <= 10").count()
    lo_half = df.filter("feature_1 >= 5 and feature_1 < 7.5").count()
    assert hi_half < lo_half


def test_varying_noise_heteroscedastic(gen):
    df = gen.regression_with_varying_noise(n_samples=1000).withColumn(
        "resid", F.abs(F.col("target") - F.col("feature") - 1000.0)
    )
    assert df.count() == 1000
    # |noise| ≤ 10% of feature, and grows with it
    assert df.filter(F.col("resid") > 0.1 * F.col("feature") + 1e-6).count() == 0
    lo = df.filter("feature < 500").agg(F.avg("resid")).collect()[0][0]
    hi = df.filter("feature >= 500").agg(F.avg("resid")).collect()[0][0]
    assert hi > lo


def test_person_data_contract(gen):
    df = gen.person_data(rows=200).cache()
    assert df.columns == [
        "Id", "Name", "Height", "Weight", "Salary", "Age",
        "IQ_Score", "Food", "Likes_Dogs", "Date",
    ]
    assert df.count() == 200
    assert df.select("Id").distinct().count() == 200
    # reference correlation structure, loose statistical bands
    from workbench_spark.api.synthetic import SyntheticDataGenerator

    corr = SyntheticDataGenerator.pearson_correlation
    assert corr(df, "Height", "Weight") > 0.05
    assert corr(df, "Height", "Salary") > 0.1
    assert corr(df, "Salary", "Age") > 0.3
    assert corr(df, "Salary", "IQ_Score") < -0.4
    # ~10% Food nulls, values from the fixed menu
    nulls = df.filter("Food is null").count()
    assert 0.03 < nulls / 200 < 0.2
    foods = {r["Food"] for r in df.select("Food").distinct().collect()} - {None}
    assert foods <= {"pizza", "tacos", "steak", "sushi"}
    # salary outliers pushed into the 200-230k band
    assert df.filter("Salary > 200000").count() >= 4
    # dates span the year 2022
    yrs = df.select(F.year("Date").alias("y")).distinct().collect()
    assert {r["y"] for r in yrs} == {2022}
    df.unpersist()


def test_generator_deterministic(spark):
    from workbench_spark.api.synthetic import SyntheticDataGenerator

    a = SyntheticDataGenerator(spark, seed=7).ml_data(300, 4, "regression")
    b = SyntheticDataGenerator(spark, seed=7).ml_data(300, 4, "regression")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
