"""Adversarial round 2 — numeric edge inputs (r11 VERDICT #6). The r11
sweep fuzzed TEXT inputs (and caught a packing crash); this module drives
the NUMERIC tier through its edges: NaN / Inf / zero-norm embeddings
through the similarity stack, zero-variance columns through drift / UQ /
correlations, and single-row / single-group frames through the window
operators.

Contract pinned here: every production operator COMPLETES on these inputs
(no exception, no empty-by-accident output) and degenerate statistics
surface as NULL / well-defined fallbacks rather than poisoning healthy
rows. Exact-mode (`exact=True`) operators are out of scope by contract —
their quantizers document that callers own the dropna (NaN quantizes to
NULL and assignment would propagate it)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("test-numeric-edges")


def _vec(seed: int, d: int = 8) -> list[float]:
    # deterministic pseudo-gaussianish components, no RNG state
    return [math.sin(seed * 37.0 + i * 2.1) for i in range(d)]


@pytest.fixture(scope="module")
def poisoned_embeddings(spark):
    """20 healthy vectors + a zero vector + a NaN vector + an Inf vector."""
    rows = [(i, _vec(i)) for i in range(20)]
    rows.append((100, [0.0] * 8))
    rows.append((101, [float("nan")] + _vec(101)[1:]))
    rows.append((102, [float("inf")] + _vec(102)[1:]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


# ---------------------------------------------------------------- similarity


def test_cosine_knn_survives_poisoned_vectors(poisoned_embeddings):
    from workbench_spark.operators.similarity import cosine_knn

    out = cosine_knn(poisoned_embeddings, k=3).collect()
    assert out  # completes, non-empty
    # healthy-query neighbors among healthy ids carry finite sims
    healthy = [
        r
        for r in out
        if r["id"] < 20 and r["neighbor_id"] < 20 and r["cosine_sim"] is not None
    ]
    assert healthy and all(math.isfinite(r["cosine_sim"]) for r in healthy)


def test_lsh_knn_survives_zero_vector(poisoned_embeddings):
    from workbench_spark.operators.similarity import lsh_cosine_knn

    clean_plus_zero = poisoned_embeddings.filter(F.col("vec_id") <= 100)
    out = lsh_cosine_knn(clean_plus_zero, k=1, n_planes=4, n_tables=2, dim=8)
    assert out.count() >= 1  # completes; zero vector can't crash the bucketer


def test_embedding_space_audit_survives_poison(poisoned_embeddings):
    from workbench_spark.operators.similarity import embedding_space_audit

    row = embedding_space_audit(poisoned_embeddings).first()
    assert row["n_vecs"] == 23 and row["dim"] == 8
    # NaN/Inf rows quantize to NULL and drop out of the folds instead of
    # poisoning them: the reported stats stay finite
    assert math.isfinite(row["mean_norm"]) and math.isfinite(row["anisotropy"])


def test_embedding_signatures_survive_zero_vector(poisoned_embeddings):
    from workbench_spark.operators.dedup import embedding_signatures

    clean_plus_zero = poisoned_embeddings.filter(F.col("vec_id") <= 100)
    sigs = embedding_signatures(clean_plus_zero, "vec_id", "embedding", n_planes=6)
    # one row per (vector, table): every vector signed in every table,
    # zero vector included (its dot folds are 0.0 → deterministic all-'1')
    assert sigs.count() == 21 * 4
    assert sigs.select("id").distinct().count() == 21


def test_semdedup_mllib_survives_zero_vector(spark):
    from workbench_spark.operators.dedup import semdedup

    rows = [(i, _vec(i)) for i in range(12)] + [(100, [0.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = semdedup(df, "vec_id", "embedding", n_clusters=3, eps=0.1).collect()
    assert len(out) == 13  # every row verdicted exactly once
    assert {r["id"] for r in out} == {*range(12), 100}


# ---------------------------------------------------------------- drift


def test_psi_zero_width_range_and_identical_frames(spark):
    from workbench_spark.operators.drift import js_divergence, ks_statistic, psi

    const = spark.createDataFrame([(5.0,)] * 50, "v double")
    # lo == hi (zero-variance caller): all mass clamps into one bucket,
    # identical frames → zero drift, no division blow-up
    assert psi(const, const, "v", 5.0, 5.0).first()["psi"] == 0.0
    assert ks_statistic(const, const, "v").first()["ks"] == 0.0
    assert js_divergence(const, const, "v", 5.0, 5.0).first()["js_divergence"] == 0.0


def test_psi_with_inf_values(spark):
    from workbench_spark.operators.drift import psi

    ref = spark.createDataFrame([(float(i),) for i in range(20)], "v double")
    cur = spark.createDataFrame(
        [(float(i),) for i in range(20)] + [(float("inf"),), (float("-inf"),)],
        "v double",
    )
    got = psi(ref, cur, "v", 0.0, 19.0, bins=5).first()["psi"]
    assert got is not None and math.isfinite(got)  # Infs clamp into edge buckets


def test_detect_drift_zero_range_column(spark):
    from workbench_spark.operators.drift import detect_drift

    ref = spark.createDataFrame([(i, 5.0) for i in range(10)], "id int, v double")
    cur = spark.createDataFrame(
        [(i, 5.0) for i in range(9)] + [(9, 7.0)], "id int, v double"
    )
    # range = 0: ANY change exceeds rel_tol * 0 — flagged, not crashed
    out = detect_drift(ref, cur, "id", ["v"]).collect()
    assert [r["id"] for r in out] == [9]


# ---------------------------------------------------------------- eda


def test_correlations_zero_variance_column(spark):
    from workbench_spark.operators.eda import correlations

    df = spark.createDataFrame(
        [(float(i), 5.0) for i in range(10)], "a double, b double"
    )
    out = correlations(df).collect()
    assert len(out) == 2  # both orientations emitted
    assert all(r["correlation"] is None or math.isnan(r["correlation"]) for r in out)


def test_descriptive_stats_single_row_and_constant(spark):
    from workbench_spark.operators.eda import descriptive_stats

    one = spark.createDataFrame([(3.0,)], "a double")
    row = descriptive_stats(one).first()
    assert row["min"] == row["max"] == row["mean"] == 3.0
    assert row["stddev"] is None or math.isnan(row["stddev"])

    const = spark.createDataFrame([(3.0,)] * 20, "a double")
    row = descriptive_stats(const).first()
    assert row["stddev"] == 0.0 and row["q1"] == row["q3"] == 3.0


def test_outliers_zero_iqr(spark):
    from workbench_spark.operators.eda import outliers

    const = spark.createDataFrame([(5.0,)] * 30, "a double")
    assert outliers(const).count() == 0  # no crash, nothing flagged


# ---------------------------------------------------------------- windows / UQ


def test_sessionize_single_event_user(spark):
    import datetime as dt

    from workbench_spark.operators.windows import sessionize

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [("u1", t0), ("u2", t0), ("u2", t0 + dt.timedelta(hours=2))],
        "user string, ts timestamp",
    )
    out = sessionize(df, "user", "ts").collect()
    assert len(out) == 3
    by_user = {}
    for r in out:
        by_user.setdefault(r["user"], set()).add(r["session_id"])
    assert len(by_user["u1"]) == 1 and len(by_user["u2"]) == 2


def test_spearman_single_row(spark):
    from workbench_spark.operators.metrics import spearman_approx

    one = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    row = spearman_approx(one, "a", "b").first()
    # rank variance is zero: correlation undefined → NULL/NaN, not a crash
    v = row[0]
    assert v is None or math.isnan(v)


def test_geometric_mean_nonpositive_inputs(spark):
    """geometric_mean documents 'positive inputs only'; pin what actually
    happens outside the contract under ANSI-off: ln(0)/ln(negative) are
    NULL, avg skips NULLs, so non-positive values silently drop out of
    the fold rather than poisoning it (exp(avg) over the positive
    subset) — and an all-non-positive group yields NULL, not a crash."""
    from workbench_spark.functions.scalar import geometric_mean

    df = spark.createDataFrame(
        [("a", 2.0), ("a", 8.0), ("a", 0.0), ("a", -1.0), ("b", -3.0)],
        "g string, v double",
    )
    rows = {r["g"]: r["gm"] for r in
            df.groupBy("g").agg(geometric_mean(F.col("v")).alias("gm")).collect()}
    assert abs(rows["a"] - 4.0) < 1e-9  # positive subset only
    assert rows["b"] is None


def test_uq_from_neighbors_zero_variance_prediction(spark):
    from workbench_spark.operators.ml_analysis import uq_from_neighbors

    rows = [(i, 7.0, float(i), float(i % 3)) for i in range(12)]
    df = spark.createDataFrame(rows, "id int, pred double, f1 double, f2 double")
    out = uq_from_neighbors(df, "id", "pred", ["f1", "f2"], k=3).collect()
    assert len(out) == 12
    # constant prediction → sigma 0 everywhere → degenerate-but-valid bounds
    assert all(r["uq_sigma"] == 0.0 for r in out)
    assert all(r["lower_bound"] == 7.0 == r["upper_bound"] for r in out)


def test_uq_from_neighbors_zero_variance_features(spark):
    from workbench_spark.operators.ml_analysis import uq_from_neighbors

    rows = [(i, float(i), 5.0, 5.0) for i in range(10)]
    df = spark.createDataFrame(rows, "id int, pred double, f1 double, f2 double")
    out = uq_from_neighbors(df, "id", "pred", ["f1", "f2"], k=3).collect()
    assert len(out) == 10  # degenerate feature space: completes, no NaN bounds
    assert all(
        r["lower_bound"] is None or math.isfinite(r["lower_bound"]) for r in out
    )
