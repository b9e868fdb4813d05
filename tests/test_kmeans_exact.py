"""Unit tier for the fixed-point integer Lloyd / power-iteration PCA
twins (r12 VERDICT #3): the DuckDB-replay oracles certify cross-engine
equality at the registry level; this module certifies the algorithmic
contract — bit-level agreement with a pure-Python replay, invariance to
partitioning, and the documented edge behavior (fewer distinct vectors
than k, constant columns, empty-cluster carryover)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbench_spark.operators.kmeans_exact import (
    SCALE,
    kmeans_fixed_point,
    python_twin,
    quantize_array_col,
    quantize_scalar_cols,
)


@pytest.fixture(scope="module")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("test-kmeans-exact")


@pytest.fixture(scope="module")
def li(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        .select("l_quantity", "l_extendedprice", "l_discount")
        .limit(400)
    )


COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def test_spark_matches_python_twin(spark, li):
    z = quantize_scalar_cols(li, COLS)
    assigned, cents = kmeans_fixed_point(z, k=7, iters=3)
    rows = assigned.select("__zq", "__cell").collect()
    zrows = [list(r["__zq"]) for r in rows]
    assert [r["__cell"] for r in rows] == python_twin(zrows, k=7, iters=3)
    assert len(cents) == 7 and all(len(c) == 3 for c in cents)


def test_partitioning_invariance(spark, li):
    """Same assignments and centroids regardless of the input's physical
    partitioning — the property float Lloyd does NOT have (its centroid
    sums are order-dependent)."""
    z1 = quantize_scalar_cols(li.repartition(1), COLS)
    z2 = quantize_scalar_cols(li.repartition(13), COLS)
    a1, c1 = kmeans_fixed_point(z1, k=5, iters=3)
    a2, c2 = kmeans_fixed_point(z2, k=5, iters=3)
    assert c1 == c2
    m1 = sorted((tuple(r["__zq"]), r["__cell"]) for r in a1.select("__zq", "__cell").collect())
    m2 = sorted((tuple(r["__zq"]), r["__cell"]) for r in a2.select("__zq", "__cell").collect())
    assert m1 == m2


def test_normalization_bounds_and_constant_col(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (4.0, 5.0)], "a double, b double"
    )
    z = quantize_scalar_cols(df, ["a", "b"])
    zq = [list(r["__zq"]) for r in z.select("__zq").collect()]
    assert all(0 <= v <= SCALE for row in zq for v in row)
    # constant column normalizes to 0 everywhere (rng clamp)
    assert {row[1] for row in zq} == {0}
    assert min(row[0] for row in zq) == 0 and max(row[0] for row in zq) == SCALE


def test_k_exceeds_distinct_vectors(spark):
    df = spark.createDataFrame([(1.0,), (1.0,), (2.0,)], "a double")
    z = quantize_scalar_cols(df, ["a"])
    assigned, cents = kmeans_fixed_point(z, k=10, iters=3)
    assert len(cents) == 2  # shrinks to the distinct count (LIMIT semantics)
    assert assigned.select("__cell").distinct().count() == 2


def test_array_quantizer_matches_scalar_semantics(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 5.0]), (2, [2.0, 5.0]), (3, [4.0, 5.0])],
        "id int, v array<double>",
    )
    z = quantize_array_col(df, "v", 2)
    zq = {r["id"]: list(r["__zq"]) for r in z.select("id", "__zq").collect()}
    assert zq[1] == [0, 0] and zq[3] == [SCALE, 0]
    # integer min-max: (q - mn) * SCALE div rng with micro-quantized q
    assert zq[2] == [(2_000_000 - 1_000_000) * SCALE // 3_000_000, 0]


def test_exact_mode_nonfinite_contract(spark):
    """Pin the exact-mode non-finite contract (r12 fuzz found the
    original silent failure: under ANSI-off, cast(floor(NaN·1e6) as long)
    yielded 0, aliasing the true minimum and SHIFTING every healthy row's
    normalization). Now: NaN/Inf quantize to NULL, healthy rows normalize
    as if the poisoned row were absent from min/max, and
    kmeans_fixed_point fails loud instead of clustering garbage."""
    df = spark.createDataFrame(
        [(1.0,), (float("nan"),), (2.0,)], "a double"
    )
    z = quantize_scalar_cols(df, ["a"])
    rows = {tuple(r["__zq"]) for r in z.select("__zq").collect()}
    assert (None,) in rows  # NaN row → NULL element, visibly poisoned
    assert {t for t in rows if t[0] is not None} == {(0,), (SCALE,)}
    with pytest.raises(ValueError, match="non-finite"):
        kmeans_fixed_point(z, k=2, iters=2)


def test_empty_cluster_carryover(spark):
    """Two tight groups + k=3 seeds: one centroid ends up empty after an
    update round and must carry its previous value (both engines encode
    the same COALESCE — here we just pin the Spark behavior)."""
    vals = [(0.0,), (0.001,), (0.002,), (10.0,), (10.001,), (10.002,)]
    df = spark.createDataFrame(vals, "a double")
    z = quantize_scalar_cols(df, ["a"])
    assigned, cents = kmeans_fixed_point(z, k=3, iters=4)
    assert len(cents) == 3
    # every row still assigned to a valid centroid index
    cells = {r["__cell"] for r in assigned.select("__cell").collect()}
    assert cells <= {0, 1, 2}


# ---------------------------------------------------------------------
# Fixed-point PCA
# ---------------------------------------------------------------------


def test_pca_exact_matches_float_pca_same_metric(spark):
    """The fixed-point eigenpair must agree (up to sign — correlation
    magnitude is sign-free) with a float PCA computed on the SAME
    min-max-normalized data (numpy eigh). MLlib PCA is NOT the oracle
    here: projection_2d's default path standardizes, a different metric
    whose PC2 legitimately differs from the min-max-normalized one."""
    import math
    import random

    import numpy as np

    from workbench_spark.operators.ml_analysis import projection_2d

    rnd = random.Random(7)
    rows = []
    for i in range(500):
        t = rnd.gauss(0, 3)
        u = rnd.gauss(0, 1)
        rows.append((i, t + 0.1 * u, -t + 0.2 * u, u, rnd.gauss(0, 0.1)))
    df = spark.createDataFrame(rows, "id int, f0 double, f1 double, f2 double, f3 double")
    cols = ["f0", "f1", "f2", "f3"]
    fp = {r["id"]: (r["x"], r["y"]) for r in projection_2d(df, cols, "id", exact=True).collect()}

    X = np.array([[r[1], r[2], r[3], r[4]] for r in rows])
    Z = (X - X.min(axis=0)) / (X.max(axis=0) - X.min(axis=0))
    Zc = Z - Z.mean(axis=0)
    w, V = np.linalg.eigh(np.cov(Zc.T))
    order = np.argsort(w)[::-1]
    ref = Zc @ V[:, order[:2]]

    def corr(a, b):
        n = len(a)
        ma, mb = sum(a) / n, sum(b) / n
        cov = sum((x - ma) * (y - mb) for x, y in zip(a, b))
        va = math.sqrt(sum((x - ma) ** 2 for x in a))
        vb = math.sqrt(sum((y - mb) ** 2 for y in b))
        return cov / (va * vb)

    ids = [r[0] for r in rows]
    cx = corr([fp[i][0] for i in ids], list(ref[:, 0]))
    cy = corr([fp[i][1] for i in ids], list(ref[:, 1]))
    assert abs(cx) > 0.999, cx
    assert abs(cy) > 0.99, cy


def test_pca_exact_partitioning_invariance(spark, li):
    from workbench_spark.operators.pca_exact import pca_fixed_point_project

    li_id = li.withColumn("rid", F.monotonically_increasing_id())
    # monotonically_increasing_id differs across partitionings — use the
    # feature tuple itself as the comparison key instead
    out1 = pca_fixed_point_project(li.repartition(1), COLS, COLS[0])
    out2 = pca_fixed_point_project(li.repartition(17), COLS, COLS[0])
    s1 = sorted(map(tuple, out1.collect()))
    s2 = sorted(map(tuple, out2.collect()))
    assert s1 == s2
    assert li_id.count() == len(s1)
