"""Count-Min + Bloom sketch guarantees (operators/sketches.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def _keys(spark, rows):
    return spark.createDataFrame([(k,) for k in rows], "key string")


def test_cms_never_underestimates_and_exact_when_wide(spark):
    from workbench_spark.operators.sketches import cms_build, cms_query

    data = ["a"] * 50 + ["b"] * 20 + [f"k{i}" for i in range(30)]
    df = _keys(spark, data)
    truth = {"a": 50, "b": 20, **{f"k{i}": 1 for i in range(30)}}
    probes = _keys(spark, list(truth))
    # narrow sketch: collisions possible, but NEVER an underestimate
    sk = cms_build(df, "key", depth=4, width=8)
    est = {r["key"]: r["cms_estimate"] for r in cms_query(sk, probes, "key", 4, 8).collect()}
    assert all(est[k] >= truth[k] for k in truth)
    # wide sketch: 32 distinct keys in 4x1024 -> w.h.p. no collisions, exact
    skw = cms_build(df, "key", depth=4, width=1024)
    estw = {r["key"]: r["cms_estimate"] for r in cms_query(skw, probes, "key", 4, 1024).collect()}
    assert estw == truth


def test_cms_merge_equals_union_build(spark):
    from workbench_spark.operators.sketches import cms_build, cms_merge

    d1 = _keys(spark, ["a", "a", "b"])
    d2 = _keys(spark, ["b", "c"])
    merged = cms_merge(
        cms_build(d1, "key", 4, 32), cms_build(d2, "key", 4, 32)
    )
    direct = cms_build(d1.unionByName(d2), "key", 4, 32)
    a = sorted(map(tuple, merged.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_cms_weighted_build(spark):
    from workbench_spark.operators.sketches import cms_build, cms_query

    df = spark.createDataFrame([("a", 7), ("a", 3), ("b", 5)], "key string, w int")
    sk = cms_build(df, "key", 4, 1024, weight_col="w")
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_query(sk, _keys(spark, ["a", "b"]), "key", 4, 1024).collect()
    }
    assert est == {"a": 10, "b": 5}


def test_bloom_no_false_negatives_and_some_true_negatives(spark):
    from workbench_spark.operators.sketches import bloom_build, bloom_contains

    present = [f"in{i}" for i in range(50)]
    absent = [f"out{i}" for i in range(200)]
    bl = bloom_build(_keys(spark, present), "key", m_bits=4096, k=5)
    mem = {
        r["key"]: r["maybe_present"]
        for r in bloom_contains(
            bl, _keys(spark, present + absent), "key", m_bits=4096, k=5
        ).collect()
    }
    assert all(mem[k] for k in present)  # zero false negatives, always
    # 50 keys x 5 bits in 4096 -> fp rate ~ (1-e^-0.061)^5 ~ 1e-6; all 200
    # absents must read absent (deterministic hashes, not a flaky bound)
    assert sum(1 for k in absent if mem[k]) == 0


def test_bloom_merge_and_partition_invariance(spark):
    from workbench_spark.operators.sketches import (
        bloom_build,
        bloom_contains,
        bloom_merge,
    )

    d1 = _keys(spark, ["x", "y"])
    d2 = _keys(spark, ["z"])
    merged = bloom_merge(
        bloom_build(d1, "key", 512, 4), bloom_build(d2, "key", 512, 4)
    )
    direct = bloom_build(d1.unionByName(d2).repartition(5), "key", 512, 4)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    mem = {
        r["key"]: r["maybe_present"]
        for r in bloom_contains(merged, _keys(spark, ["x", "y", "z", "w"]), "key", 512, 4).collect()
    }
    assert mem["x"] and mem["y"] and mem["z"]
