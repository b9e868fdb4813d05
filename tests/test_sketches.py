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


def test_hll_duplicates_absorbed_and_merge_equals_union_build(spark):
    from workbench_spark.operators.sketches import hll_build, hll_merge

    uniq = [f"key{i}" for i in range(200)]
    # the same 200 distinct keys, each repeated 5x: registers must be
    # bit-identical (max is idempotent) — HLL counts DISTINCTs
    direct = sorted(map(tuple, hll_build(_keys(spark, uniq), "key").collect()))
    dup = sorted(map(tuple, hll_build(_keys(spark, uniq * 5), "key").collect()))
    assert direct == dup
    # merge of two half-sketches == one full build, bit-for-bit
    merged = hll_merge(
        hll_build(_keys(spark, uniq[:120]), "key"),
        hll_build(_keys(spark, uniq[100:]), "key"),
    )
    assert sorted(map(tuple, merged.collect())) == direct


def test_hll_estimate_within_error_envelope(spark):
    from workbench_spark.operators.sketches import hll_build, hll_estimate

    # 3 sigma at m=64: 3 * 1.04/sqrt(64) = 39% (deterministic hashes, so
    # this is a fixed property of the family, not a flaky bound)
    for n in (40, 500, 3000):
        keys = _keys(spark, [f"u{i}:{i * i}" for i in range(n)])
        row = hll_estimate(hll_build(keys, "key")).collect()[0]
        assert abs(row["hll_estimate"] - n) / n < 0.39, (n, row["hll_estimate"])
        assert row["present_buckets"] + row["zero_registers"] == 64


def test_hll_grouped_by_equals_per_group_builds(spark):
    """hll_build(by=[g]) must produce, per group, exactly the registers
    of a standalone build over that group's rows — and grouped estimates
    must match the per-group hll_estimate outputs."""
    from workbench_spark.operators.sketches import hll_build, hll_estimate

    rows = [("a", f"k{i}") for i in range(300)] + [("b", f"k{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "g string, key string")
    grouped = hll_build(df, "key", by=["g"])
    got = {
        gname: sorted(
            (r["bucket"], r["rho"]) for r in grouped.collect() if r["g"] == gname
        )
        for gname in ("a", "b")
    }
    for gname in ("a", "b"):
        solo = sorted(
            map(tuple, hll_build(df.filter(F.col("g") == gname), "key").collect())
        )
        assert got[gname] == solo
    est = {r["g"]: r["hll_estimate"] for r in hll_estimate(grouped, by=["g"]).collect()}
    for gname, n in (("a", 300), ("b", 40)):
        solo_est = hll_estimate(
            hll_build(df.filter(F.col("g") == gname), "key")
        ).collect()[0]["hll_estimate"]
        assert est[gname] == solo_est
        assert abs(est[gname] - n) / n < 0.39


def test_hll_small_range_linear_counting(spark):
    from workbench_spark.operators.sketches import hll_build, hll_estimate

    # 5 distinct keys in 64 buckets: the linear-counting branch fires and
    # is near-exact
    row = hll_estimate(hll_build(_keys(spark, ["a", "b", "c", "d", "e"]), "key")).collect()[0]
    assert row["zero_registers"] >= 59
    assert abs(row["hll_estimate"] - 5) < 1.5
    # empty input: 0 registers -> ln(m/m) = 0
    empty = _keys(spark, []).filter(F.lit(False))
    row0 = hll_estimate(hll_build(empty, "key")).collect()[0]
    assert row0["hll_estimate"] == 0.0 and row0["zero_registers"] == 64


def test_cms_heavy_hitters_exact_even_with_collisions(spark):
    """The CMS prefilter admits a superset (narrow width forces
    collisions) but the exact second pass must return EXACTLY the keys
    with true count >= T — same result as a bare groupBy+HAVING."""
    from workbench_spark.operators.sketches import cms_heavy_hitters

    data = (
        ["hot1"] * 50
        + ["hot2"] * 30
        + ["warm"] * 10
        + [f"tail{i}" for i in range(500)]
    )
    df = _keys(spark, data)
    got = {
        r["key"]: r["cnt"]
        for r in cms_heavy_hitters(df, "key", min_count=10, depth=3, width=32).collect()
    }
    assert got == {"hot1": 50, "hot2": 30, "warm": 10}
    # threshold above everything -> empty, not an error
    assert cms_heavy_hitters(df, "key", min_count=1000).count() == 0


def test_ddsketch_relative_error_guarantee_and_merge(spark):
    """Every quantile read is within alpha*|true| of the true quantile
    (the DDSketch guarantee, incl. negatives and zeros), and a merge of
    two half-sketches is bit-identical to one full build."""
    import math

    from workbench_spark.operators.sketches import (
        ddsketch_build,
        ddsketch_merge,
        ddsketch_quantiles,
    )

    vals = (
        [0.5 + 0.37 * i for i in range(1500)]          # dense positives
        + [1000.0 * 1.31 ** i for i in range(25)]       # heavy tail
        + [-3.7 * i for i in range(1, 60)]              # negatives
        + [0.0] * 7
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    alpha = 0.02
    sk = ddsketch_build(df, "x", alpha=alpha)
    qs = [0.001, 0.05, 0.25, 0.5, 0.75, 0.95, 0.999]
    est = {r["q"]: r["est"] for r in ddsketch_quantiles(sk, qs, alpha=alpha).collect()}
    srt = sorted(vals)
    n = len(srt)
    for q in qs:
        true = srt[int(math.floor(q * (n - 1)))]
        if true == 0:
            assert est[q] == 0.0
        else:
            assert abs(est[q] - true) <= alpha * abs(true) * 1.000001, (q, est[q], true)
    # merge == build, bit-for-bit (deterministic split, no set ops)
    a = spark.createDataFrame([(float(v),) for v in vals[:800]], "x double")
    b = spark.createDataFrame([(float(v),) for v in vals[800:]], "x double")
    merged = sorted(map(tuple, ddsketch_merge(
        ddsketch_build(a, "x", alpha=alpha), ddsketch_build(b, "x", alpha=alpha)
    ).collect()))
    direct = sorted(map(tuple, sk.collect()))
    assert merged == direct
