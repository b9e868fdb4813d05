"""Sequence-packing tests: distributed prefix sum vs a local reference,
greedy bin invariants, padding accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="session")
def docs(spark):
    from workbench_spark.session import read_table

    return read_table(spark, SF_DIR, "documents")


def test_pack_sequences_matches_local_scan(spark, docs):
    """The two-phase distributed prefix sum must equal a single-threaded
    scan in doc_id order, for several partition counts (partition
    boundaries must not affect the answer)."""
    from workbench_spark.operators.packing import pack_sequences

    rows = sorted(
        docs.select(
            "doc_id",
            F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)")).alias("t"),
        ).collect()
    )
    budget = 256
    cum, expect = 0, {}
    for doc_id, t in rows:
        start, cum = cum, cum + t
        end_pos = cum - 1 if t > 0 else start
        expect[doc_id] = (t, start // budget, end_pos // budget)

    for parts in (1, 7, 32):
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_seq"], r["end_seq"])
            for r in pack_sequences(docs, budget=budget, partitions=parts).collect()
        }
        assert got == expect, f"partitions={parts}"


def test_pack_sequences_spans_flag(spark):
    from workbench_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, "a " * 10), (2, "b " * 10), (3, "c " * 10)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in pack_sequences(df, budget=16, partitions=2).collect()}
    # stream: 10 + 10 + 10 tokens, budget 16 → doc2 spans positions 10..19
    assert not out[1]["spans_boundary"]
    assert out[2]["spans_boundary"] and out[2]["start_seq"] == 0 and out[2]["end_seq"] == 1
    assert not out[3]["spans_boundary"] and out[3]["start_seq"] == 1


def test_pack_greedy_invariants(spark, docs):
    """Every regular bin fits the budget, every doc is packed exactly
    once, oversize docs are singleton bins."""
    from workbench_spark.operators.packing import pack_sequences_greedy

    budget = 200
    packed = pack_sequences_greedy(docs, budget=budget, partitions=8)
    rows = packed.collect()
    assert len(rows) == docs.count()
    by_bin: dict = {}
    for r in rows:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for members in by_bin.values():
        if any(m["oversize"] for m in members):
            assert len(members) == 1
        else:
            assert sum(m["n_tokens"] for m in members) <= budget


def test_pack_greedy_stats(spark, docs):
    from workbench_spark.operators.packing import pack_sequences_greedy, packing_stats

    budget = 200
    packed = pack_sequences_greedy(docs, budget=budget, partitions=8)
    s = packing_stats(packed, budget=budget).collect()[0]
    assert s["n_docs"] == docs.count()
    total = docs.select(
        F.sum(F.size(F.expr(r"regexp_extract_all(text, '\\S+', 0)")))
    ).collect()[0][0]
    assert s["total_tokens"] == total
    # padding = regular-bin capacity minus fill, always non-negative and
    # bounded by (n_bins - n_oversize) * budget
    assert 0 <= s["padding_tokens"] <= (s["n_bins"] - s["n_oversize"]) * budget
