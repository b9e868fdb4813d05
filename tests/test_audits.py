"""Known-answer tests for the r11 corpus/embedding audit operators (their
oracles certify engine-equality; these certify the MATH means what the
docstrings claim)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def test_zipf_slope_on_synthetic_zipf_corpus(spark):
    """A corpus built with freq(rank) = C/rank must fit slope ≈ -1."""
    from workbench_spark.operators.text import corpus_zipf_stats

    docs = []
    doc_id = 0
    for rank in range(1, 201):
        freq = max(1, round(20000 / rank))
        # spread the token's occurrences over documents
        word = f"tok{rank:04d}"
        docs.append((doc_id, (word + " ") * freq))
        doc_id += 1
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    row = corpus_zipf_stats(df, top_v=200).first()
    assert row["top_v_used"] == 200
    assert abs(row["zipf_slope"] + 1.0) < 0.02, row["zipf_slope"]
    assert row["n_distinct"] == 200


def test_duplication_report_sums(spark):
    from workbench_spark.operators.dedup import duplication_report

    rows = [(i, "unique text %d" % i) for i in range(10)]
    rows += [(100 + i, "boilerplate page") for i in range(5)]
    rows += [(200 + i, "pair doc") for i in range(2)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    hist = {r["cluster_size"]: r for r in duplication_report(df).collect()}
    assert hist[1]["n_clusters"] == 10
    assert hist[2]["n_clusters"] == 1 and hist[2]["n_docs"] == 2
    assert hist[5]["n_clusters"] == 1 and hist[5]["n_docs"] == 5
    assert sum(r["n_docs"] for r in hist.values()) == 17


def test_corpus_datasheet_values(spark):
    from workbench_spark.operators.text import corpus_datasheet

    rows = [
        (1, "a", "one two three"),
        (2, "a", "one two three"),   # exact dup of 1
        (3, "a", "four"),
        (4, "b", "five six"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    out = {r["source"]: r for r in corpus_datasheet(df).collect()}
    assert out["a"]["n_docs"] == 3 and out["a"]["n_distinct_contents"] == 2
    assert out["a"]["n_tokens"] == 7
    assert out["a"]["dup_factor"] == 1.5
    assert out["a"]["median_doc_tokens"] == 3.0
    assert out["b"]["dup_factor"] == 1.0 and out["b"]["n_tokens"] == 2


def test_anisotropy_extremes(spark):
    """All-identical directions → anisotropy ≈ 1; a symmetric ± cloud →
    anisotropy ≈ 0; norms report exactly."""
    from workbench_spark.operators.similarity import embedding_space_audit

    same = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(50)], "vec_id bigint, embedding array<double>"
    )
    r = embedding_space_audit(same).first()
    assert r["n_vecs"] == 50 and r["dim"] == 2
    assert abs(r["mean_norm"] - 5.0) < 1e-6
    assert r["std_norm"] == 0.0
    assert abs(r["anisotropy"] - 1.0) < 1e-5

    iso = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(25)]
        + [(100 + i, [-1.0, 0.0]) for i in range(25)]
        + [(200 + i, [0.0, 1.0]) for i in range(25)]
        + [(300 + i, [0.0, -1.0]) for i in range(25)],
        "vec_id bigint, embedding array<double>",
    )
    r2 = embedding_space_audit(iso).first()
    assert abs(r2["anisotropy"]) < 1e-5
    assert abs(r2["mean_norm"] - 1.0) < 1e-6
