"""Invariant tests for dedup operators whose signatures (xxhash64) have no
DuckDB oracle: MinHash estimates must track exact Jaccard; SimHash must
catch planted near-duplicates; exact dedup must be idempotent."""

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
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def docs_with_planted_dups(spark, docs):
    """Corpus + near-duplicates: copy of each doc_id<10 with a tiny edit."""
    base = docs.select("doc_id", "text")
    dups = (
        docs.filter(F.col("doc_id") < 10)
        .select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" extra tail token")).alias("text"),
        )
    )
    return base.unionAll(dups)


def test_minhash_estimates_track_exact_jaccard(spark, docs_with_planted_dups):
    from workbench_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    d = docs_with_planted_dups
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(
            d, n_hashes=64, bands=16, verify_threshold=0.3
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, threshold=0.3).collect()
    }
    # every planted pair must be found by LSH with 64 hashes / 16 bands
    planted = [(i, i + 1_000_000) for i in range(10)]
    for p in planted:
        assert p in est, f"planted near-dup {p} missed by MinHash LSH"
        assert p in exact
        assert abs(est[p] - exact[p]) < 0.25, (p, est[p], exact[p])


def test_minhash_high_estimates_are_real_dups(spark, docs):
    """The synthetic corpus ships with planted near-duplicates; every pair
    MinHash estimates above 0.9 must be a genuine high-Jaccard pair."""
    from workbench_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    est_pairs = minhash_lsh_pairs(docs, n_hashes=64, bands=8, verify_threshold=0.9).collect()
    assert len(est_pairs) > 0  # the corpus does contain planted near-dups
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    for r in est_pairs:
        key = (r["id_a"], r["id_b"])
        assert key in exact and exact[key] > 0.7, (key, r["est_jaccard"], exact.get(key))


def test_simhash_catches_planted_dups(spark, docs_with_planted_dups):
    from workbench_spark.operators.dedup import simhash_near_pairs

    pairs = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_pairs(
            docs_with_planted_dups, max_hamming=6, n_bands=8
        ).collect()
    }
    # 8 bands of 8 bits guarantee every pair at hamming <= 7 is a candidate
    found = sum((i, i + 1_000_000) in pairs for i in range(10))
    assert found == 10, f"only {found}/10 planted near-dups at hamming<=6: {sorted(pairs)[:20]}"


def test_simhash_identical_text_distance_zero(spark, docs):
    from workbench_spark.operators.dedup import simhash

    a = simhash(docs).withColumnRenamed("simhash", "h1")
    b = simhash(docs.select("doc_id", F.col("text"))).withColumnRenamed("simhash", "h2")
    j = a.join(b, "doc_id")
    assert j.filter(F.col("h1") != F.col("h2")).count() == 0


def test_exact_dedup_idempotent(spark, docs):
    from workbench_spark.operators.dedup import exact_dedup

    d = docs.select("doc_id", F.substring("text", 1, 40).alias("text"))
    once = exact_dedup(d)
    twice = exact_dedup(once)
    assert once.count() == twice.count()
    # survivors have unique normalized content
    from workbench_spark.operators.dedup import normalize_text

    n_hash = once.select(F.md5(normalize_text(F.col("text"))).alias("h")).distinct().count()
    assert n_hash == once.count()


def test_minhash_dedup_removes_planted(spark, docs_with_planted_dups):
    from workbench_spark.operators.dedup import minhash_lsh_dedup

    d = docs_with_planted_dups
    survivors = minhash_lsh_dedup(d, n_hashes=64, bands=16, verify_threshold=0.5)
    # planted copies (higher ids) should be dropped, originals kept
    remaining_planted = survivors.filter(F.col("doc_id") >= 1_000_000).count()
    assert remaining_planted <= 2  # allow a couple of LSH misses
    # the corpus itself contains ~24 planted native near-dup pairs, so
    # survivors < 500; anything far below that would mean over-deletion
    n_base = survivors.filter(F.col("doc_id") < 1_000_000).count()
    assert 460 <= n_base < 500, n_base
