"""URL-curation operators: normalization rules, URL dedup winner rule,
per-domain caps (exact + approximate scale path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def test_normalize_url_rules(spark):
    from workbench_spark.operators.web import normalize_url

    cases = [
        # fragment + tracking strip + param sort + default port + host case
        ("HTTPS://Example.COM:443/Path/?b=2&utm_source=x&a=1#frag",
         "https://example.com/Path?a=1&b=2"),
        ("https://example.com/Path?a=1&b=2", "https://example.com/Path?a=1&b=2"),
        ("http://other.org:80/", "http://other.org"),
        ("http://other.org", "http://other.org"),
        # path case preserved; non-default port kept
        ("http://Host.com:8080/CaseSensitive/", "http://host.com:8080/CaseSensitive"),
        # every param is tracking -> no query at all
        ("http://a.com/x?utm_a=1&fbclid=2&gclid", "http://a.com/x"),
        ("not a url", "not a url"),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {r["i"]: r["n"] for r in
           df.select("i", normalize_url(F.col("url")).alias("n")).collect()}
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_extract_domain(spark):
    from workbench_spark.operators.web import extract_domain

    df = spark.createDataFrame(
        [(1, "https://Sub.Example.COM:8443/x?q=1"), (2, "nope"), (3, None)],
        "i int, url string",
    )
    out = {r["i"]: (r["d"], r["rd"]) for r in df.select(
        "i",
        extract_domain(F.col("url")).alias("d"),
        extract_domain(F.col("url"), registrable=True).alias("rd"),
    ).collect()}
    assert out[1] == ("sub.example.com", "example.com")
    assert out[2] == ("", "")
    assert out[3] == (None, None)


def test_url_dedup_quality_winner_and_null_urls(spark):
    from workbench_spark.operators.web import url_dedup

    df = spark.createDataFrame(
        [
            (1, "https://a.com/x?utm_source=t", 5.0),
            (2, "https://a.com/x", 9.0),       # same canonical URL, best quality
            (3, "https://A.com/x/", 9.0),      # tie with 2 -> smaller id wins
            (4, "https://b.com/y", 1.0),       # unique -> keeps itself
            (5, None, 1.0),                    # no URL -> keeps itself
        ],
        "doc_id long, url string, q double",
    )
    out = {r["doc_id"]: r for r in url_dedup(df, quality_col="q").collect()}
    assert len(out) == 5
    assert not out[1]["keep"] and out[2]["keep"] and not out[3]["keep"]
    assert out[4]["keep"] and out[5]["keep"]
    assert out[5]["norm_url"] is None


def test_domain_cap_exact_vs_approx(spark):
    """Exact path keeps exactly `cap` per over-cap domain (best quality);
    the approximate scale path keeps ≈cap including every row the exact
    path keeps at well-separated qualities."""
    from workbench_spark.operators.web import domain_cap

    rows = [(i, f"https://hot.com/{i}", float(i)) for i in range(100)]
    rows += [(200 + i, f"https://cold.org/{i}", 1.0) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, url string, q double")

    exact = domain_cap(df, cap=10, quality_col="q", exact=True)
    kept = exact.filter("keep").groupBy("domain").count().collect()
    by_dom = {r["domain"]: r["count"] for r in kept}
    assert by_dom == {"hot.com": 10, "cold.org": 3}
    # the 10 kept on hot.com are the 10 highest-quality docs
    kept_ids = {
        r["doc_id"]
        for r in exact.filter("keep AND domain = 'hot.com'").collect()
    }
    assert kept_ids == set(range(90, 100))

    approx = domain_cap(df, cap=10, quality_col="q", exact=False)
    akept = {
        r["doc_id"] for r in approx.filter("keep AND domain = 'hot.com'").collect()
    }
    # sketch threshold: must keep the true top docs, size close to cap
    assert set(range(91, 100)).issubset(akept)
    assert len(akept) <= 15
    # under-cap domain passes through untouched
    assert approx.filter("keep AND domain = 'cold.org'").count() == 3


def test_url_dedup_incremental_admission(spark):
    from workbench_spark.operators.web import url_dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "https://a.com/x?utm_source=z"), (2, "https://b.com/y")],
        "doc_id long, url string",
    )
    batch = spark.createDataFrame(
        [
            (10, "https://A.com/x/", 1.0),   # canonical dup of corpus 1 -> rejected
            (11, "https://c.com/new", 2.0),  # novel -> admitted
            (12, "https://c.com/new?utm_a=1", 9.0),  # batch-dup of 11, better quality -> wins
            (13, None, 1.0),                 # no URL -> passes through
        ],
        "doc_id long, url string, q double",
    )
    out = {r["doc_id"] for r in
           url_dedup_incremental(batch, corpus, quality_col="q").collect()}
    assert out == {12, 13}
    # persisted-artifact fast path agrees
    from workbench_spark.operators.web import normalize_url
    from pyspark.sql import functions as F

    art = corpus.select(normalize_url(F.col("url")).alias("norm_url"))
    out2 = {r["doc_id"] for r in url_dedup_incremental(
        batch, art, quality_col="q", corpus_is_normalized=True).collect()}
    assert out2 == out
