"""Adversarial edge-input sweep of the text/dedup tier (r11 VERDICT #4).

Every oracle entry runs on the driver's well-formed corpus; these tests
push the operators' worst-case INPUTS — empty docs, null text, 1-token
docs, stopword/punctuation-only docs, whitespace-only, astral-plane
unicode (emoji/ZWJ/combining/RTL), multi-kilobyte single tokens, control
characters — through minhash / simhash / PPJoin / packing / BM25 /
unigram / BPE / quality / langid and assert no-crash + sane outputs
(bounded scores, non-negative counts, id preservation). Follows the
multimodal hypothesis-fuzz precedent (test_sources_streaming_multimodal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


# astral emoji (UTF-16 surrogate pairs), zero-width space/joiner, combining
# accent, RTL arabic+hebrew — the unicode shapes that break naive slicing
UNICODE_SOUP = "\U0001f600\U0001f389\U0001f680 ​‍ é مرحبا שלום"

EDGE_ROWS = [
    (1, ""),
    (2, None),
    (3, "word"),
    (4, "the the the the the the the the"),
    (5, "!!! ... ??? ;;; --- ***"),
    (6, "    \t\n   "),
    (7, "a"),
    (8, UNICODE_SOUP),
    (9, "x" * 10_000),
    (10, "ctrl\x01chars\x02embedded\x03here"),
    (11, "normal document with several plain words appearing right here"),
    (12, "normal document with several plain words appearing right here"),
]


@pytest.fixture(scope="session")
def edge_docs(spark):
    return spark.createDataFrame(EDGE_ROWS, "doc_id bigint, text string").coalesce(2)


def _ids(df, col="doc_id"):
    return {r[col] for r in df.select(col).collect()}


# ----------------------------------------------------------------- dedup tier
def test_minhash_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.dedup import minhash_lsh_pairs, minhash_signature

    sigs = minhash_signature(edge_docs, "text", "doc_id").collect()
    # every row (incl. null/empty text) gets a full-width signature
    assert len(sigs) == len(EDGE_ROWS)
    for r in sigs:
        assert len(r["minhash"]) == 32
    pairs = minhash_lsh_pairs(edge_docs, verify_threshold=None).collect()
    for p in pairs:
        assert p["id_a"] < p["id_b"]
        assert 0.0 <= p["est_jaccard"] <= 1.0
    # the exact-dup pair must be found with estimated jaccard 1
    assert any(p["id_a"] == 11 and p["id_b"] == 12 and p["est_jaccard"] == 1.0 for p in pairs)


def test_simhash_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.dedup import simhash_near_pairs

    for portable in (False, True):
        bits = 60 if portable else 64
        pairs = simhash_near_pairs(
            edge_docs, max_hamming=3, n_bands=4, portable=portable
        ).collect()
        for p in pairs:
            assert p["id_a"] < p["id_b"]
            assert 0 <= p["hamming"] <= 3 <= bits
        assert any(p["id_a"] == 11 and p["id_b"] == 12 and p["hamming"] == 0 for p in pairs)


def test_jaccard_and_ppjoin_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.dedup import (
        containment_pairs,
        jaccard_prefix_pairs,
        ngram_jaccard_pairs,
    )

    out = ngram_jaccard_pairs(edge_docs, threshold=0.3).collect()
    for p in out:
        assert p["id_a"] < p["id_b"]
        assert 0.0 <= p["jaccard"] <= 1.0 + 1e-9, p
    assert any(
        p["id_a"] == 11 and p["id_b"] == 12 and abs(p["jaccard"] - 1.0) < 1e-9
        for p in out
    )

    pp = jaccard_prefix_pairs(edge_docs, threshold=(3, 10)).collect()
    for p in pp:
        assert p["id_a"] < p["id_b"]
        assert 0 < p["inter"] <= p["union_sz"], p
    assert any(
        p["id_a"] == 11 and p["id_b"] == 12 and p["inter"] == p["union_sz"]
        for p in pp
    )

    cc = containment_pairs(edge_docs, threshold=(3, 10)).collect()
    for p in cc:
        assert 0 < p["inter"] <= p["sz_contained"], p
    # containment is DIRECTIONAL: the exact-dup pair appears both ways
    dirs = {
        (p["id_contained"], p["id_container"])
        for p in cc
        if p["inter"] == p["sz_contained"] and {p["id_contained"], p["id_container"]} == {11, 12}
    }
    assert dirs == {(11, 12), (12, 11)}


def test_exact_dedup_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.dedup import duplicate_clusters, exact_dedup

    rows = duplicate_clusters(edge_docs, "text", "doc_id").collect()
    # (11, 12) are exact dups; null text must not crash the hash path.
    # empty (1) and whitespace-only (6) normalize to the same content, so
    # clusters beyond the planted pair are allowed — the planted one must
    # have exactly 2 members with representative 11
    planted = [r for r in rows if r["representative_id"] == 11]
    assert len(planted) == 1 and planted[0]["n_dups"] == 2
    survivors = exact_dedup(edge_docs, "text", "doc_id")
    assert 11 in _ids(survivors) and 12 not in _ids(survivors)


# --------------------------------------------------------------- packing tier
def test_packing_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.packing import pack_sequences, pack_sequences_greedy

    packed = pack_sequences(edge_docs, budget=8).collect()
    by_id = {r["doc_id"]: r for r in packed}
    assert set(by_id) == _ids(edge_docs)  # every doc assigned, even empty/null
    for r in packed:
        assert r["n_tokens"] >= 0
        assert r["start_seq"] <= r["end_seq"]
    # the 10k-char single token is ONE token
    assert by_id[9]["n_tokens"] == 1
    assert by_id[1]["n_tokens"] == 0 and by_id[2]["n_tokens"] == 0

    greedy = pack_sequences_greedy(edge_docs, budget=8).collect()
    for r in greedy:
        assert r["n_tokens"] >= 0 and (r["bin_id"] is not None or r["oversize"])


# ------------------------------------------------------------------ BM25 tier
def test_bm25_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.text import bm25_index, bm25_search

    postings, stats = bm25_index(edge_docs)
    prow = postings.collect()
    for r in prow:
        assert r["tf"] >= 1 and r["dl"] >= 1
    for r in stats.collect():
        assert r["df"] >= 1 and r["idf"] >= 0.0  # RSJ positive idf

    queries = spark.createDataFrame(
        [(1, "plain words"), (2, ""), (3, UNICODE_SOUP), (4, "zzz_absent_token")],
        "query_id bigint, query string",
    )
    hits = bm25_search(edge_docs, queries, k=3).collect()
    for h in hits:
        assert h["score"] > 0.0
    # the plain-words query must hit the normal docs
    q1 = {h["doc_id"] for h in hits if h["query_id"] == 1}
    assert {11, 12} <= q1
    # empty and absent-token queries return no rows, not errors
    assert not [h for h in hits if h["query_id"] in (2, 4)]


# ------------------------------------------------------------- tokenizer tier
def test_unigram_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.unigram import unigram_tokenize, unigram_train

    pieces = unigram_train(edge_docs, vocab_size=40, text_col="text")
    assert pieces.count() > 0
    toks = unigram_tokenize(edge_docs, pieces, text_col="text").collect()
    by_id = {r["doc_id"]: r for r in toks}
    for r in toks:
        assert r["pieces"] is not None
    assert len(by_id[1]["pieces"]) == 0  # empty text → zero pieces, not a crash
    assert len(by_id[11]["pieces"]) >= 1


def test_bpe_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.bpe import bpe_tokenize, bpe_train

    merges = bpe_train(edge_docs, num_merges=10, text_col="text", min_count=1)
    toks = bpe_tokenize(edge_docs, merges, text_col="text").collect()
    by_id = {r["doc_id"]: r for r in toks}
    for r in toks:
        assert r["bpe_tokens"] is not None
    assert len(by_id[11]["bpe_tokens"]) >= 1
    # astral-plane text round-trips through the merge fold without error
    assert len(by_id[8]["bpe_tokens"]) >= 1


# --------------------------------------------------------- quality/langid tier
def test_quality_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.text import gopher_quality_flags, quality_features

    q = quality_features(edge_docs).collect()
    assert len(q) == len(EDGE_ROWS)
    for r in q:
        for c in r.asDict():
            v = r[c]
            if isinstance(v, float):
                assert v == v, (r["doc_id"], c, "NaN leaked")  # no NaNs
            if c.endswith("_ratio") and v is not None:
                assert 0.0 <= v <= 1.0 + 1e-9, (r["doc_id"], c, v)
    g = gopher_quality_flags(edge_docs).collect()
    assert len(g) == len(EDGE_ROWS)
    flags = {r["doc_id"]: r for r in g}
    # empty/whitespace/null docs must FAIL gopher quality, not pass silently
    for bad_id in (1, 2, 6):
        assert not flags[bad_id]["gopher_keep"], bad_id


def test_langid_edge_inputs(spark, edge_docs):
    from workbench_spark.functions.langid import add_language_scores

    out = add_language_scores(edge_docs, text_col="text").collect()
    assert len(out) == len(EDGE_ROWS)
    langs = {r["doc_id"]: r["lang_pred"] for r in out}
    assert langs[11] == "en"
    # degenerate docs get SOME deterministic label without crashing
    assert all(v is None or isinstance(v, str) for v in langs.values())


def test_c4_and_pii_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.text import add_pii_counts, c4_page_flags, scrub_pii

    c4 = c4_page_flags(edge_docs).collect()
    assert len(c4) == len(EDGE_ROWS)
    pii = add_pii_counts(edge_docs).collect()
    for r in pii:
        for c in r.asDict():
            if c.startswith("pii_") and r[c] is not None:
                assert r[c] >= 0
    scrub = scrub_pii(edge_docs).collect()
    assert len(scrub) == len(EDGE_ROWS)


def test_decontaminate_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(100, "plain words appearing right here"), (101, ""), (102, None)],
        "bench_id bigint, text string",
    )
    kept = decontaminate(edge_docs, bench, text_col="text", bench_text_col="text")
    kept_ids = _ids(kept)
    # the normal docs share a 13-gram-free overlap? regardless of outcome:
    # result is a subset of the corpus and degenerate bench rows don't crash
    assert kept_ids <= _ids(edge_docs)


# ------------------------------------------------------ span surgery / mixture
def test_span_surgery_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.text import dedup_exact_substrings, dedup_spans

    out = dedup_spans(edge_docs, chunk_words=4).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == _ids(edge_docs)  # every doc survives, possibly emptied
    # the first of the exact-dup pair keeps its text; the clone's repeated
    # spans are excised
    assert by_id[11]["text_deduped"] == EDGE_ROWS[10][1]
    assert len(by_id[12]["text_deduped"] or "") < len(EDGE_ROWS[11][1])

    sub = dedup_exact_substrings(edge_docs, min_length=5).collect()
    s_by_id = {r["doc_id"]: r for r in sub}
    assert set(s_by_id) == _ids(edge_docs)
    assert s_by_id[11]["text_deduped"] == EDGE_ROWS[10][1]


def test_mixture_edge_inputs(spark):
    from workbench_spark.operators.text import mixture_weights, sample_to_mixture

    rows = [
        (1, "src0", "alpha beta gamma delta"),
        (2, "src0", ""),
        (3, "src1", None),
        (4, "src1", "epsilon zeta"),
        (5, "src2", "\U0001f600 emoji doc"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    w = mixture_weights(df, {"src0": 0.5, "src1": 0.25, "src2": 0.25}).collect()
    for r in w:
        assert r["sampling_weight"] is None or r["sampling_weight"] >= 0.0
    out = sample_to_mixture(df, {"src0": 0.5, "src1": 0.25, "src2": 0.25})
    got = out.collect()
    # emitted rows reference real input docs only
    assert {r["doc_id"] for r in got} <= {1, 2, 3, 4, 5}


def test_chunking_edge_inputs(spark, edge_docs):
    from workbench_spark.operators.text import chunk_documents, rolling_hashes

    chunks = chunk_documents(edge_docs, chunk_tokens=4, overlap=1).collect()
    for c in chunks:
        assert c["n_tokens"] >= 1
        assert c["chunk_id"] >= 0
    # empty/null docs produce no chunks rather than crashing
    chunked_ids = {c["doc_id"] for c in chunks}
    assert 11 in chunked_ids and 1 not in chunked_ids and 2 not in chunked_ids

    rh = rolling_hashes(edge_docs, window=4).collect()
    assert len(rh) > 0
    assert all(r["shingle_hash"] is not None for r in rh)


# ------------------------------------------------------- hypothesis text fuzz
def test_hypothesis_unicode_fuzz_through_stats(spark):
    """Random unicode documents (hypothesis) through token stats + quality +
    minhash signature: no crashes, bounded ratios, full-width signatures."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from workbench_spark.operators.dedup import minhash_signature
    from workbench_spark.operators.text import add_token_stats

    texts = st.lists(
        st.text(
            alphabet=st.characters(
                blacklist_categories=("Cs",),  # no lone surrogates (unencodable)
                max_codepoint=0x1FAFF,
            ),
            max_size=200,
        ),
        min_size=1,
        max_size=6,
    )

    @given(texts)
    @settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
    def run(docs):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(docs)], "doc_id bigint, text string"
        )
        stats = add_token_stats(df).collect()
        assert len(stats) == len(docs)
        for r in stats:
            assert r["n_tokens"] >= 0 and r["n_chars_computed"] >= 0
        sigs = minhash_signature(df, "text", "doc_id").collect()
        assert all(len(r["minhash"]) == 32 for r in sigs)

    run()


# ------------------------------------------------------------------ graph tier
def test_connected_components_degenerate_edges(spark):
    from workbench_spark.operators.dedup import leakage_safe_split
    from workbench_spark.operators.graph import connected_components

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    for method in ("label", "star"):
        assert connected_components(empty, method=method).count() == 0

    loops = spark.createDataFrame([(1, 1), (2, 2)], "src bigint, dst bigint")
    for method in ("label", "star"):
        out = {r["node"]: r["component"] for r in connected_components(loops, method=method).collect()}
        # self-loops connect nothing: every node is its own component
        # (star mode drops self-loops before its edge canonicalization)
        assert all(out.get(n, n) == n for n in (1, 2)), (method, out)

    # leakage split with ZERO near-dup pairs: every doc is a singleton
    # component and still gets a deterministic split
    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id bigint")
    out = leakage_safe_split(docs, empty.selectExpr("src as id_a", "dst as id_b"))
    rows = out.collect()
    assert len(rows) == 20
    assert all(r["component"] == r["doc_id"] for r in rows)
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
