"""Regression tests for text-operator edge cases (r3 review findings)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def test_repetition_features_short_docs(spark):
    """Documents with fewer words than the n-gram size must yield empty
    gram arrays, not a Spark slice() crash (sequence(1,0) is DESCENDING
    in Spark, unlike DuckDB's empty generate_series)."""
    from workbench_spark.operators.text import repetition_features

    docs = spark.createDataFrame(
        [(1, ""), (2, "hello"), (3, "a b"), (4, "x x x x")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in repetition_features(docs, ngram=2).collect()}
    assert out[1]["dup_ngram_frac"] == 0.0  # empty text: no grams
    assert out[2]["dup_ngram_frac"] == 0.0  # single word: no grams
    assert out[3]["dup_ngram_frac"] == 0.0  # two distinct words: one gram
    assert out[4]["dup_ngram_frac"] == pytest.approx(2 / 3)  # 'x x' x3
    assert out[4]["top_word_frac"] == 1.0


def test_chunk_dedup_stats_short_docs(spark):
    from workbench_spark.operators.text import chunk_dedup_stats

    docs = spark.createDataFrame(
        [(1, "solo"), (2, "solo"), (3, "unique words here")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in chunk_dedup_stats(docs, chunk_words=8).collect()}
    # the two identical single-word docs share their (only) chunk
    assert out[1]["n_dup_chunks"] == 1 and out[2]["n_dup_chunks"] == 1
    assert out[3]["n_dup_chunks"] == 0
    assert all(out[i]["n_chunks"] == 1 for i in (1, 2, 3))


def test_pii_scrub_and_counts(spark):
    from workbench_spark.operators.text import add_pii_counts, scrub_pii

    df = spark.createDataFrame(
        [(1, "mail a@b.co and b@c.org; ip 10.0.0.1; card 4111 1111 1111 1111")],
        "id int, text string",
    )
    row = scrub_pii(add_pii_counts(df)).collect()[0]
    assert row["pii_email"] == 2
    assert row["pii_ipv4"] == 1
    assert row["pii_credit_card"] == 1
    assert row["pii_total"] == 4
    assert row["text_scrubbed"] == "mail [EMAIL] and [EMAIL]; ip [IP]; card [CC]"


def test_pii_custom_patterns(spark):
    from workbench_spark.operators.text import add_pii_counts, scrub_pii

    pats = {"badge": (r"\bEMP-\d{4}\b", "[BADGE]")}
    df = spark.createDataFrame([(1, "badge EMP-1234 ok")], "id int, text string")
    row = scrub_pii(add_pii_counts(df, patterns=pats), patterns=pats).collect()[0]
    assert row["pii_badge"] == 1 and row["pii_total"] == 1
    assert row["text_scrubbed"] == "badge [BADGE] ok"


def test_c4_flags_degenerate_corpus(spark):
    """Synthetic documents have no terminal punctuation: every page drops
    under the sentence rule, none via lorem/brace — the flags still
    compute on real data shape."""
    from workbench_spark.operators.text import c4_page_flags
    from workbench_spark.session import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    out = c4_page_flags(d)
    rows = out.select("n_sentences", "c4_keep", "has_code_brace").collect()
    assert all(r["n_sentences"] == 0 and not r["c4_keep"] for r in rows)


# ------------------------------------------------ decontamination / mixing
def test_decontaminate_planted_overlap(spark):
    from workbench_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight")],
        "bid int, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "intro text THE QUICK  Brown fox Jumps over the lazy dog tonight and more"),
            (2, "a completely different document about spark physical plans"),
            (3, "short doc"),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, n=10).collect()}
    # doc 1 contains the full 10-gram despite case/whitespace differences
    assert out[1]["contaminated"] and out[1]["n_contaminated_ngrams"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_contaminated_ngrams"] == 0
    assert not out[3]["contaminated"]  # shorter than n words -> no n-grams
    # every input doc appears exactly once in the report
    assert len(out) == 3


def test_decontaminate_no_fanout_on_common_ngrams(spark):
    """Benchmark n-grams are deduped before the join, so a phrase repeated
    across many benchmark docs still matches each doc n-gram once."""
    from workbench_spark.operators.text import decontaminate

    phrase = "one two three four five"
    bench = spark.createDataFrame(
        [(i, phrase) for i in range(10)], "bid int, text string"
    )
    docs = spark.createDataFrame([(1, phrase)], "doc_id int, text string")
    out = decontaminate(docs, bench, n=5).collect()[0]
    assert out["n_contaminated_ngrams"] == 1  # not 10


def test_mixture_weights_reshapes_distribution(spark):
    from workbench_spark.operators.text import mixture_weights

    docs = spark.createDataFrame(
        [("a", "w " * 80), ("b", "w " * 15), ("c", "w " * 5)],
        "source string, text string",
    )
    out = {r["source"]: r for r in
           mixture_weights(docs, {"a": 0.5, "b": 0.5}).collect()}
    assert out["a"]["n_tokens"] == 80
    assert out["c"]["sampling_weight"] == 0.0  # dropped domain
    # reweighted expected tokens hit the target ratio: w_s * tokens_s equal
    wa = out["a"]["sampling_weight"] * out["a"]["n_tokens"]
    wb = out["b"]["sampling_weight"] * out["b"]["n_tokens"]
    assert wa == pytest.approx(wb)
    # fractions normalize even if the target dict doesn't sum to 1
    out2 = {r["source"]: r for r in
            mixture_weights(docs, {"a": 2.0, "b": 2.0}).collect()}
    assert out2["a"]["target_frac"] == pytest.approx(0.5)
    with pytest.raises(ValueError, match="sum"):
        mixture_weights(docs, {"a": 0.0})


def test_gopher_rules_hand_computed(spark):
    """Hand-worked Gopher rule checks (Rae 2021 thresholds): a normal
    paragraph passes; too-short, bullet-heavy, and no-alpha docs fail the
    specific rule they violate."""
    from workbench_spark.operators.text import gopher_quality_flags

    good = ("The quick brown fox jumps over the lazy dog and then runs "
            "to the hills with great speed that nobody can have matched "
            "in all of recorded history because it was very fast indeed "
            "and kept going for a long time across many green fields "
            "today and tomorrow and the day after that as well friends")
    bullets = "\n".join(["• item one here", "• item two here",
                         "• item three here", "* item four here"])
    digits = " ".join(["12345"] * 60)
    df = spark.createDataFrame(
        [(1, good), (2, "too short"), (3, bullets), (4, digits)],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert out[1]["gopher_keep"], out[1]
    assert out[1]["n_stop_words"] >= 2 and out[1]["alpha_word_frac"] == 1.0
    # doc 2: word count 2 < 50
    assert not out[2]["gopher_keep"] and out[2]["n_words"] == 2
    # doc 3: every line starts with a bullet -> frac 1.0 >= 0.9
    assert out[3]["bullet_line_frac"] == 1.0 and not out[3]["gopher_keep"]
    # doc 4: zero words contain an alphabetic char
    assert out[4]["alpha_word_frac"] == 0.0 and not out[4]["gopher_keep"]


def test_vocabulary_idf_hand_computed(spark):
    """IDF on a 4-doc corpus: token in all docs -> idf ln(1)=0; token in
    one doc -> ln(4)."""
    import math

    from workbench_spark.operators.text import vocabulary

    df = spark.createDataFrame(
        [(1, "apple banana"), (2, "apple cherry"), (3, "apple banana"),
         (4, "apple date date")],
        "doc_id int, text string",
    )
    rows = {r["token"]: r for r in vocabulary(df).collect()}
    assert rows["apple"]["doc_freq"] == 4 and rows["apple"]["idf"] == 0.0
    assert rows["banana"]["doc_freq"] == 2
    assert rows["banana"]["idf"] == pytest.approx(math.log(2))
    assert rows["date"]["doc_freq"] == 1 and rows["date"]["term_freq"] == 2
    assert rows["date"]["idf"] == pytest.approx(math.log(4))
    assert "cherry" in rows and rows["cherry"]["term_freq"] == 1
    # min_df prunes singletons
    pruned = {r["token"] for r in vocabulary(df, min_df=2).collect()}
    assert pruned == {"apple", "banana"}


def test_chunk_documents_hand_computed(spark):
    """Windows at stride 4 with chunk 6 over 10 tokens: starts {0, 4};
    exactly-chunk-sized doc gets ONE window; empty doc none."""
    from workbench_spark.operators.text import chunk_documents

    ten = " ".join(f"w{i}" for i in range(10))
    six = " ".join(f"w{i}" for i in range(6))
    df = spark.createDataFrame(
        [(1, ten), (2, six), (3, "   ")], "doc_id int, text string"
    )
    out = chunk_documents(df, chunk_tokens=6, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    assert set(rows) == {(1, 0), (1, 1), (2, 0)}
    assert rows[(1, 0)]["chunk_text"] == "w0 w1 w2 w3 w4 w5"
    assert rows[(1, 1)]["chunk_text"] == "w4 w5 w6 w7 w8 w9"
    assert rows[(1, 1)]["n_tokens"] == 6
    assert rows[(2, 0)]["chunk_text"] == six and rows[(2, 0)]["n_tokens"] == 6
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)
    # every token of every doc is covered by at least one chunk
    short = chunk_documents(df, chunk_tokens=4, overlap=1)
    n1 = [r["n_tokens"] for r in short.filter("doc_id = 1").collect()]
    starts = sorted(3 * r["chunk_id"] for r in short.filter("doc_id = 1").collect())
    assert starts[0] == 0 and max(s + 4 for s in starts) >= 10


def test_lm_stupid_backoff_hand_computed(spark):
    """Brants 2007 arithmetic on a tiny corpus: train 'a b a b c',
    score 'a b', 'c a' (unseen bigram -> 0.4*c(a)/T), 'a z' (OOV ->
    0.16/T)."""
    import math

    from workbench_spark.operators.text import lm_score_documents, ngram_lm_counts

    train = spark.createDataFrame([(0, "a b a b c")], "doc_id int, text string")
    uni, bi, total = ngram_lm_counts(train)
    assert total == 5
    u = {r["token"]: r["c1"] for r in uni.collect()}
    assert u == {"a": 2, "b": 2, "c": 1}
    b = {(r["w1"], r["w2"]): r["c2"] for r in bi.collect()}
    assert b == {("a", "b"): 2, ("b", "a"): 1, ("b", "c"): 1}

    score = spark.createDataFrame(
        [(1, "a b"), (2, "c a"), (3, "a z")], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in
           lm_score_documents(score, uni, bi, total).collect()}
    # seen bigram: c(a,b)/c(a) = 2/2 = 1 -> log 0
    assert out[1]["mean_logscore"] == 0.0
    assert out[1]["pseudo_perplexity"] == 1.0
    # unseen bigram (c,a): 0.4 * c(a)/T = 0.4*2/5 = 0.16
    assert out[2]["mean_logscore"] == pytest.approx(math.log(0.4 * 2 / 5))
    # OOV z: 0.4*0.4/T
    assert out[3]["mean_logscore"] == pytest.approx(math.log(0.4 * 0.4 / 5))
    assert all(r["n_scored"] == 1 for r in out.values())


def test_dedup_spans_hand_computed(spark):
    """Span surgery on a 3-doc corpus with a shared 4-word span: doc 1
    keeps everything (first occurrence), doc 2 loses the copied span but
    keeps its own tail, a fully-copied doc 3 is emptied."""
    from workbench_spark.operators.text import dedup_spans

    shared = "alpha beta gamma delta"
    df = spark.createDataFrame(
        [
            (1, f"{shared} own tail one x"),
            (2, f"{shared} different ending here y"),
            (3, shared),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dedup_spans(df, chunk_words=4).collect()}
    assert out[1]["text_deduped"] == "alpha beta gamma delta own tail one x"
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["text_deduped"] == "different ending here y"
    assert out[2]["n_spans"] == 2 and out[2]["n_kept"] == 1
    assert out[3]["text_deduped"] == "" and out[3]["n_kept"] == 0
    # idempotence: deduping the deduped corpus changes nothing
    again = dedup_spans(
        spark.createDataFrame(
            [(i, out[i]["text_deduped"]) for i in (1, 2)],
            "doc_id int, text string",
        ),
        chunk_words=4,
    ).collect()
    for r in again:
        assert r["n_kept"] == r["n_spans"]


def test_gopher_rules_tokenless_doc(spark):
    """A whitespace-only / empty document must yield NULL ratios (not a
    DIVIDE_BY_ZERO under ANSI mode, not NaN) and gopher_keep = false —
    the same shape the DuckDB oracle's nullif() guards produce."""
    from workbench_spark.operators.text import gopher_quality_flags

    df = spark.createDataFrame(
        [(1, ""), (2, "   \n  \t "), (3, "some real words here")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    for d in (1, 2):
        assert out[d]["n_words"] == 0
        assert out[d]["mean_word_len"] is None
        assert out[d]["alpha_word_frac"] is None
        assert out[d]["hash_word_ratio"] is None
        assert out[d]["gopher_keep"] is False
    assert out[3]["alpha_word_frac"] == 1.0


def test_lm_score_unigram_joins_broadcast(spark):
    """The two unigram joins are fan-out joins on raw tokens ("the"/"of"
    are pathologically hot keys), so the vocabulary table is broadcast
    outright when it fits. With auto-broadcast disabled, the only
    BroadcastHashJoins left in the plan are the two FORCED unigram hints
    — proving the hint, not Catalyst statistics, carries them."""
    import io
    import contextlib
    import re

    from workbench_spark.operators.text import lm_score_documents, ngram_lm_counts

    def _join_nodes(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        # the detail section lists each node exactly once: "(27) BroadcastHashJoin"
        return re.findall(r"^\(\d+\) (\w*Join)\w*", buf.getvalue(), re.M)

    docs = spark.createDataFrame(
        [(i, f"the cat number {i} sat on the mat of house {i % 7}")
         for i in range(50)],
        "doc_id int, text string",
    )
    uni, bi, total = ngram_lm_counts(docs)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        forced = lm_score_documents(docs, uni, bi, total, broadcast_unigrams=True)
        joins = _join_nodes(forced)
        assert joins.count("BroadcastHashJoin") == 2, joins
        # the bigram join stays with Catalyst (shuffle under threshold=-1)
        assert joins.count("SortMergeJoin") == 1, joins
        # and without the hint the unigram joins fall back to shuffles too
        plain = lm_score_documents(docs, uni, bi, total, broadcast_unigrams=False)
        assert _join_nodes(plain).count("BroadcastHashJoin") == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # results agree on both paths (hand-checked op semantics in
    # test_lm_stupid_backoff_hand_computed); tolerance, not ==, because
    # the join strategy changes the avg(log) accumulation order
    a = {r["doc_id"]: r["mean_logscore"] for r in forced.collect()}
    b = {r["doc_id"]: r["mean_logscore"] for r in plain.collect()}
    assert a.keys() == b.keys()
    for d in a:
        assert abs(a[d] - b[d]) < 1e-12, d


def test_dedup_spans_sentence_mode(spark):
    """unit='sentences': three-sentence spans (the C4 paper's literal
    granularity), removal keeps the first (doc, pos) occurrence and
    reconstruction restores the boundary spaces exactly."""
    from workbench_spark.operators.text import dedup_spans

    span = "First one. Second here! Third now?"
    df = spark.createDataFrame(
        [
            (1, f"{span} Tail a. Tail b. Tail c."),
            (2, f"{span} Different x. Different y. Different z."),
            (3, span),
        ],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in
           dedup_spans(df, unit="sentences", chunk_sents=3).collect()}
    assert out[1]["text_deduped"] == (
        "first one. second here! third now? tail a. tail b. tail c."
    )
    assert out[1]["n_spans"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["text_deduped"] == "different x. different y. different z."
    assert out[2]["n_kept"] == 1
    assert out[3]["text_deduped"] == "" and out[3]["n_kept"] == 0
    # idempotence
    again = dedup_spans(
        spark.createDataFrame(
            [(i, out[i]["text_deduped"]) for i in (1, 2)],
            "doc_id int, text string",
        ),
        unit="sentences",
        chunk_sents=3,
    ).collect()
    for r in again:
        assert r["n_kept"] == r["n_spans"]


def test_tfidf_vectors_feed_ann(spark):
    """The text→ANN bridge: hashed TF-IDF vectors of near-duplicate
    documents are nearest neighbors under cosine_knn, and hand-checkable
    weights come out exactly (tf·ln(N/df))."""
    import math

    from workbench_spark.operators.similarity import cosine_knn
    from workbench_spark.operators.text import tfidf_vectors

    docs = spark.createDataFrame(
        [
            (1, "spark catalyst optimizer rewrites logical plans"),
            (2, "spark catalyst optimizer rewrites logical plans quickly"),
            (3, "completely different subject entirely about cooking pasta"),
            (4, "another unrelated text mentioning gardens and flowers"),
        ],
        "doc_id long, text string",
    )
    vecs = tfidf_vectors(docs, dim=32)
    top1 = {
        r["id"]: r["neighbor_id"]
        for r in cosine_knn(vecs, id_col="doc_id", vec_col="vec", k=1).collect()
    }
    assert top1[1] == 2 and top1[2] == 1  # the near-dup pair finds itself

    # hand-check (bucket-collision-proof): the vector SUM is invariant
    # under hashing = Σ tf·idf; doc 3's 7 tokens are each unique (df=1)
    # so the sum is exactly 7·ln(4/1)
    out = {r["doc_id"]: r["vec"] for r in vecs.collect()}
    assert sum(out[3]) == pytest.approx(7 * math.log(4.0), rel=1e-9)


# ------------------------------------------------------------ language ID


# Held-out phrases: none of these sentences (or their distinctive content
# words) appear in the langid training corpus. Several are chosen to be
# marker-word-poor (no "the"/"der"/"le"/"el" hits) so the marker heuristic
# returns 'und' or misfires while char trigrams still carry the signal.
_HELDOUT = [
    ("en", "birds sing early when summer arrives slowly"),
    ("en", "my neighbour bought three small wooden chairs yesterday"),
    ("en", "reading quietly helps students remember difficult lessons"),
    ("en", "our journey through rainy mountains felt endless"),
    ("en", "fresh bread smells wonderful every single morning"),
    ("de", "gestern abend haben wir zusammen gekocht"),
    ("de", "meine schwester wohnt seit jahren in hamburg"),
    ("de", "nächste woche fahren wir ans meer"),
    ("de", "dieser zug hält leider nicht überall"),
    ("de", "im winter trinke ich gerne heißen tee"),
    ("fr", "nous avons marché longtemps sous la pluie"),
    ("fr", "mon frère apprend à jouer du piano"),
    ("fr", "cette ville possède plusieurs jardins magnifiques"),
    ("fr", "demain soir nous irons voir nos amis"),
    ("fr", "elle préfère voyager en train plutôt quen voiture"),
    ("es", "mi abuela cocina siempre con mucho cariño"),
    ("es", "aprender idiomas abre muchas puertas nuevas"),
    ("es", "esta semana lloverá bastante según dicen"),
    ("es", "nos encanta pasear junto al río"),
    ("es", "tengo ganas de visitar otro país pronto"),
]


def test_langid_nb_beats_markers_on_heldout(spark):
    """The trigram-NB model must beat the marker heuristic on held-out
    phrases (none in the training corpus) and clear 90% accuracy."""
    from workbench_spark.operators.text import detect_language

    df = spark.createDataFrame(
        [(i, t, lang) for i, (lang, t) in enumerate(_HELDOUT)],
        "doc_id int, text string, truth string",
    )
    nb = {
        r["doc_id"]: r["lang_pred"]
        for r in detect_language(df, method="trigram_nb").collect()
    }
    mk = {
        r["doc_id"]: r["lang_pred"]
        for r in detect_language(df, method="markers").collect()
    }
    truth = {i: lang for i, (lang, _) in enumerate(_HELDOUT)}
    nb_acc = sum(nb[i] == truth[i] for i in truth) / len(truth)
    mk_acc = sum(mk[i] == truth[i] for i in truth) / len(truth)
    assert nb_acc >= 0.9, f"NB held-out accuracy {nb_acc:.2f} < 0.9: {nb}"
    assert nb_acc > mk_acc, f"NB {nb_acc:.2f} not better than markers {mk_acc:.2f}"


def test_langid_engine_matches_python_twin(spark):
    """Engine column expressions replay score_py/predict_py exactly
    (integer micro-nat scores, bit-identical)."""
    from workbench_spark.functions.langid import (
        LANGS,
        add_language_scores,
        predict_py,
        score_py,
    )

    rows = [(i, t) for i, (_, t) in enumerate(_HELDOUT)] + [
        (100, ""),
        (101, "12345 !!!"),
        (102, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r
        for r in add_language_scores(df, keep_scores=True).collect()
    }
    for i, t in rows:
        assert got[i]["lang_pred"] == predict_py(t), (i, t)
        if got[i]["lang_pred"] != "und":
            exp = score_py(t)
            for lang in LANGS:
                assert got[i][f"score_{lang}"] == exp[lang], (i, t, lang)


# ------------------------------------------------- exact-substring dedup


def test_exact_substr_hand_computed(spark):
    """Duplicated 4-token window: doc 1 keeps the first occurrence, doc 2's
    copy is excised; overlapping duplicate windows merge into one cut."""
    from workbench_spark.operators.text import dedup_exact_substrings

    df = spark.createDataFrame(
        [
            (1, "a b c d x y"),            # first occurrence of 'a b c d'
            (2, "p q a b c d r s"),        # later occurrence -> cut 4 tokens
            (3, "short doc"),              # shorter than L -> untouched
            (4, "a b c d"),                # exactly the window -> fully cut
        ],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_exact_substrings(df, min_length=4).collect()
    }
    assert out[1]["text_deduped"] == "a b c d x y"
    assert out[1]["n_removed"] == 0
    assert out[2]["text_deduped"] == "p q r s"
    assert out[2]["n_removed"] == 4
    assert out[3]["text_deduped"] == "short doc"
    assert out[4]["text_deduped"] == ""
    assert out[4]["n_removed"] == 4


def test_exact_substr_long_duplicate_region_excised_wholesale(spark):
    """A duplicated region longer than L produces a run of overlapping
    duplicate windows whose cuts must merge into ONE contiguous removal —
    the whole region disappears, not an L-token prefix."""
    from workbench_spark.operators.text import dedup_exact_substrings

    region = " ".join(f"w{i}" for i in range(10))  # 10-token shared region
    df = spark.createDataFrame(
        [(1, f"{region} tail1"), (2, f"head2 {region} tail2")],
        "doc_id int, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup_exact_substrings(df, min_length=4).collect()
    }
    assert out[1]["text_deduped"] == f"{region} tail1"
    # doc 2: every stride-1 window inside the region is a non-first
    # occurrence; merged cut = the full 10 tokens
    assert out[2]["text_deduped"] == "head2 tail2"
    assert out[2]["n_removed"] == 10


def test_sample_to_mixture_modes_and_determinism(spark):
    """sample_to_mixture: downsample never repeats and keeps with
    p=min(1,w); resample emits floor(w)+Bernoulli(frac) copies with
    expected count = w; both deterministic across partitionings."""
    from workbench_spark.operators.text import mixture_weights, sample_to_mixture

    rows = [(i, "src_a" if i < 80 else "src_b", "word " * (5 if i < 80 else 50)) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id int, source string, text string")
    # src_b has 20 docs x 50 tokens = 1000 tokens, src_a 80 x 5 = 400
    target = {"src_a": 0.5, "src_b": 0.5}
    w = {r["source"]: r["sampling_weight"] for r in mixture_weights(docs, target).collect()}
    assert w["src_a"] > 1.0 and w["src_b"] < 1.0  # up- and down-weighted

    down = sample_to_mixture(docs, target, mode="downsample").collect()
    ids = [r["doc_id"] for r in down]
    assert len(ids) == len(set(ids))  # never repeats
    # all src_a docs survive (w > 1 -> p = 1)
    assert sum(1 for r in down if r["source"] == "src_a") == 80
    assert 0 < sum(1 for r in down if r["source"] == "src_b") < 20

    res = sample_to_mixture(docs, target).collect()
    per_doc = {}
    for r in res:
        per_doc[r["doc_id"]] = max(per_doc.get(r["doc_id"], 0), r["copy_idx"] + 1)
    n_a = sum(v for d, v in per_doc.items() if d < 80)
    import math
    # every src_a doc appears at least floor(w) times
    assert all(v >= math.floor(w["src_a"]) for d, v in per_doc.items() if d < 80)
    # total src_a copies within 1 of expected either side per-doc bound
    assert 80 * math.floor(w["src_a"]) <= n_a <= 80 * math.ceil(w["src_a"])

    again = sample_to_mixture(docs.repartition(7), target).collect()
    assert sorted((r["doc_id"], r["copy_idx"]) for r in res) == sorted(
        (r["doc_id"], r["copy_idx"]) for r in again
    )


def test_sample_to_mixture_drops_untargeted_sources(spark):
    from workbench_spark.operators.text import sample_to_mixture

    docs = spark.createDataFrame(
        [(1, "keep", "a b c"), (2, "drop", "d e f")],
        "doc_id int, source string, text string",
    )
    out = sample_to_mixture(docs, {"keep": 1.0}).collect()
    assert {r["source"] for r in out} == {"keep"}


def test_time_rollup_hierarchy_and_single_shuffle(spark):
    """time_rollup: hand-checked grain tables on a tiny frame, per-group
    variant drops the all-groups slice, and the plan pays ONE Exchange
    for every grain at once (Expand + partial agg, not per-grain scans)."""
    import contextlib
    import datetime as dt
    import io

    from pyspark.sql import functions as F
    from workbench_spark.operators.windows import time_rollup

    rows = [
        (dt.datetime(2026, 1, 1, 0, 10), "a", 1.0),
        (dt.datetime(2026, 1, 1, 0, 50), "a", 2.0),
        (dt.datetime(2026, 1, 1, 5, 0), "b", 4.0),
        (dt.datetime(2026, 2, 3, 7, 0), "a", 8.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, k string, value double")
    out = time_rollup(df, "ts", "value", grains=("month", "day", "hour"))
    rows_out = {(r["grain"], r["bucket_ts"]): r for r in out.collect()}
    # totals
    tot = rows_out[("total", None)]
    assert tot["n_rows"] == 4 and tot["value_sum"] == 15.0
    # month grain: Jan has 3 rows sum 7, Feb 1 row sum 8
    jan = rows_out[("month", dt.datetime(2026, 1, 1))]
    feb = rows_out[("month", dt.datetime(2026, 2, 1))]
    assert (jan["n_rows"], jan["value_sum"]) == (3, 7.0)
    assert (feb["n_rows"], feb["value_sum"]) == (1, 8.0)
    # hour grain: the 00:00 hour has both a-rows
    h0 = rows_out[("hour", dt.datetime(2026, 1, 1, 0))]
    assert (h0["n_rows"], h0["value_min"], h0["value_max"]) == (2, 1.0, 2.0)
    # grain counts: 1 total + 2 months + 2 days + 3 hours
    assert len(rows_out) == 8

    # single Exchange in the physical plan
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    # count Exchanges in the AQE FINAL plan tree only (the detail and
    # Initial Plan sections repeat every node)
    tree = buf.getvalue().split("== Initial Plan ==")[0]
    n_exchanges = sum(1 for line in tree.splitlines() if "Exchange (" in line)
    assert n_exchanges == 1, tree
    assert "Expand" in tree

    # grouped variant: all-groups slice dropped, per-group totals present
    g = time_rollup(df, "ts", "value", grains=("month",), group_col="k")
    got = {(r["grain"], r["k"], r["bucket_ts"]): r["value_sum"] for r in g.collect()}
    assert got[("total", "a", None)] == 11.0
    assert got[("total", "b", None)] == 4.0
    assert got[("month", "a", dt.datetime(2026, 1, 1))] == 3.0
    assert all(k[1] is not None for k in got)


def test_range_join_semantics_and_plan(spark):
    """range_join: [start, end) boundaries, multi-match fan-out, left mode
    NULL padding, and the plan is an EQUI-join (no BNLJ/Cartesian)."""
    import contextlib
    import io

    from pyspark.sql import functions as F
    from workbench_spark.operators.joins import range_join

    pts = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 25.0), (4, 99.0)], "pid int, x double"
    )
    ivs = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 5.0, 15.0), (300, 20.0, 30.0)],
        "iid int, lo double, hi double",
    )
    out = range_join(pts, ivs, "x", "lo", "hi", bin_width=7.0)
    got = sorted((r["pid"], r["iid"]) for r in out.collect())
    # x=5 in [0,10) and [5,15); x=10 NOT in [0,10) (exclusive end) but in
    # [5,15); x=25 in [20,30); x=99 nowhere
    assert got == [(1, 100), (1, 200), (2, 200), (3, 300)]

    left = range_join(pts, ivs, "x", "lo", "hi", bin_width=7.0, how="left")
    lg = {(r["pid"], r["iid"]) for r in left.collect()}
    assert (4, None) in lg and len(lg) == 5

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_range_join_keyed_and_timestamps(spark):
    import datetime as dt

    from workbench_spark.operators.joins import range_join

    t0 = dt.datetime(2026, 1, 1)
    pts = spark.createDataFrame(
        [("u1", t0 + dt.timedelta(hours=1)), ("u2", t0 + dt.timedelta(hours=1))],
        "uid string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [("u1", t0, t0 + dt.timedelta(hours=2), "w1"),
         ("u2", t0 + dt.timedelta(hours=3), t0 + dt.timedelta(hours=4), "w2")],
        "uid string, s timestamp, e timestamp, label string",
    )
    out = range_join(pts, ivs, "ts", "s", "e", bin_width=3600, on="uid")
    got = [(r["uid"], r["label"]) for r in out.collect()]
    # u2's event is OUTSIDE u2's window; without the uid key it would
    # match u1's window — the equality key must scope the containment
    assert got == [("u1", "w1")]


def test_bm25_self_retrieval_and_idf(spark):
    """BM25: a query made from a doc's own rare terms retrieves that doc
    first; repeated query words don't double-count (set semantics); rare
    terms outweigh common ones."""
    from workbench_spark.operators.text import bm25_search

    docs = spark.createDataFrame(
        [
            (1, "zephyr quartz nebula unique words " + "common " * 20),
            (2, "common words appear here " + "common " * 30),
            (3, "another document about spark plans and common things"),
        ],
        "doc_id int, text string",
    )
    queries = spark.createDataFrame(
        [(100, "zephyr quartz"), (200, "common common common")],
        "query_id int, query string",
    )
    out = bm25_search(docs, queries, k=3)
    rows = [(r["query_id"], r["doc_id"], r["rank"]) for r in out.collect()]
    by_q = {}
    for qid, did, rank in rows:
        by_q.setdefault(qid, []).append((rank, did))
    # rare-term query: doc 1 wins
    assert sorted(by_q[100])[0] == (1, 1)
    # only doc 1 contains the rare terms
    assert len(by_q[100]) == 1
    # 'common' query matches all three docs; repeated word counted once
    assert len(by_q[200]) == 3
    sc = {r["doc_id"]: r["score"] for r in out.filter(F.col("query_id") == 200).collect()}
    # same single-term query: higher tf with shorter length wins BM25
    assert sc[2] == max(sc.values())


def test_bm25_champion_lists(spark):
    """champion_m (r12 scale valve): M >= corpus size is EXACTLY the
    uncapped retrieval; aggressive M still returns each term's highest-tf
    docs with identical scores for surviving (query, doc) pairs."""
    from workbench_spark.operators.text import bm25_index, bm25_search

    docs = spark.createDataFrame(
        [(i, "shared " * (i + 1) + "filler words here") for i in range(8)],
        "doc_id int, text string",
    )
    queries = spark.createDataFrame([(1, "shared")], "query_id int, query string")
    exact = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in bm25_search(docs, queries, k=8).collect()
    }
    wide = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in bm25_search(
            docs, queries, k=8, index=bm25_index(docs, champion_m=100)
        ).collect()
    }
    assert wide == exact  # cap above every df: bit-identical

    capped = bm25_search(docs, queries, k=8, index=bm25_index(docs, champion_m=3))
    rows = {r["doc_id"]: r["rank"] for r in capped.collect()}
    # only the 3 highest-tf docs for 'shared' survive (tf DESC, id ASC)
    # and their relative order matches the exact retrieval (avgdl shifts
    # slightly under the cut — documented approximation — so scores are
    # compared by order, not value)
    assert set(rows) == {7, 6, 5}
    exact_order = sorted((exact[(1, d)][0], d) for d in (5, 6, 7))
    assert [d for _r, d in exact_order] == [
        d for d, _r in sorted(rows.items(), key=lambda kv: kv[1])
    ]


def test_decontaminate_bloom_prefilter_identical(spark):
    """The Bloom prefilter path must return EXACTLY the unfiltered result
    (no false negatives by construction), including fp-heavy tiny-m
    settings where many clean grams survive the prefilter — the exact
    join still rejects them."""
    from workbench_spark.operators.text import decontaminate

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "bid int, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "intro alpha beta gamma delta epsilon zeta eta theta outro"),
            (2, "totally unrelated content with many different words here"),
            (3, "alpha beta gamma delta"),  # shorter than n -> clean
        ],
        "doc_id int, text string",
    )
    base = sorted(map(tuple, decontaminate(docs, bench, n=8).collect()))
    for m in (64, 4096):  # m=64: high fp rate; m=4096: near-exact filter
        pre = sorted(
            map(tuple, decontaminate(docs, bench, n=8, prefilter_m_bits=m).collect())
        )
        assert pre == base, m


def test_source_token_divergence_hand_computed(spark):
    """Tiny two-source corpus checked against a literal Python replay of
    the definition (same picounat quantization), plus the invariants:
    KL >= 0, JS in [0, ln2], and a source matching the corpus mixture
    exactly diverges by ~0."""
    import math

    from workbench_spark.operators.text import source_token_divergence

    rows = [
        (0, "a a a b", "s1"),
        (1, "a b b b c", "s2"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in source_token_divergence(d).collect()}

    counts = {"s1": {"a": 3, "b": 1}, "s2": {"a": 1, "b": 3, "c": 1}}
    corpus = {"a": 4, "b": 4, "c": 1}
    ctot = 9

    def panel(src):
        stot = sum(counts[src].values())
        klq = jsq = 0
        qmass = 0
        for t, c in counts[src].items():
            p = c / stot
            q = corpus[t] / ctot
            m = (p + q) / 2
            klq += math.floor(p * math.log(p / q) * 1e12 + 0.5)
            jsq += math.floor(
                (p * math.log(p / m) + q * math.log(q / m)) * 1e12 + 0.5
            )
            qmass += corpus[t]
        kl = math.floor((klq / 1e12) * 1e6 + 0.5) / 1e6
        js = (
            math.floor(
                ((jsq / 1e12 + math.log(2.0) * (1.0 - qmass / ctot)) / 2) * 1e6
                + 0.5
            )
            / 1e6
        )
        return stot, len(counts[src]), kl, js

    for src in ("s1", "s2"):
        stot, ntypes, kl, js = panel(src)
        r = got[src]
        assert (r["n_tokens"], r["n_types"]) == (stot, ntypes)
        assert r["kl_to_corpus"] == kl and r["js_to_corpus"] == js
        assert 0 <= r["kl_to_corpus"] and 0 <= r["js_to_corpus"] <= math.log(2)

    # a source that IS the corpus mixture: single source -> KL = JS = 0
    solo = source_token_divergence(
        spark.createDataFrame([(0, "x y z", "only")], "doc_id long, text string, source string")
    ).collect()[0]
    assert solo["kl_to_corpus"] == 0.0 and solo["js_to_corpus"] == 0.0


def test_code_quality_features(spark):
    """StarCoder Stack line-shape filters on crafted code snippets: clean
    code keeps; minified (one huge line), autogenerated, and symbol-soup
    files are rejected; comment/long-line fractions count right."""
    from workbench_spark.operators.text import code_quality_features

    clean = "# header comment\ndef f(x):\n    return x + 1\n\nprint(f(2))"
    minified = "var a=1;" * 300  # one 2400-char line
    autogen = "// Auto-generated by protoc. DO NOT EDIT.\nint x = 1;"
    soup = "!!! @@@ ### $$$ %%% ^^^ &&& *** ((( )))\n" * 3
    longlines = ("x = 1  " * 30 + "\n") * 4  # 4 lines of ~210 chars

    rows = [(1, clean), (2, minified), (3, autogen), (4, soup), (5, longlines)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in code_quality_features(df).collect()}

    assert out[1]["code_keep"] is True
    assert out[1]["n_lines"] == 5
    assert out[1]["comment_line_frac"] == 0.2  # exactly the header line
    assert out[1]["long_line_frac"] == 0.0

    assert out[2]["code_keep"] is False  # max_line_len 2400 > 1000
    assert out[2]["max_line_len"] == len(minified)

    assert out[3]["code_keep"] is False and out[3]["autogenerated"] is True
    # the comment marker on line 1 counts
    assert out[3]["comment_line_frac"] == 0.5

    assert out[4]["code_keep"] is False  # alnum_frac ~0 < 0.25
    assert out[4]["alnum_frac"] < 0.25

    # 4 long lines + the trailing-newline empty 5th line
    assert out[5]["long_line_frac"] == 0.8
    assert out[5]["code_keep"] is False  # avg_line_len > 100
