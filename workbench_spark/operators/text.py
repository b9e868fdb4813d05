"""Text-analysis operators for training-data pipelines (LLM-pipeline
extension; the reference's analogous row-wise column operators are the
chem UDFs, SURVEY §2.9 — same shape: string column in, feature columns out).

All hot-path expressions are built-in pyspark.sql.functions (regexp,
split, transform/aggregate) — JVM-side, codegen'd, zero Python per row.
Each operator is embarrassingly parallel (no shuffle at all): the natural
100 TB shape for per-document feature extraction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------ token counts


def token_count(col) -> Column:
    """Whitespace token count: number of \\S+ runs."""
    return F.size(F.regexp_extract_all(col, F.lit(r"\S+"), 0))


def word_count(col) -> Column:
    """Word-ish token count under a BPE-ish segmentation: letter runs,
    digit runs, and single punctuation marks each count as one token —
    approximates subword tokenizer pre-splitting."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0))


def char_count(col) -> Column:
    return F.length(col)


def add_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """token/word/char counts + avg token length as columns."""
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_words", word_count(t))
        .withColumn("n_chars_computed", char_count(t))
        .withColumn(
            "avg_token_len",
            F.when(
                token_count(t) > 0,
                (F.length(F.regexp_replace(t, r"\s+", "")) / token_count(t)),
            ).otherwise(F.lit(0.0)),
        )
    )


# ------------------------------------------------------------ quality score

_STOPWORDS_EN = (
    "the a an and or but if then is are was were be been to of in on for with "
    "as at by from that this it not no he she they we you i his her its their"
).split()


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features (Gopher/C4-style length & symbol rules):
    punct_ratio, digit_ratio, upper_ratio, stopword_ratio, mean_word_len,
    and a composite quality_score in [0,1]. All closed-form expressions."""
    t = F.col(text_col)
    n_char = F.greatest(F.length(t), F.lit(1))
    n_tok = token_count(t)
    punct = F.size(F.regexp_extract_all(t, F.lit(r"[^\w\s]"), 0))
    digits = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))
    uppers = F.size(F.regexp_extract_all(t, F.lit(r"[A-Z]"), 0))
    stop_pattern = r"(?i)\b(" + "|".join(_STOPWORDS_EN) + r")\b"
    stops = F.size(F.regexp_extract_all(t, F.lit(stop_pattern), 0))
    out = (
        df.withColumn("punct_ratio", punct / n_char)
        .withColumn("digit_ratio", digits / n_char)
        .withColumn("upper_ratio", uppers / n_char)
        .withColumn(
            "stopword_ratio",
            F.when(n_tok > 0, stops / n_tok).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "mean_word_len",
            F.when(n_tok > 0, F.length(F.regexp_replace(t, r"\s+", "")) / n_tok).otherwise(
                F.lit(0.0)
            ),
        )
    )
    # composite: penalize symbol soup, reward stopword presence + sane word len
    score = (
        F.lit(1.0)
        - F.least(F.col("punct_ratio") * 2, F.lit(0.5))
        - F.least(F.col("digit_ratio"), F.lit(0.3))
    ) * F.when(
        (F.col("mean_word_len") >= 2) & (F.col("mean_word_len") <= 12), F.lit(1.0)
    ).otherwise(F.lit(0.5))
    return out.withColumn("quality_score", F.round(F.greatest(score, F.lit(0.0)), 6))


# ------------------------------------------------------------ language ID

# tiny marker-word inventories; deterministic and SQL-portable (the point is
# the Spark plumbing — swap in fasttext via pandas_udf for production)
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des"],
    "es": ["el", "la", "los", "las", "es", "una", "que", "por", "para", "con"],
}


def lang_scores(col) -> dict[str, Column]:
    scores = {}
    for lang, words in _LANG_MARKERS.items():
        pat = r"(?i)\b(" + "|".join(words) + r")\b"
        scores[lang] = F.size(F.regexp_extract_all(col, F.lit(pat), 0))
    return scores


def detect_language(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    method: str = "trigram_nb",
) -> DataFrame:
    """Language ID over a text column (en / de / fr / es, else 'und').

    ``method="trigram_nb"`` (default): char-trigram multinomial Naive
    Bayes — integer micro-nat log-prob sums via a constant-folded
    map-literal ``aggregate`` fold per language; no shuffle, no Python
    (see functions/langid.py for the model and its DuckDB oracle twin).

    ``method="markers"``: the legacy marker-word heuristic — argmax of
    per-language marker hit counts, 'und' when all zero. Kept for
    comparison tests and as the cheaper scan when only coarse filtering
    is needed.
    """
    if method == "trigram_nb":
        from workbench_spark.functions.langid import add_language_scores

        return add_language_scores(df, text_col=text_col, out_col=out_col)
    if method != "markers":
        raise ValueError(f"unknown language-ID method: {method!r}")
    scores = lang_scores(F.col(text_col))
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # reversed alphabetical so the alphabetically-earliest language wins ties
    for lang in sorted(scores, reverse=True):
        s = scores[lang]
        best_lang = F.when((s >= best_score) & (s > 0), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return df.withColumn(out_col, best_lang)


# ------------------------------------------------------------ C4 rules

#: a line is "kept" when it ends in terminal punctuation (optionally
#: inside a closing quote) AND has at least 5 whitespace words
_C4_LINE_KEEP = r"""[.!?]["']?\s*$"""


def c4_page_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The C4 page-level cleaning heuristics (Raffel et al., JMLR 2020,
    §2.2 — the published rule list, minus the bad-words skip list, which
    ships as data with the original pipeline, not as an algorithm):

    - line filter: keep lines that end in terminal punctuation and have
      ≥ 5 words (``n_lines`` / ``n_kept_lines``);
    - page filters: ≥ 3 sentences (approximated as [.!?] occurrences,
      the common reimplementation), no "lorem ipsum", no "{" (code);
    - ``c4_keep`` = the conjunction (line-level dedup of 3-sentence
      spans is the separate chunk_dedup_stats operator).

    All JVM array/regex expressions — one projection over the scan, no
    Python, no shuffle."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda x: x.rlike(_C4_LINE_KEEP)
        & (F.size(F.regexp_extract_all(x, F.lit(r"\S+"), 0)) >= 5),
    )
    n_sentences = F.regexp_count(t, F.lit(r"[.!?]"))
    lower = F.lower(t)
    return (
        df.withColumn("n_lines", F.size(lines))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn("n_sentences", n_sentences)
        .withColumn("has_lorem_ipsum", lower.contains("lorem ipsum"))
        .withColumn("has_code_brace", t.contains("{"))
        .withColumn(
            "c4_keep",
            (n_sentences >= 3)
            & ~lower.contains("lorem ipsum")
            & ~t.contains("{"),
        )
    )


# ------------------------------------------------------------ PII scrub

#: category -> (regex, replacement token). Patterns stay in the portable
#: subset shared by Java regex (Spark) and RE2 (DuckDB): ASCII classes,
#: \b boundaries, bounded quantifiers — no lookaround, no backrefs — so
#: the DuckDB oracle certifies cross-engine match-for-match equivalence.
#: Recall-oriented plumbing, not a compliance guarantee: a production
#: deployment swaps in its own vetted pattern set (or an NER model) via
#: the ``patterns`` argument.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # ordered: longer/more-specific shapes first so scrubbing is
    # insensitive to overlaps (credit card before generic phone)
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "credit_card": (r"\b\d{4}[- ]\d{4}[- ]\d{4}[- ]\d{4}\b", "[CC]"),
    "ssn": (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    "phone": (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
}


def add_pii_counts(df: DataFrame, text_col: str = "text",
                   patterns: dict[str, tuple[str, str]] | None = None) -> DataFrame:
    """Per-category PII match counts (``pii_<cat>`` columns) + total.
    Pure JVM regexp_count expressions — one scan, no Python."""
    pats = patterns or PII_PATTERNS
    out = df
    total = F.lit(0)
    for cat, (pat, _) in pats.items():
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        out = out.withColumn(f"pii_{cat}", c)
        total = total + F.col(f"pii_{cat}")
    return out.withColumn("pii_total", total)


def scrub_pii(df: DataFrame, text_col: str = "text", out_col: str = "text_scrubbed",
              patterns: dict[str, tuple[str, str]] | None = None) -> DataFrame:
    """Replace every PII match with its category token, in pattern order
    (dict order is the precedence order). Chained JVM regexp_replace —
    whole-stage codegen keeps this a single projection over the scan."""
    pats = patterns or PII_PATTERNS
    col = F.col(text_col)
    for _, (pat, repl) in pats.items():
        col = F.regexp_replace(col, pat, repl)
    return df.withColumn(out_col, col)


# ------------------------------------------------------------ fingerprint


def document_fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercased, whitespace-
    collapsed text) — the exact-dup key. See dedup.exact_dedup."""
    from workbench_spark.operators.dedup import normalize_text

    return df.withColumn(out_col, F.md5(normalize_text(F.col(text_col))))


def rolling_hashes(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", window: int = 16) -> DataFrame:
    """Winnowing-style rolling fingerprints: xxhash64 of each ``window``-char
    shingle of normalized text (distinct). Output exploded: (id, shingle_hash).
    Feed into an inverted-index join for plagiarism/containment detection."""
    from workbench_spark.operators.dedup import shingle_frame

    sh = shingle_frame(df, text_col, id_col, window, "__sh")
    return sh.select(
        F.col(id_col),
        F.explode(
            F.transform("__sh", lambda s: F.xxhash64(s))
        ).alias("shingle_hash"),
    )


# ----------------------------------------------------- repetition (Gopher)


def repetition_features(
    df: DataFrame, text_col: str = "text", ngram: int = 2
) -> DataFrame:
    """Within-document repetition signals (the Gopher/MassiveText quality
    rules — Rae et al. 2021 §A1.1; no reference counterpart, mandated
    LLM-pipeline op):

    - ``dup_ngram_frac``: 1 − distinct/total word n-grams — high values
      mean boilerplate/looping text;
    - ``top_word_frac``: frequency of the most common word / total words.

    All JVM-side: split + transform for n-grams, aggregate over a
    grouped word histogram for the mode. Zero shuffle (per-row exprs).
    """
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    n_words = F.size(words)
    # guard the short-doc case: sequence(1, 0) is DESCENDING [1, 0] in
    # Spark (not empty like generate_series) and slice(start=0) throws —
    # a document with < ngram words must yield an empty gram array
    grams = F.expr(
        f"CASE WHEN size(__w) >= {ngram} THEN "
        f"transform(sequence(1, size(__w) - {ngram - 1}), "
        f"i -> concat_ws(' ', slice(__w, i, {ngram}))) "
        f"ELSE array() END"
    )
    # mode frequency via sorted word array: longest run of equal words
    # (aggregate keeps (prev, run, best) as a struct — single pass, no
    # per-element subexpressions that would re-evaluate)
    mode_freq = F.expr(
        "aggregate(array_sort(__w), "
        "named_struct('prev', cast(null as string), 'run', 0, 'best', 0), "
        "(acc, w) -> named_struct("
        "  'prev', w, "
        "  'run', CASE WHEN acc.prev IS NOT NULL AND w = acc.prev "
        "          THEN acc.run + 1 ELSE 1 END, "
        "  'best', greatest(acc.best, CASE WHEN acc.prev IS NOT NULL AND w = acc.prev "
        "          THEN acc.run + 1 ELSE 1 END)), "
        "acc -> acc.best)"
    )
    out = df.withColumn("__w", words)
    out = out.withColumn("__g", grams)
    return (
        out.withColumn(
            "dup_ngram_frac",
            F.when(
                F.size("__g") > 0,
                F.round(
                    1.0 - F.size(F.array_distinct("__g")) / F.size("__g"), 6
                ),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "top_word_frac",
            F.when(
                F.size("__w") > 0, F.round(mode_freq / F.size("__w"), 6)
            ).otherwise(F.lit(0.0)),
        )
        .drop("__w", "__g")
    )


def chunk_dedup_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 8,
) -> DataFrame:
    """Cross-document chunk-level duplication (the Lee et al. 2022
    "Deduplicating Training Data" NearDup/ExactSubstr shape at chunk
    granularity): split each doc into non-overlapping ``chunk_words``-word
    chunks, count chunks that appear in >1 document, report per-doc
    (n_chunks, n_dup_chunks, dup_chunk_frac).

    Scale: one explode (linear), one groupBy on the chunk hash (the dup
    census — map-side combinable), one broadcast-ableless semi aggregation
    back per doc. Equi-join-shaped throughout; no pairwise blowup at any
    duplication level (counts, not pairs).
    """
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")), " "
    )
    # same short-input guard as repetition_features: empty word arrays
    # must produce an empty chunk list, not a degenerate sequence
    chunks = F.expr(
        f"CASE WHEN size(__w) > 0 THEN "
        f"transform(sequence(0, (size(__w) - 1) div {chunk_words}), "
        f"i -> concat_ws(' ', slice(__w, i * {chunk_words} + 1, {chunk_words}))) "
        f"ELSE array() END"
    )
    exploded = (
        df.withColumn("__w", words)
        .withColumn("__c", chunks)
        .select(F.col(id_col), F.explode("__c").alias("chunk"))
        .withColumn("__h", F.md5(F.col("chunk")))
    )
    census = exploded.groupBy("__h").agg(
        F.countDistinct(id_col).alias("__docs")
    )
    return (
        exploded.join(census, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("__docs") > 1, 1).otherwise(0)).alias(
                "n_dup_chunks"
            ),
            F.round(
                F.sum(F.when(F.col("__docs") > 1, 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("dup_chunk_frac"),
        )
    )


# ------------------------------------------------- decontamination / mixing
def word_ngram_frame(
    df: DataFrame, text_col: str, id_col: str, n: int
) -> DataFrame:
    """(id, distinct word n-grams) — normalized text split once into a
    words-array column, n-grams sliced from that ATTRIBUTE (the
    _shingle_sql rule: an expression embedded in the per-element lambda
    body is re-evaluated per element). Docs shorter than n words emit an
    empty array."""
    from workbench_spark.operators.dedup import normalize_text

    words = df.select(
        F.col(id_col),
        F.split(normalize_text(F.col(text_col)), " ").alias("__w"),
    )
    grams = F.when(
        F.size("__w") >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size("__w") - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice("__w", i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return words.select(F.col(id_col), grams.alias("__ngrams"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = 13,
    prefilter_m_bits: int | None = None,
    prefilter_k: int = 3,
) -> DataFrame:
    """Benchmark decontamination by word-n-gram overlap (the GPT-3
    appendix-C procedure: a training document is contaminated when it
    shares any length-n word n-gram with an evaluation set; 13-grams in
    the paper, configurable here).

    Shape: the benchmark collapses to a DISTINCT n-gram set (no per-bench
    -doc identity survives), so the equi-join multiplicity is at most 1
    per document n-gram — linear in corpus n-grams, no fan-out even for
    stop-phrase n-grams, no cross product at any scale. One shuffle on
    the n-gram key.

    ``prefilter_m_bits``: the 100 TB lever. When the bench n-gram SET is
    too big to broadcast (~100 MB at 1e6 13-grams), the exact join must
    shuffle EVERY corpus n-gram. A Bloom filter of the bench grams at
    m = 10·n bits is ~100× smaller (sketches.bloom_build), so it always
    broadcasts; the prefilter is ``prefilter_k`` map-side broadcast
    word-joins + one bitmask test per doc gram (NO row inflation, no
    extra shuffle), and only surviving grams (true matches + ~1% false
    positives at m/n = 10) enter the exact join — shuffle volume drops by
    roughly the corpus contamination rate. Bloom filters have NO false
    negatives, so the result is bit-identical with or without the
    prefilter (the oracle entry runs WITH it against the unchanged exact
    SQL).

    Output: every input doc id with ``n_contaminated_ngrams`` and the
    ``contaminated`` flag (left join — clean docs report 0/false).
    """
    doc_grams = word_ngram_frame(docs, text_col, id_col, n).select(
        id_col, F.explode("__ngrams").alias("__g")
    )
    bench_grams = (
        word_ngram_frame(
            benchmark.withColumn("__bid__", F.monotonically_increasing_id()),
            bench_text_col, "__bid__", n,
        )
        .select(F.explode("__ngrams").alias("__g"))
        .distinct()
    )
    if prefilter_m_bits:
        from workbench_spark.operators.sketches import _A, _B, _P, bloom_build

        m = int(prefilter_m_bits)
        bloom = bloom_build(bench_grams, "__g", m_bits=m, k=prefilter_k)
        poly = (
            "aggregate(transform(sequence(1, length(__g), 1),"
            " i -> ascii(substring(__g, i, 1))),"
            " 0L, (a, ch) -> (a * 31 + ch) % 1000000007)"
        )
        g = doc_grams.withColumn("__p", F.expr(poly))
        checks = []
        for j in range(prefilter_k):
            g = g.withColumn(
                "__pos", ((F.col("__p") * _A[j] + _B[j]) % _P % m).cast("long")
            ).withColumn(f"__w{j}", (F.col("__pos") / 62).cast("int")).withColumn(
                f"__m{j}", F.expr("shiftleft(1L, cast(__pos % 62 as int))")
            ).drop("__pos")
            bj = bloom.select(
                F.col("word").alias(f"__w{j}"), F.col("bits").alias(f"__b{j}")
            )
            g = g.join(F.broadcast(bj), f"__w{j}", "left")
            checks.append(
                F.coalesce(F.col(f"__b{j}"), F.lit(0)).bitwiseAND(F.col(f"__m{j}"))
                == F.col(f"__m{j}")
            )
        keep = checks[0]
        for c in checks[1:]:
            keep = keep & c
        doc_grams = g.filter(keep).select(id_col, "__g")
    hits = (
        doc_grams.join(bench_grams, "__g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated_ngrams"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_contaminated_ngrams", F.lit(0)).alias("n_contaminated_ngrams"),
            (F.coalesce("n_contaminated_ngrams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def source_token_divergence(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-source token-distribution divergence from the corpus mixture:
    (source, n_tokens, n_types, kl_to_corpus, js_to_corpus) — the text
    twin of the numeric drift panel (operators/drift.js_divergence works
    on binned numeric histograms; this works on unigram distributions).
    Mixture diagnostics: a source with high KL/JS is the one whose
    up/down-weighting moves the corpus distribution most — the signal
    DoReMi-style reweighting and mixture audits read.

    Math: P = source unigram distribution, Q = corpus distribution
    (P's support ⊆ Q's, so KL(P||Q) is finite by construction).
    JS needs the tokens ABSENT from the source too; their total
    contribution has the closed form ½·ln2·(1 − Σ_{t∈source} q_t), so
    the whole panel is computable from the source-token join alone —
    no per-source scan of the full vocabulary, no outer join.

    Exactness: each summand (an irrational ln-product) is quantized to
    an integer picounat (floor(x·1e12 + 0.5)) BEFORE the SUM, so the
    shuffled sums are order-independent and the DuckDB oracle matches
    bit-for-bit; the absent-mass Σ q_t is summed as exact integer counts
    and divided once. Plan: one explode + one groupBy(source, token),
    then only (source)- and (token)-keyed aggregates/joins and a 1-row
    corpus-total broadcast cross — no windows."""
    from workbench_spark.operators.dedup import normalize_text

    toks = docs.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.filter(
                F.split(normalize_text(F.col(text_col)), " "),
                lambda t: F.length(t) > 0,
            )
        ).alias("token"),
    )
    st = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cnt"))
    corpus = st.groupBy("token").agg(F.sum("cnt").alias("ccnt"))
    stot = st.groupBy("source").agg(F.sum("cnt").alias("stot"))
    ctot = corpus.agg(F.sum("ccnt").alias("ctot"))
    j = (
        st.join(corpus, "token")
        .join(stot, "source")
        .join(F.broadcast(ctot))
    )
    p = F.col("cnt").cast("double") / F.col("stot")
    q = F.col("ccnt").cast("double") / F.col("ctot")
    m = (p + q) / 2
    quant = lambda x: F.floor(x * 1e12 + F.lit(0.5)).cast("long")  # noqa: E731
    agg = j.groupBy("source").agg(
        F.first("stot").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(quant(p * F.log(p / q))).alias("__kl_pico"),
        F.sum(quant(p * F.log(p / m) + q * F.log(q / m))).alias("__js_pico"),
        F.sum("ccnt").alias("__qmass_cnt"),
        F.first("ctot").alias("__ctot"),
    )
    ln2 = F.log(F.lit(2.0))
    js = (
        F.col("__js_pico") / 1e12
        + ln2 * (F.lit(1.0) - F.col("__qmass_cnt").cast("double") / F.col("__ctot"))
    ) / 2
    fr = lambda x: F.floor(x * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return agg.select(
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_types").cast("long").alias("n_types"),
        fr(F.col("__kl_pico") / 1e12).alias("kl_to_corpus"),
        fr(js).alias("js_to_corpus"),
    )


def mixture_weights(
    docs: DataFrame,
    target: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
    tokenizer=None,
) -> DataFrame:
    """Per-source sampling weights that reshape the corpus token
    distribution into a target mixture (the domain-reweighting step of
    training-data pipelines — e.g. the Pile / DoReMi-style fixed target
    mixtures). weight_s = target_frac_s / current_token_frac_s; sampling
    with these weights makes expected token counts match the target.

    One aggregation pass (token counts are a map-side regex count);
    sources absent from ``target`` get weight 0 (dropped domains), and a
    target source absent from the corpus is simply not emitted — check
    ``target_frac`` coverage downstream if that must be an error.

    ``tokenizer``: None (default) budgets whitespace tokens — the cheap
    scan. Pass a BPE merges table/list (operators/bpe.bpe_train output)
    to budget REAL tokenizer tokens instead, so the mixture accounting
    matches what the training run will actually consume (the counts flow
    through bpe_token_count's Arrow-batched encode).

    Output per source: n_docs, n_tokens, current_frac, target_frac,
    sampling_weight.
    """
    total = float(sum(target.values()))
    if total <= 0:
        raise ValueError("mixture_weights: target fractions must sum > 0")
    norm_target = {k: v / total for k, v in target.items()}
    if tokenizer is None:
        counted = docs.select(
            F.col(source_col), token_count(F.col(text_col)).alias("__tc")
        )
    else:
        from workbench_spark.operators.bpe import bpe_token_count

        counted = bpe_token_count(docs, tokenizer, text_col, "__tc").select(
            F.col(source_col), F.col("__tc")
        )
    per_source = counted.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__tc").alias("n_tokens"),
    )
    tgt = F.create_map(
        *[F.lit(x) for kv in norm_target.items() for x in kv]
    )
    grand = per_source.agg(F.sum("n_tokens").alias("__t"))
    return (
        per_source.crossJoin(F.broadcast(grand))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            (F.col("n_tokens") / F.col("__t")).alias("current_frac"),
            F.coalesce(tgt[F.col(source_col)], F.lit(0.0)).alias("target_frac"),
        )
        .withColumn(
            "sampling_weight",
            F.when(
                F.col("current_frac") > 0,
                F.col("target_frac") / F.col("current_frac"),
            ).otherwise(0.0),
        )
    )


def sample_to_mixture(
    docs: DataFrame,
    target: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 13,
    mode: str = "resample",
    tokenizer=None,
    weights: DataFrame | None = None,
) -> DataFrame:
    """MATERIALIZE the domain mixture that ``mixture_weights`` plans:
    emit the actual training rows, with every sampling decision a
    deterministic pure function of (seed, doc id) — reproducible across
    runs, partitionings, and engines (no rand(); the uniform draw is the
    engine-portable polynomial hash mod 1e6, so a DuckDB oracle replays
    the exact survivor set bit-for-bit).

    For each document with per-source sampling weight w:
      - ``mode='downsample'``: keep with p = min(1, w) — never repeats a
        document (the conservative setting when upsampling is unwanted).
      - ``mode='resample'`` (default): emit floor(w) full copies plus one
        more with probability frac(w) — expected copies = w exactly, so
        expected token counts hit the target mixture (the DoReMi-style
        epoch-repeat semantics for under-represented domains). Copies are
        distinguished by ``copy_idx`` (0-based).

    Plan shape: one broadcast join of the tiny per-source weight table,
    one codegen'd projection, and (resample only) an explode of
    sequence(0, n_copies-1) — no shuffle beyond the weight aggregation.
    Pass a precomputed ``weights`` frame (mixture_weights output) to
    reuse a persisted plan; ``tokenizer`` is forwarded otherwise."""
    if mode not in ("downsample", "resample"):
        raise ValueError(f"sample_to_mixture: unknown mode {mode!r}")
    w = (
        weights
        if weights is not None
        else mixture_weights(docs, target, source_col, text_col, tokenizer)
    )
    wt = F.broadcast(w.select(source_col, "sampling_weight"))
    joined = docs.join(wt, source_col)
    # deterministic uniform integer in [0, 1e6): portable polynomial hash
    # of "mix{seed}:{id}" through the nonlinear finalizer (consecutive ids
    # share a prefix, so RAW polynomial values are nearly consecutive —
    # the finalizer decorrelates them; see operators/dsir._MIX)
    from workbench_spark.operators.dsir import _MIX, _POLY

    with_u = (
        joined.withColumn(
            "__s", F.concat(F.lit(f"mix{seed}:"), F.col(id_col).cast("string"))
        )
        .withColumn("__p", F.expr(_POLY.format(c="__s")))
        .withColumn(
            "__u", (F.expr(_MIX.format(p="__p")) % F.lit(1000000)).cast("long")
        )
    )
    if mode == "downsample":
        p = F.least(F.lit(1.0), F.col("sampling_weight"))
        thr = F.floor(p * F.lit(1e6) + F.lit(0.5)).cast("long")
        return (
            with_u.filter(F.col("__u") < thr)
            .drop("__s", "__u", "sampling_weight")
        )
    base = F.floor(F.col("sampling_weight")).cast("int")
    frac = F.col("sampling_weight") - F.floor(F.col("sampling_weight"))
    thr = F.floor(frac * F.lit(1e6) + F.lit(0.5)).cast("long")
    n_copies = base + F.when(F.col("__u") < thr, F.lit(1)).otherwise(F.lit(0))
    return (
        with_u.withColumn("__n", n_copies)
        .filter(F.col("__n") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.col("__n") - 1)),
        )
        .drop("__s", "__u", "__n", "sampling_weight")
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Corpus vocabulary table — the curation-side stats behind stopword
    discovery, vocab pruning, and df_cap selection for the dedup inverted
    indexes: one row per normalized whitespace token with

    - ``doc_freq``  — documents containing the token (distinct),
    - ``term_freq`` — total occurrences across the corpus,
    - ``idf``       — ln(N / doc_freq), the classic inverse document
      frequency (N = corpus document count).

    Plan shape: explode(tokens) → ONE groupBy(token) computing both
    frequencies (count_distinct(doc) + count(*) in the same agg — no
    second shuffle), corpus size joined in as a broadcast 1-row aggregate.
    Linear in token count at any scale; the result is vocabulary-sized,
    the thing you'd write out as a reusable corpus artifact."""
    from workbench_spark.operators.dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    exploded = df.select(F.col(id_col).alias("__id"), F.explode(toks).alias("token"))
    stats = exploded.groupBy("token").agg(
        F.count_distinct("__id").alias("doc_freq"),
        F.count(F.lit(1)).alias("term_freq"),
    )
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    out = stats.crossJoin(F.broadcast(n_docs)).select(
        "token",
        "doc_freq",
        "term_freq",
        F.log(F.col("__n") / F.col("doc_freq")).alias("idf"),
    )
    if min_df > 1:
        out = out.filter(F.col("doc_freq") >= min_df)
    return out


#: the Gopher stop-word presence list (Rae et al. 2021, App. A1.1) —
#: a document must contain at least 2 of these to pass rule 7
GOPHER_STOP_WORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# A vocabulary row is (token string, count) — ~30 bytes serialized. 4M rows
# ≈ 120 MB broadcast, comfortably inside executor memory; above that the
# unigram joins fall back to shuffle-hash with AQE skew handling.
_UNIGRAM_BROADCAST_MAX_ROWS = 4_000_000


def code_quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Code-corpus quality filters (the BigCode/StarCoder "The Stack"
    heuristics — Kocetkov 2022 §3, Li 2023 appendix: source files are
    kept by LINE-SHAPE statistics, not NL quality scores): per document
    n_lines, max/avg line length, alphanumeric character fraction,
    comment-line fraction, long-line (>120 chars) fraction, an
    auto-generated marker flag, and the composite ``code_keep`` rule
    (max_line ≤ 1000 AND avg_line ≤ 100 AND alnum_frac ≥ 0.25 AND not
    autogenerated — the published Stack defaults).

    Beyond-reference operator: LLM training pipelines filter code and NL
    with different rules; this is the code-side twin of
    ``quality_features``/``gopher_quality_flags``.

    Plan shape: pure per-row projection — the lines array is projected to
    a column ONCE and every lambda references the element only (the
    nested-lambda/captured-expression codegen cliffs); no shuffles, scales
    linearly and stays in WholeStageCodegen at any corpus size."""
    lines = F.split(F.col(text_col), "\n")
    with_l = df.withColumn("__lines", lines)
    lens = F.transform(F.col("__lines"), lambda l: F.length(l))
    with_ll = with_l.withColumn("__lens", lens)
    n_lines = F.size(F.col("__lines"))
    n_chars = F.greatest(F.length(F.col(text_col)), F.lit(1))
    alnum = F.length(F.regexp_replace(F.col(text_col), r"[^A-Za-z0-9]", ""))
    comment_lines = F.size(
        F.filter(
            F.col("__lines"),
            lambda l: F.ltrim(l).rlike(r"^(#|//|--|/\*|\*|;)"),
        )
    )
    long_lines = F.size(F.filter(F.col("__lens"), lambda x: x > 120))
    max_line = F.coalesce(F.array_max(F.col("__lens")), F.lit(0))
    total_line_chars = F.aggregate(
        F.col("__lens"), F.lit(0), lambda acc, x: acc + x
    )
    autogen = F.lower(F.col(text_col)).rlike(
        r"(auto-? ?generated|generated by|do not edit)"
    )
    out = (
        with_ll.withColumn("n_lines", n_lines)
        .withColumn("max_line_len", max_line)
        .withColumn(
            "avg_line_len",
            _code_fround(total_line_chars / F.greatest(n_lines, F.lit(1))),
        )
        .withColumn("alnum_frac", _code_fround(alnum / n_chars))
        .withColumn(
            "comment_line_frac",
            _code_fround(comment_lines / F.greatest(n_lines, F.lit(1))),
        )
        .withColumn(
            "long_line_frac",
            _code_fround(long_lines / F.greatest(n_lines, F.lit(1))),
        )
        .withColumn("autogenerated", autogen)
    )
    keep = (
        (F.col("max_line_len") <= 1000)
        & (F.col("avg_line_len") <= 100)
        & (F.col("alnum_frac") >= 0.25)
        & ~F.col("autogenerated")
    )
    return out.withColumn("code_keep", keep).drop("__lines", "__lens")


def _code_fround(c, digits: int = 6):
    """floor(x·1e6+0.5)/1e6 — the engine-deterministic rounding both
    engines execute with the same IEEE op sequence (ratios after exact
    division can land on ROUND half-boundaries; see queries_pipeline
    _fround)."""
    s = float(10**digits)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def gopher_quality_flags(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher document-quality rules (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training Gopher",
    Appendix A1.1 — published thresholds, transcribed from the paper):

    1. 50 ≤ word count ≤ 100,000
    2. 3 ≤ mean word length ≤ 10
    3. symbol-to-word ratio ≤ 0.1 for '#' and for '...'
    4. < 90% of lines start with a bullet point
    5. < 30% of lines end with an ellipsis
    6. ≥ 80% of words contain at least one alphabetic character
    7. contains ≥ 2 of the 8 stop words {the, be, to, of, and, that,
       have, with}

    ``gopher_keep`` is the conjunction. Words are whitespace tokens; the
    bullet set [•*-] is the common reimplementation of the paper's
    "bullet point" (the paper doesn't enumerate glyphs). All JVM
    regex/array expressions over one projection — stop-word presence is
    8 unrolled array_contains (no nested lambdas, stays in codegen), no
    Python, no shuffle; linear scan at any corpus size."""
    t = F.col(text_col)
    toks = F.regexp_extract_all(t, F.lit(r"\S+"), 0)
    toks_l = F.regexp_extract_all(F.lower(t), F.lit(r"\S+"), 0)
    n_words = F.size(toks)
    sum_len = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
    # try_divide: a token-less/empty document must yield NULL ratios (ANSI
    # mode would otherwise raise DIVIDE_BY_ZERO), matching the oracle's
    # nullif(len(toks), 0) guards.
    mean_len = F.try_divide(sum_len, n_words)
    n_hash = F.regexp_count(t, F.lit("#"))
    n_ellipsis = F.regexp_count(t, F.lit(r"\.\.\."))
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    bullet_lines = F.size(F.filter(lines, lambda x: x.rlike(r"^\s*[•*-]")))
    ellipsis_lines = F.size(F.filter(lines, lambda x: x.rlike(r"\.\.\.\s*$")))
    alpha_words = F.size(F.filter(toks, lambda x: x.rlike("[A-Za-z]")))
    n_stop = None
    for w in GOPHER_STOP_WORDS:
        term = F.array_contains(toks_l, w).cast("int")
        n_stop = term if n_stop is None else n_stop + term
    out = (
        df.withColumn("n_words", n_words)
        .withColumn("mean_word_len", mean_len)
        .withColumn("hash_word_ratio", F.try_divide(n_hash, n_words))
        .withColumn("ellipsis_word_ratio", F.try_divide(n_ellipsis, n_words))
        .withColumn("bullet_line_frac", F.try_divide(bullet_lines, n_lines))
        .withColumn("ellipsis_line_frac", F.try_divide(ellipsis_lines, n_lines))
        .withColumn("alpha_word_frac", F.try_divide(alpha_words, n_words))
        .withColumn("n_stop_words", n_stop)
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("hash_word_ratio") <= 0.1)
        & (F.col("ellipsis_word_ratio") <= 0.1)
        & (F.col("bullet_line_frac") < 0.9)
        & (F.col("ellipsis_line_frac") < 0.3)
        & (F.col("alpha_word_frac") >= 0.8)
        & (F.col("n_stop_words") >= 2)
    )
    return out.withColumn("gopher_keep", keep)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the passage
    shape for context-window packing and retrieval indexing. Whitespace
    tokens; windows start every ``chunk_tokens - overlap`` tokens and a
    final short window is kept only when it adds new tokens (the standard
    sliding-window convention). Output: (id, chunk_id, chunk_text,
    n_tokens), chunk_id 0-based in document order.

    Plan shape: tokens projected once per row, window starts come from
    sequence() over the token count, slice()/array_join build each chunk
    — one explode, no shuffle at all until the caller aggregates; chunk
    count per doc is ceil((n-overlap)/stride), linear in corpus size."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
    with_t = df.select(
        F.col(id_col), toks.alias("__toks"), F.size(toks).alias("__n")
    ).filter(F.col("__n") > 0)
    # last window start = smallest stride multiple whose window reaches
    # the end (start + chunk_tokens >= n): ceil((n - chunk)/stride)*stride,
    # clamped at 0 — later windows would add no new tokens
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((F.col("__n") - chunk_tokens) / stride).cast("int"), F.lit(0)
        ) * stride,
        F.lit(stride),
    )
    exploded = with_t.select(
        F.col(id_col),
        "__toks",
        "__n",
        F.posexplode(starts).alias("chunk_id", "__start"),
    )
    chunk = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.least(F.col("__n") - F.col("__start"), F.lit(chunk_tokens)).alias("n_tokens"),
    )


def ngram_lm_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, int]:
    """Train the count tables of a corpus bigram language model:
    (unigrams (token, c1), bigrams (w1, w2, c2), total token count).
    One explode + two groupBys — the model IS the count tables, the
    persistable corpus artifact (write them out like the banded-minhash
    corpus artifact and reuse across batches)."""
    from workbench_spark.operators.dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    with_t = df.select(F.col(id_col), toks.alias("__toks"))
    uni = (
        with_t.select(F.explode("__toks").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    # adjacent pairs: zip the array with itself shifted by one — stays a
    # projection; the shuffle is only the count groupBy
    bi = (
        with_t.select(
            F.explode(
                F.zip_with(
                    F.slice("__toks", 1, F.greatest(F.size("__toks") - 1, F.lit(0))),
                    F.slice("__toks", 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    total = with_t.agg(F.sum(F.size("__toks"))).collect()[0][0] or 0
    return uni, bi, int(total)


def lm_score_documents(
    df: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    broadcast_unigrams: bool | None = None,
    exact: bool = False,
) -> DataFrame:
    """CCNet-style LM quality scoring with Stupid Backoff (Brants et al.
    2007, "Large Language Models in Machine Translation" — the published
    web-scale smoothing: S(w2|w1) = c(w1,w2)/c(w1) when the bigram was
    seen, else α·c(w2)/T, else α²/T for OOV; no normalization, which is
    what makes it a pure count-join at any scale). Output per document:
    n_scored (token transitions), mean_logscore (natural log), and
    pseudo_perplexity = exp(−mean_logscore) — the CCNet filtering key
    (low = fluent under the corpus model, high = noise).

    Plan shape: explode doc bigrams → equi-join the bigram and unigram
    count tables → one groupBy(doc). The two UNIGRAM joins are fan-out
    joins on raw tokens, so "the"/"of" rows are pathologically hot keys —
    rather than leave them to AQE skew splitting, the vocabulary table
    (which almost always fits: ~10s of MB even for web-scale corpora
    after normalization) is broadcast outright when it is measurably
    small (``broadcast_unigrams=None`` probes with a bounded
    limit-count; pass True/False to force). The BIGRAM table can be 10×
    the vocabulary and stays with Catalyst/AQE. Train on the corpus
    itself for self-perplexity (the CCNet setup trains on a reference
    corpus — pass any count tables).

    ``exact=True`` (oracle mode — r15 ROUND(SUM) audit conversion):
    mean_logscore is the quantized fold (ln terms to 1e-6 integer units,
    BIGINT sum, one division chain — the langid/unigram-fold convention)
    instead of float AVG over no-grid ln terms; pseudo_perplexity = exp
    of the identical deterministic mean. Scores are count ratios > 0, so
    ln is always finite here (alpha²/T floors the OOV branch)."""
    from workbench_spark.operators.dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    with_t = df.select(F.col(id_col), toks.alias("__toks")).filter(
        F.size("__toks") >= 2
    )
    pairs = with_t.select(
        F.col(id_col),
        F.explode(
            F.zip_with(
                F.slice("__toks", 1, F.greatest(F.size("__toks") - 1, F.lit(0))),
                F.slice("__toks", 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("p"),
    ).select(id_col, "p.w1", "p.w2")
    if broadcast_unigrams is None:
        # bounded probe: never a full count on a huge vocabulary
        _cap = _UNIGRAM_BROADCAST_MAX_ROWS
        broadcast_unigrams = uni.limit(_cap + 1).count() <= _cap
    uni_w1 = uni.select(F.col("token").alias("w1"), F.col("c1").alias("__c_w1"))
    uni_w2 = uni.select(F.col("token").alias("w2"), F.col("c1").alias("__c_w2"))
    if broadcast_unigrams:
        uni_w1, uni_w2 = F.broadcast(uni_w1), F.broadcast(uni_w2)
    joined = (
        pairs.join(bi, ["w1", "w2"], "left")
        .join(uni_w1, "w1", "left")
        .join(uni_w2, "w2", "left")
    )
    score = (
        F.when(
            F.col("c2").isNotNull(),
            F.col("c2").cast("double") / F.col("__c_w1"),
        )
        .when(
            F.col("__c_w2").isNotNull(),
            F.lit(alpha) * F.col("__c_w2").cast("double") / F.lit(float(total_tokens)),
        )
        .otherwise(F.lit(alpha * alpha / float(total_tokens)))
    )
    if exact:
        qln = F.floor(F.log(score) * F.lit(1e6) + F.lit(0.5)).cast("long")
        mean = F.sum(qln).cast("double") / F.count(F.lit(1)) / F.lit(1e6)
    else:
        mean = F.avg(F.log(score))
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_scored"),
            mean.alias("mean_logscore"),
        )
        .withColumn("pseudo_perplexity", F.exp(-F.col("mean_logscore")))
    )


def dedup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 8,
    unit: str = "words",
    chunk_sents: int = 3,
) -> DataFrame:
    """Cross-document span REMOVAL — the surgery half of the C4 span-dedup
    rule (Raffel 2020 deduplicates three-sentence spans corpus-wide;
    chunk_dedup_stats reports the census, this operator performs the
    removal at the same chunk granularity): every repeated span keeps
    exactly its FIRST occurrence in (doc_id, position) order, later
    occurrences are cut, and each document's text is reconstructed from
    its surviving spans in order. Output: (id, text_deduped, n_spans,
    n_kept) — one row per input document, empty string when everything
    was cut.

    Plan shape: one posexplode (linear), one groupBy over the span hash
    computing min(struct(doc_id, pos)) — a partial-aggregable (map-side
    combinable) reduction, so boilerplate spans whose duplication cluster
    is corpus-sized (cookie banners, license headers: precisely the
    spans this rule targets) combine locally instead of forcing a
    single-task per-key sort — then one equi-join of the one-row-per-hash
    firsts back onto the exploded spans, and one groupBy(doc) rebuilding
    the text via array_sort over (pos, span) structs. The shuffle keys
    are the span hash and the doc id — equi-shaped, no pairs, no window,
    constant memory per key regardless of duplication level.

    ``unit='words'`` (default): spans are consecutive ``chunk_words``-word
    windows. ``unit='sentences'``: spans are consecutive ``chunk_sents``
    SENTENCES — the paper's literal three-sentence granularity. Sentence
    boundaries = terminal punctuation [.!?] followed by a space, marked
    via a replacement byte then split (RE2 has no lookbehind, so the
    marker trick keeps the oracle in the Java∩RE2 regex subset); joining
    surviving spans with ' ' restores the boundary space exactly."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    if unit == "words":
        units = F.split(norm, " ")
        g = chunk_words
    elif unit == "sentences":
        units = F.filter(
            F.split(F.regexp_replace(norm, r"([.!?]) ", "$1\x01"), "\x01"),
            lambda s: F.length(s) > 0,
        )
        g = chunk_sents
    else:
        raise ValueError(f"unit must be 'words' or 'sentences', got {unit!r}")
    chunks = F.expr(
        f"CASE WHEN size(__w) > 0 THEN "
        f"transform(sequence(0, (size(__w) - 1) div {g}), "
        f"i -> concat_ws(' ', slice(__w, i * {g} + 1, {g}))) "
        f"ELSE array() END"
    )
    exploded = (
        df.withColumn("__w", units)
        .withColumn("__c", chunks)
        .select(F.col(id_col), F.posexplode("__c").alias("pos", "span"))
        .withColumn("__h", F.md5(F.col("span")))
    )
    firsts = exploded.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col).alias("fid"), F.col("pos").alias("fpos"))).alias(
            "__first"
        )
    )
    marked = exploded.join(firsts, "__h").withColumn(
        "__keep",
        (F.col("__first.fid") == F.col(id_col)) & (F.col("__first.fpos") == F.col("pos")),
    )
    rebuilt = (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.col("__keep").cast("long")).alias("n_kept"),
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list(CASE WHEN __keep "
                    "THEN struct(pos, span) END)), s -> s.span)"
                ),
            ).alias("text_deduped"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def dedup_exact_substrings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_length: int = 50,
) -> DataFrame:
    """Exact-substring deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", ExactSubstr) — bounded-
    length variant: any ``min_length``-token window that occurs more than
    once corpus-wide keeps exactly its FIRST occurrence in (doc, position)
    order; every later occurrence's L tokens are cut from their document,
    and overlapping cuts merge into one removal span (so a duplicated
    region of any length ≥ L is excised wholesale, exactly like the
    paper's suffix-array spans, for duplicates ≥ L tokens). Documents are
    rebuilt from the surviving token ranges. The paper's default is 50
    tokens; the suffix-array generalization to unbounded-length duplicate
    detection is what this variant bounds.

    Plan shape (the dedup_spans firsts machinery over stride-1 windows):
    one posexplode of the L-gram hashes (linear ×1 in corpus tokens), one
    groupBy over the window hash computing min(struct(doc, pos)) — partial-
    aggregable, so corpus-sized duplication clusters combine map-side — one
    equi-join marking non-first windows, then one groupBy(doc) that sorts
    the duplicate window starts and does the interval arithmetic (merge
    removal intervals → complement → slice-and-concat the token array)
    entirely in per-row higher-order functions: no range join, no window
    function, no per-token rescan of the starts list.

    Output: (id, text_deduped, n_tokens, n_removed) — one row per input
    document; n_removed counts excised tokens."""
    L = int(min_length)
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    base = df.select(F.col(id_col), F.split(norm, " ").alias("__w"))
    grams = base.withColumn(
        "__g",
        F.expr(
            f"CASE WHEN size(__w) >= {L} THEN "
            f"transform(sequence(0, size(__w) - {L}), "
            f"i -> md5(concat_ws(' ', slice(__w, i + 1, {L})))) "
            f"ELSE cast(array() as array<string>) END"
        ),
    )
    exploded = grams.select(
        F.col(id_col), F.posexplode("__g").alias("pos", "__h")
    )
    firsts = exploded.groupBy("__h").agg(
        F.min(F.struct(F.col(id_col).alias("fid"), F.col("pos").alias("fpos"))).alias(
            "__first"
        )
    )
    dup_starts = (
        exploded.join(firsts, "__h")
        .filter(
            (F.col("__first.fid") != F.col(id_col))
            | (F.col("__first.fpos") != F.col("pos"))
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("pos")).alias("__ds"))
    )
    joined = base.join(dup_starts, id_col, "left").withColumn(
        "__ds", F.coalesce(F.col("__ds"), F.expr("cast(array() as array<int>)"))
    )
    # merge sorted removal starts into disjoint [s, e) intervals: starts are
    # ascending, so interval i overlaps/touches the running last interval
    # iff start <= last.e — then the merged end is simply start + L
    merged = (
        f"aggregate(__ds, cast(array() as array<struct<s:int,e:int>>), "
        f"(acc, p) -> CASE WHEN size(acc) > 0 AND p <= element_at(acc, -1).e "
        f"THEN concat(slice(acc, 1, size(acc) - 1), "
        f"array(named_struct('s', element_at(acc, -1).s, 'e', p + {L}))) "
        f"ELSE concat(acc, array(named_struct('s', p, 'e', p + {L}))) END)"
    )
    out = joined.withColumn("__m", F.expr(merged))
    # complement within [0, size(__w)): kept ranges interleave the removals
    out = (
        out.withColumn("__n", F.size("__w"))
        .withColumn(
            "__kept",
            F.expr(
                "filter(zip_with("
                "concat(array(0), transform(__m, x -> x.e)), "
                "concat(transform(__m, x -> x.s), array(__n)), "
                "(s, e) -> named_struct('s', s, 'e', e)), x -> x.e > x.s)"
            ),
        )
        .withColumn(
            "text_deduped",
            F.expr(
                "concat_ws(' ', flatten(transform(__kept, "
                "x -> slice(__w, x.s + 1, x.e - x.s))))"
            ),
        )
        .withColumn(
            "n_removed",
            F.expr("aggregate(__m, 0, (a, x) -> a + x.e - x.s)").cast("long"),
        )
    )
    return out.select(
        id_col,
        "text_deduped",
        F.col("__n").cast("long").alias("n_tokens"),
        "n_removed",
    )


def tfidf_vectors(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    min_df: int = 1,
    vocab: DataFrame | None = None,
    exact: bool = False,
) -> DataFrame:
    """Hashed TF-IDF document vectors — the text→ANN bridge when no
    external embedding model is available: vector[b] = Σ tf(t)·idf(t)
    over tokens hashing to bucket b (the classic hashing-trick bag-of-
    words embedding). The output (id, vec array<double>) feeds every ANN
    operator in operators/similarity.py (cosine/LSH/IVF/PQ) directly.

    The bucket hash is the ENGINE-PORTABLE polynomial family from
    simhash_portable (base 31 mod 1e9+7 over code points), so DuckDB can
    recompute identical vectors — the whole pipeline is value-oracled.

    Plan shape: explode(tokens) → groupBy(id, token) term counts → join
    the vocabulary-sized idf table (vocabulary() artifact; pass a
    persisted one via ``vocab=``) → ONE groupBy(id) with map-collect →
    dense array projection. Linear in token count; documents with no
    surviving tokens get the zero vector.

    ``exact=True`` (oracle mode — the r15 ROUND(SUM) audit conversion):
    each tf·idf weight is quantized to 1e-6 integer units
    (floor(w·1e6+0.5), identical doubles floor identically on both
    engines) and the per-bucket sums run over BIGINTs — order-invariant
    under any partitioning, where the float SUM(w) over transcendental
    idf terms had no value grid and could land within accumulation
    jitter of a rounding boundary. Elements come back as S/1e6 doubles.
    Production default stays the float sum (one fewer projection; the
    1e-6 quantization is not wanted in a production embedding)."""
    from workbench_spark.operators.dedup import normalize_text

    v = vocab if vocab is not None else vocabulary(df, text_col, id_col, min_df)
    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("__tf"))
    )
    joined = tf.join(v.select("token", "idf"), "token")
    poly = (
        "aggregate(transform(sequence(1, length(token)),"
        " i -> ascii(substring(token, i, 1))),"
        " 0L, (a, c) -> (a * 31 + c) % 1000000007)"
    )
    w = F.col("__tf") * F.col("idf")
    if exact:
        w = F.floor(w * F.lit(1e6) + F.lit(0.5)).cast("long")
    weighted = joined.select(
        F.col(id_col),
        (F.expr(poly) % dim).cast("int").alias("__b"),
        w.alias("__w"),
    )
    elem = (
        "coalesce(element_at(__m, i), 0L) / 1e6" if exact
        else "coalesce(element_at(__m, i), 0.0D)"
    )
    dense = (
        weighted.groupBy(id_col, "__b")
        .agg(F.sum("__w").alias("__w"))
        .groupBy(id_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("__b"), F.col("__w")))
            ).alias("__m")
        )
        .select(
            F.col(id_col),
            F.expr(
                f"transform(sequence(0, {dim - 1}), i -> {elem})"
            ).alias("vec"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(dense, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("vec"), F.expr(f"array_repeat(0.0D, {dim})")).alias("vec"),
        )
    )


# BPE tokenizer training/encoding lives in operators/bpe.py; re-exported
# here because it is part of the text-operator surface (token accounting
# for packing/mixture_weights runs on real BPE counts via these).
from workbench_spark.operators.bpe import (  # noqa: E402,F401
    bpe_token_count,
    bpe_tokenize,
    bpe_train,
)


def bm25_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    champion_m: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the BM25 retrieval artifacts: postings (token, id, tf, dl)
    and token stats (token, df, idf) with the Robertson/Sparck-Jones
    positive idf = ln(1 + (N − df + 0.5)/(df + 0.5)). Two groupBys over
    one explode; both outputs are persistable (the inverted index and its
    vocabulary), and scoring against them is a token equi-join —
    retrieval cost at 100 TB is bounded by posting-list sizes, never a
    corpus scan.

    ``champion_m`` (r12, scale valve): keep only each term's top-M
    postings by (tf DESC, id) — classic champion lists (Manning IR §7.1.3).
    Motivation, measured in the r12 sf1 scale smoke: on a corpus whose
    vocabulary is tiny relative to N (the driver's 31-word documents),
    every posting list is ~N and query×postings trends N²/|vocab| — the
    bm25 entry's sf0.1→sf1 exponent was 1.28. Champion lists bound the
    per-term join fan-out at M while keeping the per-term HIGHEST-tf docs,
    the standard approximate top-k retrieval trade (exact for any query
    whose true top-k all sit in their terms' champion lists — guaranteed
    when k ≤ M and scores are tf-dominated). df/idf are computed over the
    FULL postings before the cut, so term statistics stay exact (bm25_
    search's avgdl is computed from the surviving postings — unchanged at
    M ≥ typical df, slightly shifted under aggressive cuts: part of the
    approximation). Default None = exact retrieval (the oracle-grade
    entry)."""
    from workbench_spark.operators.dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    base = docs.select(F.col(id_col).alias("id"), toks.alias("__toks"))
    postings = (
        base.select("id", F.size("__toks").alias("dl"), F.explode("__toks").alias("token"))
        .groupBy("token", "id", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
        # materialize once (r15 opt): postings feed THREE consumers in
        # bm25_search (stats, avgdl, the scoring join) and Spark reuses
        # no subtrees across them, so the tokenize+explode+groupBy
        # pipeline executed 3× per query; lazy localCheckpoint = the
        # multi-consumed shuffle-bearing-frame shape (CLAUDE.md). The
        # index is the persistable artifact anyway — materializing is
        # its intended life cycle.
        .localCheckpoint(eager=False)
    )
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("__n"))
    stats = (
        postings.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "token",
            "df",
            F.log(
                F.lit(1.0)
                + (F.col("__n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
            ).alias("idf"),
        )
    )
    if champion_m is not None:
        from pyspark.sql import Window

        wch = Window.partitionBy("token").orderBy(
            F.col("tf").desc(), F.col("id").asc()
        )
        postings = (
            postings.withColumn("__ch", F.row_number().over(wch))
            .filter(F.col("__ch") <= champion_m)
            .drop("__ch")
        )
    return postings, stats


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query",
    qid_col: str = "query_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """BM25 top-k retrieval (Robertson & Zaragoza 2009) — the no-model
    search bridge for curation workflows (find near-matches of a
    benchmark prompt, pull topical slices, audit dedup misses):

        score(q, d) = Σ_{t ∈ q∩d} idf(t) · tf·(k1+1) /
                                   (tf + k1·(1 − b + b·dl/avgdl))

    Query tokens are DEDUPED per query (set semantics — repeated words
    in a query don't double-count; the classic Okapi formulation).

    Plan: query tokens ⋈ postings on token (inverted-index equi-join —
    candidates bounded by posting lists), one groupBy(query, doc) sum,
    row_number top-k per query with (rounded score desc, id) determinism.
    avgdl rides along as a 1-row broadcast cross. Pass ``index=`` to
    reuse persisted bm25_index artifacts."""
    from pyspark.sql import Window

    from workbench_spark.operators.dedup import normalize_text

    postings, stats = index if index is not None else bm25_index(docs, text_col, id_col)
    avgdl = postings.select("id", "dl").distinct().agg(
        F.avg("dl").alias("__avgdl")
    )
    qtoks = F.filter(
        F.split(normalize_text(F.col(query_col)), " "), lambda t: F.length(t) > 0
    )
    qt = (
        queries.select(F.col(qid_col).alias("qid"), F.explode(qtoks).alias("token"))
        .distinct()
    )
    scored = (
        qt.join(postings, "token")
        .join(F.broadcast(stats.select("token", "idf")), "token")
        .crossJoin(F.broadcast(avgdl))
        .select(
            "qid",
            "id",
            (
                F.col("idf")
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("__avgdl"))
                )
            ).alias("__s"),
        )
        .groupBy("qid", "id")
        .agg(F.sum("__s").alias("score"))
    )
    rounded = scored.withColumn(
        "__r", F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    )
    w = Window.partitionBy("qid").orderBy(F.col("__r").desc(), F.col("id").asc())
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(qid_col),
            F.col("id").alias(id_col),
            F.col("rank"),
            F.col("__r").alias("score"),
        )
    )


def corpus_zipf_stats(
    df: DataFrame,
    text_col: str = "text",
    top_v: int = 1000,
) -> DataFrame:
    """Corpus token-frequency audit: Zipf's-law fit + Heaps ratio — the
    standard sanity panel for a training corpus (natural text shows a
    rank-frequency log-log slope near −1; a slope far off flags synthetic,
    boilerplate-heavy, or truncated data; the distinct/total token ratio
    is the Heaps'-law point estimate).

    One row: (n_tokens, n_distinct, top_v_used, zipf_slope, zipf_intercept)
    with the slope/intercept from an exact least-squares fit of
    ln(freq) ~ ln(rank) over the top ``top_v`` tokens (rank by freq DESC,
    token ASC — deterministic).

    Determinism/oracle contract: every per-term value (ln rank, ln freq,
    products) is quantized to integer micro-units BEFORE summation, so the
    OLS sums are commutative BIGINT folds — identical in any engine and
    partitioning (the micro-nat pattern; float Σ would be accumulation-
    order-dependent and never hash-match).

    Scale: the corpus pass is one explode → map-side-combinable groupBy;
    the fit touches only the top_v rows (orderBy+limit = distributed
    TakeOrdered, never a global window over the full vocabulary)."""
    from workbench_spark.operators.dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    words = df.select(F.explode(toks).alias("token"))
    freqs = words.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    totals = freqs.agg(
        F.sum("freq").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
    )
    top = freqs.orderBy(F.desc("freq"), F.asc("token")).limit(top_v)
    from pyspark.sql import Window

    # rank window runs over <= top_v rows (bounded by construction)
    ranked = top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("freq"), F.asc("token"))),
    )
    q = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")
    terms = ranked.select(
        q(F.log(F.col("rank").cast("double"))).alias("x"),
        q(F.log(F.col("freq").cast("double"))).alias("y"),
        q(
            F.log(F.col("rank").cast("double"))
            * F.log(F.col("freq").cast("double"))
        ).alias("xy"),
        q(
            F.log(F.col("rank").cast("double"))
            * F.log(F.col("rank").cast("double"))
        ).alias("xx"),
    )
    sums = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum("xy").alias("sxy"),
        F.sum("xx").alias("sxx"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double") / 1e6
    sy = F.col("sy").cast("double") / 1e6
    sxy = F.col("sxy").cast("double") / 1e6
    sxx = F.col("sxx").cast("double") / 1e6
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    fr = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    fitted = sums.select(
        F.col("n").alias("top_v_used"),
        fr(slope).alias("zipf_slope"),
        fr(intercept).alias("zipf_intercept"),
    )
    return totals.crossJoin(F.broadcast(fitted)).select(
        "n_tokens", "n_distinct", "top_v_used", "zipf_slope", "zipf_intercept"
    )


def corpus_datasheet(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source corpus datasheet — the dataset-card table every corpus
    release ships (docs, tokens, exact-dup factor, length profile):
    (source, n_docs, n_distinct_contents, n_tokens, mean_doc_chars,
    median_doc_tokens, dup_factor). ONE aggregation pass over a map-side
    projection (md5 + token count per row, then groupBy source);
    approx_count_distinct is deliberately NOT used — the distinct-content
    count is an exact COUNT(DISTINCT md5) so dup_factor is exact.

    median_doc_tokens uses exact ``percentile`` (linear interpolation —
    the DuckDB quantile_cont contract); swap to percentile_approx at the
    100 TB tier if the per-source doc counts make exact percentiles heavy
    (they rarely do: state is per-source, not corpus-wide)."""
    from workbench_spark.operators.dedup import normalize_text

    rows = df.select(
        F.col(source_col).alias("source"),
        F.md5(normalize_text(F.col(text_col))).alias("__h"),
        token_count(F.col(text_col)).cast("long").alias("__nt"),
        F.length(F.col(text_col)).cast("long").alias("__nc"),
    )
    fr = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        rows.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("__h").alias("n_distinct_contents"),
            F.sum("__nt").alias("n_tokens"),
            fr(F.avg("__nc")).alias("mean_doc_chars"),
            F.expr("percentile(CAST(__nt AS DOUBLE), 0.5)").alias("median_doc_tokens"),
            fr(
                F.count(F.lit(1)).cast("double")
                / F.countDistinct("__h").cast("double")
            ).alias("dup_factor"),
        )
        .orderBy("source")
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Corpus collocation extraction: top-k adjacent word pairs by
    pointwise mutual information PMI(x,y) = ln(c_xy·N / (c_x·c_y)) over
    pairs with c_xy ≥ min_count (the classic Church & Hanks 1990
    association measure — multiword-expression mining, tokenizer-merge
    candidates, domain-vocabulary audits).

    Output: (w1, w2, pair_count, pmi), ordered (pmi DESC, w1, w2) —
    deterministic because PMI is computed per row from exact integer
    counts (identical doubles in any engine; no cross-row float sums).

    Plan: one explode → bigram/unigram count groupBys (map-side
    combinable), two token equi-joins of the bigram table against the
    unigram counts, a 1-row total broadcast, TakeOrdered top-k. The
    min_count filter prunes BEFORE the joins — the joined stream is the
    frequent-pair table, not the corpus."""
    from workbench_spark.operators.dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    with_t = df.select(toks.alias("__toks"))
    bigrams = with_t.select(
        F.explode(
            F.zip_with(
                F.slice("__toks", 1, F.greatest(F.size("__toks") - 1, F.lit(0))),
                F.slice("__toks", 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    uni = (
        with_t.select(F.explode("__toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    pairs = (
        bigrams.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .filter(F.col("pair_count") >= min_count)
    )
    total = bigrams.agg(F.count(F.lit(1)).alias("__n"))
    fr = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    scored = (
        pairs.join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2")), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "pair_count",
            fr(
                F.log(
                    F.col("pair_count").cast("double")
                    * F.col("__n").cast("double")
                    / (F.col("c1").cast("double") * F.col("c2").cast("double"))
                )
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2")).limit(k)


def distinctive_terms(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    alpha: float = 0.01,
    min_count: int = 5,
) -> DataFrame:
    """Per-source distinctive vocabulary: top-k terms per source by the
    Monroe/Colaresi/Quinn 2008 Dirichlet-smoothed log-odds z-score
    ("Fightin' Words") against the rest of the corpus — the standard
    "what distinguishes this source" audit for mixture design and
    source-tagging QA.

        delta_w = ln((y_sw+a)/(n_s+A-y_sw-a)) - ln((y_w'+a)/(n'+A-y_w'-a))
        z_w     = delta_w / sqrt(1/(y_sw+a) + 1/(y_w'+a))

    with y_w' the REST-of-corpus count, a = alpha, A = alpha·|vocab|.

    Output: (source, term, term_count, z_score), rank by (z DESC, term)
    — deterministic (per-row doubles from exact integer counts).

    Scale: explode → one (source, term) groupBy; vocab totals joined back
    on term (equi-join); the per-source ranking window runs over terms
    with count ≥ min_count ONLY (the filter precedes the window), so a
    web-scale tail vocabulary never enters the sort."""
    from pyspark.sql import Window

    from workbench_spark.operators.dedup import normalize_text

    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    words = df.select(
        F.col(source_col).alias("source"), F.explode(toks).alias("term")
    )
    by_src = words.groupBy("source", "term").agg(F.count(F.lit(1)).alias("ysw"))
    vocab = by_src.groupBy("term").agg(F.sum("ysw").alias("yw"))
    n_src = by_src.groupBy("source").agg(F.sum("ysw").alias("ns"))
    totals = vocab.agg(
        F.sum("yw").alias("n_all"), F.count(F.lit(1)).alias("v")
    )
    a = float(alpha)
    fr = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    joined = (
        by_src.filter(F.col("ysw") >= min_count)
        .join(vocab, "term")
        .join(F.broadcast(n_src), "source")
        .crossJoin(F.broadcast(totals))
        .select(
            "source",
            "term",
            "ysw",
            (F.col("yw") - F.col("ysw")).alias("yrest"),
            (F.col("n_all") - F.col("ns")).alias("nrest"),
            "ns",
            (F.col("v").cast("double") * F.lit(a)).alias("A"),
        )
    )
    lo = lambda y, n: F.log(
        (y.cast("double") + F.lit(a))
        / (n.cast("double") + F.col("A") - y.cast("double") - F.lit(a))
    )
    delta = lo(F.col("ysw"), F.col("ns")) - lo(F.col("yrest"), F.col("nrest"))
    var = (
        F.lit(1.0) / (F.col("ysw").cast("double") + F.lit(a))
        + F.lit(1.0) / (F.col("yrest").cast("double") + F.lit(a))
    )
    scored = joined.select(
        "source",
        "term",
        F.col("ysw").alias("term_count"),
        fr(delta / F.sqrt(var)).alias("z_score"),
    )
    w = Window.partitionBy("source").orderBy(F.desc("z_score"), F.asc("term"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
        .orderBy("source", F.desc("z_score"), "term")
    )


def ngram_novelty(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    n: int = 2,
) -> DataFrame:
    """Corpus-level n-gram novelty per source: distinct/total word-n-gram
    ratio — low novelty = templated/self-repetitive source (the corpus-
    wide complement of the per-document Gopher repetition rules). Output:
    (source, n_ngrams, n_distinct_ngrams, novelty_frac), source ascending.

    One explode over adjacent n-grams (zip_with slices — the PMI/bigram
    idiom), one groupBy(source) with exact COUNT(DISTINCT) — the novelty
    number must be exact to compare across rounds/sources; swap to
    approx_count_distinct at the 100 TB tier if per-source exactness ever
    dominates (the groupBy is per-source, so state is bounded by the
    per-source vocabulary)."""
    from workbench_spark.operators.dedup import normalize_text

    if n != 2:
        raise NotImplementedError("word bigrams only (n=2) — the corpus signal")
    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "), lambda t: F.length(t) > 0
    )
    with_t = df.select(F.col(source_col).alias("source"), toks.alias("__toks"))
    grams = with_t.select(
        "source",
        F.explode(
            F.zip_with(
                F.slice("__toks", 1, F.greatest(F.size("__toks") - 1, F.lit(0))),
                F.slice("__toks", 2, F.greatest(F.size("__toks") - 1, F.lit(0))),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("g"),
    )
    fr = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        grams.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.countDistinct("g").alias("n_distinct_ngrams"),
        )
        .select(
            "source",
            "n_ngrams",
            "n_distinct_ngrams",
            fr(
                F.col("n_distinct_ngrams").cast("double")
                / F.greatest(F.col("n_ngrams"), F.lit(1)).cast("double")
            ).alias("novelty_frac"),
        )
        .orderBy("source")
    )
