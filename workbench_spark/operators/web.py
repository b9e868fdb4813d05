"""Web-corpus URL curation — normalization, domain extraction, URL-keyed
dedup, and per-domain caps. The URL-level half of a CommonCrawl-style
pipeline (the text-level half lives in operators/text.py): crawl corpora
carry the same page under many URL spellings (tracking params, fragments,
default ports, trailing slashes), and a handful of hot domains can
dominate the mixture unless capped.

All transformations are JVM regex/array expressions over one projection —
no UDFs, no shuffle until the dedup/cap aggregations, which are
equi-shaped on the normalized key. The normalization rules are the
common-denominator canonicalization (RFC 3986 §6 syntax-based
normalization + the de-facto tracking-param strip list); the DuckDB
oracles replay the identical regex pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# de-facto standard tracking parameters (Google/Facebook/Microsoft click
# ids + utm campaign tags); matched against the `name=` prefix
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|mc_eid|igshid|ref)(=|$)"


def normalize_url(col) -> "F.Column":
    """Syntax-based URL canonicalization as one codegen'd expression:

    1. trim + strip the fragment (``#...`` never reaches the server)
    2. lowercase the scheme and authority (host), NOT the path/query
       (those are case-sensitive per RFC 3986)
    3. drop default ports (``:80`` for http, ``:443`` for https)
    4. drop tracking query parameters (TRACKING_PARAM_RE), SORT the
       survivors (param order is not semantic), rebuild the query string
    5. strip one trailing slash from the path

    Returns NULL for NULL input; non-URL strings pass through mostly
    unchanged (regexes simply fail to match)."""
    u = F.regexp_replace(F.trim(col), r"#.*$", "")
    base = F.regexp_extract(u, r"^([^?]*)", 1)
    query = F.regexp_extract(u, r"\?(.*)$", 1)
    # lowercase scheme://host, keep the rest
    head = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    tail = F.when(head != "", F.substring(base, F.length(head) + 1, 1_000_000)).otherwise(base)
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(http://[^/:]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/:]*):443$", r"$1")
    tail = F.regexp_replace(tail, r"/$", "")
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qs = F.concat_ws("&", kept)
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat(
            head,
            tail,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        )
    )


def extract_domain(col, registrable: bool = False) -> "F.Column":
    """Hostname of a URL (lowercased, port stripped). ``registrable=True``
    approximates the registrable domain as the last two dot-labels
    (``a.b.example.co.uk`` → ``co.uk`` — WRONG for multi-label public
    suffixes; the real fix is the Public Suffix List, which is data, not
    code — load it and join if the corpus needs it. Honest heuristic,
    documented, matching the reference-free common practice)."""
    host = F.lower(
        F.regexp_extract(F.trim(col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)", 1)
    )
    if not registrable:
        return host
    return F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)


def url_dedup(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Exact dedup on the NORMALIZED URL: one keeper per canonical URL —
    highest ``quality_col`` (ties → smallest id), or smallest id when no
    quality is given. Output: every input row + (norm_url, keep).

    Plan shape: normalization is map-side; the winner per URL is ONE
    partial-aggregable max(struct(quality, -id)) + an equi-join back —
    the dedup_spans/cluster_representatives pattern, no window, so the
    hottest URL (a crawl can hit one canonical URL millions of times)
    costs constant memory per key."""
    q = (
        F.col(quality_col).cast("double")
        if quality_col
        else F.lit(0.0)
    )
    base = df.withColumn("norm_url", normalize_url(F.col(url_col))).withColumn(
        "__q", q
    )
    winners = base.filter(F.col("norm_url").isNotNull()).groupBy("norm_url").agg(
        F.max(
            F.struct(F.col("__q").alias("q"), (-F.col(id_col)).alias("nid"))
        ).alias("__w")
    ).select("norm_url", (-F.col("__w.nid")).alias("__win_id"))
    return (
        base.join(winners, "norm_url", "left")
        # a document with no URL cannot be URL-deduped — it keeps itself
        .withColumn(
            "keep",
            F.when(F.col("norm_url").isNull(), F.lit(True)).otherwise(
                F.col(id_col) == F.col("__win_id")
            ),
        )
        .drop("__q", "__win_id")
    )


def domain_cap(
    df: DataFrame,
    url_col: str = "url",
    cap: int = 1000,
    quality_col: str | None = None,
    id_col: str = "doc_id",
    exact: bool = True,
) -> DataFrame:
    """Per-domain document cap — keep at most ``cap`` documents per
    domain, preferring high ``quality_col`` (ties → smallest id). The
    standard mixture-control step: without it a handful of boilerplate
    mills dominate the corpus.

    exact=True (oracle/test path): row_number over the domain partition —
    exact, but a hot domain is one sort partition (the documented
    exact-path trade, same convention as ntile_buckets).
    exact=False (the 100 TB path): domains over the cap get a per-domain
    quality THRESHOLD from an approximate quantile sketch and keep rows
    strictly above it, admitting boundary ties — ≈cap kept per domain
    (sketch error + ties), every aggregation partial, no per-key sort.

    Output: every input row + (domain, keep)."""
    from pyspark.sql import Window

    q = F.col(quality_col).cast("double") if quality_col else -F.col(id_col).cast("double")
    base = df.withColumn("domain", extract_domain(F.col(url_col))).withColumn("__q", q)
    if exact:
        w = Window.partitionBy("domain").orderBy(
            F.col("__q").desc(), F.col(id_col).asc()
        )
        return (
            base.withColumn("__rn", F.row_number().over(w))
            .withColumn("keep", F.col("__rn") <= cap)
            .drop("__rn", "__q")
        )
    # percentile_approx takes a FOLDABLE percentage, but the needed
    # quantile (1 - cap/n) differs per domain — so sketch a fixed
    # 1000-point quantile grid per domain and index it with the
    # group-dependent position (still one partial-aggregable agg)
    grid = 1000
    probs = F.array(*[F.lit(i / grid) for i in range(1, grid)])
    counts = base.groupBy("domain").agg(
        F.count(F.lit(1)).alias("__n"),
        F.percentile_approx("__q", probs, F.lit(10_000)).alias("__qs"),
    ).withColumn(
        "__thresh",
        F.element_at(
            "__qs",
            F.least(
                F.greatest(
                    F.ceil((F.lit(1.0) - F.lit(float(cap)) / F.col("__n")) * grid)
                    .cast("int"),
                    F.lit(1),
                ),
                F.lit(grid - 1),
            ),
        ),
    ).drop("__qs")
    return (
        base.join(counts, "domain")
        .withColumn(
            "keep",
            (F.col("__n") <= cap) | (F.col("__q") >= F.col("__thresh")),
        )
        .drop("__n", "__thresh", "__q")
    )


def url_dedup_incremental(
    new_df: DataFrame,
    corpus_urls: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
    corpus_is_normalized: bool = False,
) -> DataFrame:
    """The URL-level ADMISSION filter (the dedup.minhash_incremental_dedup
    pattern at the URL key): keep only new-batch rows whose canonical URL
    is (a) absent from the already-accepted corpus and (b) the winner
    within the batch itself. Corpus rows are never dropped — the corpus
    is the accepted truth; persist ``norm_url`` with the corpus exactly
    like the banded-minhash artifact so each batch costs one left-anti
    equi-join, linear per batch at any corpus size.

    ``corpus_urls``: a frame containing ``url_col`` (raw, normalized
    on the fly) or a ``norm_url`` column (corpus_is_normalized=True —
    the persisted-artifact fast path)."""
    if corpus_is_normalized:
        corpus_keys = corpus_urls.select("norm_url").distinct()
    else:
        corpus_keys = (
            corpus_urls.select(normalize_url(F.col(url_col)).alias("norm_url"))
            .filter(F.col("norm_url").isNotNull())
            .distinct()
        )
    batch = url_dedup(new_df, url_col, id_col, quality_col)
    admitted = batch.filter(F.col("keep")).join(corpus_keys, "norm_url", "left_anti")
    # URL-less rows can't be URL-deduped; they pass through (same rule as
    # url_dedup)
    no_url = batch.filter(F.col("norm_url").isNull())
    return admitted.unionByName(no_url).drop("keep")
