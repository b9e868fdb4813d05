"""Mergeable frequency/membership/cardinality sketches: Count-Min
(Cormode & Muthukrishnan 2005), Bloom filter (Bloom 1970), and
HyperLogLog (Flajolet et al. 2007) as plain DataFrame aggregates.

Why sketch TABLES and not exact groupBys: at 100 TB the distinct-key
space (URLs, shingles, tokens) can be larger than any single reducer's
memory, and streaming/incremental pipelines need an artifact that merges
by addition. A CMS is a fixed depth×width table whatever the data size;
merging per-batch/per-day sketches is one groupBy-sum; point queries and
heavy-hitter checks are equi-joins against a broadcastable table. The
Bloom filter is ⌈m/62⌉ BIGINT words — a membership artifact that ships
to every executor for admission-control joins without shuffling the
corpus.

Everything here is integer arithmetic on the engine-portable polynomial
hash (base 31 mod 1e9+7 — the simhash_portable/tfidf/dsir family), with
per-depth affine diversifiers h_j(x) = ((a_j·p + b_j) mod P) mod width.
Every product fits int64 in both Spark and DuckDB, so the DuckDB oracles
replay the sketch CONTENTS bit-for-bit — the correctness gate certifies
the exact build, not just shapes. (Production code wanting raw speed can
swap the portable hash for xxhash64 at the cost of oracle-ability —
same trade documented for simhash.)

No counterpart in the reference (SuperCowPowers/workbench delegates SQL
to Athena and keeps no sketch artifacts); part of the LLM-pipeline
mandate ("a novel sketch" scale path).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

_P = 1_000_000_007

#: Per-depth affine diversifiers — fixed primes, a_j odd, so the family
#: is pairwise-independent enough for the CMS/Bloom error bounds.
_A = [1000003, 1000033, 1000037, 1000039, 1000081, 1000099, 1000117, 1000121]
_B = [12289, 24593, 49157, 98317, 196613, 393241, 786433, 1572869]

_POLY = (
    "aggregate(transform(sequence(1, length({c}), 1),"
    " i -> ascii(substring({c}, i, 1))),"
    " 0L, (a, ch) -> (a * 31 + ch) % 1000000007)"
)


def _check_depth(depth: int) -> None:
    if not 1 <= depth <= len(_A):
        raise ValueError(f"depth must be in 1..{len(_A)}, got {depth}")


def _with_poly(df: DataFrame, key_col: str) -> DataFrame:
    """Project the portable polynomial hash of the key to ``__p``."""
    return df.withColumn("__k", F.col(key_col).cast("string")).withColumn(
        "__p", F.expr(_POLY.format(c="__k"))
    )


def _bucket(j: int, width: int) -> Column:
    return ((F.col("__p") * _A[j] + _B[j]) % _P % width).cast("int")


def _bucket_xx(j: int, width: int, key: str = "__k") -> Column:
    """xxhash64 bucket family (r15 opt): one codegen'd native hash per
    depth instead of the portable per-character polynomial fold, which
    is an INTERPRETED O(len) lambda per row (guide §4.1 — prefer
    codegen'd built-ins). Use ONLY where the sketch contents are not
    oracle-replayed (e.g. the heavy-hitters prefilter, whose output is
    exact for ANY hash family); artifact-oracled builds keep the
    engine-portable poly family."""
    return F.pmod(F.xxhash64(F.lit(j), F.col(key)), F.lit(width)).cast("int")


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
    hash_family: str = "poly",
) -> DataFrame:
    """Count-Min sketch of a key column: (j int, bucket int, cnt long)
    rows, at most depth×width of them (absent cells are implicit zeros).
    ε = e/width over-estimate with probability ≥ 1 − e^−depth per query.

    One projection + one posexplode (depth rows per input row) + one
    map-side-combinable groupBy — the natural distributed build. Pass
    ``weight_col`` to sketch a weighted frequency (e.g. token counts).
    ``hash_family``: 'poly' (default) is the engine-portable polynomial
    the artifact oracles replay bit-for-bit; 'xx' is the codegen'd
    xxhash64 family (see _bucket_xx) for paths whose RESULT does not
    depend on the hash choice."""
    _check_depth(depth)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    if hash_family == "xx":
        keyed = df.withColumn("__k", F.col(key_col).cast("string"))
        buckets = [_bucket_xx(j, width) for j in range(depth)]
    else:
        keyed = _with_poly(df, key_col)
        buckets = [_bucket(j, width) for j in range(depth)]
    rows = (
        keyed.select(
            F.posexplode(F.array(*buckets)).alias("j", "bucket"),
            w.alias("__w"),
        )
        .groupBy("j", "bucket")
        .agg(F.sum("__w").alias("cnt"))
    )
    return rows


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS tables built with the same (depth, width): union + sum —
    the additive-merge property that makes the sketch a per-batch/per-day
    artifact."""
    if not sketches:
        raise ValueError("cms_merge: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_query(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """Point-frequency estimates: probes × depth → LEFT equi-join the
    sketch (broadcastable: ≤ depth×width rows) → min over depths.
    Output: probes' columns + ``cms_estimate`` (≥ true count, never
    under). Probes with a key absent from every depth get 0."""
    _check_depth(depth)
    probe_rows = _with_poly(probes, key_col).select(
        F.col(key_col),
        F.posexplode(F.array(*[_bucket(j, width) for j in range(depth)])).alias(
            "j", "bucket"
        ),
    )
    joined = probe_rows.join(F.broadcast(sketch), ["j", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k: int = 5
) -> DataFrame:
    """Bloom filter: (word int, bits long) rows — bit position
    h_j(x) ∈ [0, m_bits) packed 62 bits per BIGINT word (bits 0..61 only:
    no sign-bit portability hazard between engines). Build is one
    posexplode + one groupBy(word) bit_or — map-side combinable, and two
    filters merge by bit_or again. False-positive rate ≈ (1−e^{−kn/m})^k."""
    _check_depth(k)
    rows = (
        _with_poly(df, key_col)
        .select(
            F.explode(
                F.array(
                    *[
                        ((F.col("__p") * _A[j] + _B[j]) % _P % m_bits).cast("int")
                        for j in range(k)
                    ]
                )
            ).alias("pos")
        )
        .select(
            (F.col("pos") / 62).cast("int").alias("word"),
            F.expr("shiftleft(1L, pos % 62)").alias("__bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("__bit").alias("bits"))
    )
    return rows


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Merge Bloom filters built with the same (m_bits, k): bit_or."""
    if not filters:
        raise ValueError("bloom_merge: need at least one filter")
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.groupBy("word").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    bloom: DataFrame,
    probes: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k: int = 5,
) -> DataFrame:
    """Membership probe: probes' columns + ``maybe_present`` boolean
    (false = definitely absent; true = present or false positive). One
    explode to (probe, word, mask), one LEFT broadcast equi-join on word,
    one groupBy(probe) bool_and — the admission-control join shape that
    never shuffles the corpus side."""
    _check_depth(k)
    probe_rows = (
        _with_poly(probes, key_col)
        .select(
            F.col(key_col),
            F.explode(
                F.array(
                    *[
                        ((F.col("__p") * _A[j] + _B[j]) % _P % m_bits).cast("int")
                        for j in range(k)
                    ]
                )
            ).alias("pos"),
        )
        .select(
            F.col(key_col),
            (F.col("pos") / 62).cast("int").alias("word"),
            F.expr("shiftleft(1L, pos % 62)").alias("__mask"),
        )
    )
    joined = probe_rows.join(F.broadcast(bloom), "word", "left")
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__mask")) == F.col("__mask"))
    return (
        joined.groupBy(key_col)
        .agg(F.min(hit.cast("int")).alias("__all"))
        .select(F.col(key_col), (F.col("__all") == 1).alias("maybe_present"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    depth: int = 4,
    width: int = 4096,
) -> DataFrame:
    """EXACT heavy hitters (keys with true count ≥ min_count) computed
    with a CMS-prefiltered aggregation: (key, cnt) — identical result to
    ``GROUP BY key HAVING COUNT(*) ≥ min_count``, different state bound.

    Why: a bare groupBy over a power-law key stream (tokens, URLs)
    carries aggregation state for EVERY distinct key — the long tail
    that heavy-hitter queries then throw away. Here a first map-side
    pass folds the stream into the fixed depth×width CMS; the second
    pass probes each row against the BROADCAST sketch (depth LEFT
    broadcast equi-joins + one least() — no shuffle) and drops rows
    whose estimate is already < min_count BEFORE the exact groupBy.
    CMS never underestimates, so no true heavy hitter is dropped (the
    prefilter admits a superset); the exact count filter then removes
    the false positives — the same no-false-negative two-pass shape as
    the Bloom decontamination prefilter. Shuffle volume and groupBy
    state drop from all-keys to candidate-keys (ε·stream collisions at
    most above threshold).

    Hash family (r15 opt): the output is EXACT for any hash choice
    (superset prefilter + exact recount), so both passes use the
    codegen'd xxhash64 buckets instead of the interpreted per-character
    polynomial fold, which was evaluated once per row per pass and
    dominated the query (guide §4.1; measured on the sf0.1 token
    stream). Artifact-replayed CMS entries keep the poly family."""
    _check_depth(depth)
    sk = cms_build(df, key_col, depth, width, hash_family="xx")
    rows = df.withColumn("__k", F.col(key_col).cast("string"))
    for j in range(depth):
        skj = (
            sk.filter(F.col("j") == j)
            .select(F.col("bucket").alias(f"__b{j}"), F.col("cnt").alias(f"__c{j}"))
        )
        rows = rows.withColumn(f"__b{j}", _bucket_xx(j, width)).join(
            F.broadcast(skj), f"__b{j}", "left"
        )
    est = F.least(*[F.coalesce(F.col(f"__c{j}"), F.lit(0)) for j in range(depth)])
    survivors = rows.filter(est >= min_count)
    return (
        survivors.groupBy(F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select(key_col, F.col("cnt").cast("long").alias("cnt"))
    )


# ------------------------------------------------------------- DDSketch
def _dd_gamma(alpha: float) -> float:
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    return (1 + alpha) / (1 - alpha)


def ddsketch_build(df: DataFrame, value_col: str, alpha: float = 0.01) -> DataFrame:
    """DDSketch (Masson, Lee & Rim, VLDB 2019): a mergeable quantile
    sketch with a RELATIVE-error guarantee — (sgn, idx, cnt) rows, one
    per occupied log-γ bucket, γ = (1+α)/(1−α).

    bucket(x) = (sign(x), ⌈ln|x| / ln γ⌉); zeros get (0, 0). Any
    quantile read off the sketch is within α·|true| of the true value —
    the guarantee exact percentiles can't give at 100 TB without a
    global sort, and percentile_approx (GK) gives only in RANK error
    (a rank-ε answer on a heavy-tailed value column can be off by
    orders of magnitude in VALUE; DDSketch is the published fix).

    Build is one projection + one map-side-combinable groupBy; the
    artifact is O(log(max/min)/α) rows regardless of data size
    (~1,400 buckets across 15 decades at α=1%), merges by addition
    (ddsketch_merge), and persists like the CMS/Bloom/HLL artifacts.
    Bucket indices are integers computed by one deterministic float
    expression (same libm ln both engines), and counts are integer
    sums — the DuckDB oracle replays the artifact bit-for-bit."""
    gamma = _dd_gamma(alpha)
    x = F.col(value_col).cast("double")
    sgn = F.when(x > 0, 1).when(x < 0, -1).otherwise(0).cast("int")
    idx = F.when(
        x != 0, F.ceil(F.log(F.abs(x)) / F.lit(float(math.log(gamma))))
    ).otherwise(F.lit(0)).cast("long")
    return (
        df.filter(x.isNotNull())
        .select(sgn.alias("sgn"), idx.alias("idx"))
        .groupBy("sgn", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def ddsketch_merge(*sketches: DataFrame) -> DataFrame:
    """Merge DDSketches built with the same alpha: union + sum."""
    if not sketches:
        raise ValueError("ddsketch_merge: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("sgn", "idx").agg(F.sum("cnt").alias("cnt"))


def ddsketch_quantiles(
    sketch: DataFrame, qs: list[float], alpha: float = 0.01
) -> DataFrame:
    """Quantile estimates from a DDSketch: (q, est) rows, each est
    within α·|true| of the true q-quantile (positive/negative values;
    zeros exact).

    Rank convention: target = floor(q·(n−1)) + 1 over the exact total
    n = Σcnt (integer — engine and oracle agree exactly); the answer
    bucket is the value-order-first bucket whose cumulative count
    reaches the target, picked with a partial-aggregable min(struct)
    over integer sort keys — deterministic. Value order is
    (sgn ASC, sgn·idx ASC). Estimate = sgn · 2γ^idx/(γ+1) (the bucket
    midpoint in relative terms), floor-rounded with the cross-engine
    form. The cumulative sum runs over the ARTIFACT (≤ a few thousand
    rows — a window here is a constant-size driver-equivalent, not a
    data-scale sort)."""
    from pyspark.sql import Window

    gamma = _dd_gamma(alpha)
    spark = sketch.sparkSession
    w = Window.orderBy("sgn", F.col("sgn") * F.col("idx")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = sketch.select(
        "sgn",
        "idx",
        "cnt",
        F.sum("cnt").over(w).alias("__cum"),
    )
    total = cum.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("__n"))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    est = (
        F.col("sgn").cast("double")
        * F.lit(2.0)
        * F.exp(F.col("idx") * F.lit(float(math.log(gamma))))
        / F.lit(float(gamma + 1.0))
    )
    # value-order sort key packed into ONE BIGINT (sgn ≪ 40 | sgn·idx):
    # |idx| ≤ ln(DBL_MAX)/ln γ ≈ 3.5e4 ≪ 2^39, so the packing preserves
    # the lexicographic (sgn, sgn·idx) order — a scalar key both engines'
    # min_by/arg_min accept.
    key = F.col("sgn").cast("long") * F.lit(1 << 40) + F.col("sgn") * F.col("idx")
    joined = (
        qdf.join(F.broadcast(total))
        .withColumn("__target", F.expr("CAST(floor(q * (__n - 1)) AS BIGINT) + 1"))
        .join(
            cum.select(
                key.alias("__key"),
                "__cum",
                F.when(F.col("sgn") == 0, F.lit(0.0)).otherwise(est).alias("__est"),
            ),
            F.col("__cum") >= F.col("__target"),
            "left",
        )
    )
    first = joined.groupBy("q").agg(F.min_by("__est", "__key").alias("__pick"))
    return first.select(
        "q",
        (F.floor(F.col("__pick") * 1e6 + F.lit(0.5)) / 1e6).alias("est"),
    )


# ------------------------------------------------------------------ HLL
#: Remaining-entropy bits after the bucket split: the portable hash lives
#: in [0, 1e9+7) ≈ 2^30; v = mix // m keeps ~24 bits at m=64. rho(v) is
#: the 1-based index of v's lowest set bit, capped at _HLL_RHO_CAP for
#: v == 0 (every key in the domain has rho ≤ 24 at m ≤ 64).
_HLL_RHO_CAP = 25

#: alpha_m bias constants from Flajolet et al. 2007 §4 (m = 2^b).
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def _hll_mix(col: str) -> str:
    """The nonlinear finalizer over the polynomial hash (dsir._MIX): HLL
    treats hash bits as uniform draws, and the raw base-31 chain gives
    CONSECUTIVE integers for sequential keys — the measured perf-cliff /
    uniform-draw bug. Bucket ids alone tolerate it; rho does not."""
    return f"((({col} * {col}) % {_P} + ({col} * 2654435761) % {_P}) % {_P})"


def _hll_rho_case(v: str) -> str:
    """SQL CASE computing rho(v) = 1 + trailing zeros of v (lowest-set-bit
    index + 1), _HLL_RHO_CAP when v = 0. Identical text runs in Spark SQL
    and DuckDB — pure integer modulo arithmetic, no bit intrinsics."""
    branches = " ".join(
        f"WHEN {v} % {1 << r} = {1 << (r - 1)} THEN {r}"
        for r in range(1, _HLL_RHO_CAP)
    )
    return f"(CASE WHEN {v} = 0 THEN {_HLL_RHO_CAP} {branches} ELSE {_HLL_RHO_CAP} END)"


def _check_hll_m(m: int) -> None:
    if m not in _HLL_ALPHA:
        raise ValueError(f"m must be one of {sorted(_HLL_ALPHA)}, got {m}")


def hll_build(
    df: DataFrame, key_col: str, m: int = 64, by: list[str] | None = None
) -> DataFrame:
    """HyperLogLog register table of a key column: (bucket int, rho int)
    rows, at most m of them (absent buckets are implicit zero registers).
    Relative error ≈ 1.04/√m on the distinct count.

    bucket = mix(poly(key)) mod m, register = max over the bucket's keys
    of rho(mix // m) — one projection + one map-side-combinable
    groupBy(bucket).max. The MAX-merge property makes the register table
    a per-batch/per-day artifact: union + groupBy-max re-merges any
    number of sketches, and duplicates are absorbed for free (max is
    idempotent), which is what makes HLL a DISTINCT counter rather than
    a row counter. Everything is integer arithmetic on the portable
    hash, so the DuckDB oracle replays the register CONTENTS
    bit-for-bit.

    ``by``: grouping columns for per-group distinct counting (distinct
    URLs per domain, vocabulary per source) — output gains those columns
    and holds ≤ m rows PER GROUP, still one combinable groupBy; merge
    stays union + max on (by..., bucket). At 100 TB this replaces a
    countDistinct-per-group (whose exact dedup state is unbounded) with
    a fixed m-register artifact per group."""
    _check_hll_m(m)
    by = list(by or [])
    return (
        _with_poly(df, key_col)
        .withColumn("__m", F.expr(_hll_mix("__p")))
        .select(
            *by,
            (F.col("__m") % m).cast("int").alias("bucket"),
            F.expr(f"__m div {m}").alias("__v"),
        )
        .select(
            *by,
            "bucket",
            F.expr(_hll_rho_case("__v")).cast("int").alias("__r"),
        )
        .groupBy(*by, "bucket")
        .agg(F.max("__r").alias("rho"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Merge HLL register tables built with the same m: union + max —
    exactly the build's own aggregation, so merge(build(A), build(B)) is
    bit-identical to build(A ∪ B)."""
    if not sketches:
        raise ValueError("hll_merge: need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame, m: int = 64, by: list[str] | None = None
) -> DataFrame:
    """Cardinality estimate from a register table — one row (or one row
    per ``by`` group for sketches built with hll_build(by=...)):
    (present_buckets, zero_registers, s_scaled, hll_estimate).

    The harmonic-mean denominator Σ_j 2^(−M_j) is computed EXACTLY as the
    integer s_scaled = Σ_j 2^(_HLL_RHO_CAP − M_j) (zero registers
    contribute 2^_HLL_RHO_CAP each; max total m·2^25 < 2^63) — integer
    sums are order-independent, so engine and oracle agree bit-for-bit
    and the single float division alpha·m²·2^25 / s_scaled is the only
    floating-point step. Small-range correction (Flajolet §4): when the
    raw estimate ≤ 2.5m and zero registers exist, linear counting
    m·ln(m/V) replaces it. Result rounded with the cross-engine floor
    form (see queries_pipeline._fround)."""
    _check_hll_m(m)
    by = list(by or [])
    alpha = _HLL_ALPHA[m]
    pow_cap = 1 << _HLL_RHO_CAP
    agg = sketch.groupBy(*by).agg(
        F.count(F.lit(1)).alias("present_buckets"),
        (
            F.coalesce(F.sum(F.expr(f"shiftleft(1L, {_HLL_RHO_CAP} - rho)")), F.lit(0))
            + (m - F.count(F.lit(1))) * F.lit(pow_cap)
        ).alias("s_scaled"),
    ).select(
        *by,
        "present_buckets",
        (F.lit(m) - F.col("present_buckets")).alias("zero_registers"),
        "s_scaled",
    )
    raw = F.lit(alpha) * F.lit(float(m * m)) * F.lit(float(pow_cap)) / F.col(
        "s_scaled"
    ).cast("double")
    corrected = F.when(
        (raw <= 2.5 * m) & (F.col("zero_registers") > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zero_registers").cast("double")),
    ).otherwise(raw)
    est = F.floor(corrected * 1e6 + F.lit(0.5)) / 1e6
    return agg.select(
        *by,
        F.col("present_buckets").cast("long").alias("present_buckets"),
        F.col("zero_registers").cast("long").alias("zero_registers"),
        F.col("s_scaled").cast("long").alias("s_scaled"),
        est.alias("hll_estimate"),
    )
