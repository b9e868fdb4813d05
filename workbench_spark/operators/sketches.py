"""Mergeable frequency/membership sketches: Count-Min (Cormode &
Muthukrishnan 2005) and Bloom filter (Bloom 1970) as plain DataFrame
aggregates.

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


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min sketch of a key column: (j int, bucket int, cnt long)
    rows, at most depth×width of them (absent cells are implicit zeros).
    ε = e/width over-estimate with probability ≥ 1 − e^−depth per query.

    One projection + one posexplode (depth rows per input row) + one
    map-side-combinable groupBy — the natural distributed build. Pass
    ``weight_col`` to sketch a weighted frequency (e.g. token counts)."""
    _check_depth(depth)
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = (
        _with_poly(df, key_col)
        .select(
            F.posexplode(F.array(*[_bucket(j, width) for j in range(depth)])).alias(
                "j", "bucket"
            ),
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
