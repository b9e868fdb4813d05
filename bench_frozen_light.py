"""FROZEN r14 LIGHT-TIER benchmark twins — DO NOT EDIT, EVER.

Additive companion to bench_frozen.py (whose six heavy twins stay pinned
at the r12 state, FROZEN_VERSION untouched — the CLAUDE.md invariant
forbids editing that file, so the light tier gets its own module).
Verbatim snapshot, taken at round 14 open (tree = r13 final + the r14
harness commits, none of which touch these query paths), of the four
LIGHT headline queries whose raw cross-round movement had no adjudicator
(r13: q1 read +61% raw on provably unchanged code and only the
heavy-tier median could say "box drift"):

    q1_pricing_summary        — scan+agg flagship
    q5_revenue_by_nation      — 6-way join
    knn_cosine_bruteforce     — broadcast-queries exact cosine top-k
    dedup_minhash_pairs       — the BENCHED production shape
                                (16 hashes / 4 bands, persisted
                                signatures — bench.py's _bench_extras
                                override, NOT the oracle-grade registry
                                entry, so live and twin time the same
                                plan)

Contract (same as bench_frozen.py):
- NEVER edit beyond this header. Re-freezing requires a
  LIGHT_FROZEN_VERSION bump + a restart of the light ratio series.
- Function-level imports are resolved to this module's own frozen copies.
- `_t` freezes the plain-parquet read path (these four queries touch no
  events table, so no timestamp normalization is needed).

Generated from: workbench_spark/queries.py (q1, q5),
workbench_spark/queries_pipeline.py (knn oracle projection),
workbench_spark/operators/similarity.py (cosine_knn chain),
workbench_spark/operators/dedup.py (minhash chain), bench.py
(_bench_extras.minhash_pairs_persisted) as of commit e931213 (r14 open).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LIGHT_FROZEN_VERSION = "r14-light"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------- q1


def _qmean(c: str):
    q = F.floor(F.col(c).cast("double") * F.lit(1e6) + F.lit(0.5)).cast(
        "decimal(19,0)"
    )
    mean = F.sum(q).cast("decimal(38,0)").cast("double") / F.count(F.col(c)) / F.lit(1e6)
    return F.floor(mean * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)


def frozen_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            _qmean("l_quantity").alias("avg_qty"),
            _qmean("l_extendedprice").alias("avg_price"),
            _qmean("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------- q5


def frozen_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


# --------------------------------------------------- knn_cosine_bruteforce


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _finite_sims(df: DataFrame, col: str = "cosine_sim") -> DataFrame:
    return df.filter(F.col(col).isNotNull() & ~F.isnan(col))


def cosine_knn(
    vectors: DataFrame,
    queries: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    include_self: bool = False,
) -> DataFrame:
    q = queries if queries is not None else vectors
    qd = q.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    rd = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__rv"),
        _norm(F.col(vec_col)).alias("__rn"),
    )
    pairs = F.broadcast(qd).crossJoin(rd)
    if not include_self:
        pairs = pairs.filter(F.col("id") != F.col("neighbor_id"))
    scored = pairs.select(
        "id",
        "neighbor_id",
        (_dot(F.col("__qv"), F.col("__rv")) / (F.col("__qn") * F.col("__rn"))).alias(
            "cosine_sim"
        ),
    )
    w = Window.partitionBy("id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id").asc())
    return (
        _finite_sims(scored).withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _fround(c, digits: int = 6):
    s = float(10**digits)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def frozen_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 20)
    out = cosine_knn(e, queries=q, k=5)
    return out.select("id", "neighbor_id", _fround(F.col("cosine_sim")).alias("cosine_sim"))


# --------------------------------------------------- dedup_minhash_pairs
# the benched production shape: minhash_lsh_pairs(documents, n_hashes=16,
# bands=4, verify_threshold=0.5, persist_signatures=True) — pair_mode
# 'all', no bucket cap (bench.py _bench_extras.minhash_pairs_persisted)


def normalize_text(col, lowercase: bool = True, collapse_ws: bool = True):
    out = col
    if lowercase:
        out = F.lower(out)
    if collapse_ws:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def _shingle_sql(attr: str, n: int) -> str:
    return (
        f"array_distinct(filter(transform("
        f"sequence(1, greatest(length({attr}) - {n - 1}, 1)),"
        f" i -> substring({attr}, i, {n})), s -> length(s) = {n}))"
    )


def shingle_frame(
    df: DataFrame, text_col: str, id_col: str, n: int = 5, out_col: str = "__sh"
) -> DataFrame:
    cores = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col), F.col(text_col))
    if src.rdd.getNumPartitions() < cores:
        src = src.repartition(cores)
    normed = src.select(
        F.col(id_col), normalize_text(F.col(text_col)).alias("__norm")
    )
    return normed.select(
        F.col(id_col), F.expr(_shingle_sql("__norm", n)).alias(out_col)
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 32,
    shingle_n: int = 5,
) -> DataFrame:
    sh = shingle_frame(df, text_col, id_col, shingle_n, "__sh")
    hashed = sh.select(
        F.col(id_col), F.expr("transform(__sh, s -> xxhash64(s))").alias("__h")
    )
    sig = F.expr(
        "array("
        + ", ".join(
            f"array_min(transform(__h, h -> xxhash64(h, {i})))"
            for i in range(n_hashes)
        )
        + ")"
    )
    return hashed.select(F.col(id_col), sig.alias("minhash"))


def _band_hash_sql(bands: int, r: int) -> str:
    return (
        "array("
        + ", ".join(
            "xxhash64(" + ", ".join(f"minhash[{b * r + j}]" for j in range(r)) + ")"
            for b in range(bands)
        )
        + ")"
    )


def minhash_lsh_pairs_persisted(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 5,
    verify_threshold: float = 0.5,
) -> DataFrame:
    r = n_hashes // bands
    sigs = minhash_signature(df, text_col, id_col, n_hashes, shingle_n)
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.col("minhash"),
        F.posexplode(F.expr(_band_hash_sql(bands, r))).alias("band", "bh"),
    )
    banded = banded.localCheckpoint(eager=True)
    a, b = banded.alias("a"), banded.alias("b")
    est = F.aggregate(
        F.zip_with("a.minhash", "b.minhash", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(n_hashes)
    out = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bh") == F.col("b.bh"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        est.alias("est_jaccard"),
    )
    if verify_threshold is not None:
        out = out.filter(F.col("est_jaccard") >= verify_threshold)
    return out.dropDuplicates(["id_a", "id_b"])


def frozen_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs_persisted(
        d, n_hashes=16, bands=4, verify_threshold=0.5
    )


LIGHT_FROZEN = {
    "q1_pricing_summary": frozen_q1,
    "q5_revenue_by_nation": frozen_q5,
    "knn_cosine_bruteforce": frozen_knn_bruteforce,
    "dedup_minhash_pairs": frozen_minhash_pairs,
}
