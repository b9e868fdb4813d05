"""Deterministic scale-factor table generator for scale-smoke runs.

The driver ships sf0.001/0.01/0.1 parquet (TESTDATA.md, read-only); every
plan in this repo is shape-audited at those SFs but nothing had ever
EXECUTED above ~600k rows. This module generates schema-identical
``lineitem / documents / embeddings / events`` tables at arbitrary SF —
statistically matched to the driver's tables (vocab, doc-length range,
language/source mix, 4-lines-per-order, 30-day event window, near-dup
rate) — so the heaviest operators can be smoked at sf1+ and their
sf0.1→sf1 scaling exponents measured (tests/test_scale_smoke.py).

Everything is Spark-native and hash-derived (``xxhash64`` of the row id —
no RNG state, no Python loops, no driver data), so generation itself is
the distributed path: at sf100 this same code emits a ~600M-row lineitem
from ``spark.range`` with zero driver memory. Values are deterministic
per (sf, seed) but do NOT reproduce the driver's tables bit-for-bit —
these tables are for throughput/plan-shape measurement, never for the
DuckDB oracle gate (which pins the driver's own data).

``skew=True`` (r15 — the planted-skew stress tier, VERDICT r14 #2)
overlays the Zipfian hot keys a real 100 TB corpus has, on otherwise
identical statistics (every non-planted draw uses the same hash
streams, so uniform-vs-skew timing ratios isolate the skew itself):

- events:    user 0 receives ~30% of all events (hot window/groupBy key)
- documents: the token "the" is prepended to ~50% of docs (hot posting
             list / shingle), and ~60% of docs land in source "src0"
             (dominant domain for the per-source panels / domain caps)
- lineitem:  l_partkey 0 on ~20% of lines and l_suppkey 0 on ~20%
             (hot aggregation + hot join key; price stays coupled to
             the planted partkey, as for any other part)
- embeddings: label 0 on ~50% of vectors (dominant class for
             centroid/per-label cells)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# the driver documents' exact 31-word vocabulary (sf0.1, enumerated)
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order",
    "part", "query", "row", "scan", "slow", "small", "sort", "spark",
    "stream", "table", "the", "value", "vector", "window",
]

# base-row counts at sf=1 (10x the driver's sf0.1 tables)
ROWS_SF1 = {
    "lineitem": 6_000_000,
    "documents": 50_000,
    "embeddings": 20_000,
    "events": 1_000_000,
}


def _h(*cols) -> F.Column:
    """Non-negative 63-bit xxhash64 of the inputs — the per-row draw."""
    return F.abs(F.xxhash64(*cols))


def gen_documents(
    spark: SparkSession, n: int, seed: int = 42, skew: bool = False
) -> DataFrame:
    """(doc_id, text, lang, source, n_chars) with the driver corpus'
    shape: 10-100 words from the 31-word vocab, ~uniform word draw,
    en 40% / zh,es,fr,de 15% each, 20 sources, and a ~2% near-dup tier
    (clusters of ≤7 consecutive ids sharing a generator id, each member
    mutated at ~1/37 of positions — so near-dup, not exact-dup).

    Shape: one explode (n×~55 rows), one groupBy(doc_id) with an
    array_sort(collect_list(struct)) re-assembly — order-safe under any
    partitioning. No lambda captures outer attributes (the transform
    lambda touches only its own element)."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(_h(F.col("id"), F.lit(seed), F.lit("dup")) % 100 < 2,
               F.col("id") - F.col("id") % 7)
        .otherwise(F.col("id"))
        .alias("gen_id"),
    )
    base = base.select(
        "doc_id",
        "gen_id",
        (F.lit(10) + _h(F.col("gen_id"), F.lit(seed), F.lit("len")) % 91).alias("n_words"),
        (_h(F.col("gen_id"), F.lit(seed), F.lit("lang")) % 20).alias("lh"),
        (_h(F.col("gen_id"), F.lit(seed), F.lit("src")) % 20).alias("sh"),
    )
    vocab = F.array(*[F.lit(w) for w in VOCAB])
    pos = base.select(
        "doc_id",
        "gen_id",
        "lh",
        "sh",
        F.explode(F.expr("sequence(0, int(n_words) - 1)")).alias("p"),
    )
    # word index: the generator id's draw, overridden at mutation
    # positions for near-dup members (doc_id != gen_id)
    widx = F.when(
        (F.col("doc_id") != F.col("gen_id"))
        & (_h(F.col("doc_id"), F.col("p"), F.lit(seed), F.lit("mut")) % 37 == 0),
        _h(F.col("doc_id"), F.col("p"), F.lit(seed), F.lit("alt")) % len(VOCAB),
    ).otherwise(_h(F.col("gen_id"), F.col("p"), F.lit(seed), F.lit("w")) % len(VOCAB))
    words = pos.select(
        "doc_id",
        "lh",
        "sh",
        F.struct(F.col("p"), F.element_at(vocab, (widx + 1).cast("int")).alias("w")).alias("pw"),
    )
    text = F.concat_ws(" ", F.expr("transform(pws, s -> s.w)"))
    source = F.concat(F.lit("src"), F.col("sh").cast("string"))
    if skew:
        # hot token: "the" prepended to ~50% of docs (hot posting list /
        # shingle); dominant domain: ~60% of docs land in src0
        text = F.when(
            _h(F.col("doc_id"), F.lit(seed), F.lit("hotw")) % 2 == 0,
            F.concat(F.lit("the "), text),
        ).otherwise(text)
        source = F.when(
            _h(F.col("doc_id"), F.lit(seed), F.lit("hotsrc")) % 100 < 60,
            F.lit("src0"),
        ).otherwise(source)
    docs = (
        words.groupBy("doc_id", "lh", "sh")
        .agg(F.array_sort(F.collect_list("pw")).alias("pws"))
        .select(
            "doc_id",
            text.alias("text"),
            F.when(F.col("lh") < 8, F.lit("en"))
            .otherwise(
                F.element_at(
                    F.array(F.lit("zh"), F.lit("es"), F.lit("fr"), F.lit("de")),
                    (F.col("lh") % 4 + 1).cast("int"),
                )
            )
            .alias("lang"),
            source.alias("source"),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
    )
    return docs.select("doc_id", "text", "lang", "source", "n_chars")


def gen_embeddings(
    spark: SparkSession, n: int, dim: int = 64, seed: int = 42,
    skew: bool = False,
) -> DataFrame:
    """(vec_id, embedding float[dim] — L2-normalized, label 0-9) with a
    ~5% planted near-twin tier (copy of a base vector, one coordinate
    nudged) so ANN/near-dup entries see realistic cluster structure."""
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.when(_h(F.col("id"), F.lit(seed), F.lit("twin")) % 100 < 5,
               F.col("id") - F.col("id") % 3)
        .otherwise(F.col("id"))
        .alias("gen_id"),
    )
    pos = base.select(
        "vec_id",
        "gen_id",
        F.explode(F.expr(f"sequence(0, {dim - 1})")).alias("d"),
    )
    raw = F.when(
        (F.col("vec_id") != F.col("gen_id"))
        & (_h(F.col("vec_id"), F.col("d"), F.lit(seed), F.lit("nudge")) % dim == 0),
        (_h(F.col("vec_id"), F.col("d"), F.lit(seed), F.lit("nv")) % 2001 - 1000),
    ).otherwise(_h(F.col("gen_id"), F.col("d"), F.lit(seed), F.lit("v")) % 2001 - 1000)
    vals = pos.select(
        "vec_id", F.struct(F.col("d"), (raw / F.lit(1000.0)).alias("x")).alias("dx")
    )
    arrs = (
        vals.groupBy("vec_id")
        .agg(F.array_sort(F.collect_list("dx")).alias("dxs"))
        .select("vec_id", F.expr("transform(dxs, s -> s.x)").alias("rawv"))
        .withColumn(
            "nrm",
            F.sqrt(F.expr("aggregate(rawv, 0.0D, (acc, x) -> acc + x * x)")),
        )
        .select(
            "vec_id",
            F.expr("transform(rawv, x -> CAST(x / nrm AS FLOAT))").alias("embedding"),
        )
    )
    label = (_h(F.col("vec_id"), F.lit(seed), F.lit("lbl")) % 10).cast("int")
    if skew:
        # dominant class: ~50% of vectors in label 0
        label = F.when(
            _h(F.col("vec_id"), F.lit(seed), F.lit("hotlbl")) % 2 == 0, F.lit(0)
        ).otherwise(label).cast("int")
    return arrs.withColumn("label", label).select("vec_id", "embedding", "label")


def gen_events(
    spark: SparkSession, n: int, seed: int = 42, skew: bool = False
) -> DataFrame:
    """(event_id, ts over a 30-day Jan-2024 window, user_id with ~66
    events/user, 5 uniform event types, value 0-560, props JSON)."""
    n_users = max(n // 66, 1)
    types = F.array(
        F.lit("click"), F.lit("view"), F.lit("purchase"), F.lit("signup"), F.lit("error")
    )
    user = _h(F.col("id"), F.lit(seed), F.lit("u")) % n_users
    if skew:
        # hot user: user 0 holds ~30% of all events
        user = F.when(
            _h(F.col("id"), F.lit(seed), F.lit("hotu")) % 100 < 30, F.lit(0)
        ).otherwise(user)
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1704067200000000)  # 2024-01-01 00:00:00 UTC
            + (_h(F.col("id"), F.lit(seed), F.lit("ts")) % (30 * 86400 * 1000000))
        ).alias("ts"),
        user.cast("long").alias("user_id"),
        F.element_at(
            types, (_h(F.col("id"), F.lit(seed), F.lit("t")) % 5 + 1).cast("int")
        ).alias("event_type"),
        ((_h(F.col("id"), F.lit(seed), F.lit("v")) % 56022) / F.lit(100.0)).alias("value"),
        F.concat(
            F.lit('{"k": '),
            (_h(F.col("id"), F.lit(seed), F.lit("k")) % 100).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )


def gen_lineitem(
    spark: SparkSession, n: int, seed: int = 42, skew: bool = False
) -> DataFrame:
    """TPC-H-ish lineitem: 4 lines/order, part/supp keys scaled with SF,
    quantity 1-50, price coupled to partkey, discount 0-0.10, tax 0-0.08,
    A/N/R x O/F flags, shipdate over 1995-2001."""
    n_parts = max(n // 30, 1)
    n_supps = max(n // 600, 1)
    qty = (_h(F.col("id"), F.lit(seed), F.lit("q")) % 50 + 1).cast("double")
    partkey = _h(F.col("id"), F.lit(seed), F.lit("p")) % n_parts
    suppkey = _h(F.col("id"), F.lit(seed), F.lit("s")) % n_supps
    if skew:
        # hot part / hot supplier: key 0 on ~20% of lines each
        partkey = F.when(
            _h(F.col("id"), F.lit(seed), F.lit("hotp")) % 100 < 20, F.lit(0)
        ).otherwise(partkey).cast("long")
        suppkey = F.when(
            _h(F.col("id"), F.lit(seed), F.lit("hots")) % 100 < 20, F.lit(0)
        ).otherwise(suppkey).cast("long")
    return spark.range(n).select(
        (F.col("id") / 4).cast("long").alias("l_orderkey"),
        partkey.alias("l_partkey"),
        suppkey.alias("l_suppkey"),
        (F.col("id") % 4 + 1).cast("int").alias("l_linenumber"),
        qty.alias("l_quantity"),
        (qty * (F.lit(900.0) + (partkey % 1100) + F.lit(0.012345))).alias(
            "l_extendedprice"
        ),
        ((_h(F.col("id"), F.lit(seed), F.lit("d")) % 11) / F.lit(100.0)).alias(
            "l_discount"
        ),
        ((_h(F.col("id"), F.lit(seed), F.lit("x")) % 9) / F.lit(100.0)).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (_h(F.col("id"), F.lit(seed), F.lit("rf")) % 3 + 1).cast("int"),
        ).alias("l_returnflag"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F")),
            (_h(F.col("id"), F.lit(seed), F.lit("ls")) % 2 + 1).cast("int"),
        ).alias("l_linestatus"),
        F.timestamp_seconds(
            F.lit(789004800)  # 1995-01-02
            + (_h(F.col("id"), F.lit(seed), F.lit("sd")) % 2500) * 86400
        ).alias("l_shipdate"),
    )


def generate(
    spark: SparkSession, out_dir: str, sf: float = 1.0, seed: int = 42,
    skew: bool = False,
) -> dict:
    """Write all four tables at the given SF under out_dir (parquet
    directories named {table}.parquet — the same paths read_table
    expects). Skips tables that already exist (generation is
    deterministic, so an existing dir IS the table — use distinct dirs
    for skew=True vs False). Returns row counts."""
    os.makedirs(out_dir, exist_ok=True)
    gens = {
        "documents": gen_documents,
        "embeddings": gen_embeddings,
        "events": gen_events,
        "lineitem": gen_lineitem,
    }
    counts = {}
    for name, fn in gens.items():
        path = os.path.join(out_dir, f"{name}.parquet")
        n = int(ROWS_SF1[name] * sf)
        if not os.path.exists(path):
            fn(spark, n, seed=seed, skew=skew).write.parquet(path)
        counts[name] = n
    return counts


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    from workbench_spark.session import get_spark

    out = args.out or os.path.join(
        os.path.dirname(__file__), "..", "..", ".scale", f"sf{args.sf:g}"
    )
    print(generate(get_spark("scalegen"), os.path.abspath(out), sf=args.sf))
