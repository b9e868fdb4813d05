"""Deterministic synthetic partsupp — closes the TPC-H partsupp-family gap
(Q2/Q9/Q11/Q16/Q20) on a testdata schema that ships no partsupp table.

The driver's parquet set has part and supplier but no partsupp, so the five
TPC-H queries that need it were previously declared out of reach
(queries.py r4 note). This module fixtures partsupp the way ``embeddings``
oracles are fixtured: the SAME deterministic generation runs engine-side
(Spark DataFrame) and oracle-side (a DuckDB CTE), so DuckDB hash-matching
stays exact. Reference parity: the reference's TPC-H-style workloads are
plain SQL over warehouse tables (it delegates SQL to its warehouse engine);
these five shapes complete the relational-core coverage of SURVEY.md §2.

Generation (all integer arithmetic — portable bit-for-bit across engines;
S = count(supplier), keys are 0-based in this testdata):

    for each p_partkey pk, i in 0..3:
        ps_suppkey          = (pk + i * (S div 4)) mod S
        ps_availqty         = (pk*37 + i*101) mod 9999 + 1
        ps_supplycost_cents = (pk*7919 + i*4271) mod 99900 + 100
        ps_supplycost       = cents / 100.0   (1.00 .. 1000.99)

ps_suppkey is injective in i (0 < d < 2d < 3d < S for d = S div 4, S >= 4),
so every part gets exactly 4 DISTINCT suppliers — the TPC-H cardinality.
The cents column exists so threshold comparisons (Q11's HAVING) can run in
exact BIGINT arithmetic instead of float sums (oracle-recipes: integer
fixed-point beats float replay).

Scale: partsupp is 4x part — at 100 TB this generator is a narrow
projection + a 4-way explode of the part table (no shuffle; the supplier
count is a 1-row aggregate broadcast). A real deployment would materialize
it once with sources.layout and bucket it by ps_partkey for co-located
joins with part/lineitem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workbench_spark.session import read_table


def synthetic_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ps_partkey, ps_suppkey, ps_availqty, ps_supplycost_cents,
    ps_supplycost) — 4 rows per part, deterministic, engine-portable."""
    part = read_table(spark, sf_dir, "part").select("p_partkey")
    # 1-row aggregate: the supplier COUNT rides a broadcast nested-loop
    # cross join (the allowlisted 1-row-aggregate pattern) — constant size
    # at any SF, never a data cross product.
    s_cnt = read_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("__s_cnt")
    )
    four = part.crossJoin(s_cnt).select(
        "p_partkey",
        "__s_cnt",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("__i"),
    )
    cents = (F.col("p_partkey") * 7919 + F.col("__i") * 4271) % 99900 + 100
    return four.select(
        F.col("p_partkey").alias("ps_partkey"),
        (
            (F.col("p_partkey") + F.col("__i") * F.expr("__s_cnt div 4"))
            % F.col("__s_cnt")
        ).alias("ps_suppkey"),
        ((F.col("p_partkey") * 37 + F.col("__i") * 101) % 9999 + 1).alias(
            "ps_availqty"
        ),
        cents.cast("long").alias("ps_supplycost_cents"),
        (cents.cast("double") / F.lit(100.0)).alias("ps_supplycost"),
    )


def partsupp_oracle_cte() -> str:
    """The identical generation as a DuckDB CTE body; embed as
    ``WITH partsupp AS MATERIALIZED ({partsupp_oracle_cte()}) ...``.
    MATERIALIZED because consumers reference partsupp more than once
    (DuckDB inlines plain CTEs — the r8 exponential-expansion lesson)."""
    return """
      SELECT p_partkey AS ps_partkey,
             (p_partkey + t.i * (sc.cnt // 4)) % sc.cnt AS ps_suppkey,
             (p_partkey * 37 + t.i * 101) % 9999 + 1 AS ps_availqty,
             (p_partkey * 7919 + t.i * 4271) % 99900 + 100 AS ps_supplycost_cents,
             CAST((p_partkey * 7919 + t.i * 4271) % 99900 + 100 AS DOUBLE) / 100.0
               AS ps_supplycost
      FROM part,
           (SELECT COUNT(*) AS cnt FROM supplier) sc,
           generate_series(0, 3) AS t(i)
    """
