"""Correctness-gate query registry.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) -> DataFrame``
with an equivalent DuckDB-ANSI-SQL oracle string over the same parquet
tables. The driver hash-matches values (columns sorted by name, rows
order-insensitive), so every computed column is aliased identically on
both sides and floating-point aggregates are rounded on both sides to
keep engine-level ULP noise out of the hash.

Operator keys reference SURVEY.md §2 (reference citations live in the
implementing modules under workbench_spark/operators/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workbench_spark.session import read_table

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# =====================================================================
# Relational core — TPC-H-style queries (scan/filter/agg/join/sort)
# =====================================================================


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 4) AS sum_qty,
           ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the flagship scan+agg. Map-side partial
    aggregation on (returnflag, linestatus): 6 groups regardless of scale,
    so the shuffle is O(partitions), not O(rows)."""
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
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_top_revenue_orders",
    """
    SELECT o.o_orderkey, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: filtered dim join + agg + top-k. customer is tiny
    relative to lineitem at every SF → broadcast it; orders→lineitem is the
    one real shuffle join and AQE handles skew."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


@query(
    "q5_revenue_by_nation",
    """
    SELECT n.n_name, ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style multi-join: all dims broadcast (region/nation/
    supplier/customer are small at any SF under TPC-H scaling rules except
    customer — Catalyst/AQE decides customer; we hint the truly tiny ones)."""
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
            F.broadcast(s),
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


# =====================================================================
# EDA stats (SURVEY §2.4 A1-A9, §2.6, §2.7)
# =====================================================================


@query("row_count_lineitem", "SELECT COUNT(*) AS row_count FROM lineitem")
def a1_row_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 — athena_source.py:187-190."""
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("row_count"))


@query(
    "distinct_counts_lineitem",
    """
    SELECT COUNT(DISTINCT l_orderkey) AS l_orderkey,
           COUNT(DISTINCT l_partkey) AS l_partkey,
           COUNT(DISTINCT l_suppkey) AS l_suppkey,
           COUNT(DISTINCT l_returnflag) AS l_returnflag,
           COUNT(DISTINCT l_linestatus) AS l_linestatus
    FROM lineitem
    """,
)
def a2_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 — column_stats.py:13-23 (one-pass multi-column COUNT DISTINCT)."""
    from workbench_spark.operators.eda import distinct_counts

    li = _t(spark, sf_dir, "lineitem")
    return distinct_counts(
        li, ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus"]
    )


@query(
    "null_counts_events",
    """
    SELECT COUNT(CASE WHEN event_id IS NULL THEN 1 END) AS event_id,
           COUNT(CASE WHEN user_id IS NULL THEN 1 END) AS user_id,
           COUNT(CASE WHEN event_type IS NULL THEN 1 END) AS event_type,
           COUNT(CASE WHEN value IS NULL THEN 1 END) AS value,
           COUNT(CASE WHEN props IS NULL THEN 1 END) AS props
    FROM events
    """,
)
def a3_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 — column_stats.py:26-36."""
    from workbench_spark.operators.eda import null_counts

    ev = _t(spark, sf_dir, "events")
    return null_counts(ev, ["event_id", "user_id", "event_type", "value", "props"])


@query(
    "zero_counts_lineitem",
    """
    SELECT COUNT(CASE WHEN l_discount = 0 THEN 1 END) AS l_discount,
           COUNT(CASE WHEN l_tax = 0 THEN 1 END) AS l_tax,
           COUNT(CASE WHEN l_quantity = 0 THEN 1 END) AS l_quantity
    FROM lineitem
    """,
)
def a4_zeros(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — column_stats.py:39-49."""
    from workbench_spark.operators.eda import zero_counts

    li = _t(spark, sf_dir, "lineitem")
    return zero_counts(li, ["l_discount", "l_tax", "l_quantity"])


_DESC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@query(
    "descriptive_stats_lineitem",
    """
    WITH stats AS (
      SELECT
        {inner}
      FROM lineitem
    )
    {union}
    """.format(
        inner=",\n        ".join(
            f"ROUND(MIN(CAST({c} AS DOUBLE)), 6) AS {c}___min,\n"
            f"        ROUND(quantile_cont(CAST({c} AS DOUBLE), 0.25), 6) AS {c}___q1,\n"
            f"        ROUND(quantile_cont(CAST({c} AS DOUBLE), 0.5), 6) AS {c}___median,\n"
            f"        ROUND(quantile_cont(CAST({c} AS DOUBLE), 0.75), 6) AS {c}___q3,\n"
            f"        ROUND(MAX(CAST({c} AS DOUBLE)), 6) AS {c}___max,\n"
            f"        ROUND(AVG(CAST({c} AS DOUBLE)), 6) AS {c}___mean,\n"
            f"        ROUND(STDDEV(CAST({c} AS DOUBLE)), 6) AS {c}___stddev"
            for c in _DESC_COLS
        ),
        union="\n    UNION ALL\n".join(
            f"SELECT '{c}' AS column_name, {c}___min AS min, {c}___q1 AS q1, "
            f"{c}___median AS median, {c}___q3 AS q3, {c}___max AS max, "
            f"{c}___mean AS mean, {c}___stddev AS stddev FROM stats"
            for c in _DESC_COLS
        ),
    ),
)
def a5_descriptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 — descriptive_stats.py:14-83. Exact percentiles (linear
    interpolation) to match quantile_cont; rounded to 6dp on both sides."""
    from workbench_spark.operators.eda import descriptive_stats

    li = _t(spark, sf_dir, "lineitem")
    df = descriptive_stats(li, _DESC_COLS, exact=True)
    stat_cols = ["min", "q1", "median", "q3", "max", "mean", "stddev"]
    return df.select(
        "column_name", *[F.round(F.col(s), 6).alias(s) for s in stat_cols]
    )


@query(
    "correlations_lineitem",
    """
    WITH pairs AS (
      SELECT 'l_quantity' AS column_1, 'l_extendedprice' AS column_2,
             corr(l_quantity, l_extendedprice) AS c FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_discount', corr(l_quantity, l_discount) FROM lineitem
      UNION ALL
      SELECT 'l_quantity', 'l_tax', corr(l_quantity, l_tax) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_discount', corr(l_extendedprice, l_discount) FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', 'l_tax', corr(l_extendedprice, l_tax) FROM lineitem
      UNION ALL
      SELECT 'l_discount', 'l_tax', corr(l_discount, l_tax) FROM lineitem
    )
    SELECT column_1, column_2, ROUND(c, 6) AS correlation FROM pairs
    UNION ALL
    SELECT column_2 AS column_1, column_1 AS column_2, ROUND(c, 6) AS correlation FROM pairs
    """,
)
def a6_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 — correlations.py:14-91 (all pairs in one aggregation pass,
    emitted in both orientations)."""
    from workbench_spark.operators.eda import correlations

    li = _t(spark, sf_dir, "lineitem")
    df = correlations(li, _DESC_COLS)
    return df.select(
        "column_1", "column_2", F.round(F.col("correlation"), 6).alias("correlation")
    )


@query(
    "value_counts_orderpriority",
    """
    WITH counted AS (
      SELECT COALESCE(CAST(o_orderpriority AS VARCHAR), 'NaN') AS value,
             COUNT(*) AS count
      FROM orders GROUP BY 1
    ),
    top AS (SELECT * FROM counted ORDER BY count DESC, value ASC LIMIT 20),
    bottom AS (SELECT * FROM counted ORDER BY count ASC, value DESC LIMIT 20)
    SELECT DISTINCT value, count FROM (
      SELECT * FROM top UNION ALL SELECT * FROM bottom
    )
    """,
)
def a7_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — value_counts.py:13-63 (top-20 ∪ bottom-20, NULL→'NaN')."""
    from workbench_spark.operators.eda import value_counts

    o = _t(spark, sf_dir, "orders")
    return value_counts(o, "o_orderpriority")


@query(
    "outliers_lineitem_price",
    """
    WITH b AS (
      SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.25) AS q1,
             quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.75) AS q3
      FROM lineitem
    ),
    scanned AS (
      SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice,
             CASE WHEN l.l_extendedprice < b.q1 - 1.5 * (b.q3 - b.q1)
                  THEN 'l_extendedprice_low'
                  ELSE 'l_extendedprice_high' END AS outlier_group
      FROM lineitem l, b
      WHERE l.l_extendedprice < b.q1 - 1.5 * (b.q3 - b.q1)
         OR l.l_extendedprice > b.q3 + 1.5 * (b.q3 - b.q1)
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY outlier_group
        ORDER BY CASE WHEN outlier_group = 'l_extendedprice_low'
                      THEN l_extendedprice ELSE -l_extendedprice END ASC,
                 l_orderkey, l_linenumber
      ) AS rn
      FROM scanned
    )
    SELECT l_orderkey, l_linenumber, l_extendedprice, outlier_group
    FROM ranked WHERE rn <= 10
    """,
)
def a9_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/P4 — outliers.py:20-216: IQR bounds (driver-side, one agg pass) →
    pushed-down predicate scan → top-10 most-extreme per group window.
    scan_limit disabled here for determinism (the LIMIT-5000 cap is a
    production knob, applied in the library API)."""
    from workbench_spark.operators.eda import outliers

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    return outliers(
        li,
        ["l_extendedprice"],
        scan_limit=0,
        order_cols=["l_orderkey", "l_linenumber"],
    )


@query(
    "deterministic_sample_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey % 100 < 5
    """,
)
def o3_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 stand-in — engine-portable deterministic sample (the library's
    Bernoulli sample_rows is seeded but not cross-engine reproducible)."""
    from workbench_spark.operators.eda import deterministic_sample

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return deterministic_sample(o, "o_orderkey", 100, 5)
