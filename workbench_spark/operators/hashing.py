"""Content-hash operators (SURVEY §2.4 A21, §2.8 F12).

Reference semantics:
- A21 table hash — utils/athena_utils.py:123-220:
  MD5(array_join(array_agg(CAST(col AS VARCHAR) concat), '')) — an
  order-SENSITIVE whole-table hash built by materializing every row into
  one array on one node. That collapses at scale.
- F12 row hash — utils/pandas_utils.py:40-50, endpoint_core.py:1021-1031.

Spark-first redesign: hash each row independently (md5 of a '|'-joined
cast-to-string projection), fold the first 15 hex chars to a bigint, and
SUM modulo a prime — an order-INSENSITIVE commutative combine that is a
pure map-side aggregation (no sort, no collect, constant-size state).
This is the primitive the duckdb-oracle value-hash check exercises.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MOD = 1_000_000_007  # sum of 15-hex-digit hashes % p stays well inside int64


def row_hash(df: DataFrame, columns: list[str] | None = None, out_col: str = "row_hash") -> DataFrame:
    """F12 — deterministic per-row md5 over a cast-to-string projection.
    NULLs are encoded as a sentinel so (NULL,'x') != ('x',NULL)."""
    cols = columns or df.columns
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("\0NULL")) for c in cols]
    return df.withColumn(out_col, F.md5(F.concat_ws("|", *parts)))


def row_hash_int(df: DataFrame, columns: list[str] | None = None, out_col: str = "row_hash_int") -> DataFrame:
    """First 15 hex chars of the row md5 as bigint (engine-portable:
    Spark conv(hex,16,10) == DuckDB CAST('0x'||hex AS BIGINT))."""
    hashed = row_hash(df, columns, "__h")
    return hashed.withColumn(
        out_col, F.conv(F.substring("__h", 1, 15), 16, 10).cast("long") % _MOD
    ).drop("__h")


def table_hash(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """A21 — order-insensitive whole-table content hash: SUM(row_hash_int).
    One row out: (table_hash bigint, row_count bigint).

    Unlike the reference's array_agg-then-md5 (single-node, order-
    sensitive), this is a commutative aggregate: map-side partials, O(1)
    state, identical result under any row order or partitioning.
    """
    with_hash = row_hash_int(df, columns, "__rh")
    # Sum in decimal(38,0) (overflow-free to ~1e29 rows at <1e9 per row),
    # then reduce mod p so the result is a stable bigint at ANY row count —
    # matching the oracle, which sums in HUGEINT before the final mod/cast.
    return with_hash.agg(
        F.pmod(F.sum(F.col("__rh").cast("decimal(38,0)")), F.lit(_MOD))
        .cast("long")
        .alias("table_hash"),
        F.count(F.lit(1)).alias("row_count"),
    )


def table_hash_oracle_sql(table: str, columns: list[str]) -> str:
    """DuckDB-ANSI equivalent of table_hash() for the correctness gate."""
    parts = ", ".join(f"COALESCE(CAST({c} AS VARCHAR), chr(0) || 'NULL')" for c in columns)
    return f"""
    SELECT CAST(SUM(CAST(('0x' || substr(md5(concat_ws('|', {parts})), 1, 15)) AS BIGINT) % {_MOD}) % {_MOD} AS BIGINT) AS table_hash,
           CAST(COUNT(*) AS BIGINT) AS row_count
    FROM {table}
    """
