"""Local replica of the driver's correctness check: run a Spark query and
its DuckDB oracle over the same parquet tables, compare row-count, schema
(column names), and order-insensitive values (columns sorted by name)."""

from __future__ import annotations

import math
import os

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def duckdb_run(sql: str, sf_dir: str, threads: int | None = None):
    """Run sql over the sf_dir parquet views. `threads` pins DuckDB's
    parallelism (used by the oracle-side order-invariance tier to perturb
    aggregation tree shapes); None keeps the default."""
    con = duckdb.connect()
    if threads is not None:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(path):
            # Spark-written table: a DIRECTORY of part files (the skew /
            # scale tiers' generated corpora) — DuckDB needs the glob
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def canon_pdf(pdf, cols=None) -> list[tuple]:
    """The comparison's canonical form: columns sorted by name, rows as
    sorted string tuples, floats at _norm_cell's 6-decimal granularity.
    Shared by compare() and the oracle-side invariance tier so both
    certify against the SAME canon."""
    cols = sorted(pdf.columns) if cols is None else cols
    rows = []
    for _, row in pdf[cols].iterrows():
        rows.append(tuple(str(_norm_cell(v)) for v in row))
    return sorted(rows)


def compare(spark_df, oracle_pdf, float_tol: float = 1e-9) -> list[str]:
    """Return list of mismatch descriptions; empty list == pass."""
    problems = []
    spark_pdf = spark_df.toPandas()
    s_cols = sorted(spark_pdf.columns)
    o_cols = sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        return [f"schema mismatch: spark={s_cols} oracle={o_cols}"]
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")

    s_rows, o_rows = canon_pdf(spark_pdf, s_cols), canon_pdf(oracle_pdf, s_cols)
    if s_rows != o_rows:
        diff_s = [r for r in s_rows if r not in o_rows][:3]
        diff_o = [r for r in o_rows if r not in s_rows][:3]
        problems.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
    return problems
