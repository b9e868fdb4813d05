"""DataFrame comparison report (reference utils/pandas_utils.py:97-186
compare_dataframes).

The reference compares two pandas frames positionally (shared index) and
prints a report. Distributed frames have no positional identity, so the
Spark version aligns on an explicit key column — one full-outer join —
and returns the report as a tidy DataFrame instead of printing:

    (column, status, n_differences)

with one row per compared column plus the structural rows
``__rows_only_in_df1`` / ``__rows_only_in_df2``. Comparison semantics
mirror the reference exactly:

- strings: NULLs treated as equal (both filled to '')
- floats: equal within epsilon (1e-10), NaN/NULL==NaN/NULL
- everything else: null-safe equality
- columns present on one side only are reported, not compared
- dtype-mismatched common columns are reported as ``type_mismatch``

Everything is a single join + one aggregation pass (per-column counts
computed as conditional sums map-side); the report itself is built from
the 1-row aggregate — O(#columns) driver state, no collect of data rows.
Rows present on only one side are counted but excluded from per-column
comparison (the reference's equal-length precondition re-expressed for
keyed data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EPSILON = 1e-10


def compare_dataframes(
    df1: DataFrame,
    df2: DataFrame,
    key: str,
    epsilon: float = EPSILON,
) -> DataFrame:
    """Return the tidy difference report for two keyed DataFrames."""
    spark = df1.sparkSession
    t1 = dict(df1.dtypes)
    t2 = dict(df2.dtypes)
    if key not in t1 or key not in t2:
        raise ValueError(f"compare_dataframes: key '{key}' must exist in both frames")
    cols1 = [c for c in df1.columns if c != key]
    cols2 = [c for c in df2.columns if c != key]
    only1 = [c for c in cols1 if c not in t2]
    only2 = [c for c in cols2 if c not in t1]
    common = [c for c in cols1 if c in t2]
    mismatched = [c for c in common if t1[c] != t2[c]]
    comparable = [c for c in common if t1[c] == t2[c]]

    a = df1.select(key, *[F.col(c).alias(f"__a_{c}") for c in comparable]).withColumn(
        "__a", F.lit(1)
    )
    b = df2.select(key, *[F.col(c).alias(f"__b_{c}") for c in comparable]).withColumn(
        "__b", F.lit(1)
    )
    joined = a.join(b, key, "full")
    both = F.col("__a").isNotNull() & F.col("__b").isNotNull()

    def differs(c: str):
        x, y = F.col(f"__a_{c}"), F.col(f"__b_{c}")
        dt = t1[c]
        if dt == "string":
            neq = F.coalesce(x, F.lit("")) != F.coalesce(y, F.lit(""))
        elif dt in ("double", "float"):
            xn = x.isNull() | F.isnan(x)
            yn = y.isNull() | F.isnan(y)
            close = F.abs(x - y) <= epsilon
            neq = ~(xn & yn) & ~F.coalesce(close, F.lit(False))
        else:
            neq = ~x.eqNullSafe(y)
        return F.sum(F.when(both & neq, 1).otherwise(0)).alias(f"__d_{c}")

    agg = joined.agg(
        F.sum(F.when(F.col("__b").isNull(), 1).otherwise(0)).alias("__rows1"),
        F.sum(F.when(F.col("__a").isNull(), 1).otherwise(0)).alias("__rows2"),
        *[differs(c) for c in comparable],
    ).first()

    rows = [("__rows_only_in_df1", "row_count", int(agg["__rows1"] or 0))]
    rows.append(("__rows_only_in_df2", "row_count", int(agg["__rows2"] or 0)))
    for c in sorted(only1):
        rows.append((c, "only_in_df1", None))
    for c in sorted(only2):
        rows.append((c, "only_in_df2", None))
    for c in sorted(mismatched):
        rows.append((c, "type_mismatch", None))
    for c in comparable:
        n = int(agg[f"__d_{c}"] or 0)
        rows.append((c, "differences" if n else "equal", n))
    return spark.createDataFrame(
        rows, "column string, status string, n_differences long"
    )


def dataframes_equal(df1: DataFrame, df2: DataFrame, key: str) -> bool:
    """The reference's early-exit df1.equals(df2) check, keyed: True when
    no structural rows, no one-sided columns, and every common column is
    'equal'."""
    report = compare_dataframes(df1, df2, key)
    bad = report.filter(
        (F.col("status").isin("only_in_df1", "only_in_df2", "type_mismatch", "differences"))
        | ((F.col("status") == "row_count") & (F.col("n_differences") > 0))
    )
    return bad.count() == 0
