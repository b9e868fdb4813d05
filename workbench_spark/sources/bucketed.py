"""Bucketed-table support — co-located joins without a shuffle.

The reference's storage layer (Athena over parquet prefixes) has no
bucketing concept; every join shuffles. On Spark, `bucketBy` at write
time pre-hash-partitions and sorts the data on the join key, so a join
between two tables bucketed the same way is a zero-Exchange SortMergeJoin
— at 100 TB the difference between an hours-long shuffle of the fact
table and none at all.

Usage contract (Spark's, surfaced here):
- bucketed writes go through ``saveAsTable`` (the bucket metadata lives
  in the catalog, not the files), so a warehouse dir + table name;
- both sides must be bucketed by the SAME columns into the SAME bucket
  count for full shuffle elimination; a bucketed big side still avoids
  ITS shuffle when joined against an unbucketed (shuffled) small side;
- `spark.sql.sources.bucketing.enabled` (default true) must be on, and
  AQE respects bucket info.

The plan-shape guarantee is asserted in
tests/test_sources_streaming_multimodal.py::test_bucketed_join_avoids_shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a catalog table bucketed (and sorted) on
    ``bucket_cols``. ``n_buckets`` should divide the cluster's target
    parallelism; both join sides must use the same value."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table)


def read_bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table (bucket metadata comes from the catalog —
    a bare spark.read.parquet on the files would lose it)."""
    return spark.table(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket columns.
    With matching bucket specs the physical plan contains NO Exchange on
    either side (asserted in tests)."""
    return read_bucketed_table(spark, left_table).join(
        read_bucketed_table(spark, right_table), on, how
    )
