"""Source loaders (SURVEY §2.1 S1-S6).

Reference citations:
- S1 CSV → DataSource   — csv_to_data_source.py:38-60
- S2 JSONL → DataSource — json_to_data_source.py:37-58
- S3/S4 light/heavy S3 loaders — s3_to_data_source_light.py:46-75,
  s3_heavy_to_data_source.py:91-221. The light/heavy size-tier split
  disappears in Spark (one distributed reader handles both); what
  survives from the heavy loader is its *semantic* pipeline:
  resolve ambiguous types → flatten nested structs with '.'→'_' renames →
  cast designated timestamp columns → write columnar.
- S6 query/limit pull — data_to_pandas.py:35-60
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv(spark: SparkSession, path: str, **options) -> DataFrame:
    """S1 — header + schema inference, matching the reference's
    pandas.read_csv-then-convert behavior."""
    opts = {"header": True, "inferSchema": True, **options}
    return spark.read.options(**opts).csv(path)


def read_jsonl(spark: SparkSession, path: str, schema=None, **options) -> DataFrame:
    """S2 — JSON-lines (the reference discourages but supports it)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl_tolerant(
    spark: SparkSession,
    path: str,
    schema=None,
    corrupt_col: str = "_corrupt_record",
    cache: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """S2 at corpus scale: PERMISSIVE parse that separates good rows from
    corrupt ones instead of failing the job — at 100 TB there is ALWAYS a
    malformed line, and FAILFAST turns one bad byte into a dead pipeline.

    Returns (good, bad): ``good`` drops the corrupt column; ``bad`` holds
    the raw offending lines for quarantine/repair.

    Spark refuses a query whose only referenced file column is the
    internal corrupt-record column (UNSUPPORTED_FEATURE.QUERY_ONLY_
    CORRUPT_RECORD_COLUMN), so ``bad`` cannot be derived from the JSON
    scan directly without a materialized parse. Two supported paths:

    - ``cache=True`` (default): the parsed frame is cached, both sides
      filter the cached parse — one read, cached blocks pinned until
      ``unpersist``/``clearCache``.
    - ``cache=False``: ``bad`` is derived from a SECOND read of the file
      as raw text, re-parsed per-line with ``from_json`` (an expression,
      not a file source, so the corrupt-column restriction does not
      apply). No cached blocks pinned — right for loops over many
      inputs — at the cost of one extra scan of the input."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", corrupt_col
    )
    if schema is not None:
        from pyspark.sql import types as _T

        if isinstance(schema, _T.StructType) and corrupt_col not in schema.names:
            schema = schema.add(corrupt_col, _T.StringType())
        reader = reader.schema(schema)
    df = reader.json(path)
    if corrupt_col not in df.columns:  # fully clean file, inferred schema
        return df, df.sparkSession.createDataFrame(
            [], f"`{corrupt_col}` string"
        )
    if cache:
        df = df.cache()  # corrupt-column access needs a materialized parse
        good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
        bad = df.filter(F.col(corrupt_col).isNotNull()).select(corrupt_col)
        return good, bad
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    # uncached path: re-read as text and re-apply the parse with from_json,
    # whose PERMISSIVE mode fills the corrupt field on malformed lines
    data_schema = T.StructType(
        [f for f in df.schema.fields if f.name != corrupt_col]
    ).add(corrupt_col, T.StringType())
    raw = spark.read.text(path)
    parsed = raw.select(
        F.col("value"),
        F.from_json(
            "value",
            data_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt_col},
        ).alias("__parsed"),
    )
    bad = parsed.filter(
        F.col(f"__parsed.{corrupt_col}").isNotNull()
    ).select(F.col("value").alias(corrupt_col))
    return good, bad


def flatten_structs(df: DataFrame, sep: str = "_") -> DataFrame:
    """S4 — recursive struct flatten with '.'→'_' column renames
    (Glue Relationalize semantics, s3_heavy_to_data_source.py:130-145).
    Arrays are left intact (the reference relationalizes them into side
    tables; we keep them as native array columns — strictly more capable)."""
    while True:
        struct_fields = [
            f for f in df.schema.fields if isinstance(f.dataType, T.StructType)
        ]
        if not struct_fields:
            return df
        cols = []
        for f in df.schema.fields:
            if isinstance(f.dataType, T.StructType):
                for sub in f.dataType.fields:
                    cols.append(
                        F.col(f"`{f.name}`.`{sub.name}`").alias(f"{f.name}{sep}{sub.name}")
                    )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)


def resolve_choice_to_long(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """S4 — Glue resolveChoice('cast:long') parity
    (s3_heavy_to_data_source.py:38-51): ambiguous numeric-ish string
    columns cast to long (nulls on failure, Glue 'choice' resolution)."""
    targets = columns or [
        f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    out = df
    for c in targets:
        out = out.withColumn(c, F.col(c).cast("long"))
    return out


def cast_timestamps(df: DataFrame, timestamp_columns: list[str], fmt: str | None = None) -> DataFrame:
    """S4 — designated timestamp-column casts
    (s3_heavy_to_data_source.py:53-68); unparseable → NULL."""
    out = df
    for c in timestamp_columns:
        out = out.withColumn(c, F.to_timestamp(F.col(c), fmt) if fmt else F.to_timestamp(F.col(c)))
    return out


def heavy_json_to_table(
    spark: SparkSession,
    path: str,
    timestamp_columns: list[str] | None = None,
    out_path: str | None = None,
) -> DataFrame:
    """S4 — the full heavy-loader pipeline: read JSONL(.gz), flatten
    nested structs, cast timestamps, optionally write parquet. One Spark
    job; the reference needed a Glue DynamicFrame job for this tier."""
    df = spark.read.json(path)
    df = flatten_structs(df)
    if timestamp_columns:
        df = cast_timestamps(df, [c for c in timestamp_columns if c in df.columns])
    if out_path:
        df.write.mode("overwrite").parquet(out_path)
        df = spark.read.parquet(out_path)
    return df


def pull_dataframe(
    df: DataFrame, query: str | None = None, max_rows: int = 100_000, view_name: str = "__pull"
) -> DataFrame:
    """S6 — query-override-else-limited-pull (data_to_pandas.py:35-60)."""
    if query:
        df.createOrReplaceTempView(view_name)
        return df.sparkSession.sql(query)
    return df.limit(max_rows)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> str:
    """Write a bucketed (and optionally sorted) catalog table so later
    joins/aggregations on ``bucket_col`` co-locate WITHOUT a shuffle —
    the pre-partitioning design choice SURVEY §4 calls out (the reference
    explicitly punts partitioning, pandas_to_data.py:144-145).

    At 100 TB this is the difference between re-shuffling the fact table
    on every join and shuffling it once at write time: two tables
    bucketed on the same key by the same bucket count sort-merge-join
    with zero Exchange (verify: plan has no Exchange above either scan).
    Requires a catalog table (bucket metadata lives there) — works with
    Spark's default in-memory/derby catalog."""
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS {table_name}")
        # a dropped-from-catalog table can leave its managed location behind
        # (e.g. across sessions with the in-memory catalog); clear it
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        leftover = f"{wh}/{table_name.lower()}"
        shutil.rmtree(leftover, ignore_errors=True)
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)
    return table_name
