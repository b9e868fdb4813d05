"""InferenceCache — skip already-predicted rows via a row-hash anti-join
(SURVEY §4; reference: api/inference_cache.py:109-160 keeps a client-side
cache keyed by row hash).

Spark-first: the cache is a parquet dataset of (row_hash, prediction
columns); lookup is a broadcast-able anti-join (new rows) + semi-join
(cached rows) — the Delta-MERGE shape without needing Delta."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from workbench_spark.operators.hashing import row_hash


class InferenceCache:
    def __init__(
        self,
        model_name: str,
        spark: SparkSession | None = None,
        root: str | None = None,
        key_cols: list[str] | None = None,
    ):
        from workbench_spark.api.stores import _DEFAULT_ROOT
        from workbench_spark.session import get_spark

        self.spark = spark or get_spark()
        self.model_name = model_name
        self.path = os.path.abspath(
            os.path.join(root or _DEFAULT_ROOT, "inference_cache", model_name)
        )
        self.key_cols = key_cols

    def _hashed(self, df: DataFrame) -> DataFrame:
        return row_hash(df, self.key_cols, "__row_hash")

    def cached(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def split(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        """(uncached_rows, cached_results): anti-join for rows needing
        inference; inner join attaching cached predictions for the rest."""
        hashed = self._hashed(df)
        cache = self.cached()
        if cache is None:
            return hashed.drop("__row_hash"), None
        keys = cache.select("__row_hash").distinct()
        need = hashed.join(F.broadcast(keys), "__row_hash", "left_anti").drop("__row_hash")
        hit = hashed.select("__row_hash").join(cache, "__row_hash").drop("__row_hash")
        return need, hit

    def add(self, df: DataFrame, result_cols: list[str]) -> None:
        """Store predictions keyed by input-row hash (input columns = all
        non-result columns unless key_cols pinned)."""
        in_cols = self.key_cols or [c for c in df.columns if c not in result_cols]
        hashed = row_hash(df, in_cols, "__row_hash")
        hashed.select("__row_hash", *df.columns).write.mode("append").parquet(self.path)

    def clear(self) -> None:
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
