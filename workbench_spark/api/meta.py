"""Meta — cross-artifact catalog listings (SURVEY §1.1; reference:
api/meta.py:13-227, aws_meta.py:26-807 assembles boto3 listings into
DataFrames; here the registry sidecars are the single source of truth)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from workbench_spark.api.registry import Registry


class Meta:
    def __init__(self, spark: SparkSession | None = None, warehouse: str | None = None):
        from workbench_spark.session import get_spark

        self.spark = spark or get_spark()
        self.registry = Registry(warehouse)

    def _listing(self, artifact_type: str) -> DataFrame:
        rows = []
        for name in self.registry.list_artifacts(artifact_type):
            m = self.registry.read_meta(name)
            rows.append(
                {
                    "name": name,
                    "status": m.get("status", ""),
                    "tags": ", ".join(m.get("tags", [])),
                    "modified": str(m.get("modified", "")),
                }
            )
        if not rows:
            return self.spark.createDataFrame(
                [], "name string, status string, tags string, modified string"
            )
        return self.spark.createDataFrame(rows).select("name", "status", "tags", "modified")

    def data_sources(self) -> DataFrame:
        return self._listing("data_source")

    def feature_sets(self) -> DataFrame:
        return self._listing("feature_set")

    def models(self) -> DataFrame:
        return self._listing("model")

    def endpoints(self) -> DataFrame:
        return self._listing("endpoint")
