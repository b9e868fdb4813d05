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

    # ---- detailed listings + per-artifact getters (api/meta.py:97-215)
    def _artifact(self, artifact_type: str, name: str) -> dict | None:
        try:
            m = self.registry.read_meta(name)
        except Exception:
            return None
        if not m or m.get("artifact_type") != artifact_type:
            return None
        return m

    def data_source(self, name: str) -> dict | None:
        return self._artifact("data_source", name)

    def feature_set(self, name: str) -> dict | None:
        return self._artifact("feature_set", name)

    def model(self, name: str) -> dict | None:
        return self._artifact("model", name)

    def endpoint(self, name: str) -> dict | None:
        return self._artifact("endpoint", name)

    def models_with_details(self) -> DataFrame:
        """models(details=True) (api/meta.py:108-117): listing plus the
        model-specific columns (type, algo, target)."""
        rows = []
        for name in self.registry.list_artifacts("model"):
            m = self.registry.read_meta(name)
            rows.append(
                {
                    "name": name,
                    "status": m.get("status", ""),
                    "model_type": m.get("model_type", ""),
                    "algo": m.get("algo", ""),
                    "target": str(m.get("target", "")),
                    "tags": ", ".join(m.get("tags", [])),
                }
            )
        schema = "name string, status string, model_type string, algo string, target string, tags string"
        return self.spark.createDataFrame(rows, schema)

    def champion_models(self) -> DataFrame:
        """api/meta.py:130-137 — the model serving each endpoint, one row
        per endpoint: [model, endpoint]. Champions here = the deployed
        model recorded on each endpoint artifact (the reference walks its
        promotion-pipeline nodes; our registry keeps the serving link
        directly on the endpoint meta)."""
        rows = [
            {"model": self.registry.read_meta(name).get("model", ""), "endpoint": name}
            for name in self.registry.list_artifacts("endpoint")
        ]
        return self.spark.createDataFrame(rows, "model string, endpoint string")

    def challenger_models(self, endpoint_name: str, reports=None) -> list:
        """api/meta.py:139-149 — challenger names for an endpoint, looked
        up from the published contest reports (contest_utils semantics):
        rows with role='challenger' whose report names this endpoint."""
        if reports is None:
            return []
        from workbench_spark.api.model_comparison import CONTEST_PREFIX, _report_frame

        out: list[str] = []
        for location in reports.list():
            if not location.lstrip("/").startswith(CONTEST_PREFIX):
                continue
            df = _report_frame(reports, location)
            if df is None or "endpoint" not in df.columns or "role" not in df.columns:
                continue
            rows = df[(df["endpoint"] == endpoint_name) & (df["role"] == "challenger")]
            out.extend(rows["model"].tolist())
        return out

    def config(self) -> dict:
        """api/meta.py:54-60 — the active configuration: warehouse root +
        the Spark conf entries that shape execution (the AWS account
        block has no local counterpart and is omitted)."""
        conf = self.spark.sparkContext.getConf()
        keys = (
            "spark.master",
            "spark.sql.shuffle.partitions",
            "spark.sql.adaptive.enabled",
        )
        return {
            "warehouse": str(self.registry.warehouse),
            **{k: conf.get(k, None) for k in keys},
        }

    def pipelines(self, root: str | None = None) -> list:
        """The ML-pipeline hierarchy (reference Meta.pipelines() /
        pipeline_serializer.pipeline_hierarchy): nested groups of
        linearized artifact-lineage DAGs, discovered from every
        pipelines.json under ``root`` (default: <warehouse>/pipelines).
        """
        from workbench_spark.api.pipelines import pipeline_hierarchy

        import os

        root = root or os.path.join(str(self.registry.warehouse), "pipelines")
        return pipeline_hierarchy(root)

    def pipeline(self, name: str, root: str | None = None) -> dict | None:
        """One pipeline's linearized node-link dict, or None."""
        from workbench_spark.api.pipelines import single_pipeline

        import os

        root = root or os.path.join(str(self.registry.warehouse), "pipelines")
        return single_pipeline(root, name)
