"""FeatureSet — id/event-time-keyed feature table (SURVEY §1.1-1.2).

Reference behavior re-expressed (citations into /root/reference):
- id_column auto-generation — pandas_to_features.py:94-104
- event_time auto-fill with now() — pandas_to_features.py:106-129
- type-coercion contract (Integral/Fractional/String only; bool→int,
  datetime→ISO string) — pandas_to_features.py:243-280
- snapshot semantics: latest row per id via row_number window, AWS
  tiebreakers, is_deleted filter — feature_set_core.py:370-391
- always-dropped AWS columns — feature_set_core.py:302-306
- training view with roles — view_utils.py:154-215
- name-rewrite in user SQL — feature_set_core.py:270-284
- training-data export — feature_set_core.py:342-368
- temporal split — feature_set_core.py:516-542

The offline store is a parquet dataset in append mode: event-time
versions accumulate; every read resolves the current snapshot with the
W1 window (one shuffle on id — the canonical upsert-log pattern, scale-
safe because the window state is one row per id).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from workbench_spark.api.data_source import AWS_INTERNAL_COLUMNS, sanitize_columns
from workbench_spark.api.registry import Registry, validate_name
from workbench_spark.operators.joins import training_view
from workbench_spark.operators.windows import latest_snapshot, temporal_split

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def coerce_feature_types(df: DataFrame) -> DataFrame:
    """The FeatureSet type contract (pandas_to_features.py:243-280):
    only integral / fractional / string survive. bool→int, timestamp→
    ISO-8601 string, date→ISO string, decimal→double."""
    out = df
    for f in df.schema.fields:
        c = f.name
        if isinstance(f.dataType, T.BooleanType):
            out = out.withColumn(c, F.col(c).cast("int"))
        elif isinstance(f.dataType, T.TimestampType):
            out = out.withColumn(c, F.date_format(c, ISO_FMT))
        elif isinstance(f.dataType, T.DateType):
            out = out.withColumn(c, F.date_format(c, "yyyy-MM-dd"))
        elif isinstance(f.dataType, T.DecimalType):
            out = out.withColumn(c, F.col(c).cast("double"))
        elif not isinstance(
            f.dataType, (T.StringType, T.IntegerType, T.LongType, T.ShortType, T.ByteType, T.FloatType, T.DoubleType)
        ):
            out = out.withColumn(c, F.col(c).cast("string"))
    return out


class FeatureSet:
    def __init__(
        self,
        source: Any = None,
        name: str | None = None,
        id_column: str | None = None,
        event_time_column: str | None = None,
        one_hot_columns: list[str] | None = None,
        spark: SparkSession | None = None,
        warehouse: str | None = None,
        layout: dict | None = None,
    ):
        from workbench_spark.session import get_spark

        self.spark = spark or get_spark()
        self.registry = Registry(warehouse)
        # pruning-friendly offline-store layout (write_layout kwargs);
        # applied to every ingest batch — appends cluster within the batch
        self._layout = dict(layout) if layout else None
        if source is None:
            self.name = validate_name(name)
            meta = self.registry.read_meta(self.name)
            if meta.get("artifact_type") != "feature_set":
                raise ValueError(f"FeatureSet {self.name!r} not found")
            self.id_column = meta["id_column"]
            self.event_time_column = meta["event_time_column"]
        else:
            self.name = validate_name(name)
            self.id_column = id_column or "auto_id"
            self.event_time_column = event_time_column or "event_time"
            self._ingest(source, one_hot_columns or [])
        self._register_view()

    # ------------------------------------------------------------ ingest
    def _ingest(self, source: Any, one_hot_columns: list[str]) -> None:
        df = source if isinstance(source, DataFrame) else self.spark.createDataFrame(source)
        df = sanitize_columns(df)
        if self.id_column not in df.columns:
            # auto id (pandas_to_features.py:94-104) — deterministic order
            # not guaranteed across partitions; zipWithIndex-equivalent
            df = df.withColumn(self.id_column, F.monotonically_increasing_id())
        if self.event_time_column not in df.columns:
            df = df.withColumn(
                self.event_time_column, F.date_format(F.current_timestamp(), ISO_FMT)
            )
        if one_hot_columns:
            from workbench_spark.functions.encoding import one_hot_encode

            df = one_hot_encode(df, one_hot_columns)
        df = coerce_feature_types(df)
        # synthesize AWS bookkeeping columns so reference-shaped snapshot
        # SQL works unchanged (feature_set_core.py:370-391 tiebreakers)
        df = (
            df.withColumn("write_time", F.current_timestamp())
            .withColumn("api_invocation_time", F.current_timestamp())
            .withColumn("is_deleted", F.lit(False))
        )
        if self._layout:
            from workbench_spark.sources.layout import write_layout

            write_layout(
                df, self.registry.data_path(self.name), mode="append", **self._layout
            )
        else:
            df.write.mode("append").parquet(self.registry.data_path(self.name))
        meta = {
            "artifact_type": "feature_set",
            "status": "ready",
            "id_column": self.id_column,
            "event_time_column": self.event_time_column,
            "tags": [self.name],
        }
        if self._layout:
            meta["layout"] = self._layout
        self.registry.upsert_meta(self.name, meta)

    def append(self, df: DataFrame) -> None:
        """S8-style incremental ingest: event-time versions accumulate;
        snapshot resolves to the latest per id."""
        self._ingest(df, [])

    def _register_view(self) -> str:
        """Register the snapshot under a distinct view name (so the rewrite
        in query() is a real rewrite, not a same-name no-op)."""
        view = f"{self.name}___snapshot"
        self.snapshot().createOrReplaceTempView(view)
        return view

    # ------------------------------------------------------------ reads
    def offline_store(self) -> DataFrame:
        """Raw versioned rows, AWS bookkeeping included."""
        return self.spark.read.parquet(self.registry.data_path(self.name))

    def snapshot(self) -> DataFrame:
        """W1 — current rows: latest per id, tiebroken like the reference,
        soft-deletes dropped, AWS columns removed (feature_set_core.py:
        370-391 + 302-306)."""
        snap = latest_snapshot(
            self.offline_store(),
            self.id_column,
            self.event_time_column,
            tiebreakers=["api_invocation_time", "write_time"],
            deleted_column="is_deleted",
        )
        drop = [c for c in AWS_INTERNAL_COLUMNS if c != "event_time" and c in snap.columns]
        return snap.drop(*drop)

    def pull_dataframe(self, limit: int = 100_000) -> DataFrame:
        return self.snapshot().limit(limit)

    def query(self, sql: str) -> DataFrame:
        """P7 — whole-word rewrite of the FeatureSet name to its snapshot
        view (feature_set_core.py:270-284)."""
        view = self._register_view()
        rewritten = re.sub(rf"\b{re.escape(self.name)}\b", view, sql)
        return self.spark.sql(rewritten)

    def num_rows(self) -> int:
        return self.snapshot().count()

    @property
    def columns(self) -> list[str]:
        return self.snapshot().columns

    # ------------------------------------------------------------ training
    def set_training_roles(self, roles: DataFrame) -> None:
        """J2 — store the sparse roles table (id, sample_weight, validation,
        exclude) as a supplemental artifact (view_utils.py:96-152)."""
        roles.write.mode("overwrite").parquet(
            self.registry.data_path(f"_{self.name}___training_roles")
        )
        self.registry.upsert_meta(
            f"_{self.name}___training_roles", {"artifact_type": "supplemental"}
        )
        # re-stamp the FEATURE SET's own meta too: roles change its derived
        # views (training_view), so Modified-stamp caches (CachedFeatureSet)
        # must see the artifact as changed, not just its supplemental table
        self.registry.upsert_meta(self.name, {})

    def training_view(self) -> DataFrame:
        """J2/P5 — snapshot LEFT JOIN roles + COALESCE defaults + exclude
        filter (view_utils.py:154-215)."""
        roles_name = f"_{self.name}___training_roles"
        roles = None
        if self.registry.exists(roles_name):
            roles = self.spark.read.parquet(self.registry.data_path(roles_name))
        return training_view(self.snapshot(), roles, self.id_column)

    def create_training_data(
        self,
        path: str | None = None,
        fmt: str = "parquet",
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
    ) -> str:
        """S9 — export the training view (feature_set_core.py:342-368;
        reference writes CSV via Athena — parquet default here, csv
        opt-in). partition_by/sort_by/zorder_by route the parquet export
        through the pruning-friendly writer (sources/layout.py) so the
        downstream training scan can partition-prune and footer-skip."""
        import os

        out = path or os.path.join(self.registry.artifact_dir(self.name), "training_data")
        if fmt != "csv" and (partition_by or sort_by or zorder_by):
            from workbench_spark.sources.layout import write_layout

            write_layout(
                self.training_view(), out,
                partition_by=partition_by, sort_by=sort_by, zorder_by=zorder_by,
            )
            return out
        w = self.training_view().write.mode("overwrite")
        (w.option("header", True).csv(out) if fmt == "csv" else w.parquet(out))
        return out

    def temporal_split(self, cutoff: str) -> tuple[DataFrame, DataFrame]:
        """O5 — (feature_set_core.py:516-542)."""
        return temporal_split(self.snapshot(), self.event_time_column, cutoff)

    def to_data_source(self, name: str | None = None):
        from workbench_spark.api.data_source import DataSource

        return DataSource(self.snapshot(), name or f"{self.name}_ds")

    def delete(self) -> None:
        self.registry.delete(self.name)
        self.registry.delete(f"_{self.name}___training_roles")

    def __repr__(self) -> str:  # pragma: no cover
        return f"FeatureSet({self.name!r}, id={self.id_column!r})"


# convenience chaining (reference: api/feature_set.py to_model →
# FeaturesToModel; trains on the role-aware training view)
def _to_model(self, name=None, target=None, features=None, model_type="regressor", algo="xgb", **kwargs):
    from workbench_spark.api.model import Model

    tv = self.training_view()
    feats = features or [
        c for c, t in tv.dtypes
        if c not in (target, self.id_column, self.event_time_column,
                     "sample_weight", "validation")
        and t in ("int", "bigint", "float", "double", "smallint", "tinyint")
    ]
    return Model.train(
        tv, name or f"{self.name}_model", target=target, features=feats,
        model_type=model_type, algo=algo, spark=self.spark,
        warehouse=self.registry.warehouse, **kwargs,
    )


FeatureSet.to_model = _to_model
