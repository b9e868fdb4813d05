"""DataSource — the queryable-table artifact (SURVEY §1.1, §3.1-3.2).

Reference behavior being re-expressed (citations into /root/reference):
- construction dispatch on source type — api/data_source.py:33-63,152-174
- ingest pipeline: lowercase cols, object→string — pandas_to_data.py:94-170
- query(sql) → engine — athena_source.py:206-244 (here: spark.sql)
- num_rows/columns/column_types — athena_source.py:187-204
- onboard(): display/computation views + sample/column_stats/outliers/
  smart_sample, all cached — data_source_abstract.py:274-318
- pull_dataframe LIMIT default 100k — view.py:94-107
- view naming {base}___{view} — view.py:128-139

Spark-first: the table is a parquet dataset registered as a temp view;
every stat is a fused DataFrame aggregation (see operators/eda.py); stats
cache into the artifact's JSON sidecar (the reference caches into Glue
table parameters).
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from workbench_spark.api.registry import Registry, validate_name
from workbench_spark.operators import eda

AWS_INTERNAL_COLUMNS = ["write_time", "api_invocation_time", "is_deleted", "event_time"]


def sanitize_columns(df: DataFrame) -> DataFrame:
    """Lowercase + sanitize column names ([^a-zA-Z0-9_]→_) per the
    reference's Athena constraint (pandas_to_data.py:110-115,
    pandas_to_features.py:137-184)."""
    cleaned = [re.sub(r"[^a-zA-Z0-9_]", "_", c).lower() for c in df.columns]
    return df.toDF(*cleaned)


class DataSource:
    """Named, queryable, stats-bearing table artifact."""

    def __init__(
        self,
        source: Any = None,
        name: str | None = None,
        spark: SparkSession | None = None,
        warehouse: str | None = None,
        onboard: bool = True,
        layout: dict | None = None,
    ):
        from workbench_spark.session import get_spark

        self.spark = spark or get_spark()
        self.registry = Registry(warehouse)
        # pruning-friendly write layout (sources/layout.py write_layout
        # kwargs: partition_by / sort_by / zorder_by / max_records_per_file)
        # — applied at ingest; compact() re-layouts an existing artifact
        self._layout = dict(layout) if layout else None
        if source is None and name is None:
            raise ValueError("need a source and/or a name")
        if source is None:
            # attach to existing artifact
            self.name = validate_name(name)
            if not self.registry.exists(self.name):
                raise ValueError(f"DataSource {self.name!r} not found")
        else:
            self.name = validate_name(name) if name else self._derive_name(source)
            self._load_source(source)
            if onboard:
                self.onboard()
        self._register_view()

    # ------------------------------------------------------------- ingest
    @staticmethod
    def _derive_name(source: Any) -> str:
        if isinstance(source, str):
            import os

            return validate_name(os.path.splitext(os.path.basename(source))[0])
        raise ValueError("name required for non-path sources")

    def _load_source(self, source: Any) -> None:
        """S1/S2/S5 loaders (csv_to_data_source.py:38-60,
        json_to_data_source.py:37-58, pandas_to_data.py:94-170)."""
        spark = self.spark
        if isinstance(source, DataFrame):
            df = source
        elif type(source).__name__ == "DataFrame":  # pandas without import cost
            df = spark.createDataFrame(source)
        elif isinstance(source, str):
            if source.endswith(".csv"):
                df = spark.read.csv(source, header=True, inferSchema=True)
            elif source.endswith((".json", ".jsonl")):
                df = spark.read.json(source)
            elif source.endswith(".parquet") or "/" in source:
                df = spark.read.parquet(source)
            else:
                raise ValueError(f"unsupported source: {source}")
        else:
            raise ValueError(f"unsupported source type: {type(source)}")
        df = sanitize_columns(df)
        if self._layout:
            from workbench_spark.sources.layout import write_layout

            write_layout(df, self.registry.data_path(self.name), **self._layout)
        else:
            df.write.mode("overwrite").parquet(self.registry.data_path(self.name))
        meta = {"artifact_type": "data_source", "status": "loaded", "tags": [self.name]}
        if self._layout:
            meta["layout"] = self._layout
        self.registry.upsert_meta(self.name, meta)

    def _register_view(self) -> None:
        self.df().createOrReplaceTempView(self.name)

    def compact(
        self,
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        max_records_per_file: int | None = None,
    ) -> "DataSource":
        """Rewrite the stored parquet with a pruning-friendly layout — the
        OPTIMIZE / ZORDER maintenance operation (sources/layout.py).

        Spark cannot overwrite a path it is lazily reading, so the rewrite
        lands in a sibling temp directory and is swapped in atomically-ish
        with a filesystem rename (an object store would swap a manifest the
        same way). The registered view re-points at the new layout."""
        import shutil
        import uuid

        from workbench_spark.sources.layout import write_layout

        path = self.registry.data_path(self.name)
        tmp = f"{path}__compact_{uuid.uuid4().hex[:8]}"
        layout = {
            "partition_by": partition_by,
            "sort_by": sort_by,
            "zorder_by": zorder_by,
            "max_records_per_file": max_records_per_file,
        }
        layout = {k: v for k, v in layout.items() if v}
        write_layout(self.df(), tmp, **layout)
        # Crash-safe swap: move the old layout ASIDE first so a failure
        # between steps never leaves the artifact missing — worst case the
        # original is still recoverable at path__old. Only after the new
        # layout is in place do we delete the old copy and update metadata.
        old = f"{path}__old_{uuid.uuid4().hex[:8]}"
        shutil.move(path, old)
        try:
            shutil.move(tmp, path)
        except Exception:
            shutil.move(old, path)  # roll back: restore the original
            raise
        shutil.rmtree(old)
        self.registry.upsert_meta(self.name, {"layout": layout})
        self._layout = layout
        self._register_view()
        return self

    # ------------------------------------------------------------- basics
    def df(self) -> DataFrame:
        return self.spark.read.parquet(self.registry.data_path(self.name))

    def query(self, sql: str, dialect: str = "athena") -> DataFrame:
        """§3.1 — SQL straight to the engine (athena_source.py:206-244 →
        spark.sql). Views referenced as {name} or {name}___{view}.

        dialect='athena' (default, drop-in parity) runs reference-shaped
        Presto SQL through the dialect shim (double-quoted identifiers,
        TABLESAMPLE BERNOULLI, VARCHAR casts...); dialect='spark' passes
        the string through untouched."""
        if dialect == "athena":
            from workbench_spark.functions.athena_sql import translate_athena_sql

            sql = translate_athena_sql(sql)
        self._register_view()
        for v in self.views():
            self._materialize_view(v)
        return self.spark.sql(sql)

    def pull_dataframe(self, limit: int = 100_000) -> DataFrame:
        """Default-LIMIT pull (view.py:94-107)."""
        return self.df().limit(limit)

    def num_rows(self) -> int:
        return self.df().count()

    def num_columns(self) -> int:
        return len(self.columns)

    @property
    def columns(self) -> list[str]:
        return self.df().columns

    def column_types(self) -> dict[str, str]:
        return dict(self.df().dtypes)

    def ready(self) -> bool:
        """Artifact readiness gate (data_source_abstract.py:259-272: ready
        when smart_sample has been computed)."""
        return "smart_sample_rows" in self.registry.read_meta(self.name).get("stats", {})

    def delete(self) -> None:
        self.registry.delete(self.name)
        self.spark.catalog.dropTempView(self.name)

    # ------------------------------------------------------------- views
    def view_name(self, view: str) -> str:
        return f"{self.name}___{view}"

    def views(self) -> list[str]:
        return list(self.registry.read_meta(self.name).get("views", {}))

    def create_view(self, view: str, columns: list[str] | None = None) -> str:
        """P1-P3 — column-subset view (column_subset_view.py:35-90):
        persisted as a column list in metadata, registered as a temp view."""
        meta = self.registry.read_meta(self.name)
        views = meta.get("views", {})
        cols = columns or [c for c in self.columns if c not in AWS_INTERNAL_COLUMNS][:30]
        views[view] = cols
        self.registry.upsert_meta(self.name, {"views": views})
        self._materialize_view(view)
        return self.view_name(view)

    def _materialize_view(self, view: str) -> None:
        cols = self.registry.read_meta(self.name).get("views", {}).get(view)
        if cols:
            self.df().select(*cols).createOrReplaceTempView(self.view_name(view))

    def view_df(self, view: str) -> DataFrame:
        cols = self.registry.read_meta(self.name).get("views", {}).get(view)
        if cols is None:
            raise ValueError(f"view {view!r} not found on {self.name!r}")
        return self.df().select(*cols)

    def set_display_columns(self, columns: list[str]) -> None:
        self.create_view("display", columns)

    def set_computation_columns(self, columns: list[str]) -> None:
        """P3 — recompute stats on computation-view change
        (data_source_abstract.py:104-134)."""
        self.create_view("computation", columns)
        self.recompute_stats()

    # ------------------------------------------------------------- stats
    def onboard(self) -> None:
        """§3.2 — ensure display/computation views then compute + cache the
        EDA stat suite (data_source_abstract.py:274-318)."""
        self._register_view()
        meta = self.registry.read_meta(self.name)
        views = meta.get("views", {})
        if "display" not in views:
            self.create_view("display")
        if "computation" not in views:
            self.create_view("computation")
        self.recompute_stats()
        self.registry.upsert_meta(self.name, {"status": "ready"})

    def recompute_stats(self) -> dict:
        df = self.view_df("computation") if "computation" in self.views() else self.df()
        total = df.count()
        stats: dict = {"num_rows": total}
        stats["column_stats"] = eda.column_stats(df)
        sample = eda.sample_rows(df, rows=100, total=total)
        stats["sample_rows"] = sample.count()
        smart = eda.smart_sample(df)
        stats["smart_sample_rows"] = smart.count()
        self.registry.upsert_meta(self.name, {"stats": stats})
        return stats

    def cached_stats(self) -> dict:
        return self.registry.read_meta(self.name).get("stats", {})

    def sample(self, rows: int = 100) -> DataFrame:
        """O3 — Bernoulli sample w/ fudge+clamp (sample_rows.py:33-49)."""
        return eda.sample_rows(self.df(), rows=rows)

    def descriptive_stats(self, exact: bool = False) -> DataFrame:
        return eda.descriptive_stats(self.df(), exact=exact)

    def value_counts(self, column: str, top_n: int = 20) -> DataFrame:
        return eda.value_counts(self.df(), column, top_n)

    def correlations(self) -> DataFrame:
        return eda.correlations(self.df())

    def column_stats(self, exact: bool = False) -> dict:
        return eda.column_stats(self.df(), exact=exact)

    def outliers(self, scale: float = 1.5, exact: bool = False) -> DataFrame:
        return eda.outliers(self.df(), scale=scale, exact=exact)

    def smart_sample(self) -> DataFrame:
        return eda.smart_sample(self.df())

    # ------------------------------------------------------------- meta
    def set_tags(self, tags: list[str]) -> None:
        self.registry.upsert_meta(self.name, {"tags": tags})

    def get_tags(self) -> list[str]:
        return self.registry.read_meta(self.name).get("tags", [])

    def upsert_workbench_meta(self, updates: dict) -> None:
        meta = self.registry.read_meta(self.name)
        wb = meta.get("workbench_meta", {})
        wb.update(updates)
        self.registry.upsert_meta(self.name, {"workbench_meta": wb})

    def workbench_meta(self) -> dict:
        return self.registry.read_meta(self.name).get("workbench_meta", {})

    def __repr__(self) -> str:  # pragma: no cover
        return f"DataSource({self.name!r})"


# convenience chaining (reference: api/data_source.py to_features →
# DataToFeaturesLight; the fluent DataSource→FeatureSet→Model flow)
def _to_features(self, name=None, id_column=None, event_time_column=None, one_hot_columns=None):
    from workbench_spark.api.feature_set import FeatureSet

    return FeatureSet(
        self.df(),
        name or f"{self.name}_features",
        id_column=id_column,
        event_time_column=event_time_column,
        one_hot_columns=one_hot_columns,
        spark=self.spark,
        warehouse=self.registry.warehouse,
    )


DataSource.to_features = _to_features
