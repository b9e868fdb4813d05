"""Auxiliary stores: DFStore, ParameterStore, InferenceStore, GraphStore
(SURVEY §1.1 S10-S13, §2.1).

Reference behavior re-expressed:
- DFStore: path-addressed Parquet KV with concurrency-safe append —
  core/df_store_core.py:188-263
- ParameterStore: small-JSON KV with gzip above 4KB —
  core/parameter_store_core.py:102-229
- InferenceStore: append-only 7-column table + raw SQL + tags
  string↔list — api/inference_store.py:38-141
- GraphStore: named graphs as node-link JSON — api/graph_store.py:72-91
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DEFAULT_ROOT = os.environ.get(
    "SPARK_GRAFT_STORE_ROOT",
    os.path.join(os.path.dirname(__file__), "..", "..", ".warehouse", "_stores"),
)


def _loc_to_path(root: str, location: str) -> str:
    clean = location.strip("/").replace("..", "_")
    return os.path.join(root, clean)


class DFStore:
    """S10 — path-addressed DataFrame KV on parquet datasets."""

    def __init__(self, spark: SparkSession | None = None, root: str | None = None):
        from workbench_spark.session import get_spark

        self.spark = spark or get_spark()
        self.root = os.path.abspath(os.path.join(root or _DEFAULT_ROOT, "df"))
        os.makedirs(self.root, exist_ok=True)

    def get(self, location: str) -> DataFrame | None:
        p = _loc_to_path(self.root, location)
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def upsert(self, location: str, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(_loc_to_path(self.root, location))

    def append(self, location: str, df: DataFrame) -> None:
        """Concurrency-safe append = unique part files in the same dataset
        dir (df_store_core.py:227-263) — exactly parquet append mode."""
        df.write.mode("append").parquet(_loc_to_path(self.root, location))

    def delete(self, location: str) -> None:
        p = _loc_to_path(self.root, location)
        if os.path.exists(p):
            shutil.rmtree(p)

    def list(self, prefix: str = "") -> list[str]:
        base = _loc_to_path(self.root, prefix) if prefix else self.root
        out = []
        for p in glob.glob(os.path.join(base, "**", "_SUCCESS"), recursive=True):
            out.append(os.path.relpath(os.path.dirname(p), self.root))
        return sorted(out)


class ParameterStore:
    """S13 — small-JSON KV; values above 4KB are gzip'd transparently
    (parameter_store_core.py:102-186 SSM 4KB limit contract)."""

    COMPRESS_LIMIT = 4096

    def __init__(self, root: str | None = None):
        self.root = os.path.abspath(os.path.join(root or _DEFAULT_ROOT, "params"))
        os.makedirs(self.root, exist_ok=True)

    def _path(self, name: str) -> str:
        return _loc_to_path(self.root, name) + ".json"

    def upsert(self, name: str, value) -> None:
        # tmp + os.replace: a concurrent reader never observes a truncated
        # file (the store is advertised as cross-process shared state)
        raw = json.dumps(value).encode()
        p = self._path(name)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        if len(raw) > self.COMPRESS_LIMIT:
            tmp = p + f".gz.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(gzip.compress(raw))
            os.replace(tmp, p + ".gz")
            if os.path.exists(p):
                os.remove(p)
        else:
            tmp = p + f".tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                f.write(raw)
            os.replace(tmp, p)
            if os.path.exists(p + ".gz"):
                os.remove(p + ".gz")

    def get(self, name: str):
        # unreadable/garbled entries (lost race with a writer on a filesystem
        # without atomic replace, partial gz) read as a miss, not a crash
        p = self._path(name)
        try:
            if os.path.exists(p):
                with open(p, "rb") as f:
                    return json.loads(f.read())
            if os.path.exists(p + ".gz"):
                with open(p + ".gz", "rb") as f:
                    return json.loads(gzip.decompress(f.read()))
        except (ValueError, OSError, EOFError):
            # ValueError covers json decode; OSError covers BadGzipFile and
            # fs errors; EOFError is gzip's truncated-stream signal
            return None
        return None

    def delete(self, name: str) -> None:
        for p in (self._path(name), self._path(name) + ".gz"):
            if os.path.exists(p):
                os.remove(p)

    def list(self, prefix: str = "") -> list[str]:
        out = []
        for p in glob.glob(os.path.join(self.root, "**", "*.json*"), recursive=True):
            rel = os.path.relpath(p, self.root)
            rel = rel.removesuffix(".gz").removesuffix(".json")
            if rel.startswith(prefix):
                out.append(rel)
        return sorted(set(out))


INFERENCE_SCHEMA = "id string, model string, pred_label string, pred_value double, tags string, meta string, timestamp timestamp"


class InferenceStore:
    """S11 — append-only inference-results table with the reference's fixed
    7-column schema (inference_store.py:38) and tags string↔list round-trip
    (inference_store.py:127-129)."""

    def __init__(self, spark: SparkSession | None = None, root: str | None = None):
        from workbench_spark.session import get_spark

        self.spark = spark or get_spark()
        self.path = os.path.abspath(os.path.join(root or _DEFAULT_ROOT, "inference_store"))

    def add_inference_results(
        self,
        df: DataFrame,
        model: str,
        schema_map: dict[str, str] | None = None,
        meta_fields: list[str] | None = None,
        tags: list[str] | None = None,
    ) -> None:
        """Enforce schema: rename via schema_map, JSON-pack meta_fields into
        ``meta``, stringify tags as '[a, b]' (inference_store.py:46-99)."""
        out = df
        for src, dst in (schema_map or {}).items():
            out = out.withColumnRenamed(src, dst)
        if meta_fields:
            out = out.withColumn(
                "meta", F.to_json(F.struct(*[F.col(c) for c in meta_fields]))
            ).drop(*meta_fields)
        if "meta" not in out.columns:
            out = out.withColumn("meta", F.lit("{}"))
        out = out.withColumn("model", F.lit(model))
        out = out.withColumn(
            "tags", F.lit("[" + ", ".join(tags or []) + "]")
        )
        if "timestamp" not in out.columns:
            out = out.withColumn("timestamp", F.current_timestamp())
        if "pred_label" not in out.columns:
            out = out.withColumn("pred_label", F.lit(None).cast("string"))
        if "pred_value" not in out.columns:
            out = out.withColumn("pred_value", F.lit(None).cast("double"))
        final = out.select(
            F.col("id").cast("string"),
            "model",
            "pred_label",
            F.col("pred_value").cast("double"),
            "tags",
            "meta",
            "timestamp",
        )
        final.write.mode("append").parquet(self.path)

    def df(self) -> DataFrame:
        return self.spark.read.schema(INFERENCE_SCHEMA).parquet(self.path)

    def query(self, sql: str) -> DataFrame:
        """Raw SQL over the store; tags parsed back to array
        (inference_store.py:112-141)."""
        self.df().createOrReplaceTempView("inference_store")
        out = self.spark.sql(sql)
        if "tags" in out.columns:
            out = out.withColumn(
                "tags",
                F.filter(
                    F.split(F.regexp_replace("tags", r"^\[|\]$", ""), ",\\s*"),
                    lambda t: F.length(t) > 0,
                ),
            )
        return out

    def delete(self) -> None:
        if os.path.exists(self.path):
            shutil.rmtree(self.path)


class GraphStore:
    """S12 — named graphs as node-link JSON files; driver-side for small
    graphs (api/graph_store.py:72-91; the reference stores NetworkX JSON).
    Edge/vertex DataFrames for at-scale graph work live in
    operators/graph.py (proximity graphs)."""

    def __init__(self, root: str | None = None):
        self.root = os.path.abspath(os.path.join(root or _DEFAULT_ROOT, "graphs"))
        os.makedirs(self.root, exist_ok=True)

    def _path(self, location: str) -> str:
        return _loc_to_path(self.root, location) + ".json"

    def upsert(self, location: str, graph: dict) -> None:
        """graph = node-link dict: {"nodes": [...], "links"/"edges": [...]}"""
        p = self._path(location)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            json.dump(graph, f)

    def get(self, location: str) -> dict | None:
        p = self._path(location)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def edges_df(self, location: str, spark: SparkSession | None = None) -> DataFrame | None:
        from workbench_spark.session import get_spark

        g = self.get(location)
        if g is None:
            return None
        spark = spark or get_spark()
        edges = g.get("links", g.get("edges", []))
        return spark.createDataFrame(edges) if edges else None

    def delete(self, location: str) -> None:
        p = self._path(location)
        if os.path.exists(p):
            os.remove(p)

    def list(self, prefix: str = "") -> list[str]:
        out = []
        for p in glob.glob(os.path.join(self.root, "**", "*.json"), recursive=True):
            rel = os.path.relpath(p, self.root).removesuffix(".json")
            if rel.startswith(prefix):
                out.append(rel)
        return sorted(out)


def cache_dataframe(location: str, root: str | None = None):
    """S15 — transparent DataFrame-result cache decorator
    (cloud_platform/aws/cache_dataframe.py:22-57): caches the wrapped
    method's DataFrame to the DFStore keyed by {artifact_name}/{location}
    [+ args]; subsequent calls read the parquet instead of recomputing.
    Invalidate by deleting the location (data_source_abstract.py:310-317)."""

    def deco(fn):
        import functools

        @functools.wraps(fn)
        def wrapper(self, *args, **kwargs):
            key_extra = "_".join(str(a) for a in args) if args else ""
            key = f"{getattr(self, 'name', type(self).__name__)}/{location}"
            if key_extra:
                key = f"{key}_{key_extra}"
            store = DFStore(getattr(self, "spark", None), root=root)
            hit = store.get(key)
            if hit is not None:
                return hit
            out = fn(self, *args, **kwargs)
            store.upsert(key, out)
            return store.get(key)

        return wrapper

    return deco
