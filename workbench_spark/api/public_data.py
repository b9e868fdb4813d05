"""PublicData — read-only list/get over a shared dataset root
(reference api/public_data.py:15-143).

The reference reads an anonymous public S3 bucket via boto3. Engine-side
the surface is storage-agnostic: any Spark-readable directory tree of
parquet/csv/json datasets (S3A URIs on a real cluster, a filesystem path
locally). Same calls: list() → relative dataset names without
extensions, get(name) → DataFrame, describe(name)/details().
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame, SparkSession

_EXTS = (".parquet", ".csv", ".jsonl", ".json")


class PublicData:
    """Read-only list/get interface for shared datasets.

    Common usage::

        public_data = PublicData(root="s3a://my-public-bucket")  # or a path
        public_data.list()
        df = public_data.get("comp_chem/aqsol/aqsol_public_data")
    """

    def __init__(self, root: str | None = None, spark: SparkSession | None = None):
        from workbench_spark.session import get_spark

        self.log = logging.getLogger("workbench_spark")
        self.root = root or os.environ.get(
            "WORKBENCH_PUBLIC_DATA", "/tmp/workbench_public_data"
        )
        self.spark = spark or get_spark()

    def list(self) -> list[str]:
        """All dataset names (relative paths, extensions stripped). A
        dataset is either a plain file or a Spark-written dataset
        DIRECTORY whose name carries the extension (x.parquet/part-*);
        directories are not descended into."""
        out = []
        for dirpath, dirnames, filenames in os.walk(self.root):
            for d in list(dirnames):
                if d.endswith(_EXTS):
                    rel = os.path.relpath(os.path.join(dirpath, d), self.root)
                    out.append(rel[: rel.rfind(".")])
                    dirnames.remove(d)  # dataset dir: don't descend
            for fn in filenames:
                if fn.endswith(_EXTS):
                    rel = os.path.relpath(os.path.join(dirpath, fn), self.root)
                    out.append(rel[: rel.rfind(".")])
        return sorted(set(out))

    def _resolve(self, name: str) -> str | None:
        for ext in _EXTS:
            p = os.path.join(self.root, name + ext)
            if os.path.exists(p):
                return p
        return None

    def get(self, name: str) -> DataFrame | None:
        """Dataset by name; None when absent (reference
        not_found_returns_none behavior)."""
        p = self._resolve(name)
        if p is None:
            self.log.warning("public dataset not found: %s", name)
            return None
        if p.endswith(".parquet"):
            return self.spark.read.parquet(p)
        if p.endswith(".csv"):
            return self.spark.read.option("header", True).csv(p, inferSchema=True)
        return self.spark.read.json(p)

    def describe(self, name: str) -> dict | None:
        """Schema + row count summary for one dataset."""
        df = self.get(name)
        if df is None:
            return None
        return {
            "name": name,
            "columns": df.columns,
            "dtypes": dict(df.dtypes),
            "rows": df.count(),
        }

    def details(self):
        """One row per dataset: (name, n_columns, rows)."""
        rows = []
        for name in self.list():
            df = self.get(name)
            if df is not None:
                rows.append((name, len(df.columns), df.count()))
        return self.spark.createDataFrame(
            rows, "name string, n_columns int, rows long"
        )

    def __repr__(self) -> str:
        return f"PublicData(root={self.root!r})"
