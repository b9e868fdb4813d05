"""PublicData — read-only list/get over a shared dataset root
(reference api/public_data.py:15-143).

The reference reads an anonymous public S3 bucket via boto3. Engine-side
the surface is storage-agnostic and resolves through the Hadoop
FileSystem API, so the SAME code serves a local directory tree, an
``s3a://`` bucket, HDFS, or any other filesystem Spark's Hadoop
configuration knows — list() → relative dataset names without
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

        public_data = PublicData(root="s3a://a-public-bucket")  # or a path
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

    # ---------------------------------------------------------- hadoop fs
    def _fs_root(self):
        """(FileSystem, Path) for the configured root — works for local
        paths, s3a://, hdfs://, … via the session's Hadoop configuration."""
        jvm = self.spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(self.root)
        fs = path.getFileSystem(self.spark._jsc.hadoopConfiguration())
        return fs, path

    @staticmethod
    def _rel(child_path, root_path) -> str:
        root_uri = root_path.toUri().getPath().rstrip("/")
        child_uri = child_path.toUri().getPath()
        return child_uri[len(root_uri) :].lstrip("/")

    def list(self) -> list[str]:
        """All dataset names (relative paths, extensions stripped). A
        dataset is either a plain file or a Spark-written dataset
        DIRECTORY whose name carries the extension (x.parquet/part-*);
        dataset directories are not descended into."""
        fs, root = self._fs_root()
        if not fs.exists(root):
            return []
        out: set[str] = set()
        stack = [root]
        while stack:
            d = stack.pop()
            for st in fs.listStatus(d):
                p = st.getPath()
                name = p.getName()
                if name.endswith(_EXTS):
                    rel = self._rel(p, root)
                    out.add(rel[: rel.rfind(".")])
                elif st.isDirectory():
                    stack.append(p)
        return sorted(out)

    def _resolve(self, name: str) -> str | None:
        fs, root = self._fs_root()
        jvm = self.spark._jvm
        for ext in _EXTS:
            p = jvm.org.apache.hadoop.fs.Path(root, name + ext)
            if fs.exists(p):
                return p.toString()
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
