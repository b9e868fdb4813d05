"""Reports — published analysis DataFrames under the /reports subtree
(reference api/reports.py:7-36: a DFStore scoped by path prefix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from workbench_spark.api.stores import DFStore


class Reports(DFStore):
    """A DFStore where every operation is scoped to the /reports subtree.

    Common usage::

        reports = Reports()
        reports.upsert("/contests/my-endpoint", ranked_df)
        reports.list()
        df = reports.get("/contests/my-endpoint")
        reports.delete("/contests/my-endpoint")
    """

    PREFIX = "reports"

    def __init__(self, spark: SparkSession | None = None, root: str | None = None):
        super().__init__(spark=spark, root=root)

    def _scoped(self, location: str) -> str:
        return f"{self.PREFIX}/{location.lstrip('/')}"

    def get(self, location: str) -> DataFrame | None:
        return super().get(self._scoped(location))

    def upsert(self, location: str, df: DataFrame) -> None:
        super().upsert(self._scoped(location), df)

    def append(self, location: str, df: DataFrame) -> None:
        super().append(self._scoped(location), df)

    def delete(self, location: str) -> None:
        super().delete(self._scoped(location))

    def list(self, prefix: str = "") -> list[str]:
        scoped = self._scoped(prefix) if prefix else self.PREFIX
        return [
            loc[len(self.PREFIX) + 1 :] if loc.startswith(self.PREFIX + "/") else loc
            for loc in super().list(scoped)
        ]
