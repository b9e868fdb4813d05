"""Import-path parity shim (reference: api/graph_store.py)."""

from workbench_spark.api.stores import GraphStore

__all__ = ["GraphStore"]
