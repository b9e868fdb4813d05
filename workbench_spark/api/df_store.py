"""Import-path parity shim (reference: api/df_store.py) — the class lives
in api/stores.py; this keeps `from workbench_spark.api.df_store import
DFStore` working for code ported from the reference layout."""

from workbench_spark.api.stores import DFStore

__all__ = ["DFStore"]
