"""Import-path parity shim (reference: api/parameter_store.py)."""

from workbench_spark.api.stores import ParameterStore

__all__ = ["ParameterStore"]
