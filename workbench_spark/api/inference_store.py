"""Import-path parity shim (reference: api/inference_store.py)."""

from workbench_spark.api.stores import InferenceStore

__all__ = ["InferenceStore"]
