"""Import-path parity shim (reference: api/endpoint.py) — Endpoint lives
next to Model in api/model.py (they share the MLlib pipeline plumbing)."""

from workbench_spark.api.model import Endpoint

__all__ = ["Endpoint"]
