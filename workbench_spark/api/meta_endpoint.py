"""Import-path parity shim (reference: api/meta_endpoint.py) — the
MetaEndpoint DAG lives in plans/transform.py with the Transform ABC."""

from workbench_spark.plans.transform import MetaEndpointDag
from workbench_spark.plans.transform import MetaEndpointDag as MetaEndpoint

__all__ = ["MetaEndpoint", "MetaEndpointDag"]
