"""SageMaker deployment adapter — the AWS-specific edge kept out of the
engine core (BASELINE.json: "MLlib model training + SageMaker deployment
wrapper").

Re-expresses the reference's endpoint-invocation contract
(endpoint_core.py:814-1004) as a thin adapter:
- chunked CSV inference (default batch 100 rows, metadata-overridable —
  endpoint_core.py:843-846),
- CSV dtype-laundering repair ("N/A"→NaN, "__NA__"→NA, bool-string
  mapping — endpoint_core.py:860-905),
- binary-search error isolation on failing chunks
  (_endpoint_error_handling, endpoint_core.py:906-1004).

boto3/sagemaker are NOT in this container: the transport is injectable
(``invoke_fn``) and the AWS client path raises cleanly when the SDK is
absent. The chunking/repair logic is real and tested — it is the part
that must be byte-compatible with the reference's endpoints.
"""

from __future__ import annotations

import io
from collections.abc import Callable

import pandas as pd

try:  # pragma: no cover - not available in this environment
    import boto3  # type: ignore

    HAVE_BOTO3 = True
except ImportError:
    boto3 = None
    HAVE_BOTO3 = False

DEFAULT_BATCH_ROWS = 100
_BOOL_MAP = {"True": True, "False": False, "true": True, "false": False}


def df_to_csv_payload(df: pd.DataFrame) -> str:
    """Serialize a chunk the way the reference's endpoints expect."""
    buf = io.StringIO()
    df.to_csv(buf, index=False)
    return buf.getvalue()


def csv_payload_to_df(payload: str) -> pd.DataFrame:
    """Deserialize + undo CSV lossiness (endpoint_core.py:860-905)."""
    df = pd.read_csv(io.StringIO(payload), na_values=["N/A"], keep_default_na=True)
    for c in df.columns:
        if df[c].dtype == object:
            vals = df[c].dropna().unique()
            if len(vals) and all(v in _BOOL_MAP for v in vals):
                df[c] = df[c].map(_BOOL_MAP)
            else:
                df[c] = df[c].replace("__NA__", pd.NA)
    return df


def chunked_invoke(
    df: pd.DataFrame,
    invoke_fn: Callable[[str], str],
    batch_rows: int = DEFAULT_BATCH_ROWS,
) -> pd.DataFrame:
    """Chunk → CSV → invoke → parse → stitch, with binary-search isolation
    of failing chunks (failed halves recurse; single failing rows are
    dropped with their index recorded in ``df.attrs['failed_rows']``)."""
    failed: list[int] = []

    def run(chunk: pd.DataFrame) -> list[pd.DataFrame]:
        try:
            return [csv_payload_to_df(invoke_fn(df_to_csv_payload(chunk)))]
        except Exception:
            if len(chunk) <= 1:
                failed.extend(chunk.index.tolist())
                return []
            mid = len(chunk) // 2
            return run(chunk.iloc[:mid]) + run(chunk.iloc[mid:])

    out: list[pd.DataFrame] = []
    for start in range(0, len(df), batch_rows):
        out.extend(run(df.iloc[start : start + batch_rows]))
    result = pd.concat(out, ignore_index=True) if out else pd.DataFrame()
    result.attrs["failed_rows"] = failed
    return result


class SageMakerEndpointAdapter:
    """Remote-endpoint invocation via the chunked-CSV contract. Requires
    boto3 (absent here — construction succeeds for testing with an
    injected transport; AWS calls raise)."""

    def __init__(self, endpoint_name: str, region: str | None = None, invoke_fn=None):
        self.endpoint_name = endpoint_name
        self.region = region
        self._invoke_fn = invoke_fn

    def _aws_invoke(self, payload: str) -> str:  # pragma: no cover
        if not HAVE_BOTO3:
            raise NotImplementedError(
                "boto3 not available in this environment; pass invoke_fn= for a "
                "custom transport or run where the AWS SDK is installed"
            )
        client = boto3.client("sagemaker-runtime", region_name=self.region)
        resp = client.invoke_endpoint(
            EndpointName=self.endpoint_name, ContentType="text/csv", Body=payload
        )
        return resp["Body"].read().decode()

    def predict(self, df: pd.DataFrame, batch_rows: int = DEFAULT_BATCH_ROWS) -> pd.DataFrame:
        fn = self._invoke_fn or self._aws_invoke
        return chunked_invoke(df, fn, batch_rows)
