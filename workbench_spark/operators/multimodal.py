"""Multimodal column operators — image/audio/video as opaque binary
columns with typed metadata (LLM-pipeline extension; the reference's
closest analogue is its row-wise chem UDF stack, SURVEY §2.9, which has
the same shape: opaque payload column in → typed feature columns out).

Design for 100 TB:
- payloads live in a ``binary`` column (or as object-store references in a
  ``uri`` column — never collect them);
- every transform is mapInPandas / pandas_udf: Arrow-batched, per-
  partition streaming, bounded memory via maxRecordsPerBatch;
- decode is pluggable: the actual image/audio codecs (PIL/ffmpeg) are NOT
  in this container, so ``decoder=`` defaults to a deterministic stub
  that derives pseudo-metadata from the bytes. The Spark-side plumbing —
  schemas, batch iteration, partitioning — is real and tested; swapping
  in a real codec is a one-function change.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_size", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def stub_decoder(payload: bytes) -> dict:
    """Deterministic fake decode (real codecs not in this container):
    derives stable pseudo-dimensions from the payload hash. Replace with a
    PIL/ffmpeg-backed callable in production."""
    import hashlib

    if payload is None:
        return {"width": None, "height": None, "duration_ms": None}
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,          # 64..255 px
        "height": 64 + h[1] % 192,
        "duration_ms": int.from_bytes(h[2:4], "big"),
    }


def attach_media(
    df: DataFrame, payload_col: str, media_type: str = "image"
) -> DataFrame:
    """Ensure the payload column is binary-typed and add byte_size +
    content_hash bookkeeping (JVM-side: length/md5 over binary)."""
    out = df.withColumn(payload_col, F.col(payload_col).cast("binary"))
    return (
        out.withColumn("media_type", F.lit(media_type))
        .withColumn("byte_size", F.length(F.col(payload_col)).cast("long"))
        .withColumn("content_hash", F.md5(F.col(payload_col)))
    )


def extract_media_metadata(
    df: DataFrame,
    payload_col: str,
    decoder: Callable[[bytes], dict] = stub_decoder,
    batch_note_col: str | None = None,
) -> DataFrame:
    """Decode metadata per payload via mapInPandas (Arrow-batched; the
    decoder runs once per row inside a vectorized batch loop, partitions
    stream — nothing is collected)."""
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(p) for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["width"] = pd.array([m["width"] for m in metas], dtype="Int32")
            pdf["height"] = pd.array([m["height"] for m in metas], dtype="Int32")
            pdf["duration_ms"] = pd.array(
                [m["duration_ms"] for m in metas], dtype="Int64"
            )
            yield pdf

    return df.mapInPandas(run, schema=out_schema)


def media_feature_udf(
    feature_fn: Callable[[bytes], list[float]], dim: int
) -> Callable:
    """Wrap a payload→embedding function as an Arrow-batched pandas UDF
    returning array<float> (the per-row feature-extraction contract —
    mirrors the reference's feature-endpoint output_columns contract)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.ArrayType(T.FloatType()))
    def extract(payloads: pd.Series) -> pd.Series:
        return payloads.map(lambda p: feature_fn(p) if p is not None else None)

    return extract


def stub_feature_fn(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake embedding from payload bytes (stands in for a
    vision/audio encoder)."""
    import hashlib

    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def frame_sample(
    df: DataFrame,
    payload_col: str,
    n_frames: int = 4,
    frame_decoder: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video → frame rows: each payload expands to n_frames (payload,
    frame_idx, frame_bytes) rows via mapInPandas. The stub 'decoder'
    slices the payload deterministically; a real one would call ffmpeg.
    Output explodes row count ×n_frames — partition counts must scale
    accordingly (repartition after, not before, to keep decode local)."""
    out_schema = T.StructType(
        [
            T.StructField("content_hash", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_bytes", T.BinaryType()),
        ]
    )

    def decode(payload: bytes, idx: int) -> bytes:
        if frame_decoder is not None:
            return frame_decoder(payload, idx)
        if not payload:
            return b""
        step = max(len(payload) // n_frames, 1)
        return payload[idx * step : idx * step + step]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for p in pdf[payload_col]:
                if p is None:
                    continue
                ch = hashlib.md5(p).hexdigest()
                for i in range(n_frames):
                    rows.append((ch, i, decode(p, i)))
            yield pd.DataFrame(rows, columns=["content_hash", "frame_idx", "frame_bytes"])

    return df.mapInPandas(run, schema=out_schema)


def resize_stub(df: DataFrame, payload_col: str, width: int, height: int) -> DataFrame:
    """Image resize placeholder: the real implementation needs PIL (not in
    container). Raises with a clear message; plumbing callers can inject a
    custom decoder via extract_media_metadata/media_feature_udf instead."""
    raise NotImplementedError(
        "image resize requires PIL/opencv (not available in this environment); "
        "wire a real codec through media_feature_udf(feature_fn) or "
        "extract_media_metadata(decoder=...)"
    )
