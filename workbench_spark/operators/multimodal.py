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
        T.StructField("media_format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def stub_decoder(payload: bytes) -> dict:
    """Deterministic fake decode (kept for plumbing tests that need dims
    on arbitrary non-image bytes): derives stable pseudo-dimensions from
    the payload hash."""
    import hashlib

    if payload is None:
        return {"width": None, "height": None, "duration_ms": None}
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192,          # 64..255 px
        "height": 64 + h[1] % 192,
        "duration_ms": int.from_bytes(h[2:4], "big"),
    }


# JPEG frame-header markers that carry dimensions: SOF0-SOF15 minus the
# non-frame DHT/JPG/DAC markers (ITU T.81 table B.1)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def parse_image_header(payload: bytes | None) -> dict:
    """REAL image metadata from pure byte arithmetic — no PIL/opencv.
    Recognizes the four header formats whose dimensions are fixed-offset
    (or marker-scan) reads:

    - PNG: 8-byte signature, then the IHDR chunk — width/height are
      big-endian uint32 at offsets 16/20 (RFC 2083 §3.1).
    - GIF87a/89a: logical screen descriptor — little-endian uint16 at 6/8.
    - BMP: 'BM' + DIB header size at 14; BITMAPINFOHEADER(40+) carries
      int32 width/|height| at 18/22 (negative height = top-down rows);
      the legacy 12-byte BITMAPCOREHEADER carries uint16 at 18/20.
    - JPEG: marker scan from SOI to the first SOFn frame header, which
      carries big-endian height/width at +5/+7 past the marker.

    Returns {media_format, width, height}; all-None when the payload is
    not a recognized image (NEVER fake values — unknown means NULL)."""
    import struct

    none = {"media_format": None, "width": None, "height": None}
    if not payload or len(payload) < 10:
        return none
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        if len(payload) >= 24 and payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return {"media_format": "png", "width": w, "height": h}
        return none
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return {"media_format": "gif", "width": w, "height": h}
    if payload[:2] == b"BM" and len(payload) >= 26:
        (hdr_size,) = struct.unpack("<I", payload[14:18])
        if hdr_size >= 40 and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            return {"media_format": "bmp", "width": abs(w), "height": abs(h)}
        if hdr_size == 12 and len(payload) >= 22:
            w, h = struct.unpack("<HH", payload[18:22])
            return {"media_format": "bmp", "width": w, "height": h}
        return none
    if payload[:2] == b"\xff\xd8":
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:  # standalone
                i += 2
                continue
            if i + 4 > n:
                break
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if marker in _JPEG_SOF and i + 9 <= n:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return {"media_format": "jpeg", "width": w, "height": h}
            i += 2 + seg_len
        return none
    return none


def parse_av_header(payload: bytes | None) -> dict:
    """REAL audio/video duration from pure byte arithmetic:

    - WAV: RIFF/WAVE chunk scan — the fmt chunk carries byte_rate
      (little-endian uint32 at +8 into its data); the data chunk's
      declared size over byte_rate is the duration.
    - MP4/ISO-BMFF: top-level box scan to moov, then its mvhd child —
      version 0 carries (timescale, duration) as big-endian uint32 at
      +12/+16 past the box header, version 1 as uint32/uint64 at
      +20/+24.

    Returns {media_format, duration_ms}; all-None when unrecognized."""
    import struct

    none = {"media_format": None, "duration_ms": None}
    if not payload or len(payload) < 16:
        return none
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i, n = 12, len(payload)
        byte_rate = data_size = None
        while i + 8 <= n:
            cid = payload[i : i + 4]
            (csize,) = struct.unpack("<I", payload[i + 4 : i + 8])
            if cid == b"fmt " and i + 20 <= n:
                (byte_rate,) = struct.unpack("<I", payload[i + 16 : i + 20])
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize & 1)  # chunks are word-aligned
        if byte_rate and data_size is not None:
            return {
                "media_format": "wav",
                "duration_ms": data_size * 1000 // byte_rate,
            }
        return {"media_format": "wav", "duration_ms": None}
    # ISO-BMFF: the first box is conventionally ftyp; scan top-level boxes
    if payload[4:8] == b"ftyp":
        def scan(lo: int, hi: int, target: bytes) -> tuple[int, int] | None:
            i = lo
            while i + 8 <= hi:
                (bsize,) = struct.unpack(">I", payload[i : i + 4])
                btype = payload[i + 4 : i + 8]
                if bsize < 8:  # 0 = to-end, 1 = 64-bit size: not emitted
                    return None  # by our builder; bail rather than loop
                if btype == target:
                    return (i + 8, min(i + bsize, hi))
                i += bsize
            return None

        moov = scan(0, len(payload), b"moov")
        if moov:
            mvhd = scan(moov[0], moov[1], b"mvhd")
            if mvhd and mvhd[0] + 4 <= len(payload):
                version = payload[mvhd[0]]
                if version == 0 and mvhd[0] + 20 <= len(payload):
                    ts, dur = struct.unpack(
                        ">II", payload[mvhd[0] + 12 : mvhd[0] + 20]
                    )
                elif version == 1 and mvhd[0] + 32 <= len(payload):
                    # v1: 4 (ver/flags) + 8 + 8 (64-bit times) = timescale
                    # at +20, 64-bit duration at +24
                    (ts,) = struct.unpack(
                        ">I", payload[mvhd[0] + 20 : mvhd[0] + 24]
                    )
                    (dur,) = struct.unpack(
                        ">Q", payload[mvhd[0] + 24 : mvhd[0] + 32]
                    )
                else:
                    return {"media_format": "mp4", "duration_ms": None}
                if ts:
                    return {
                        "media_format": "mp4",
                        "duration_ms": dur * 1000 // ts,
                    }
        return {"media_format": "mp4", "duration_ms": None}
    return none


def header_decoder(payload: bytes | None) -> dict:
    """The DEFAULT metadata decoder: real header parsing — image formats
    (parse_image_header) for dimensions, then WAV/MP4 (parse_av_header)
    for durations. Unrecognized payloads yield NULL everything, never
    pseudo-values."""
    meta = parse_image_header(payload)
    if meta["media_format"] is not None:
        return {**meta, "duration_ms": None}
    av = parse_av_header(payload)
    return {
        "media_format": av["media_format"],
        "width": None,
        "height": None,
        "duration_ms": av["duration_ms"],
    }


def make_test_image(fmt: str, width: int, height: int) -> bytes:
    """Minimal structurally-valid image bytes for the given format and
    dimensions — the golden-test/fixture builder (real pixel data is not
    needed for header metadata; files are complete w.r.t. signatures,
    chunk CRCs, and terminators)."""
    import struct
    import zlib

    if fmt == "png":
        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body))
            )

        ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b""))
            + chunk(b"IEND", b"")
        )
    if fmt == "gif":
        return (
            b"GIF89a"
            + struct.pack("<HH", width, height)
            + b"\x00\x00\x00"  # no GCT, bg 0, aspect 0
            + b"\x3b"  # trailer
        )
    if fmt == "bmp":
        dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
        header = b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 14 + 40)
        return header + dib
    if fmt == "jpeg":
        sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3, 8, height, width, 1) + b"\x01\x11\x00"
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    raise ValueError(f"unknown test-image format {fmt!r}")


def make_test_wav(duration_ms: int, byte_rate: int = 32000) -> bytes:
    """Minimal complete PCM WAV of the given duration (zero samples).
    byte_rate must divide by 1000 for the duration to round-trip exactly
    through the integer data_size/byte_rate arithmetic."""
    import struct

    data_size = duration_ms * byte_rate // 1000
    fmt = struct.pack("<HHIIHH", 1, 1, byte_rate // 2, byte_rate, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", data_size) + b"\x00" * data_size
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_test_mp4(duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal ISO-BMFF header (ftyp + moov/mvhd, no media data) with the
    given movie duration. timescale=1000 makes duration_ms the mvhd
    duration field verbatim."""
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    dur = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification time
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24  # pre-defined
        + struct.pack(">I", 2),  # next track id
    )
    return ftyp + box(b"moov", mvhd)


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
    decoder: Callable[[bytes], dict] = header_decoder,
    batch_note_col: str | None = None,
) -> DataFrame:
    """Decode metadata per payload via mapInPandas (Arrow-batched; the
    decoder runs once per row inside a vectorized batch loop, partitions
    stream — nothing is collected). The default decoder is the REAL
    byte-arithmetic header parser (PNG/GIF/BMP/JPEG — r10, upgraded from
    the md5 pseudo-dims stub); pass ``decoder=stub_decoder`` for
    deterministic fake dims on arbitrary bytes, or a PIL/ffmpeg-backed
    callable in environments that have the codecs."""
    in_schema = df.schema
    out_schema = T.StructType(
        list(in_schema.fields)
        + [
            T.StructField("media_format", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decoder(p) for p in pdf[payload_col]]
            pdf = pdf.copy()
            pdf["media_format"] = pd.array(
                [m.get("media_format") for m in metas], dtype="string"
            )
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
