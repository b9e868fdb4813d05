"""Tests: heavy loader (flatten/timestamps), multimodal plumbing,
streaming windowed aggregation, drift monitor batch path."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def test_flatten_structs_and_heavy_loader(spark, tmp_path):
    from workbench_spark.sources.loaders import heavy_json_to_table

    p = tmp_path / "nested.jsonl"
    rows = [
        {"id": 1, "user": {"name": "a", "geo": {"lat": 1.5, "lon": 2.5}}, "ts": "2024-01-01 10:00:00"},
        {"id": 2, "user": {"name": "b", "geo": {"lat": 3.5, "lon": 4.5}}, "ts": "2024-01-02 11:30:00"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    df = heavy_json_to_table(spark, str(p), timestamp_columns=["ts"])
    assert "user_name" in df.columns and "user_geo_lat" in df.columns
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.count() == 2
    assert df.filter(F.col("user_geo_lat") == 1.5).first()["user_name"] == "a"


def test_multimodal_metadata_and_frames(spark):
    from workbench_spark.operators.multimodal import (
        attach_media,
        extract_media_metadata,
        frame_sample,
        media_feature_udf,
        stub_decoder,
        stub_feature_fn,
    )

    payloads = [(i, bytes([i % 256] * (100 + i))) for i in range(20)]
    df = spark.createDataFrame(payloads, "media_id int, payload binary")
    m = attach_media(df, "payload", "image")
    assert {"media_type", "byte_size", "content_hash"} <= set(m.columns)
    meta = extract_media_metadata(m, "payload", decoder=stub_decoder)
    rows = meta.collect()
    assert all(64 <= r["width"] <= 255 for r in rows)
    # deterministic: same payload → same pseudo-dimensions
    again = {
        r["media_id"]: (r["width"], r["height"])
        for r in extract_media_metadata(m, "payload", decoder=stub_decoder).collect()
    }
    assert all(again[r["media_id"]] == (r["width"], r["height"]) for r in rows)
    # the DEFAULT decoder is the real header parser: these payloads are
    # not images, so dims must be NULL — never pseudo-values
    real = extract_media_metadata(m, "payload").collect()
    assert all(
        r["width"] is None and r["media_format"] is None for r in real
    )

    emb = m.withColumn("embedding", media_feature_udf(stub_feature_fn, 8)("payload"))
    e = emb.first()["embedding"]
    assert len(e) == 8 and all(0 <= v <= 1 for v in e)

    frames = frame_sample(m, "payload", n_frames=4)
    assert frames.count() == 20 * 4
    assert frames.groupBy("content_hash").count().filter(F.col("count") != 4).count() == 0


def test_image_header_parsing_golden():
    """The real byte-arithmetic codec against golden bytes: checked-in
    externally-produced files (the canonical 1x1 PNG and 1x1 GIF that ship
    with countless web pages) plus builder round-trips for all four
    formats and non-image rejection."""
    import base64

    from workbench_spark.operators.multimodal import (
        make_test_image,
        parse_image_header,
    )

    # canonical public 1x1 transparent PNG (not produced by our builder)
    png_1x1 = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mNkYPhf"
        "DwAChwGA60e6kgAAAABJRU5ErkJggg=="
    )
    assert parse_image_header(png_1x1) == {
        "media_format": "png", "width": 1, "height": 1,
    }
    # canonical public 1x1 GIF
    gif_1x1 = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    assert parse_image_header(gif_1x1) == {
        "media_format": "gif", "width": 1, "height": 1,
    }
    # builder round-trip across formats and dimension ranges
    for fmt in ("png", "gif", "bmp", "jpeg"):
        for w, h in ((1, 1), (509, 499), (640, 480)):
            got = parse_image_header(make_test_image(fmt, w, h))
            assert got == {"media_format": fmt, "width": w, "height": h}, (
                fmt, w, h, got,
            )
    # non-images and pathological inputs → all-None, never fake dims
    for bad in (None, b"", b"hello world, definitely not an image bytes",
                b"\x89PNG\r\n\x1a\n" + b"short", b"\xff\xd8\xff\xd9",
                b"BMxx" + b"\x00" * 30):
        got = parse_image_header(bad)
        assert got["width"] is None and got["media_format"] in (None, "png", "bmp"), (bad, got)
        assert got["height"] is None


def test_av_header_parsing_golden():
    """WAV/MP4 duration parsing: builder round-trips (exact integer
    inversion by construction), mvhd version-1 64-bit duration, chunk
    word-alignment, and non-media rejection."""
    import struct

    from workbench_spark.operators.multimodal import (
        make_test_mp4,
        make_test_wav,
        parse_av_header,
    )

    for dur in (1, 137, 200):
        assert parse_av_header(make_test_wav(dur)) == {
            "media_format": "wav", "duration_ms": dur,
        }
    for dur in (1, 12345, 3_600_000):
        assert parse_av_header(make_test_mp4(dur)) == {
            "media_format": "mp4", "duration_ms": dur,
        }
        # non-unit timescale: duration field = dur*ts/1000, parsed back
        assert parse_av_header(make_test_mp4(dur, timescale=90000)) == {
            "media_format": "mp4", "duration_ms": dur,
        }
    # hand-built mvhd version 1 (64-bit duration): 5s at timescale 600
    mvhd_v1 = (
        struct.pack(">B3x", 1)
        + struct.pack(">QQ", 0, 0)          # 64-bit times
        + struct.pack(">I", 600)            # timescale
        + struct.pack(">Q", 3000)           # duration
    )
    box = lambda t, b: struct.pack(">I", 8 + len(b)) + t + b
    payload = box(b"ftyp", b"isom" + b"\x00" * 8) + box(b"moov", box(b"mvhd", mvhd_v1))
    assert parse_av_header(payload) == {"media_format": "mp4", "duration_ms": 5000}
    # odd-sized chunk before data: word-alignment must not derail the scan
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
    wav = (
        b"RIFF" + struct.pack("<I", 0) + b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"odd" + b"\x00"  # pad byte
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 6400)
    )
    assert parse_av_header(wav) == {"media_format": "wav", "duration_ms": 200}
    for bad in (None, b"", b"RIFFxxxxNOPE" + b"\x00" * 8, b"12345678ftypless"):
        got = parse_av_header(bad)
        assert got["duration_ms"] is None, (bad, got)


def test_image_header_parser_never_crashes():
    """Property: parse_image_header is total — arbitrary byte blobs
    (including ones that start with valid magic numbers and then lie)
    return a well-formed dict, never raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from workbench_spark.operators.multimodal import parse_image_header

    magics = [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"BM", b"\xff\xd8",
              b"RIFF", b"RIFFxxxxWAVE", b"\x00\x00\x00\x14ftyp", b""]

    @settings(max_examples=300, deadline=None)
    @given(
        prefix=st.sampled_from(magics),
        tail=st.binary(min_size=0, max_size=64),
    )
    def check(prefix, tail):
        from workbench_spark.operators.multimodal import header_decoder

        got = parse_image_header(prefix + tail)
        assert set(got) == {"media_format", "width", "height"}
        assert got["media_format"] in (None, "png", "gif", "bmp", "jpeg")
        for k in ("width", "height"):
            assert got[k] is None or isinstance(got[k], int)
        full = header_decoder(prefix + tail)
        assert full["media_format"] in (None, "png", "gif", "bmp", "jpeg", "wav", "mp4")
        assert full["duration_ms"] is None or isinstance(full["duration_ms"], int)

    check()


def test_streaming_windowed_counts(spark):
    from workbench_spark.streaming.monitor import run_stream_to_memory, stream_windowed_counts

    from workbench_spark.session import read_table

    ev = read_table(spark, SF_DIR, "events")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "stream_src")
        ev.write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = stream_windowed_counts(
            spark, src, schema, window="1 hour", watermark="2 hours"
        )
        out = run_stream_to_memory(stream, "ev_counts")
        batch = (
            ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        # append-mode memory sink emits only closed windows; every emitted
        # row must match the batch computation exactly
        emitted = out.collect()
        assert len(emitted) > 0
        batch_map = {
            (r["win"]["start"], r["event_type"]): r["n"] for r in batch.collect()
        }
        for r in emitted:
            assert batch_map[(r["window_start"], r["event_type"])] == r["n"]


def test_drift_monitor_batch_path(spark):
    from workbench_spark.session import read_table
    from workbench_spark.streaming.monitor import capture_inference, check_drift

    ev = read_table(spark, SF_DIR, "events").select("event_id", "value")
    with tempfile.TemporaryDirectory() as d:
        cap = os.path.join(d, "capture")
        capture_inference(ev.limit(300), cap)
        report = check_drift(spark, cap, ev, "value", 0.0, 100.0)
        assert report["captured_rows"] == 300
        assert report["psi"] < 0.5  # same distribution → low psi
        assert 0 <= report["ks"] <= 1


def test_stateful_streaming_sessionize(spark):
    from workbench_spark.session import read_table
    from workbench_spark.streaming.monitor import (
        run_stream_to_memory,
        stream_sessionize_stateful,
    )

    ev = read_table(spark, SF_DIR, "events").select("user_id", "ts", "value")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        ev.write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = stream_sessionize_stateful(spark, src, schema, gap_minutes=30)
        out = run_stream_to_memory(stream, "sessions_out")
        emitted = out.collect()
        # closed sessions only (the last session per user stays in state);
        # compare against the batch sessionizer
        from workbench_spark.operators.windows import sessionize

        batch = (
            sessionize(ev, "user_id", "ts", gap_minutes=30)
            .groupBy("user_id", "session_num")
            .count()
        )
        batch_n = batch.count()
        users = ev.select("user_id").distinct().count()
        assert len(emitted) == batch_n - users  # every user holds 1 open session
        batch_map = {
            (r["user_id"], r["count"]) for r in batch.collect()
        }
        for r in emitted:
            assert (r["user_id"], r["n_events"]) in batch_map or r["n_events"] > 0


def test_sagemaker_adapter_chunking():
    import pandas as pd

    from workbench_spark.api.sagemaker_adapter import chunked_invoke, csv_payload_to_df, df_to_csv_payload

    df = pd.DataFrame({"x": range(250), "flag": ["True", "False"] * 125})

    calls = []

    def fake_endpoint(payload: str) -> str:
        pdf = pd.read_csv(__import__("io").StringIO(payload))
        calls.append(len(pdf))
        if (pdf["x"] == 137).any():  # one poison row
            raise RuntimeError("boom")
        pdf["prediction"] = pdf["x"] * 2.0
        return df_to_csv_payload(pdf)

    out = chunked_invoke(df, fake_endpoint, batch_rows=100)
    assert out.attrs["failed_rows"] == [137]
    assert len(out) == 249
    assert (out["prediction"] == out["x"] * 2.0).all()
    assert calls[0] == 100  # batch contract
    # bool-string round trip repaired
    rt = csv_payload_to_df(df_to_csv_payload(pd.DataFrame({"b": ["True", "False"]})))
    assert rt["b"].tolist() == [True, False]


def test_bucketed_join_has_no_shuffle(spark):
    from workbench_spark.session import read_table
    from workbench_spark.sources.loaders import write_bucketed

    li = read_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_bucketed", "l_orderkey", 4)
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_bucketed", "l_orderkey", 4
    )
    # disable broadcast so the planner actually uses the buckets (at these
    # test sizes it would broadcast and skip bucketing entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("li_bucketed")
        b = spark.table("o_bucketed")
        joined = a.join(b, "l_orderkey")
        # co-located buckets: the sort-merge join needs no Exchange at all
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:1500]
        assert "SortMergeJoin" in plan
        assert joined.count() == li.join(o, li.l_orderkey == o.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE li_bucketed")
        spark.sql("DROP TABLE o_bucketed")


def test_stream_exact_dedup_matches_batch(spark, tmp_path):
    """Streaming dropDuplicates within the watermark == batch dedup over
    the same files (every duplicate here arrives inside the horizon)."""
    from workbench_spark.streaming.monitor import (
        run_stream_to_memory,
        stream_exact_dedup,
    )

    from workbench_spark.session import read_table

    src = read_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    # plant duplicates: union a 20% sample of itself
    dup = src.sample(0.2, seed=1)
    both = src.unionByName(dup)
    d = str(tmp_path / "dedup_src")
    both.write.mode("overwrite").parquet(d)

    stream = stream_exact_dedup(
        spark, d, both.schema, key_cols=["event_id"], watermark="1 day"
    )
    out = run_stream_to_memory(stream, "dedup_out")
    batch = spark.read.parquet(d).dropDuplicates(["event_id"])
    assert out.count() == batch.count()
    assert out.select("event_id").distinct().count() == out.count()


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Same-spec bucketed tables join with ZERO Exchange in the physical
    plan — the co-located-join contract for 100 TB fact-fact joins."""
    import contextlib
    import io

    from workbench_spark.session import read_table
    from workbench_spark.sources.bucketed import bucketed_join, save_bucketed_table

    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS bktest LOCATION '{tmp_path / 'wh'}'"
    )
    try:
        o = read_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        li = read_table(spark, SF_DIR, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ).withColumnRenamed("l_orderkey", "o_orderkey")
        save_bucketed_table(o, "bktest.orders_b", ["o_orderkey"], n_buckets=8)
        save_bucketed_table(li, "bktest.lineitem_b", ["o_orderkey"], n_buckets=8)

        # at test scale the planner would broadcast the small side; force
        # the SortMergeJoin path that bucketing targets at fact-fact scale
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(
                spark, "bktest.orders_b", "bktest.lineitem_b", ["o_orderkey"]
            )
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                joined.explain("formatted")
            plan = buf.getvalue()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # the whole point of bucketing
        # and the result is still correct
        expected = o.join(li, "o_orderkey").count()
        assert joined.count() == expected
    finally:
        spark.sql("DROP DATABASE IF EXISTS bktest CASCADE")


def test_jsonl_tolerant_quarantines_corrupt_lines(spark, tmp_path):
    from pyspark.sql import types as T

    from workbench_spark.sources.loaders import read_jsonl_tolerant

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "this is not json\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": 3, "v": }\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, bad = read_jsonl_tolerant(spark, str(p), schema=schema)
    assert {r["id"] for r in good.collect()} == {1, 2}
    assert bad.count() == 2
    raws = {r[0] for r in bad.collect()}
    assert "this is not json" in raws


def test_jsonl_tolerant_uncached_path(spark, tmp_path):
    # cache=False must not hit Spark's corrupt-record-column-only
    # restriction (r3 ADVICE: the old implementation raised
    # AnalysisException on any action over `bad`)
    from pyspark.sql import types as T

    from workbench_spark.sources.loaders import read_jsonl_tolerant

    p = tmp_path / "mixed2.jsonl"
    p.write_text(
        '{"id": 1, "v": "a"}\n'
        "not json either\n"
        '{"id": 2, "v": "b"}\n'
        '{"id": 3, "v": }\n'
    )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    good, bad = read_jsonl_tolerant(spark, str(p), schema=schema, cache=False)
    assert {r["id"] for r in good.collect()} == {1, 2}
    raws = {r[0] for r in bad.collect()}
    assert raws == {"not json either", '{"id": 3, "v": }'}
    # inferred-schema variant of the uncached path
    good2, bad2 = read_jsonl_tolerant(spark, str(p), cache=False)
    assert bad2.count() == 2


def test_stream_admit_against_corpus_matches_batch(spark, tmp_path):
    """foreachBatch streaming admission == the batch incremental-dedup
    operator on the same data: corpus clones rejected, novel docs admitted."""
    from workbench_spark.operators.dedup import (
        banded_minhash,
        minhash_incremental_dedup,
    )
    from workbench_spark.session import read_table
    from workbench_spark.streaming.monitor import stream_admit_against_corpus

    from pyspark.sql import functions as F

    docs = read_table(spark, SF_DIR, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") < 300)
    clones = corpus.filter(F.col("doc_id") < 4).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [(60000 + i, f"fresh streaming doc {i} nebula-{i} quartz-{i}")
         for i in range(4)],
        "doc_id long, text string",
    )
    batch = clones.unionByName(novel)
    src = str(tmp_path / "admit_src")
    sink = str(tmp_path / "admit_sink")
    ckpt = str(tmp_path / "admit_ckpt")
    batch.write.mode("overwrite").parquet(src)

    corpus_banded = banded_minhash(corpus).localCheckpoint(eager=True)
    q = stream_admit_against_corpus(
        spark, src, batch.schema, corpus_banded, sink, ckpt
    )
    q.awaitTermination(120)
    streamed = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    expected = {
        r["doc_id"]
        for r in minhash_incremental_dedup(
            spark.read.parquet(src), corpus_banded, corpus_is_banded=True
        ).collect()
    }
    assert streamed == expected
    assert streamed == {60000, 60001, 60002, 60003}


def test_stream_windowed_drift_matches_batch_psi(spark):
    """Streaming per-window PSI (one windowed agg, conditional-sum bins)
    must match operators/drift.psi computed per window in batch."""
    from workbench_spark.operators.drift import psi
    from workbench_spark.session import read_table
    from workbench_spark.streaming.monitor import run_stream_to_memory, stream_windowed_drift

    ev = read_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    baseline = ev.filter(F.col("event_id") % 2 == 0)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "drift_src")
        ev.write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = stream_windowed_drift(
            spark, src, schema, baseline, "value", 0.0, 100.0,
            bins=10, window="1 hour", watermark="2 hours",
        )
        out = run_stream_to_memory(stream, "drift_out")
        emitted = out.collect()
        assert len(emitted) > 0
        for r in emitted[:5]:  # spot-check a handful of windows vs batch
            cur = ev.filter(
                (F.col("ts") >= r["window_start"]) & (F.col("ts") < r["window_end"])
            )
            batch_psi = psi(baseline, cur, "value", 0.0, 100.0, 10).first()["psi"]
            assert r["psi"] == pytest.approx(batch_psi, rel=1e-9, abs=1e-12)
            assert r["n"] == cur.count()
        # identical distributions drift little; all PSI finite and >= 0
        assert all(r["psi"] >= 0 or abs(r["psi"]) < 1e-9 for r in emitted)


def test_stream_quality_monitor_matches_batch(spark, tmp_path):
    """Streaming per-window quality pass rates must equal the batch
    operators applied to the same documents (shared rule code — the
    twin property the monitor promises)."""
    from workbench_spark.operators.text import c4_page_flags, gopher_quality_flags
    from workbench_spark.session import read_table
    from workbench_spark.streaming.monitor import (
        run_stream_to_memory,
        stream_quality_monitor,
    )

    docs = read_table(spark, SF_DIR, "documents").limit(200).select(
        "doc_id",
        "text",
        # spread docs across two hourly windows deterministically
        F.when(F.col("doc_id") % 2 == 0,
               F.lit("2026-01-01 00:10:00"))
        .otherwise(F.lit("2026-01-01 05:10:00"))
        .cast("timestamp")
        .alias("ingest_ts"),
    )
    src = str(tmp_path / "doc_stream")
    docs.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = stream_quality_monitor(
        spark, src, schema, window="1 hour", watermark="30 minutes"
    )
    out = run_stream_to_memory(stream, "doc_quality")
    emitted = {r["window_start"]: r for r in out.collect()}
    assert len(emitted) > 0
    batch = c4_page_flags(gopher_quality_flags(docs), "text")
    agg = {
        r["ws"]: r
        for r in batch.groupBy(
            F.window("ingest_ts", "1 hour").getField("start").alias("ws")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("gopher_keep").cast("long")).alias("g"),
            F.sum(F.col("c4_keep").cast("long")).alias("c"),
        )
        .collect()
    }
    for ws, r in emitted.items():
        assert agg[ws]["n_docs"] == r["n_docs"]
        assert agg[ws]["g"] == r["n_gopher_pass"]
        assert agg[ws]["c"] == r["n_c4_pass"]
        assert r["gopher_pass_rate"] == r["n_gopher_pass"] / r["n_docs"]


def test_stream_url_dedup_composition(spark, tmp_path):
    """normalize_url composes with the streaming exact-dedup guard: dedup
    on the CANONICAL url at ingestion time (map-side normalization, then
    watermarked dropDuplicates) == batch dedup on the same canonical key.
    The same composition any operators/web key works with."""
    from pyspark.sql import functions as F

    from workbench_spark.operators.web import normalize_url
    from workbench_spark.streaming.monitor import run_stream_to_memory

    rows = []
    for i in range(50):
        # three spellings of the same canonical URL per i
        rows.append((3 * i, f"https://Site.com/page/{i}?utm_source=x", i))
        rows.append((3 * i + 1, f"https://site.com/page/{i}/", i))
        rows.append((3 * i + 2, f"https://site.com/page/{i}", i))
    src = spark.createDataFrame(rows, "doc_id long, url string, n int").withColumn(
        "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
    )
    d = str(tmp_path / "url_src")
    src.write.mode("overwrite").parquet(d)

    stream = (
        spark.readStream.format("parquet")
        .schema(src.schema)
        .load(d)
        .withColumn("norm_url", normalize_url(F.col("url")))
        .withWatermark("ts", "1 day")
        .dropDuplicates(["norm_url"])
    )
    out = run_stream_to_memory(stream, "url_dedup_out")
    assert out.count() == 50  # one survivor per canonical URL
    assert out.select("norm_url").distinct().count() == 50


def test_stream_domain_cap(spark, tmp_path):
    """Stateful streaming per-domain cap: first `cap` docs per domain are
    admitted (with their admission rank), the rest dropped at ingestion;
    under-cap domains pass through whole."""
    from pyspark.sql import functions as F

    from workbench_spark.streaming.monitor import (
        run_stream_to_memory,
        stream_domain_cap,
    )

    rows = [(i, f"https://hot.com/{i}") for i in range(20)]
    rows += [(100 + i, f"https://cold.org/{i}") for i in range(3)]
    src = spark.createDataFrame(rows, "doc_id long, url string")
    d = str(tmp_path / "cap_src")
    src.coalesce(1).write.mode("overwrite").parquet(d)

    out = run_stream_to_memory(
        stream_domain_cap(spark, d, src.schema, cap=5), "domain_cap_out"
    )
    by_dom = {
        r["domain"]: r["count"]
        for r in out.groupBy("domain").count().collect()
    }
    assert by_dom == {"hot.com": 5, "cold.org": 3}
    ranks = sorted(
        r["domain_rank"] for r in out.filter("domain = 'hot.com'").collect()
    )
    assert ranks == [1, 2, 3, 4, 5]
    assert set(out.columns) == {"doc_id", "url", "domain", "domain_rank"}


def test_stream_bloom_admit_matches_batch(spark, tmp_path):
    """foreachBatch Bloom admission == batch bloom_contains on the same
    data: corpus keys rejected (no false negatives ever), novel keys
    admitted (fp-free at this m/n), and the filter artifact is the only
    corpus state consulted."""
    from pyspark.sql import functions as F
    from workbench_spark.operators.sketches import bloom_build, bloom_contains
    from workbench_spark.streaming.monitor import stream_bloom_admit

    corpus = spark.createDataFrame(
        [(i, f"seen-{i}") for i in range(200)], "doc_id long, text string"
    )
    bloom = bloom_build(corpus, "doc_id", m_bits=4096, k=5).localCheckpoint(
        eager=True
    )
    replays = spark.createDataFrame(
        [(i, f"seen-{i} again") for i in range(0, 40, 2)], "doc_id long, text string"
    )
    novel = spark.createDataFrame(
        [(10_000 + i, f"new-{i}") for i in range(20)], "doc_id long, text string"
    )
    batch = replays.unionByName(novel)
    src = str(tmp_path / "bloom_src")
    sink = str(tmp_path / "bloom_sink")
    ckpt = str(tmp_path / "bloom_ckpt")
    batch.write.mode("overwrite").parquet(src)

    q = stream_bloom_admit(
        spark, src, batch.schema, bloom, sink, ckpt, key_col="doc_id"
    )
    q.awaitTermination(120)
    streamed = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    batch_verdict = bloom_contains(
        bloom, spark.read.parquet(src), "doc_id", m_bits=4096, k=5
    )
    expected = {
        r["doc_id"]
        for r in batch_verdict.filter(~F.col("maybe_present")).collect()
    }
    assert streamed == expected
    # corpus replays can NEVER be admitted (one-sided error)
    assert all(d >= 10_000 for d in streamed)
    # at m=4096/n=200 the fp rate is ~1e-6 — all novel keys admitted
    assert streamed == {10_000 + i for i in range(20)}


def test_stream_cms_counts_matches_batch(spark, tmp_path):
    """The streamed CMS artifact (folded across micro-batches) equals the
    batch sketch of all the data — the additive-merge guarantee — and
    point queries over it are >= true counts."""
    from pyspark.sql import functions as F
    from workbench_spark.operators.sketches import cms_build, cms_query
    from workbench_spark.streaming.monitor import stream_cms_counts

    rows = [(i, ["alpha", "beta", "gamma", "alpha", "alpha"][i % 5]) for i in range(500)]
    batch = spark.createDataFrame(rows, "event_id long, event_type string")
    src = str(tmp_path / "cms_src")
    skd = str(tmp_path / "cms_sketch")
    ckpt = str(tmp_path / "cms_ckpt")
    # several files -> several (or at least one) micro-batches
    batch.repartition(4).write.mode("overwrite").parquet(src)

    q = stream_cms_counts(spark, src, batch.schema, skd, ckpt, depth=3, width=64)
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.read.parquet(skd).collect()))
    direct = sorted(map(tuple, cms_build(batch, "event_type", 3, 64).collect()))
    assert streamed == direct
    probes = spark.createDataFrame(
        [("alpha",), ("beta",), ("nope",)], "event_type string"
    )
    est = {
        r["event_type"]: r["cms_estimate"]
        for r in cms_query(
            spark.read.parquet(skd), probes, "event_type", 3, 64
        ).collect()
    }
    truth = {"alpha": 300, "beta": 100, "nope": 0}
    for k, t in truth.items():
        assert est[k] >= t


def test_stream_hll_counts_matches_batch_and_is_idempotent(spark, tmp_path):
    """The streamed HLL artifact equals the batch registers (MAX-merge
    guarantee), grouped registers track per-group distincts, and a full
    REPLAY of the stream leaves the artifact unchanged — the idempotence
    that distinguishes the distinct counter from the CMS row counter."""
    from workbench_spark.operators.sketches import hll_build, hll_estimate
    from workbench_spark.streaming.monitor import stream_hll_counts

    rows = [(i, f"user{i % 73}", ["a", "b"][i % 2]) for i in range(400)]
    batch = spark.createDataFrame(rows, "event_id long, user string, g string")
    src = str(tmp_path / "hll_src")
    skd = str(tmp_path / "hll_sketch")
    ckpt = str(tmp_path / "hll_ckpt")
    batch.repartition(4).write.mode("overwrite").parquet(src)

    q = stream_hll_counts(spark, src, batch.schema, skd, ckpt, key_col="user", by=["g"])
    q.awaitTermination(120)
    streamed = sorted(map(tuple, spark.read.parquet(skd).collect()))
    direct = sorted(map(tuple, hll_build(batch, "user", by=["g"]).collect()))
    assert streamed == direct
    # replay the same source against the SAME artifact (fresh checkpoint
    # simulates at-least-once redelivery): registers must not move
    q2 = stream_hll_counts(
        spark, src, batch.schema, skd, str(tmp_path / "hll_ckpt2"),
        key_col="user", by=["g"],
    )
    q2.awaitTermination(120)
    assert sorted(map(tuple, spark.read.parquet(skd).collect())) == streamed
    # both groups saw all 73 distinct users; estimates near truth
    est = {
        r["g"]: r["hll_estimate"]
        for r in hll_estimate(spark.read.parquet(skd), by=["g"]).collect()
    }
    for g in ("a", "b"):
        assert abs(est[g] - 73) / 73 < 0.39


def test_stream_restart_resumes_from_checkpoint(spark, tmp_path):
    """Restart/recovery (r12 VERDICT #5): stop a foreachBatch stream
    after it has drained the first half of the corpus, land more files,
    restart on the SAME checkpointLocation — the final CMS, HLL, and
    Bloom-admission artifacts must equal an uninterrupted run's
    bit-for-bit. The CMS is the discriminating probe: its merge is
    ADDITIVE, so if the restart re-processed even one already-committed
    file the counts would inflate and the equality below would fail
    (HLL/Bloom would mask that with idempotent max/OR merges)."""
    from workbench_spark.operators.sketches import (
        bloom_build,
        cms_build,
        hll_build,
    )
    from workbench_spark.streaming.monitor import (
        stream_bloom_admit,
        stream_cms_counts,
        stream_hll_counts,
    )

    rows1 = [(i, f"user{i % 31}", ["x", "y", "z"][i % 3]) for i in range(300)]
    rows2 = [(1000 + i, f"user{i % 57}", ["x", "y"][i % 2]) for i in range(300)]
    part1 = spark.createDataFrame(rows1, "event_id long, user string, event_type string")
    part2 = spark.createDataFrame(rows2, "event_id long, user string, event_type string")
    both = part1.unionByName(part2)
    src = str(tmp_path / "restart_src")
    part1.repartition(3).write.mode("overwrite").parquet(src)

    cms_skd, hll_skd = str(tmp_path / "cms_sk"), str(tmp_path / "hll_sk")
    cms_ck, hll_ck = str(tmp_path / "cms_ck"), str(tmp_path / "hll_ck")
    bloom = bloom_build(
        spark.createDataFrame([(i,) for i in range(100)], "event_id long"),
        "event_id", m_bits=4096, k=5,
    ).localCheckpoint(eager=True)
    bl_sink, bl_ck = str(tmp_path / "bl_sink"), str(tmp_path / "bl_ck")

    def run_all():
        schema = part1.schema
        for q in (
            stream_cms_counts(spark, src, schema, cms_skd, cms_ck, depth=3, width=64),
            stream_hll_counts(spark, src, schema, hll_skd, hll_ck, key_col="user"),
            stream_bloom_admit(spark, src, schema, bloom, bl_sink, bl_ck,
                               key_col="event_id"),
        ):
            q.awaitTermination(120)

    run_all()  # drains part1, then terminates (availableNow) — the "stop"
    part2.repartition(3).write.mode("append").parquet(src)
    run_all()  # restart on the SAME checkpoints — must process ONLY part2

    assert sorted(map(tuple, spark.read.parquet(cms_skd).collect())) == sorted(
        map(tuple, cms_build(both, "event_type", 3, 64).collect())
    )
    assert sorted(map(tuple, spark.read.parquet(hll_skd).collect())) == sorted(
        map(tuple, hll_build(both, "user").collect())
    )
    admitted = {r["event_id"] for r in spark.read.parquet(bl_sink).collect()}
    # corpus ids 0-99 rejected in part1; everything else admitted exactly once
    expected = {i for i in range(100, 300)} | {1000 + i for i in range(300)}
    assert admitted == expected
    assert spark.read.parquet(bl_sink).count() == len(expected)  # no re-emits


def test_stream_cms_redelivery_inflates_documented(spark, tmp_path):
    """The CMS fold's at-least-once caveat, pinned as behavior: replaying
    an ALREADY-COMMITTED source against the same artifact with a FRESH
    checkpoint (= redelivery after checkpoint loss) exactly doubles every
    register — the additive-merge contract the API documents. Restarts on
    an intact checkpoint (previous test) do NOT inflate; redelivery
    does. HLL under the identical abuse is a no-op (max-merge)."""
    from workbench_spark.operators.sketches import cms_build
    from workbench_spark.streaming.monitor import stream_cms_counts

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    batch = spark.createDataFrame(rows, "event_id long, event_type string")
    src = str(tmp_path / "redeliver_src")
    skd = str(tmp_path / "redeliver_sk")
    batch.repartition(2).write.mode("overwrite").parquet(src)

    q = stream_cms_counts(
        spark, src, batch.schema, skd, str(tmp_path / "ck1"), depth=3, width=64
    )
    q.awaitTermination(120)
    q2 = stream_cms_counts(  # fresh checkpoint = full redelivery
        spark, src, batch.schema, skd, str(tmp_path / "ck2"), depth=3, width=64
    )
    q2.awaitTermination(120)
    single = {(r["j"], r["bucket"]): r["cnt"]
              for r in cms_build(batch, "event_type", 3, 64).collect()}
    doubled = {(r["j"], r["bucket"]): r["cnt"]
               for r in spark.read.parquet(skd).collect()}
    assert doubled == {k: 2 * v for k, v in single.items()}
