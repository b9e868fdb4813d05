"""Monitor API lifecycle tests (reference api/monitor.py usage shape:
setup → baseline → schedule → scheduled-job executions → results)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="session")
def warehouse():
    with tempfile.TemporaryDirectory() as d:
        yield d


@pytest.fixture(scope="session")
def endpoint(spark, warehouse):
    from workbench_spark.api.model import Model

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    df = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_rev"),
            F.sum("l_quantity").alias("total_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .select(
            "net_rev", "total_qty", "avg_price", "n_lines",
            (F.col("l_orderkey") % 5 == 0).alias("validation"),
        )
    )
    m = Model.train(
        df, "mon_model", target="net_rev",
        features=["total_qty", "avg_price", "n_lines"],
        model_type="regressor", algo="xgb",
        warehouse=warehouse, spark=spark,
    )
    ep = m.to_endpoint()
    # capture some traffic so the monitoring execution has inputs
    ep.inference(df.drop("validation").limit(200), capture=True)
    return ep, df


def test_monitor_setup_and_summary(spark, warehouse, endpoint):
    ep, df = endpoint
    mon = ep.monitor()
    assert mon.endpoint_name == ep.name
    s = mon.summary()
    assert s["endpoint_type"] == "local-spark"
    assert s["baseline"] is False and s["monitoring_schedule"] is False

    mon.enable_data_capture(capture_percentage=100)
    assert mon.data_capture_enabled()
    assert mon.details()["monitoring_schedule_status"] == "Not Scheduled"

    # schedule requires a baseline first
    with pytest.raises(ValueError):
        mon.create_monitoring_schedule()


def test_monitor_baseline_files(spark, warehouse, endpoint):
    ep, df = endpoint
    mon = ep.monitor()
    mon.create_baseline(baseline_df=df, recreate=True)
    assert mon.baseline_exists()
    # second call without recreate is a no-op (reference semantics)
    mon.create_baseline(baseline_df=df.limit(1))
    base = mon.get_baseline()
    # model features only, sorted column order
    assert base.columns == ["avg_price", "n_lines", "total_qty"]
    assert base.count() == df.count()

    cons = mon.get_constraints()
    assert set(cons["features"]) == {"avg_price", "n_lines", "total_qty"}
    spec = cons["features"]["total_qty"]
    assert spec["completeness"] == 1.0
    assert spec["lower_bound"] <= spec["upper_bound"]

    stats = mon.get_statistics()
    srow = {r["name"]: r for r in stats.collect()}
    assert srow["avg_price"]["min"] <= srow["avg_price"]["median"] <= srow["avg_price"]["max"]

    assert mon.update_constraints(
        {"total_qty": {"upper_bound": spec["upper_bound"] * 2},
         "monitoring_config": {"psi_threshold": 0.3}}
    )
    cons2 = mon.get_constraints()
    assert cons2["features"]["total_qty"]["upper_bound"] == spec["upper_bound"] * 2
    assert cons2["monitoring_config"]["psi_threshold"] == 0.3


def test_monitor_schedule_and_execution(spark, warehouse, endpoint):
    ep, df = endpoint
    mon = ep.monitor()
    mon.create_baseline(baseline_df=df, recreate=True)
    with pytest.raises(ValueError):
        mon.create_monitoring_schedule("weekly")
    mon.create_monitoring_schedule("hourly")
    assert mon.monitoring_schedule_exists()
    d = mon.details()
    assert d["monitoring_schedule_status"] == "Scheduled"
    assert d["schedule"] == "hourly"

    # the captured traffic is drawn from the baseline rows → no violations
    rec = mon.run_monitoring_execution()
    assert rec["status"] == "Completed", rec
    assert rec["violations"] == []
    assert rec["captured_rows"] >= 200

    results = mon.get_monitoring_results()
    assert results.count() >= 1
    top = results.orderBy(F.desc("scheduled_time")).first()
    assert top["status"] == "Completed" and top["violations"] == 0

    full = mon.get_execution_details(top["scheduled_time"])
    assert full is not None and full["violations"] == []

    d2 = mon.details()
    assert d2["last_run_status"] == "Completed"
    assert d2["last_run_violations"] == 0


def test_monitor_detects_drifted_capture(spark, warehouse, endpoint):
    ep, df = endpoint
    mon = ep.monitor()
    mon.create_baseline(baseline_df=df, recreate=True)
    # shove out-of-distribution traffic through the endpoint: 10x the
    # feature scale pushes values past the baseline bounds AND shifts the
    # distribution (PSI/KS)
    drifted = df.drop("validation").limit(200).select(
        "net_rev",
        (F.col("total_qty") * 10).alias("total_qty"),
        (F.col("avg_price") * 10).alias("avg_price"),
        "n_lines",
    )
    ep.inference(drifted, capture=True)
    rec = mon.run_monitoring_execution()
    assert rec["status"] == "CompletedWithViolations"
    kinds = {v["constraint_check_type"] for v in rec["violations"]}
    assert "baseline_drift_check" in kinds
    assert "psi_drift_check" in kinds or "ks_drift_check" in kinds
    feats = {v["feature"] for v in rec["violations"]}
    assert "total_qty" in feats and "avg_price" in feats

    assert mon.setup_alerts("ops@example.com", threshold=2)
    assert mon.registry.read_meta(ep.name)["alerts"]["violation_threshold"] == 2

    mon.delete_monitoring_schedule()
    assert not mon.monitoring_schedule_exists()


def test_capture_percentage_sampling(spark, warehouse, endpoint):
    """enable_data_capture(pct<100) must thin the captured stream by a
    deterministic hash Bernoulli (data_capture_core.py:64-99) — same rows
    captured on every rerun, roughly pct% of traffic."""
    import os
    import shutil

    ep, df = endpoint
    mon = ep.monitor()
    cap_dir = mon.capture_dir
    mon.enable_data_capture(capture_percentage=30)
    if os.path.isdir(cap_dir):
        shutil.rmtree(cap_dir)
    traffic = df.drop("validation")
    n_in = traffic.count()
    ep.inference(traffic, capture=True)
    n1 = spark.read.json(cap_dir).count()
    assert 0 < n1 < n_in
    assert abs(n1 / n_in - 0.30) < 0.12  # hash-uniformity, generous band
    # determinism: the same traffic captures the SAME rows again
    ep.inference(traffic, capture=True)
    n2 = spark.read.json(cap_dir).count()
    assert n2 == 2 * n1
    # restore full capture for other tests
    mon.enable_data_capture(capture_percentage=100)
    shutil.rmtree(cap_dir)


def test_monitor_no_capture_data(spark, warehouse):
    from workbench_spark.api.model import Model
    from workbench_spark.api.monitor import Monitor

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").filter(
        F.col("value").isNotNull()
    )
    df = ev.select("value", (F.col("value") * 2 + 1).alias("y"))
    Model.train(
        df, "mon_nocap", target="y", features=["value"],
        model_type="regressor", algo="linear",
        warehouse=warehouse, spark=spark,
    )
    # endpoint never ran inference: name resolves via the {model}_end
    # convention, execution fails with the reference's no-data reason
    mon = Monitor("mon_nocap_end", spark=spark, warehouse=warehouse)
    mon.create_baseline(baseline_df=df)
    rec = mon.run_monitoring_execution()
    assert rec["status"] == "Failed"
    assert rec["failure_reason"] == "Job inputs had no data"
    row = mon.get_monitoring_results().first()
    assert row["status"] == "Failed"


def test_fused_drift_matches_per_feature(spark):
    """psi_by_feature / ks_by_feature (the Monitor's one-pass melted shape)
    must equal the single-feature operators exactly, feature by feature."""
    from workbench_spark.operators.drift import (
        ks_by_feature,
        ks_statistic_binned,
        psi,
        psi_by_feature,
    )

    ref = spark.range(0, 2000).select(
        (F.col("id") % 97).cast("double").alias("a"),
        ((F.col("id") * 7) % 31).cast("double").alias("b"),
    )
    cur = spark.range(0, 1500).select(
        ((F.col("id") % 97) * 1.3).alias("a"),
        ((F.col("id") * 11) % 29).cast("double").alias("b"),
    )
    bounds = {"a": (0.0, 130.0), "b": (0.0, 31.0)}
    fused_psi = {r["feature"]: r["psi"] for r in psi_by_feature(ref, cur, bounds, 10).collect()}
    fused_ks = {r["feature"]: r["ks"] for r in ks_by_feature(ref, cur, bounds, 100).collect()}
    for c, (lo, hi) in bounds.items():
        single_psi = psi(ref, cur, c, lo, hi, 10).first()["psi"]
        single_ks = ks_statistic_binned(ref, cur, c, lo, hi, 100).first()["ks"]
        assert abs(fused_psi[c] - single_psi) < 1e-12, c
        assert abs(fused_ks[c] - single_ks) < 1e-12, c


def test_streaming_drift_monitor(spark, warehouse):
    """Monitor.streaming_drift_monitor wires the stored baseline +
    constraints bounds into the watermarked streaming PSI — per-window
    values must match batch psi() on the same rows."""
    import os
    import tempfile

    from workbench_spark.api.model import Model
    from workbench_spark.api.monitor import Monitor
    from workbench_spark.operators.drift import psi
    from workbench_spark.session import read_table
    from workbench_spark.streaming.monitor import run_stream_to_memory

    ev = read_table(spark, SF_DIR, "events").filter(F.col("value").isNotNull())
    train = ev.select("value", (F.col("value") * 3 + 2).alias("y"))
    Model.train(
        train, "mon_stream", target="y", features=["value"],
        model_type="regressor", algo="linear",
        warehouse=warehouse, spark=spark,
    )
    mon = Monitor("mon_stream_end", spark=spark, warehouse=warehouse)
    mon.create_baseline(baseline_df=train.filter(F.col("value") < 50))
    with pytest.raises(ValueError):
        mon.streaming_drift_monitor("/tmp/x", None, "no_such_feature")

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "stream_src")
        ev.select("ts", "value").write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = mon.streaming_drift_monitor(
            src, schema, "value", window="1 hour", watermark="2 hours"
        )
        out = run_stream_to_memory(stream, "mon_stream_out")
        emitted = out.collect()
        assert len(emitted) > 0
        spec = mon.get_constraints()["features"]["value"]
        baseline = mon.get_baseline()
        r = max(emitted, key=lambda x: x["n"])
        cur = ev.filter(
            (F.col("ts") >= r["window_start"]) & (F.col("ts") < r["window_end"])
        ).select("value")
        batch = psi(
            baseline, cur, "value",
            float(spec["lower_bound"]), float(spec["upper_bound"]), 10,
        ).first()["psi"]
        assert r["psi"] == pytest.approx(batch, rel=1e-9, abs=1e-12)


def test_streaming_constraint_monitor_matches_batch(spark, warehouse):
    """Per-window per-feature (n, n_null, n_oob) from the melted streaming
    aggregation must equal the batch scan on the same window's rows."""
    import os
    import tempfile

    from workbench_spark.api.model import Model
    from workbench_spark.api.monitor import Monitor
    from workbench_spark.session import read_table
    from workbench_spark.streaming.monitor import run_stream_to_memory

    ev = read_table(spark, SF_DIR, "events")
    train = ev.filter(F.col("value").isNotNull()).select(
        "value", (F.col("value") + 1).alias("y")
    )
    Model.train(
        train, "mon_cstr", target="y", features=["value"],
        model_type="regressor", algo="linear",
        warehouse=warehouse, spark=spark,
    )
    mon = Monitor("mon_cstr_end", spark=spark, warehouse=warehouse)
    # baseline on a narrow slice → live traffic goes out of bounds
    mon.create_baseline(baseline_df=train.filter(F.col("value") < 40))

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "cstr_src")
        ev.select("ts", "value").write.parquet(src)  # keeps real nulls
        schema = spark.read.parquet(src).schema
        stream = mon.streaming_constraint_monitor(src, schema, window="1 hour")
        out = run_stream_to_memory(stream, "mon_cstr_out")
        emitted = out.collect()
        assert len(emitted) > 0
        assert {r["feature"] for r in emitted} == {"value"}
        spec = mon.get_constraints()["features"]["value"]
        lo, hi = float(spec["lower_bound"]), float(spec["upper_bound"])
        total_oob = 0
        for r in sorted(emitted, key=lambda x: -x["n"])[:5]:
            win = ev.filter(
                (F.col("ts") >= r["window_start"]) & (F.col("ts") < r["window_end"])
            )
            n = win.count()
            n_null = win.filter(F.col("value").isNull()).count()
            n_oob = win.filter(
                F.col("value").isNotNull()
                & ((F.col("value") < lo) | (F.col("value") > hi))
            ).count()
            assert (r["n"], r["n_null"], r["n_oob"]) == (n, n_null, n_oob)
            total_oob += n_oob
        assert total_oob > 0  # the narrow baseline really flags live traffic


def test_schema_drift_and_alert_delivery(spark, warehouse, endpoint):
    """Missing baseline features in the capture raise missing_column_check
    violations; reaching the setup_alerts threshold appends a delivered
    alert record."""
    import os
    import shutil

    ep, df = endpoint
    mon = ep.monitor()
    mon.create_baseline(baseline_df=df, recreate=True)
    mon.setup_alerts("oncall@example.com", threshold=1)
    # capture traffic that silently DROPPED a feature column
    cap_dir = mon.capture_dir
    if os.path.isdir(cap_dir):
        shutil.rmtree(cap_dir)
    os.makedirs(cap_dir)
    with open(os.path.join(cap_dir, "capture.json"), "w") as f:
        f.write('{"total_qty": 5.0, "avg_price": 10.0}\n' * 3)
    rec = mon.run_monitoring_execution()
    kinds = {v["constraint_check_type"] for v in rec["violations"]}
    assert "missing_column_check" in kinds
    missing = [v for v in rec["violations"] if v["constraint_check_type"] == "missing_column_check"]
    assert {v["feature"] for v in missing} == {"n_lines"}
    assert rec["status"] == "CompletedWithViolations"
    assert rec.get("alerted") is True
    delivered = mon.alerts()
    assert delivered and delivered[-1]["email"] == "oncall@example.com"
    assert delivered[-1]["n_violations"] == len(rec["violations"])
    shutil.rmtree(cap_dir)


def test_incremental_watermark_skips_prior_traffic(spark, warehouse, endpoint):
    """The r12 incremental contract, as a property (r12 VERDICT What's-wrong
    #2): a second execution must NOT re-flag the FIRST execution's
    out-of-distribution traffic (its watermark bounds the scan to files
    newer than the last run), while incremental=False re-analyzes the full
    capture history and DOES re-flag it."""
    ep, df = endpoint
    mon = ep.monitor()
    mon.create_baseline(baseline_df=df, recreate=True)
    # execution 1: out-of-distribution traffic → violations
    drifted = df.drop("validation").limit(200).select(
        "net_rev",
        (F.col("total_qty") * 10).alias("total_qty"),
        (F.col("avg_price") * 10).alias("avg_price"),
        "n_lines",
    )
    ep.inference(drifted, capture=True)
    rec1 = mon.run_monitoring_execution()
    assert rec1["status"] == "CompletedWithViolations"
    assert rec1["capture_watermark_ns"] > 0
    # execution 2 (incremental, default): only CLEAN traffic arrived since
    # — the old OOD files sit below the watermark and must not re-flag
    clean = df.drop("validation").limit(200)
    ep.inference(clean, capture=True)
    rec2 = mon.run_monitoring_execution()
    assert rec2["status"] == "Completed", rec2["violations"]
    assert rec2["violations"] == []
    assert rec2["captured_rows"] == 200  # the new files only, not history
    assert rec2["capture_watermark_ns"] >= rec1["capture_watermark_ns"]
    # execution 3 (incremental=False): full-history rescan sees the OOD
    # traffic again and re-flags it
    rec3 = mon.run_monitoring_execution(incremental=False)
    assert rec3["status"] == "CompletedWithViolations"
    assert rec3["captured_rows"] > rec2["captured_rows"]
    assert rec3["capture_files"] > rec2["capture_files"]
    kinds = {v["constraint_check_type"] for v in rec3["violations"]}
    assert "baseline_drift_check" in kinds


def test_extra_column_violation(spark, warehouse, endpoint):
    """A captured column that is neither a baseline feature nor an
    expected inference output raises extra_column_check (the other half
    of the Model-Monitor schema pair; shipped r12, property untested)."""
    ep, df = endpoint
    mon = ep.monitor()
    mon.create_baseline(baseline_df=df, recreate=True)
    rogue = df.drop("validation").limit(50).withColumn("rogue_col", F.lit(1.0))
    ep.inference(rogue, capture=True)
    rec = mon.run_monitoring_execution()  # incremental: scans the new file
    flagged = {
        (v["constraint_check_type"], v["feature"]) for v in rec["violations"]
    }
    assert ("extra_column_check", "rogue_col") in flagged
    # the legitimate inference outputs (prediction/residual/target) are
    # allowlisted — rogue_col must be the ONLY extra-column violation
    extras = {f for k, f in flagged if k == "extra_column_check"}
    assert extras == {"rogue_col"}
