"""Unit tests for bench.py's round-over-round delta math — the calibration
normalization must be right or every future round's perf read is wrong."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import HARNESS, compute_delta  # noqa: E402

CAL = {"spark_cpu_sec": 0.50, "python_loop_sec": 0.35, "spark_shuffle_sec": 0.45}


def test_delta_normalization_removes_box_drift():
    """Identical code on a 25% slower box: raw delta shows a phantom
    +2.0s; the normalized delta must be ~0 (the r8/r9 phantom-swing
    scenario the probes exist for)."""
    prev = {
        "value": 8.0,
        "sf": 0.1,
        "harness": {"version": HARNESS["version"]},
        "calibration": {"spark_cpu_sec": 0.40},
    }
    d = compute_delta(prev, "BENCH_r10.json", 10.0, 0.1, CAL)
    assert d["delta_sec"] == 2.0
    assert d["drift_factor"] == 1.25
    assert abs(d["delta_normalized_sec"]) < 1e-9
    assert d["same_harness"] is True


def test_delta_real_regression_survives_normalization():
    """A true 1s regression on a stable box must show up in BOTH deltas."""
    prev = {
        "value": 8.0, "sf": 0.1,
        "harness": {"version": HARNESS["version"]},
        "calibration": {"spark_cpu_sec": 0.50},
    }
    d = compute_delta(prev, "BENCH_r10.json", 9.0, 0.1, CAL)
    assert d["delta_sec"] == 1.0 and d["delta_normalized_sec"] == 1.0


def test_delta_prior_without_calibration_is_unnormalized():
    prev = {"value": 8.0, "sf": 0.1, "harness": {"version": HARNESS["version"]}}
    d = compute_delta(prev, "BENCH_r09.json", 9.0, 0.1, CAL)
    assert d["delta_sec"] == 1.0
    assert d["drift_factor"] is None and d["delta_normalized_sec"] is None
    assert "normalization_note" in d


def test_delta_driver_parsed_wrapper_and_sf_mismatch():
    """The driver wraps the bench line under 'parsed'; a different SF must
    flag same_harness=False."""
    prev = {"parsed": {
        "value": 8.0, "sf": 0.01,
        "harness": {"version": HARNESS["version"]},
        "calibration": {"spark_cpu_sec": 0.50},
    }}
    d = compute_delta(prev, "BENCH_r10.json", 9.0, 0.1, CAL)
    assert d["same_harness"] is False and d["delta_sec"] == 1.0


def test_delta_missing_prev_value_returns_none():
    assert compute_delta({"sf": 0.1}, "BENCH_r01.json", 9.0, 0.1, CAL) is None
