"""Whole-registry partition-invariance certification (r12 VERDICT #2).

The repo's correctness story leans on order-independence claims —
integer-quantized sums, deterministic tiebreakers, engine-portable hash
draws — that were previously proven per-entry, not globally. This tier
certifies the claim for EVERY oracled registry entry at once: run the
full sf0.01 driver-contract sweep under a HOSTILE layout —

    spark.sql.shuffle.partitions = 7          (vs the 32 default)
    every input read repartition(13)          (SPARK_GRAFT_HOSTILE_PARTS,
                                               round-robin, coprime with
                                               both 7 and 32)

— and assert every DuckDB oracle still hash-matches. An entry that flips
under this layout has a latent partitioning dependence of exactly the
kind the micro-quantization invariant exists to prevent.

Gated behind SPARK_GRAFT_HOSTILE_SWEEP=1 (it reruns the whole ~5-minute
sweep):

    SPARK_GRAFT_HOSTILE_SWEEP=1 python -m pytest \
        tests/test_partition_invariance.py -q -s

First full run (r13): 198/201 green; the 3 flips were real bugs, all
fixed in the same round —
- o4_stratified_split_invariants: sampleBy's per-row rand + a re-evaluated
  monotonically_increasing_id anti-join made train/holdout overlap →
  stratified_split now uses a deterministic xxhash64 row draw.
- descriptive_stats_lineitem: float AVG's partition-order low bits flipped
  l_tax's mean at a ROUND .5e-6 half-boundary → exact-mode mean/stddev now
  come from exact integer sums + floor-form rounding.
- m4_uq_neighbors: float mu/sd low bits re-resolved z-score neighbor ties
  → similarity._zscore_frame now computes mu/sd from exact integer sums
  (HUGEINT twins in the knn_euclidean_standardized / m4_uq_neighbors
  oracles).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = [
    pytest.mark.long,
    pytest.mark.skipif(
        not os.environ.get("SPARK_GRAFT_HOSTILE_SWEEP"),
        reason="hostile-layout sweep is opt-in (SPARK_GRAFT_HOSTILE_SWEEP=1); "
        "it reruns the full sf0.01 oracle sweep (~5 min)",
    ),
]

# default sf0.01 (the driver-contract SF); SPARK_GRAFT_HOSTILE_SF_DIR
# overrides — r13 VERDICT #6 asks for a round-close run at sf0.1 too,
# since partition-dependence can be size-dependent (AQE coalescing and
# skew-join splits change layouts with volume)
SF = os.environ.get("SPARK_GRAFT_HOSTILE_SF_DIR", "/root/testdata/sf0.01")


def run_hostile_sweep(
    only: str | None = None,
    entries: list | None = None,
    sf_dir: str | None = None,
) -> list:
    """Run the sf0.01 oracle sweep under the hostile 7/13 layout.

    ``only`` restricts the run to a single registry entry (used by the
    always-on gated-tier smoke in test_gated_tiers_smoke.py, and settable
    via SPARK_GRAFT_SWEEP_ONLY for ad-hoc debugging); ``entries``
    restricts to an explicit list (r15 — the skew tier runs the hostile
    layout over the generatable-table subset ON THE SKEWED CORPUS via
    ``sf_dir``, certifying the layout×skew interaction). Returns the
    failure list so callers can assert on it.
    """
    import __spark_entry__ as entrymod

    from tests.oracle_utils import compare, duckdb_run
    from workbench_spark.session import get_spark

    # every mutation inside the try: this function runs in the always-on
    # default suite (gated-tier smoke), and a session-init failure after a
    # bare env assignment would leak the hostile layout into every
    # subsequent test in the process
    prior_parts = None
    spark = None
    try:
        os.environ["SPARK_GRAFT_HOSTILE_PARTS"] = "1"
        spark = get_spark("hostile-sweep")
        prior_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        q, o = entrymod.queries(), entrymod.oracle_sql()
        if only is not None:
            if only not in q:
                raise KeyError(f"unknown registry entry: {only!r}")
            names = [only]
        elif entries is not None:
            unknown = [n for n in entries if n not in q]
            if unknown:
                raise KeyError(f"unknown registry entries: {unknown!r}")
            names = sorted(entries)
        else:
            names = sorted(q)
        run_sf = sf_dir or SF
        failures = []
        for name in names:
            try:
                sdf = q[name](spark, run_sf)
                if name not in o:
                    assert sdf.count() >= 0  # rows-only entries: must run
                    continue
                probs = compare(sdf, duckdb_run(o[name], run_sf))
                if probs:
                    failures.append((name, probs))
            except Exception as exc:  # noqa: BLE001 — collect, then report all
                failures.append((name, f"{type(exc).__name__}: {exc}"))
            print(f"{name}: {'FAIL' if failures and failures[-1][0] == name else 'ok'}",
                  flush=True)
        return failures
    finally:
        os.environ.pop("SPARK_GRAFT_HOSTILE_PARTS", None)
        if spark is not None and prior_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prior_parts)


def test_full_registry_under_hostile_layout():
    failures = run_hostile_sweep(only=os.environ.get("SPARK_GRAFT_SWEEP_ONLY"))
    assert not failures, failures
