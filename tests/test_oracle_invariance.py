"""Oracle-side order-invariance sweep (r14).

The hostile-layout sweep certifies the SPARK side of every hash-matched
pair against partition-order effects — but the certification is only as
strong as the ORACLE side's own stability: DuckDB's parallel aggregation
order can flip the same .5-boundary roundings (the exact mechanism behind
q1's sum_charge catch, from the other engine). This tier runs every
SQL-expressible oracle at two DuckDB thread counts (4 vs 32 — different
partial-aggregation tree shapes) at the target SF and asserts the
canonicalized outputs (columns sorted, rows sorted, floats at the
compare() 6-decimal granularity) are identical.

Entries whose oracle contains ``AS MATERIALIZED`` are skipped as a class:
those are the unrolled iterative replays (KMeans/PCA/pagerank/HITS/BPE),
integer fixed-point BY DESIGN — structurally order-invariant — and
minutes-long per query, so they are out of scope for a float-rounding
boundary audit.

First full run (r14, sf0.1): **186 stable / 0 thread-dependent / 14
skipped fixed-point replays**, 824 s — combined with the sf0.1 hostile
sweep, BOTH engines of every oracled pair are order-invariance-certified
at sf0.1.

Gated behind SPARK_GRAFT_ORACLE_INVARIANCE=1 (~15 min at sf0.1):

    SPARK_GRAFT_ORACLE_INVARIANCE=1 python -m pytest \
        tests/test_oracle_invariance.py -q -s

SPARK_GRAFT_ORACLE_INVARIANCE_SF_DIR overrides the SF (default sf0.1 —
boundary landings are size-dependent, and sf0.1 is where q1 flipped);
the always-on smoke (test_gated_tiers_smoke.py) runs one entry at sf0.01
every default run so this module can never rot unexecuted.
"""

from __future__ import annotations

import os

import pytest

pytestmark = [
    pytest.mark.long,
    pytest.mark.skipif(
        not os.environ.get("SPARK_GRAFT_ORACLE_INVARIANCE"),
        reason="oracle-side invariance sweep is opt-in "
        "(SPARK_GRAFT_ORACLE_INVARIANCE=1); ~15 min at sf0.1",
    ),
]

SF = os.environ.get(
    "SPARK_GRAFT_ORACLE_INVARIANCE_SF_DIR", "/root/testdata/sf0.1"
)


def duckdb_canon(sql: str, sf_dir: str, threads: int) -> list[tuple]:
    """Run sql in a fresh DuckDB connection pinned to `threads` and return
    compare()'s OWN canonical form — shared code (oracle_utils.canon_pdf /
    duckdb_run), so this tier certifies against the exact canon the
    correctness gate hashes with, and table-list or granularity changes
    can never diverge silently."""
    from tests.oracle_utils import canon_pdf, duckdb_run

    return canon_pdf(duckdb_run(sql, sf_dir, threads=threads))


def run_oracle_invariance(
    only: str | None = None, sf_dir: str = SF,
    threads_a: int = 4, threads_b: int = 32,
) -> list:
    """Returns [(name, detail), ...] for thread-dependent oracles. `only`
    restricts to one entry (the always-on smoke's mode)."""
    from workbench_spark.queries import oracle_sql

    o = oracle_sql()
    names = sorted(o) if only is None else [only]
    if only is not None and only not in o:
        raise KeyError(f"unknown oracled entry: {only!r}")
    failures = []
    for name in names:
        sql = o[name]
        if "AS MATERIALIZED" in sql:
            print(f"{name}: skipped (integer fixed-point replay)", flush=True)
            continue
        a = duckdb_canon(sql, sf_dir, threads_a)
        b = duckdb_canon(sql, sf_dir, threads_b)
        if a != b:
            da = [r for r in a if r not in b][:2]
            db = [r for r in b if r not in a][:2]
            failures.append((name, f"t{threads_a}-only={da} t{threads_b}-only={db}"))
        print(f"{name}: {'THREAD-DEPENDENT' if a != b else 'stable'}", flush=True)
    return failures


def test_oracles_thread_invariant():
    failures = run_oracle_invariance(
        only=os.environ.get("SPARK_GRAFT_SWEEP_ONLY")
    )
    assert not failures, failures
