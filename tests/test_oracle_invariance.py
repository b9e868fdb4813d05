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

Entries whose oracle contains ``AS MATERIALIZED`` are skipped by default:
9 are the unrolled iterative replays (KMeans/PCA/pagerank/HITS/IVF/
semdedup/BPE/unigram/mixture-BPE) and 5 are the partsupp-family
generation replays (q2/q9/q11/q16/q20) — ALL integer fixed-point BY
DESIGN, structurally order-invariant, and the iterative ones minutes-long
at sf0.1. The skip set is PINNED (``MATERIALIZED_SKIP``, asserted both
here and in the default-suite smoke): a future oracle that adds a
MATERIALIZED CTE for performance fails the default run until it is
explicitly adjudicated onto the list (r15 ADVICE — a bare substring
skip let entries escape the tier silently).
``include_materialized=True`` (env SPARK_GRAFT_ORACLE_INVARIANCE_ALL=1)
runs them too — executed once at sf0.01 in r15 per the r14 verdict:
all 14 stable, removing the skipped-by-design asterisk (COVERAGE.md).

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

# The ONLY oracles allowed to carry `AS MATERIALIZED` (and thereby skip
# the default thread-invariance run). 9 unrolled iterative integer
# replays + 5 partsupp-family integer-cents generation replays. Each was
# run through threads 4-vs-32 once at sf0.01 (r15): all stable. Adding a
# MATERIALIZED CTE to any OTHER oracle fails the default-suite pin smoke
# until the new entry is adjudicated here.
MATERIALIZED_SKIP = frozenset({
    # iterative fixed-point replays (minutes-long at sf0.1)
    "a11_smart_aggregator",        # KMeans Lloyd unroll
    "c7_projection_pca",           # PCA power-iteration unroll
    "dedup_semdedup",              # k-means cells unroll
    "graph_hits_hubs_authorities",
    "graph_pagerank_authority",
    "knn_cosine_ivf",              # IVF centroid unroll
    "text_bpe_merges",
    "text_mixture_weights_bpe",
    "text_unigram_vocab_invariants",
    # partsupp-family integer-cents generation replays (fast, but the
    # MATERIALIZED is load-bearing: the CTE is referenced 2+ times)
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_stock",
    "q16_supplier_part_counts",
    "q20_excess_stock_suppliers",
})


def materialized_actual() -> frozenset:
    """The oracles whose SQL actually contains AS MATERIALIZED — compared
    against the pin in the default-suite smoke and in the full tier."""
    from workbench_spark.queries import oracle_sql

    return frozenset(
        n for n, s in oracle_sql().items() if "AS MATERIALIZED" in s
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
    include_materialized: bool = False,
    entries: list | None = None,
) -> list:
    """Returns [(name, detail), ...] for thread-dependent oracles. `only`
    restricts to one entry (the always-on smoke's mode); `entries` to an
    explicit list (r15 — the skew tier runs the DuckDB thread cross over
    the generatable-table subset ON THE SKEWED CORPUS);
    `include_materialized` also runs the pinned fixed-point replays (env
    SPARK_GRAFT_ORACLE_INVARIANCE_ALL=1 — use sf0.01, they are minutes-
    long at sf0.1)."""
    from workbench_spark.queries import oracle_sql

    o = oracle_sql()
    if only is not None:
        if only not in o:
            raise KeyError(f"unknown oracled entry: {only!r}")
        names = [only]
    elif entries is not None:
        unknown = [n for n in entries if n not in o]
        if unknown:
            raise KeyError(f"unknown oracled entries: {unknown!r}")
        names = sorted(entries)
    else:
        names = sorted(o)
    if only is None and entries is None:
        actual = materialized_actual()
        assert actual == MATERIALIZED_SKIP, (
            "MATERIALIZED pin drift — adjudicate the new entries: "
            f"unpinned={sorted(actual - MATERIALIZED_SKIP)} "
            f"stale_pins={sorted(MATERIALIZED_SKIP - actual)}"
        )
    failures = []
    for name in names:
        sql = o[name]
        if name in MATERIALIZED_SKIP and not include_materialized:
            print(f"{name}: skipped (pinned integer fixed-point replay)",
                  flush=True)
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
        only=os.environ.get("SPARK_GRAFT_SWEEP_ONLY"),
        include_materialized=bool(
            os.environ.get("SPARK_GRAFT_ORACLE_INVARIANCE_ALL")
        ),
    )
    assert not failures, failures
