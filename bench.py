"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Harness version tag emitted with every result so round-over-round deltas
# are like-for-like. Bump ONLY when the measurement methodology changes
# (timing rule, warm passes, or a query's computation mode) and note the
# change here; the rule (r6 verdict #2) is that a methodology change ships
# one round before the numbers it produces are compared.
#   v2 (r6): min-of-2 timed passes; sf0.001 codegen warm pass; page-cache
#            table warm; descriptive_stats in sampled-quantile mode
#            (sample_fraction=0.02); outliers in fused-GK mode.
#   v1 (r1-r5): single timed pass, same warm-up, exact stats modes.
HARNESS = {
    "version": "v2",
    "timing": "min_of_2_passes",
    "warm": ["jvm", "arrow_pool", "page_cache", "codegen_sf0.001"],
    "stats_mode": "sampled_quantile_0.02",
    # additive in r10 (no methodology change to the timed passes): pinned
    # machine-speed probes so round-over-round deltas can be box-drift
    # normalized — r8 showed a +22% phantom regression and r9 a -25%
    # phantom improvement on byte-identical code.
    "calibration": "v1",
    # additive in r13: frozen-twin baselines (bench_frozen.py, code frozen
    # at r12) run INTERLEAVED with their live counterparts min-of-3 in the
    # same session; the live/frozen ratio is drift-free by construction —
    # the r12 round proved cross-session probe calibration cannot be
    # trusted (probes 0.45x vs queries 0.85x, drift_consistent=false).
    "frozen_baseline": "v1",
}

# Live registry entries with a frozen twin in bench_frozen.FROZEN — the
# 6 heaviest benched queries as of the r12 freeze. Timed in their OWN
# interleaved block (after the extras passes), so the headline/extras
# min-of-2 series stays like-for-like with prior rounds.
FROZEN_PAIRS = [
    "text_nb_classifier",
    "dedup_leakage_safe_split",
    "dedup_jaccard_prefix_pairs",
    "dedup_containment_pairs",
    "graph_pagerank_authority",
    "graph_hits_hubs_authorities",
]

# Light-tier twins (bench_frozen_light.LIGHT_FROZEN, pinned at the r14
# code state — r13 VERDICT #4: q1 read +61% raw at code parity and only
# the heavy-tier median could adjudicate it). Additive: the heavy twins
# and FROZEN_VERSION are untouched; the light ratio series starts at r14.
# The LIVE side of each pair is the BENCHED callable (for
# dedup_minhash_pairs that is _bench_extras' persisted 16/4 production
# shape, not the oracle-grade registry entry) so live and twin time the
# same plan.
LIGHT_FROZEN_PAIRS = [
    "q1_pricing_summary",
    "q5_revenue_by_nation",
    "knn_cosine_bruteforce",
    "dedup_minhash_pairs",
]

# alternating-order pass counts per twin tier (single source of truth —
# the sidecar's per-pair "passes" methodology tag reads these same
# constants, r15 review): heavy pairs are multi-second (4 passes, two
# per side per position); light pairs are sub-second and need more
# samples (8 passes).
HEAVY_TWIN_PASSES = 4
LIGHT_TWIN_PASSES = 8


def summarize_frozen(
    live_t: dict[str, float], froz_t: dict[str, float], version: str,
    passes: int = 4,
    live_samples: dict[str, list] | None = None,
    froz_samples: dict[str, list] | None = None,
    tiers: dict[str, str] | None = None,
    light_passes: int = LIGHT_TWIN_PASSES,
) -> dict | None:
    """Fold per-query live/frozen min timings into the sidecar block.
    Pure function (fuzz-tested in tests/test_bench_delta.py). ratio =
    live_min / frozen_min: < 1 means the live implementation is faster
    than its frozen snapshot ON THIS BOX TODAY — machine drift cancels
    because both ran interleaved in the same session with ALTERNATING
    within-pair order across the 4 passes (two runs per side in each
    position — always-live-first read a phantom 1.02-1.14x regression
    from JIT warm-up order). Queries missing a timing on either side are
    skipped; all-skipped -> None.

    ``live_samples``/``froz_samples`` (r15, VERDICT r14 #6): per-pair
    ALL-pass timings; when given, each per_query entry carries
    ``ratio_band`` = [live_min/frozen_max, live_max/frozen_min] — the
    extreme ratios consistent with this session's own samples. A
    regression claim for a single pair is only meaningful when its
    ratio sits OUTSIDE its own band's spread around 1.0 (r14's
    leakage pair read 0.86 and 1.23 on identical code — the band makes
    such swings self-adjudicating). ``tiers`` (r15, ADVICE) tags each
    entry heavy/light with its true pass count, since heavy pairs run 4
    alternating passes and light pairs 8."""
    per = {}
    for k in sorted(set(live_t) & set(froz_t)):
        lv, fz = float(live_t[k]), float(froz_t[k])
        if fz <= 0:
            continue
        per[k] = {
            "live": round(lv, 4),
            "frozen": round(fz, 4),
            "ratio": round(lv / fz, 4),
        }
        if tiers and k in tiers:
            per[k]["tier"] = tiers[k]
            per[k]["passes"] = (
                light_passes if tiers[k] == "light" else passes
            )
        ls = (live_samples or {}).get(k)
        fs = (froz_samples or {}).get(k)
        if ls and fs and min(fs) > 0:
            per[k]["ratio_band"] = [
                round(min(ls) / max(fs), 4),
                round(max(ls) / min(fs), 4),
            ]
    if not per:
        return None
    ratios = sorted(v["ratio"] for v in per.values())
    return {
        "code_version": version,
        "passes": passes,
        "per_query": per,
        "median_ratio": ratios[len(ratios) // 2],
    }


def _calibrate(spark) -> dict:
    """Pinned, data-independent machine-speed probes. These measure the BOX
    (CPU speed, JVM throughput, shuffle machinery under current load), not
    the repo's code — byte-identical probes every round, so the ratio of
    two rounds' probe timings is the box-drift factor between them.

    Three probes, min-of-3 after one warm run each:
    - python_loop: single-thread pure-Python integer loop (driver CPU).
    - spark_cpu: 32-partition codegen'd arithmetic fold over range(2B) —
      no IO, no shuffle; tracks executor-side JVM throughput.
    - spark_shuffle: range(30M) groupBy 100k keys — one small exchange;
      tracks the shuffle/serialization machinery.
    """

    def _pyloop() -> float:
        t0 = time.perf_counter()
        acc = 0
        for i in range(3_000_000):
            acc = (acc + i * 31) ^ (i >> 3)
        if acc == 0:  # defeat hypothetical DCE, never true
            print(acc, file=sys.stderr)
        return time.perf_counter() - t0

    def _spark_cpu() -> float:
        # 2B rows ≈ 0.6s steady-state on the reference box: long enough to
        # swamp task-scheduling jitter, short enough to run 8x per bench.
        # sum(id % 1000003 + ...) stays far inside long range under ANSI
        # (sum(id*3) over 2B rows overflows).
        t0 = time.perf_counter()
        spark.range(0, 2_000_000_000, 1, 32).selectExpr(
            "sum(id % 1000003 + (id % 7)) as s"
        ).collect()
        return time.perf_counter() - t0

    def _spark_shuffle() -> float:
        t0 = time.perf_counter()
        spark.range(0, 30_000_000, 1, 32).selectExpr("id % 100000 as k").groupBy(
            "k"
        ).count().count()
        return time.perf_counter() - t0

    out = {}
    for name, fn in (
        ("python_loop_sec", _pyloop),
        ("spark_cpu_sec", _spark_cpu),
        ("spark_shuffle_sec", _spark_shuffle),
    ):
        # warm + min-of-3: the probe's own variance must sit well under the
        # ±25% drift band it exists to measure (min-of-2 left 2x spread on
        # the spark probes right after a bench warm-up)
        fn()
        out[name] = round(min(fn(), fn(), fn()), 4)
    return out

def recover_truncated_record(tail: str) -> dict | None:
    """Best-effort reconstruction of a bench record from the driver's
    truncated stdout tail (r10 failure mode: the driver keeps only the
    LAST 2000 chars of stdout; the r10 JSON line outgrew that window, so
    its head — metric/value/leading queries — was cut and the driver's
    parse failed, leaving parsed=null + a mid-line fragment).

    Recovers by regex: the headline-query fragment (every "name": num pair
    before "queries_extra"), the extras dict, sf, harness version, and the
    MERGED calibration probes (the last occurrence of each probe key inside
    the calibration object — pre/post copies come first). Returns a
    partial record marked _truncated; compute_delta then compares on the
    common-headline-query basis instead of the (unrecoverable) total."""
    if not tail or '"queries_extra"' not in tail:
        return None
    # the whole line may actually be present (parse failed upstream for
    # some other reason): try a clean load from the line start first
    start = tail.rfind('{"metric"')
    if start != -1:
        try:
            return json.loads(tail[start:].split("\n")[0])
        except ValueError:
            pass
    head, _, rest = tail.partition('"queries_extra"')
    pair_re = re.compile(r'"([A-Za-z0-9_]+)": ([0-9]+\.?[0-9]*)')
    reserved = {"value", "sf", "n", "rc", "cpus"}
    queries = {
        k: float(v) for k, v in pair_re.findall(head) if k not in reserved
    }
    extras_frag = rest.partition("}")[0]
    extras = {k: float(v) for k, v in pair_re.findall(extras_frag)}
    out: dict = {"queries": queries, "queries_extra": extras, "_truncated": True}
    m = re.search(r'"sf": ([0-9.]+)', rest)
    if m:
        out["sf"] = float(m.group(1))
    m = re.search(r'"version": "(\w+)"', rest)
    if m:
        out["harness"] = {"version": m.group(1)}
    cal_frag = rest.partition('"calibration"')[2]
    cal = {}
    for key in ("python_loop_sec", "spark_cpu_sec", "spark_shuffle_sec"):
        hits = re.findall(rf'"{key}": ([0-9.]+)', cal_frag.partition("}}")[0] or cal_frag)
        if hits:
            cal[key] = float(hits[-1])  # last = the merged value, after pre/post
    if cal:
        out["calibration"] = cal
    return out if queries else None


def compute_delta(
    prev: dict, prev_file: str, total: float, sf_val, calibration: dict,
    timings: dict | None = None, timings_extra: dict | None = None,
):
    """Round-over-round delta block, raw + box-drift-normalized.

    drift_factor f = this round's spark_cpu probe / prev round's (the probe
    that tracks the Spark-dominated query mix; >1 = box slower now).
    Expected total on identical code = prev_total * f, so
    delta_normalized = total - prev_total * f -- the part of the raw delta
    NOT explained by machine drift. None-normalized when the prior round
    predates the calibration probes.

    Also emits ``per_query``: for every query (headline + extras) present
    in BOTH rounds, {prev, raw, delta_raw, delta_normalized} — so a
    per-query perf claim ("pagerank -28%") is verifiable from driver
    artifacts across two drifty rounds, not just the total. ``per_query``
    is SIDEcar-only (BENCH_DETAIL.json): main() strips it from the printed
    line, which must stay under the driver's 2000-char stdout window.

    When the prior record was truncated by the driver's 2000-char stdout
    tail (parsed=null), both totals are recomputed over the COMMON headline
    queries so the comparison stays apples-to-apples on what survived."""
    prev = prev.get("parsed") or prev  # driver wraps the bench line
    if prev.get("value") is None and "queries" not in prev:
        recovered = recover_truncated_record(prev.get("tail") or "")
        if recovered is None:
            # no prior total -- a 0.0 stand-in would report delta_sec == the
            # whole run time
            return None
        prev = recovered
    prev_harness = prev.get("harness", {}).get(
        "version", "v2" if "BENCH_r06" in prev_file else "v1"
    )
    prev_val = prev.get("value")
    basis_note = None
    this_total = total
    if prev_val is None:
        if not (prev.get("_truncated") and timings and prev.get("queries")):
            return None
        common = sorted(set(timings) & set(prev["queries"]))
        if not common:
            return None
        prev_val = round(sum(prev["queries"][k] for k in common), 4)
        this_total = round(sum(timings[k] for k in common), 4)
        basis_note = f"common-{len(common)} (prev tail-truncated)"
    out = {
        "prev_file": prev_file,
        "prev_total_sec": prev_val,
        "delta_sec": round(this_total - float(prev_val), 4),
        "same_harness": prev_harness == HARNESS["version"]
        and prev.get("sf") == sf_val,
    }
    if basis_note:
        out["basis"] = basis_note
        out["this_total_common_sec"] = this_total
    prev_probe = (prev.get("calibration") or {}).get("spark_cpu_sec")
    if prev_probe:
        f_drift = calibration["spark_cpu_sec"] / float(prev_probe)
        out["drift_factor"] = round(f_drift, 4)
        out["delta_normalized_sec"] = round(
            this_total - float(prev_val) * f_drift, 4
        )
        this_q = {**(timings or {}), **(timings_extra or {})}
        prev_q = {**(prev.get("queries") or {}), **(prev.get("queries_extra") or {})}
        per = {}
        for k in sorted(set(this_q) & set(prev_q)):
            pv, tv = float(prev_q[k]), float(this_q[k])
            per[k] = {
                "prev": pv,
                "raw": tv,
                "delta_raw": round(tv - pv, 4),
                "delta_normalized": round(tv - pv * f_drift, 4),
            }
        if per:
            out["per_query"] = per
            # drift-estimate consistency (r12): the probe ratio and the
            # median per-query raw ratio are two independent reads of the
            # same box drift. When they disagree badly (the prior round's
            # probes were sampled at a contention spike — observed r11→r12:
            # probe-implied 2.26× vs query-implied 1.36×), the normalized
            # deltas OVER- or UNDER-correct and must be read raw-first.
            ratios = sorted(
                t["raw"] / t["prev"] for t in per.values() if t["prev"] > 0
            )
            if ratios:  # all-zero prev timings possible on a degenerate
                # tail-truncated prior record — skip the consistency read
                # rather than IndexError and lose the whole bench line
                med = ratios[len(ratios) // 2]
                out["median_query_ratio"] = round(med, 4)
                hi, lo = max(med, f_drift), min(med, f_drift)
                out["drift_consistent"] = bool(lo > 0 and hi / lo <= 1.25)
    else:
        out["drift_factor"] = None
        out["delta_normalized_sec"] = None
        out["normalization_note"] = (
            "prior round has no calibration probes; "
            "normalized deltas start next round"
        )
    return out


# Headline queries: one per operator family, weighted toward the
# scan/join/agg/window/dedup/similarity paths that dominate at scale.
# Stats run in production mode (exact=False → sketch percentiles/HLL,
# constant-memory partials — the same semantics the reference gets from
# Athena approx_percentile); the exact variants exist for the sf0.01
# duckdb-oracle gate where hash-matching requires them.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_revenue_by_nation",
    "q6_forecast_revenue",
    "q18_large_orders",
    "correlations_lineitem",
    "value_counts_orderpriority",
    "w1_latest_event_per_user",
    "w_sessionize_events",
    "asof_join_purchase_click",
    "table_hash_lineitem",
    # documents-table queries: text_quality first so the one-time parquet
    # footer/page-cache cost lands on the cheap scan, not on minhash —
    # order is PINNED (r2 showed rotation noise on q6/q18 when the extras
    # map changed the dict order)
    "text_quality_features",
    "dedup_minhash_pairs",
    "dedup_embedding_cosine",
    "knn_cosine_bruteforce",
    "a13_ensemble_mean",
    "cube_returnflag_linestatus",
]


def _bench_extras(spark):
    """Library-call benchmarks (production/sketch mode)."""
    from workbench_spark.operators import eda
    from workbench_spark.session import read_table

    def descriptive_stats_approx(spark, sf_dir):
        li = read_table(spark, sf_dir, "lineitem")
        # sampled-quantile production mode: exact percentiles of a 2%
        # Bernoulli sample (~0.14% rank error at sf0.1, tighter than the
        # accuracy=250 GK sketch) — the GK per-ROW insert cost dominated
        # this agg (measured 1.0s of 1.1s; sample mode 0.53s, full-data
        # min/max/mean/stddev bit-identical)
        return eda.descriptive_stats(
            li,
            ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
            exact=False,
            sample_fraction=0.02,
        )

    def outliers_approx(spark, sf_dir):
        li = read_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_extendedprice"
        )
        # single-column bounds: the fused GK agg beats the sampled-quantile
        # mode here (sample mode needs a second full-scan job for the
        # distinct gate; measured 0.76 vs 0.84) — sample_fraction pays off
        # only on MULTI-column stats where GK inserts multiply
        return eda.outliers(li, ["l_extendedprice"], exact=False)

    def embedding_dedup_blas(spark, sf_dir):
        from workbench_spark.operators.dedup import embedding_near_dup_pairs

        e = read_table(spark, sf_dir, "embeddings")
        return embedding_near_dup_pairs(e, threshold=0.8, method="blas")

    def minhash_pairs_persisted(spark, sf_dir):
        # production path: persist the banded signatures so the self-join
        # doesn't compute the signature pipeline twice (Spark self-joins
        # never get a ReusedExchange — measured ~2x on this query)
        from workbench_spark.operators.dedup import minhash_lsh_pairs

        d = read_table(spark, sf_dir, "documents")
        # 16 hashes / 4 bands keeps r=4 (same S-curve knee as 32/8) at half
        # the signature cost; the minhash_vs_exact_jaccard estimator
        # invariant stays green at this setting (oracle path keeps 32/8)
        return minhash_lsh_pairs(
            d, n_hashes=16, bands=4, verify_threshold=0.5,
            persist_signatures=True,
        )

    return {
        "descriptive_stats_lineitem": descriptive_stats_approx,
        "outliers_lineitem_price": outliers_approx,
        "dedup_embedding_cosine": embedding_dedup_blas,
        "dedup_minhash_pairs": minhash_pairs_persisted,
    }


# Non-headline timings for operators added after the harness was pinned:
# timed identically (same warm passes, min-of-2) but reported under
# "queries_extra" and EXCLUDED from "value", so the headline total stays
# like-for-like with prior rounds (the r6 rule: never change what the
# round-over-round delta measures mid-stream). Promote an extra into
# HEADLINE only together with a harness-version bump.
EXTRA = [
    "text_dsir_weights",          # r8: importance-weight fit + scoring
    "text_sample_to_mixture",     # r8: mixture materialization
    "text_bm25_topk",             # r8: inverted-index retrieval
    "sketch_cms_token_counts",    # r8: CMS build over the token stream
    "w_time_rollup_events",       # r8: multi-grain rollup, one shuffle
    "j_range_join_promo_windows", # r8: binned range join
    "text_nb_classifier",         # r8: NB train + score
    "pipeline_select_pack",       # r8: select->pack composition
    "text_unigram_scores",        # r8: pandas_udf Viterbi tokenize
    "dedup_leakage_safe_split",   # r8: CC + hash split
    "sketch_hll_registers",       # r8: HLL register build over pair keys
    "graph_pagerank_authority",   # r8: 10 integer power iterations
    "dedup_jaccard_prefix_pairs", # r8: PPJoin prefix-filtered exact join
    "text_source_divergence",     # r8: per-source KL/JS mixture audit
    "graph_hits_hubs_authorities",  # r8: 5 integer HITS iterations
    "dedup_containment_pairs",    # r8: directional containment join
    "sketch_cms_heavy_hitters",   # r8: sketch-prefiltered exact top keys
    "sketch_dd_quantiles",        # r8: DDSketch build + 5 quantile reads
    "q9_product_type_profit",     # r10: partsupp-family profit join (5-way)
    "text_code_quality",          # r11: Stack line-shape filters (pure projection)
    "text_corpus_datasheet",      # r11: one-pass per-source dataset card
    "embedding_space_audit",      # r11: norm stats + anisotropy panel
]


def main() -> None:
    from workbench_spark.queries import queries
    from workbench_spark.session import get_spark

    spark = get_spark("bench")
    reg = queries()
    to_run = {n: reg[n] for n in HEADLINE if n in reg}
    to_run.update(_bench_extras(spark))
    extra_run = {n: reg[n] for n in EXTRA if n in reg}
    timings: dict[str, float] = {}
    timings_extra: dict[str, float] = {}
    # warm the JVM + file listing once
    next(iter(to_run.values()))(spark, SF_DIR).count()
    # warm the Python/Arrow worker pool (one trivial mapInPandas) so the
    # first pandas-path query isn't charged the per-session worker spin-up
    spark.range(32).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    # warm every input table's pages into the OS cache: the metric is
    # round-over-round query EXECUTION, not cold-disk IO, and whichever
    # query happens to touch a table first shouldn't eat its scan cost
    from workbench_spark.session import read_table

    for t in ("lineitem", "orders", "customer", "nation", "region",
              "events", "documents", "embeddings"):
        try:
            read_table(spark, SF_DIR, t).count()
        except Exception:
            pass
    # Compile-cache warm pass: run every benchmark query once against the
    # SMALLEST sf directory before timing. WholeStageCodegen sources are
    # data-independent, so Janino's compile cache (and the JVM JIT) hit
    # when the same plan shapes run at the benchmark SF — the timed runs
    # then measure query EXECUTION, not one-shot codegen compilation
    # (measured: dedup_minhash first run 3.2s cold vs 1.4s after a
    # sf0.001 warm pass, steady-state 0.8s). The warm SF is deliberately
    # tiny so the pass costs seconds and does no meaningful IO warm-up
    # for the benchmark data itself.
    try:
        from bench_frozen import FROZEN, FROZEN_VERSION
    except Exception as exc:  # a broken frozen module must not kill the bench
        print(f"# bench_frozen unavailable: {exc}", file=sys.stderr)
        FROZEN, FROZEN_VERSION = {}, None
    try:
        from bench_frozen_light import LIGHT_FROZEN, LIGHT_FROZEN_VERSION
    except Exception as exc:
        print(f"# bench_frozen_light unavailable: {exc}", file=sys.stderr)
        LIGHT_FROZEN, LIGHT_FROZEN_VERSION = {}, None
    frozen_run = {
        n: FROZEN[n] for n in FROZEN_PAIRS if n in FROZEN and n in reg
    }
    frozen_run.update(
        {n: LIGHT_FROZEN[n] for n in LIGHT_FROZEN_PAIRS
         if n in LIGHT_FROZEN and n in reg}
    )
    # live side = the benched callable (headline/extras override, else
    # registry) so each pair compares identical plans
    live_side = {
        n: to_run.get(n) or extra_run.get(n) or reg[n] for n in frozen_run
    }
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir) and os.path.abspath(warm_dir) != os.path.abspath(SF_DIR):
        warm_frozen = {f"frozen:{n}": fn for n, fn in frozen_run.items()}
        for name, fn in {**to_run, **extra_run, **warm_frozen}.items():
            try:
                fn(spark, warm_dir).count()
            except Exception as exc:  # warm failures must not kill the bench
                print(f"# warm {name} failed: {exc}", file=sys.stderr)
    # Two timed passes, per-query MIN: the metric is the engine's
    # steady-state execution; single-query timings vary 2-3x under
    # concurrent load on this box (measured), and min-of-2 rejects the
    # transient noise while a mean would average it in. Plans and data are
    # identical across passes, so min is the honest steady-state estimate.
    # BOTH headline passes run back-to-back BEFORE any extra query: that is
    # exactly the r6/r7 v2 shape (those rounds had no extras at all), so the
    # headline min-of-2 stays like-for-like. Interleaving (extras inside the
    # pass loop) measurably taxed headline pass 1 — 15 extras including
    # iterative checkpoint-heavy queries churn the JVM code cache / GC /
    # page cache between passes (observed +0.6s spread thinly across the
    # scan-heavy headline queries).
    # Calibration probes run AFTER warm-up, BEFORE the timed passes, and
    # again AFTER everything: the per-probe mean of the two runs is the
    # round's box-speed estimate (machine state can change during the ~2min
    # bench itself — r8's drift was intra-round).
    cal_pre = _calibrate(spark)
    for pass_i in range(2):
        for name, fn in to_run.items():
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = time.perf_counter() - t0
            if name not in timings or dt < timings[name]:
                timings[name] = round(dt, 4)
            print(f"# pass{pass_i} {name}: {dt:.3f}s rows={n}", file=sys.stderr)
    for pass_i in range(2):
        for name, fn in extra_run.items():
            t0 = time.perf_counter()
            n = fn(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            if name not in timings_extra or dt < timings_extra[name]:
                timings_extra[name] = round(dt, 4)
            print(f"# pass{pass_i} extra {name}: {dt:.3f}s rows={n}", file=sys.stderr)
    # Frozen-twin block: live and frozen twin back-to-back WITHIN each
    # pass (the interleave is the whole point — any box-speed change
    # between pass 1 and pass 4 hits both sides equally), per-side min.
    # The within-pair ORDER alternates between passes: the second of two
    # back-to-back identical plans measurably benefits from the first's
    # JIT/codegen warm-up (first cut of this block ran live always-first
    # and read a phantom 1.02-1.14x "regression" on byte-identical code),
    # so 4 passes give each side two runs in each position and the mins
    # compare like-for-like. These live timings feed ONLY the ratio,
    # never queries/queries_extra — the legacy series stays
    # methodology-stable.
    # Sub-second light pairs need more samples than the multi-second heavy
    # ones: at min-of-4 the observed q1 live/frozen ratio swung 0.80→1.41
    # on byte-identical comparisons (a 0.3s query's per-run noise is a
    # large fraction of its runtime), while heavy medians stayed within
    # 1.015→1.027. 8 alternating passes for pairs under the threshold
    # give each side four runs in each position; the extra cost is
    # seconds (the pairs are cheap by definition).
    froz_live_t: dict[str, float] = {}
    froz_froz_t: dict[str, float] = {}
    froz_live_all: dict[str, list] = {}
    froz_froz_all: dict[str, list] = {}

    def _run_pairs(pairs: dict, n_passes: int) -> None:
        for pass_i in range(n_passes):
            for name, ffn in pairs.items():
                def _timed(fn):
                    t0 = time.perf_counter()
                    fn(spark, SF_DIR).count()
                    return time.perf_counter() - t0
                if pass_i % 2 == 0:
                    lt = _timed(live_side[name])
                    ft = _timed(ffn)
                else:
                    ft = _timed(ffn)
                    lt = _timed(live_side[name])
                froz_live_all.setdefault(name, []).append(round(lt, 4))
                froz_froz_all.setdefault(name, []).append(round(ft, 4))
                if name not in froz_live_t or lt < froz_live_t[name]:
                    froz_live_t[name] = round(lt, 4)
                if name not in froz_froz_t or ft < froz_froz_t[name]:
                    froz_froz_t[name] = round(ft, 4)
                print(
                    f"# pass{pass_i} frozen-pair {name}: live={lt:.3f}s"
                    f" frozen={ft:.3f}s"
                    f" ({'live' if pass_i % 2 == 0 else 'frozen'} first)",
                    file=sys.stderr,
                )

    _run_pairs({n: f for n, f in frozen_run.items() if n in FROZEN_PAIRS},
               HEAVY_TWIN_PASSES)
    _run_pairs({n: f for n, f in frozen_run.items() if n in LIGHT_FROZEN_PAIRS},
               LIGHT_TWIN_PASSES)
    frozen_baseline = (
        summarize_frozen(
            froz_live_t, froz_froz_t, FROZEN_VERSION,
            passes=HEAVY_TWIN_PASSES,
            live_samples=froz_live_all, froz_samples=froz_froz_all,
            tiers={
                **{n: "heavy" for n in FROZEN_PAIRS},
                **{n: "light" for n in LIGHT_FROZEN_PAIRS},
            },
        )
        if frozen_run
        else None
    )
    if frozen_baseline and LIGHT_FROZEN_VERSION:
        # The two twin populations are SEPARATE ratio series (heavy = r12
        # freeze, light = r14 freeze, and a light twin can be legitimately
        # stale the round its live query changes — q1's sum_charge fix
        # landed after the light freeze). A single pooled median would
        # silently change population vs r13's printed number, so:
        # median_ratio stays the HEAVY-pairs median (series-stable with
        # r13), and the light pairs get their own median, carried on the
        # printed line so the light series is line-visible too.
        def _median(names):
            rs = sorted(
                froz_live_t[n] / froz_froz_t[n]
                for n in names
                if n in froz_live_t and froz_froz_t.get(n, 0) > 0
            )
            return round(rs[len(rs) // 2], 4) if rs else None

        frozen_baseline["median_ratio"] = _median(FROZEN_PAIRS)
        frozen_baseline["light_median_ratio"] = _median(LIGHT_FROZEN_PAIRS)
        frozen_baseline["light"] = {
            "version": LIGHT_FROZEN_VERSION,
            "passes": 8,
            "queries": [n for n in LIGHT_FROZEN_PAIRS if n in froz_live_t],
        }
    cal_post = _calibrate(spark)
    calibration = {
        "pre": cal_pre,
        "post": cal_post,
        **{
            k: round((cal_pre[k] + cal_post[k]) / 2, 4)
            for k in cal_pre
        },
    }
    total = sum(timings.values())
    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = None
    # Same-harness delta vs the previous recorded round (r6 ran what is now
    # tagged v2, so r7+ comparisons are like-for-like). Best-effort: absent
    # or unreadable prior BENCH files never fail the bench.
    prev_delta = None
    try:
        import glob as _glob

        def _round_num(path):
            # numeric round sort -- lexicographic glob order misorders r100+
            m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(path))
            return int(m.group(1)) if m else -1

        prior = sorted(
            _glob.glob(os.path.join(_REPO, "BENCH_r*.json")), key=_round_num
        )
        if prior:
            prev_delta = compute_delta(
                json.load(open(prior[-1])), os.path.basename(prior[-1]),
                total, sf_val, calibration, timings=timings,
                timings_extra=timings_extra,
            )
    except Exception:
        prev_delta = None
    record = {
        "metric": "headline_queries_total",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "queries_extra": timings_extra,
        "sf": sf_val,
        "harness": HARNESS,
        "calibration": calibration,
        "same_harness_delta": prev_delta,
        "frozen_baseline": frozen_baseline,
    }
    # full-fidelity sidecar (pre/post probes, everything): the driver keeps
    # only the LAST 2000 chars of stdout, so the printed line must stay
    # inside that window — r10's line outgrew it and the round's numbers
    # were lost to parsed=null. The sidecar loses nothing.
    try:
        with open(os.path.join(_REPO, "BENCH_DETAIL.json"), "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        pass
    # printed line: compact separators, merged-only calibration; if the
    # extras tail still pushes past the driver window, spill the cheapest
    # extras (keep the expensive ones visible — they carry the signal)
    line_rec = dict(record)
    line_rec["calibration"] = {
        k: v for k, v in calibration.items() if k not in ("pre", "post")
    }
    # the line keeps only harness.version (what compute_delta's
    # same-harness check reads); the full methodology block is sidecar —
    # r15 (VERDICT r14 #5): frees ~170 chars so the budget below has
    # real slack instead of the r14 1,898/1,900 squeeze
    line_rec["harness"] = {"version": HARNESS["version"]}
    # per-query deltas are sidecar-only: ~40 queries x 4 numbers would blow
    # the 2000-char stdout window the driver records
    if isinstance(prev_delta, dict) and "per_query" in prev_delta:
        line_rec["same_harness_delta"] = {
            k: v for k, v in prev_delta.items() if k != "per_query"
        }
    # same rule for the frozen block: the line keeps only the headline
    # (version + median live/frozen ratio); per-pair numbers are sidecar
    if isinstance(frozen_baseline, dict):
        line_rec["frozen_baseline"] = {
            k: v for k, v in frozen_baseline.items()
            if k not in ("per_query", "light")
        }
    line = json.dumps(line_rec, separators=(",", ":"))
    if len(line) > 1800:
        keep = dict(
            sorted(timings_extra.items(), key=lambda t: -t[1])
        )
        while len(line) > 1800 and keep:
            keep.popitem()
            line_rec["queries_extra"] = {
                **keep, "_spilled": "see BENCH_DETAIL.json"
            }
            line = json.dumps(line_rec, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
