"""Property-based tests (hypothesis) for operator invariants the
example-based suites can't sweep: hash order-insensitivity, as-of join
equivalence with pandas merge_asof, encode/decode round-trips.

The reference has no property-based testing at all (SURVEY §5); these
target the custom primitives where a subtle contract break would poison
the correctness gate silently."""

from __future__ import annotations

import os

import pandas as pd
import pytest

_SLOW_GATE = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_SLOW_TESTS"),
    reason="by-design-slow certification tier (SPARK_GRAFT_SLOW_TESTS=1, "
    "run at round close with the other gated tiers; r16 suite-time cut — "
    "the default suite stopped fitting the driver's pytest window)",
)
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=12,  # each example spins Spark jobs — keep the sweep tight
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "4"})


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.text(alphabet="abcdef |", min_size=0, max_size=12),
    ),
    min_size=1,
    max_size=25,
)


@_SLOW_GATE  # measured 16.1s on the r16 baseline run
@given(rows=rows_strategy, nparts=st.integers(min_value=1, max_value=5))
@settings(**SETTINGS)
def test_table_hash_order_and_partition_invariant(spark, rows, nparts):
    """A21 contract: the content hash must not depend on row order or
    partitioning — only on the multiset of rows."""
    from workbench_spark.operators.hashing import table_hash

    df = spark.createDataFrame(rows, "k int, s string")
    h1 = table_hash(df).first()["table_hash"]
    h2 = table_hash(df.repartition(nparts)).first()["table_hash"]
    h3 = table_hash(df.orderBy("s", "k")).first()["table_hash"]
    assert h1 == h2 == h3


@given(
    left_times=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=10),
    right_times=st.lists(st.integers(min_value=0, max_value=100), min_size=0, max_size=10),
)
@settings(**SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_times, right_times):
    """asof_join == pd.merge_asof(direction='backward') on a single key."""
    from workbench_spark.operators.joins import asof_join

    left = spark.createDataFrame(
        [(1, t, i) for i, t in enumerate(left_times)], "k int, t long, lid int"
    )
    right = spark.createDataFrame(
        [(1, t, float(i)) for i, t in enumerate(sorted(set(right_times)))],
        "k int, t long, val double",
    )
    got = {
        r["lid"]: r["val_right"]
        for r in asof_join(left, right, on="k", left_time="t", right_time="t").collect()
    }
    lp = pd.DataFrame({"k": 1, "t": left_times, "lid": range(len(left_times))}).sort_values("t")
    rp = pd.DataFrame(
        {"k": 1, "t": sorted(set(right_times)), "val": [float(i) for i in range(len(set(right_times)))]}
    )
    if len(rp):
        expected_df = pd.merge_asof(lp, rp, on="t", by="k", direction="backward")
        expected = dict(zip(expected_df["lid"], expected_df["val"]))
    else:
        expected = {lid: None for lid in lp["lid"]}
    for lid, val in got.items():
        exp = expected[lid]
        if exp is None or pd.isna(exp):
            assert val is None
        else:
            assert val == exp


@given(
    values=st.lists(
        st.sampled_from(["a", "b", "c", None]), min_size=2, max_size=20
    )
)
@settings(**SETTINGS)
def test_one_hot_row_sums(spark, values):
    """F7 contract: each encoded row has exactly one hot dummy (or all
    zeros for NULL), and column sums reproduce the value counts."""
    from workbench_spark.functions.encoding import one_hot_encode

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id int, c string")
    enc = one_hot_encode(df, ["c"])
    if "c" in enc.columns:  # gate skipped (unique count out of range)
        return
    dummy_cols = [c for c in enc.columns if c.startswith("c_")]
    rows = enc.collect()
    for r in rows:
        hot = sum(r[c] for c in dummy_cols)
        assert hot in (0, 1)
    for c in dummy_cols:
        label = c[2:]
        assert sum(r[c] for r in rows) == sum(1 for v in values if v == label)


@given(
    text=st.text(alphabet=" abcdeABCDE123.,!", min_size=0, max_size=60),
)
@settings(**SETTINGS)
def test_token_count_matches_python(spark, text):
    """Text stats must agree with the obvious Python implementation."""
    from workbench_spark.operators.text import token_count

    from pyspark.sql import functions as F

    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(token_count(F.col("t")).alias("n")).first()["n"]
    assert got == len(text.split())


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=2, max_size=30
    )
)
@settings(**SETTINGS)
def test_descriptive_stats_match_pandas(spark, vals):
    """A5 exact mode must agree with pandas quantile (linear interpolation)."""
    from workbench_spark.operators.eda import descriptive_stats

    df = spark.createDataFrame([(v,) for v in vals], "x double")
    row = descriptive_stats(df, ["x"], exact=True).first()
    s = pd.Series(vals)
    assert row["min"] == s.min()
    assert row["max"] == s.max()
    assert abs(row["median"] - s.quantile(0.5)) < 1e-6 * max(1, abs(s.quantile(0.5)))
    assert abs(row["q1"] - s.quantile(0.25)) < 1e-6 * max(1, abs(s.quantile(0.25)))


def test_spearman_approx_converges(spark):
    """Bucketed-rank Spearman must track the exact rank-window version."""
    from pyspark.sql import functions as F

    from workbench_spark.operators.metrics import regression_metrics, spearman_approx

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_totalprice").alias("y"),
        (F.col("o_totalprice") * 0.5 + F.col("o_orderkey") * 7.0).alias("p"),
    )
    exact = regression_metrics(o, "y", "p").first()["spearman"]
    approx = spearman_approx(o, "y", "p", buckets=500).first()["spearman"]
    assert abs(exact - approx) < 0.01, (exact, approx)


def test_spearman_heavy_ties_matches_scipy_definition(spark):
    """Tie handling vs scipy.spearmanr (r3 VERDICT #7): scipy computes the
    Pearson correlation of AVERAGE ranks; with ~80% ties (5 distinct
    values over 200 rows) any min-rank or dense-rank shortcut diverges.
    scipy itself is not installed in this container, so the expectation
    reimplements its exact definition independently in numpy (stable-sort
    average ranks -> corrcoef) and must agree to 1e-9."""
    import numpy as np

    from workbench_spark.operators.metrics import regression_metrics

    rng = np.random.default_rng(7)
    n = 200
    y = rng.integers(0, 5, n).astype(float)
    p = (y + rng.integers(-1, 2, n)).astype(float)

    def avg_rank(x):
        order = np.argsort(x, kind="stable")
        ranks = np.empty(n)
        sx = x[order]
        i = 0
        while i < n:
            j = i
            while j < n and sx[j] == sx[i]:
                j += 1
            ranks[order[i:j]] = (i + j + 1) / 2.0
            i = j
        return ranks

    expected = float(np.corrcoef(avg_rank(y), avg_rank(p))[0, 1])
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(y, p)], "y double, p double"
    )
    got = regression_metrics(df, "y", "p").first()["spearman"]
    assert abs(got - expected) < 1e-9, (got, expected)


def test_ks_binned_converges(spark):
    from pyspark.sql import functions as F

    from workbench_spark.operators.drift import ks_statistic, ks_statistic_binned

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ref = ev.filter(F.col("user_id") % 2 == 0)
    cur = ev.filter(F.col("user_id") % 2 == 1)
    exact = ks_statistic(ref, cur, "value").first()["ks"]
    binned = ks_statistic_binned(ref, cur, "value", 0.0, 100.0, bins=1000).first()["ks"]
    assert abs(exact - binned) < 0.01, (exact, binned)


# ------------------------------------------------- chem electronic tier

# random acyclic molecules: a tree over heteroatoms, rendered as SMILES
_atom_st = st.sampled_from(["C", "N", "O", "F", "Cl", "S"])


@st.composite
def random_tree_smiles(draw):
    """A random chemical TREE (no rings) as SMILES: each new atom attaches
    to a uniformly chosen earlier atom — always parseable, always neutral,
    and permutation-testable by re-rooting."""
    n = draw(st.integers(min_value=2, max_value=9))
    syms = [draw(_atom_st) for _ in range(n)]
    parents = [draw(st.integers(min_value=0, max_value=i - 1)) for i in range(1, n)]
    children: dict[int, list[int]] = {}
    for i, p in enumerate(parents, start=1):
        children.setdefault(p, []).append(i)

    def render(i):
        out = syms[i] if len(syms[i]) == 1 else f"[{syms[i]}]"
        if syms[i] == "Cl":
            out = "Cl"
        for c in children.get(i, []):
            out += f"({render(c)})"
        return out

    return render(0), syms, parents


@given(data=random_tree_smiles())
@settings(**SETTINGS)
def test_peoe_charge_conservation_random_molecules(data):
    """PEOE on any neutral molecule: total charge (heavy + folded H)
    conserves to float precision, and halogens never go positive."""
    from workbench_spark.chem.peoe import gasteiger_charges
    from workbench_spark.chem.smiles import parse_smiles

    smiles, syms, _ = data
    res = gasteiger_charges(parse_smiles(smiles))
    if res is None:  # S.sp betaine etc. — outside the parameter tables
        return
    q, h = res
    assert sum(q) + sum(h) == pytest.approx(0.0, abs=1e-9)
    mol = parse_smiles(smiles)
    for a in mol.atoms:
        # a halogen bonded to CARBON is always an acceptor; bonded to O/N/F
        # it can legitimately go positive (hypofluorite-type), so only the
        # carbon-neighbor case carries a sign guarantee
        if a.symbol in ("F", "Cl") and all(
            mol.atoms[nb].symbol == "C" for nb, _ in mol.neighbors(a.idx)
        ):
            assert q[a.idx] < 0, (smiles, a.idx)


@given(data=random_tree_smiles())
@settings(**SETTINGS)
def test_vsa_partition_random_molecules(data):
    """Every VSA bin family partitions the identical heavy-atom surface
    total, whatever the molecule."""
    from workbench_spark.chem.smiles import parse_smiles
    from workbench_spark.chem.surface import (
        labute_contributions,
        surface_descriptors,
    )

    smiles, _, _ = data
    mol = parse_smiles(smiles)
    contrib = labute_contributions(mol)
    if contrib is None:
        return
    total = sum(contrib[0])
    d = surface_descriptors(mol)
    for fam in ("slogp_vsa", "smr_vsa", "estate_vsa"):
        fam_vals = [v for k, v in d.items() if k.startswith(fam)]
        if any(v is None for v in fam_vals):
            continue
        assert sum(fam_vals) == pytest.approx(total, rel=1e-9), (smiles, fam)


@given(data=random_tree_smiles(), seed=st.integers(min_value=0, max_value=10**6))
@settings(**SETTINGS)
def test_peoe_relabel_invariance_random_molecules(data, seed):
    """Re-rooting the same tree at a different atom is a pure relabeling:
    the charge multiset must be identical."""
    import random as _random

    from workbench_spark.chem.peoe import gasteiger_charges
    from workbench_spark.chem.smiles import parse_smiles

    smiles, syms, parents = data
    n = len(syms)
    # rebuild adjacency, re-root at a random atom
    adj: dict[int, list[int]] = {i: [] for i in range(n)}
    for i, p in enumerate(parents, start=1):
        adj[p].append(i)
        adj[i].append(p)
    root = _random.Random(seed).randrange(n)

    def render(i, parent):
        out = syms[i]
        for c in adj[i]:
            if c != parent:
                out += f"({render(c, i)})"
        return out

    alt = render(root, -1)
    r1 = gasteiger_charges(parse_smiles(smiles))
    r2 = gasteiger_charges(parse_smiles(alt))
    if r1 is None or r2 is None:
        assert (r1 is None) == (r2 is None)
        return
    a = sorted(round(x + y, 9) for x, y in zip(*r1))
    b = sorted(round(x + y, 9) for x, y in zip(*r2))
    assert a == b, (smiles, alt)


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
            st.text(alphabet="xyz", min_size=0, max_size=4),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
@_SLOW_GATE  # measured 22.0s on the r16 baseline run
@settings(**SETTINGS)
def test_compare_dataframes_self_is_equal(spark, rows):
    """Identity contract: any keyed frame compared to itself reports zero
    structural rows and 'equal' for every column."""
    from workbench_spark.operators.compare import compare_dataframes, dataframes_equal

    df = spark.createDataFrame(rows, "k int, f double, s string")
    rep = compare_dataframes(df, df, "k").collect()
    for r in rep:
        if r["status"] == "row_count":
            assert r["n_differences"] == 0
        else:
            assert r["status"] == "equal" and r["n_differences"] == 0
    assert dataframes_equal(df, df, "k")


@given(
    preds=st.lists(
        st.tuples(
            st.floats(min_value=-50, max_value=50, allow_nan=False),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
            st.floats(min_value=-50, max_value=50, allow_nan=False),
            st.floats(min_value=0, max_value=1, allow_nan=False),
            st.floats(min_value=0, max_value=1, allow_nan=False),
            st.floats(min_value=0, max_value=1, allow_nan=False),
        ),
        min_size=1,
        max_size=15,
    ),
    strategy=st.sampled_from(
        ["confidence", "inverse_mae", "scaled_confidence", "calibrated_confidence"]
    ),
)
@settings(**SETTINGS)
def test_ensemble_strategy_convexity(spark, preds, strategy):
    """Every strategy is a convex combination of the branches: the
    prediction must lie in [min, max] of the branch predictions, and the
    population std must be non-negative."""
    rows = [(i, *p) for i, p in enumerate(preds)]
    df = spark.createDataFrame(
        rows, "id int, p1 double, p2 double, p3 double, c1 double, c2 double, c3 double"
    )
    from workbench_spark.operators.ensembles import ensemble_strategy

    out = ensemble_strategy(
        df, ["p1", "p2", "p3"], ["c1", "c2", "c3"],
        strategy=strategy, model_weights=[1.0, 2.0, 3.0], optimal_alpha=0.5,
    ).collect()
    for r in out:
        lo = min(r["p1"], r["p2"], r["p3"]) - 1e-9
        hi = max(r["p1"], r["p2"], r["p3"]) + 1e-9
        assert lo <= r["prediction"] <= hi, (strategy, r)
        assert r["prediction_std"] >= 0


@given(
    text=st.text(alphabet="ab cd", min_size=0, max_size=60),
    n=st.integers(min_value=2, max_value=4),
)
@settings(**SETTINGS)
def test_decontaminate_self_benchmark(spark, text, n):
    """A doc checked against a benchmark containing itself is contaminated
    iff it has at least n normalized words (i.e. it produces any n-gram)."""
    from workbench_spark.operators.text import decontaminate

    docs = spark.createDataFrame([(1, text)], "doc_id int, text string")
    out = decontaminate(docs, docs, n=n).collect()[0]
    n_words = len([w for w in text.lower().split() if w])
    if n_words >= n:
        assert out["contaminated"]
    else:
        assert not out["contaminated"]


def test_resample_ffill_hand_computed(spark):
    """Hourly resample with a 2-hour gap: the missing bins appear on the
    grid, carry the last observed value, and are flagged is_filled."""
    from datetime import datetime

    from workbench_spark.operators.windows import resample_timeseries

    rows = [
        (1, datetime(2026, 1, 1, 0, 10), 10.0),
        (1, datetime(2026, 1, 1, 0, 50), 20.0),   # same bin -> avg 15
        (1, datetime(2026, 1, 1, 3, 5), 40.0),    # bins 1 and 2 are gaps
        (2, datetime(2026, 1, 1, 5, 0), 7.0),     # single-bin group
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = resample_timeseries(
        df, "ts", "value", group_col="user_id", step_seconds=3600
    )
    got = {
        (r["user_id"], r["bucket_ts"].hour): (r["value"], r["is_filled"])
        for r in out.collect()
    }
    assert got[(1, 0)] == (15.0, False)
    assert got[(1, 1)] == (15.0, True)   # gap carries forward
    assert got[(1, 2)] == (15.0, True)
    assert got[(1, 3)] == (40.0, False)
    assert got[(2, 5)] == (7.0, False)
    assert len(got) == 5  # grid bounded per group, no cross-group bleed
    # zero-fill mode
    z = resample_timeseries(
        df, "ts", "value", group_col="user_id", step_seconds=3600, fill="zero"
    )
    gz = {(r["user_id"], r["bucket_ts"].hour): r["value"] for r in z.collect()}
    assert gz[(1, 1)] == 0.0 and gz[(1, 3)] == 40.0


@given(
    n_tokens=st.integers(min_value=0, max_value=60),
    chunk=st.integers(min_value=2, max_value=12),
    overlap_frac=st.floats(min_value=0.0, max_value=0.9),
)
@settings(**SETTINGS)
def test_chunk_documents_covers_every_token(spark, n_tokens, chunk, overlap_frac):
    """Chunking invariants for any (n, chunk, overlap): every token index
    is covered by >= 1 window, window starts are consecutive stride
    multiples, no window is empty, and the non-overlapping prefix parts
    reconstruct the document."""
    from workbench_spark.operators.text import chunk_documents

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect(),
        key=lambda r: r["chunk_id"],
    )
    if n_tokens == 0:
        assert rows == []
        return
    covered = set()
    for r in rows:
        start = r["chunk_id"] * stride
        toks = r["chunk_text"].split(" ")
        assert toks == [f"t{i}" for i in range(start, min(start + chunk, n_tokens))]
        assert r["n_tokens"] == len(toks) > 0
        covered.update(range(start, start + len(toks)))
    assert covered == set(range(n_tokens))
    # chunk_ids are consecutive from 0
    assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
    # last window reaches the end; the one before it (if any) does not
    last_start = rows[-1]["chunk_id"] * stride
    assert last_start + chunk >= n_tokens
    if len(rows) > 1:
        assert (rows[-2]["chunk_id"] * stride) + chunk < n_tokens


@given(
    vals=st.lists(
        st.tuples(st.integers(min_value=0, max_value=30),
                  st.floats(min_value=-100, max_value=100, allow_nan=False)),
        min_size=1, max_size=25,
    ),
    step=st.sampled_from([60, 300, 3600]),
)
@settings(**SETTINGS)
def test_resample_grid_complete_and_ffill(spark, vals, step):
    """Resample invariants: the grid is exactly every step between the
    group's first and last bucket, observed bins equal the bin average,
    filled bins carry the most recent observed value."""
    from datetime import datetime, timedelta

    from workbench_spark.operators.windows import resample_timeseries

    base = datetime(2026, 3, 1)
    rows = [(1, base + timedelta(seconds=step * off + (off % 7)), v) for off, v in vals]
    df = spark.createDataFrame(rows, "g int, ts timestamp, v double")
    out = sorted(
        resample_timeseries(df, "ts", "v", group_col="g", step_seconds=step).collect(),
        key=lambda r: r["bucket_ts"],
    )
    offs = sorted({off for off, _ in vals})
    assert len(out) == offs[-1] - offs[0] + 1  # dense grid, no more no less
    import collections

    by_bin = collections.defaultdict(list)
    for off, v in vals:
        by_bin[off].append(v)
    last = None
    for i, r in enumerate(out):
        off = offs[0] + i
        if off in by_bin:
            expect = sum(by_bin[off]) / len(by_bin[off])
            assert not r["is_filled"]
            assert abs(r["value"] - expect) < 1e-9
            last = r["value"]
        else:
            assert r["is_filled"] and r["value"] == last


@given(
    docs=st.lists(st.text(alphabet="ab c", min_size=0, max_size=30),
                  min_size=1, max_size=8),
)
@settings(**SETTINGS)
def test_vocabulary_mass_conservation(spark, docs):
    """Σ term_freq = total token count; doc_freq <= min(term_freq, n_docs);
    idf = ln(N/df) exactly."""
    import math

    from workbench_spark.operators.text import vocabulary

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id int, text string")
    rows = vocabulary(df).collect()
    total_tokens = sum(len(d.split()) for d in docs)
    assert sum(r["term_freq"] for r in rows) == total_tokens
    for r in rows:
        assert 1 <= r["doc_freq"] <= min(r["term_freq"], len(docs))
        assert abs(r["idf"] - math.log(len(docs) / r["doc_freq"])) < 1e-12


def test_descriptive_stats_sampled_mode(spark):
    """The sample_fraction production mode: full-data min/max are
    BIT-identical to exact mode; mean/stddev agree within the exact
    mode's 1e-6 input-quantization bound (r13: exact mode computes both
    from micro-quantized integer sums for partition-order invariance, so
    the float-agg production values differ in the quantization tail);
    sampled quantiles land within the ~1/(2*sqrt(n*f)) rank-error bound
    of the exact ones."""
    from pyspark.sql import functions as F

    from workbench_spark.operators.eda import descriptive_stats

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    cols = ["o_totalprice"]
    ex = descriptive_stats(o, cols, exact=True).first()
    sm = descriptive_stats(o, cols, exact=False, sample_fraction=0.3).first()
    for k in ("min", "max"):
        assert sm[k] == ex[k], k
    for k in ("mean", "stddev"):
        assert abs(sm[k] - ex[k]) < 1e-6, (k, sm[k], ex[k])
    # the method bounds RANK error (~sqrt(p(1-p)/(n*f)) ≈ 2% at n*f≈450),
    # not value error (a flat CDF amplifies value deviation arbitrarily):
    # the sampled quantile's rank within the FULL data must sit near p
    n = o.count()
    for k, p in (("q1", 0.25), ("median", 0.5), ("q3", 0.75)):
        rank = o.filter(F.col("o_totalprice") <= sm[k]).count() / n
        assert abs(rank - p) < 0.06, (k, rank, p)


def test_outlier_bounds_sampled_mode(spark):
    """sample_fraction bounds mode: same skip-gate behavior, bounds within
    the IQR tolerance of exact (the margins absorb small quantile shifts)."""
    from workbench_spark.operators.eda import outlier_bounds

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    ex = outlier_bounds(o, ["o_totalprice"], exact=True)
    sm = outlier_bounds(o, ["o_totalprice"], exact=False, sample_fraction=0.5)
    assert set(ex) == set(sm) == {"o_totalprice"}
    (elo, ehi), (slo, shi) = ex["o_totalprice"], sm["o_totalprice"]
    iqr_scale = ehi - elo
    assert abs(slo - elo) / iqr_scale < 0.1
    assert abs(shi - ehi) / iqr_scale < 0.1


_ivs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-20, max_value=40),   # start
        st.integers(min_value=0, max_value=15),     # length
    ),
    min_size=0,
    max_size=12,
)
_pts_strategy = st.lists(
    st.integers(min_value=-25, max_value=60), min_size=1, max_size=15
)


@given(
    ivs=_ivs_strategy,
    pts=_pts_strategy,
    bw=st.sampled_from([1.0, 3.0, 7.5, 20.0]),
)
@settings(**SETTINGS)
def test_range_join_matches_brute_force(spark, ivs, pts, bw):
    """range_join's binned equi-join must equal the O(P·I) brute force for
    ANY bin width: [start, end) semantics, zero-length intervals empty,
    duplicate points kept."""
    from workbench_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(pts)], "pid int, x double"
    )
    intervals = spark.createDataFrame(
        [(j, float(s), float(s + ln)) for j, (s, ln) in enumerate(ivs)],
        "iid int, lo double, hi double",
    ) if ivs else spark.createDataFrame([], "iid int, lo double, hi double")
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, "x", "lo", "hi", bin_width=bw).collect()
    )
    want = sorted(
        (i, j)
        for i, x in enumerate(pts)
        for j, (s, ln) in enumerate(ivs)
        if s <= x < s + ln
    )
    assert got == want


@given(
    keys=st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=4), min_size=1, max_size=30
    ),
    width=st.sampled_from([4, 16, 256]),
)
@_SLOW_GATE  # measured 16.4s on the r16 baseline run
@settings(**SETTINGS)
def test_cms_estimate_bounds(spark, keys, width):
    """CMS contract on arbitrary key multisets: estimate >= true count for
    EVERY key, and estimate <= true + (total - true) (a bucket can never
    hold more than everything else hashed into it)."""
    from collections import Counter

    from workbench_spark.operators.sketches import cms_build, cms_query

    truth = Counter(keys)
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    probes = spark.createDataFrame([(k,) for k in truth], "key string")
    sk = cms_build(df, "key", depth=3, width=width)
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_query(sk, probes, "key", depth=3, width=width).collect()
    }
    total = len(keys)
    for k, true in truth.items():
        assert est[k] >= true, (k, est[k], true)
        assert est[k] <= total, (k, est[k], total)
