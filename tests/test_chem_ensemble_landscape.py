"""Tests: chem operators (stub path), ensembles, landscape/M-operators,
InferenceCache, Transform ABC + DAG, cache decorator."""

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
def mols(spark):
    rows = [
        ("m1", "CCO", 1.0),
        ("m2", "OCC", 1.1),          # ethanol again: same canonical form
        ("m3", "C1=CC=CC=C1", 2.0),
        ("m4", "CC(=O)[O-].[Na+]", 3.0),  # salt
        ("m5", None, 4.0),            # invalid
        ("m6", "CCN", 5.0),
    ]
    return spark.createDataFrame(rows, "id string, smiles string, y double")


def test_canonical_dedup(spark, mols):
    from workbench_spark.operators.chem import dedup_by_canonical_smiles

    out = dedup_by_canonical_smiles(mols)
    ids = {r["id"] for r in out.collect()}
    assert "m5" not in ids            # invalid dropped
    assert ("m1" in ids) != ("m2" in ids)  # exactly one of the dup pair kept
    assert "m1" in ids                # keep-min-id


def test_fingerprints_and_tanimoto(spark, mols):
    from workbench_spark.operators.chem import morgan_fingerprints, tanimoto_pairs

    fp = morgan_fingerprints(mols.filter(F.col("smiles").isNotNull()), n_bits=256)
    row = fp.first()
    assert len(row["fingerprint"]) == 256 and set(row["fingerprint"]) <= {"0", "1"}
    pairs = tanimoto_pairs(fp, threshold=0.99)
    # m1/m2 are the same molecule (ethanol) → identical ECFP → tanimoto 1.0
    found = {(r["id_a"], r["id_b"]): r["tanimoto"] for r in pairs.collect()}
    assert found.get(("m1", "m2")) == 1.0


def test_mol_tagging_and_filter(spark, mols):
    from workbench_spark.operators.chem import filter_by_tags, tag_molecules

    tagged = tag_molecules(mols)
    by_id = {r["id"]: r["tags"] for r in tagged.collect()}
    assert "salt" in by_id["m4"]  # two components; net charge is 0
    assert "invalid" in by_id["m5"]
    assert "structure:aromatic" in by_id["m3"]  # Kekulé benzene perceived
    assert "structure:acyclic" in by_id["m1"]
    kept = filter_by_tags(tagged, exclude=["invalid", "salt"])
    ids = {r["id"] for r in kept.collect()}
    assert ids == {"m1", "m2", "m3", "m6"}


def test_sdf_roundtrip(spark, tmp_path):
    from workbench_spark.operators.chem import df_to_sdf_file, sdf_file_to_df

    sdf = tmp_path / "test.sdf"
    sdf.write_text(
        "mol1\n\n\n  0  0\nM  END\n>  <logS>\n-1.5\n\n>  <name>\nethanol\n\n$$$$\n"
        "mol2\n\n\n  0  0\nM  END\n>  <logS>\n-2.5\n\n$$$$\n"
    )
    df = sdf_file_to_df(spark, str(sdf))
    rows = sorted(df.collect(), key=lambda r: r["props"]["logS"])
    assert len(rows) == 2
    assert rows[0]["props"] == {"logS": "-1.5", "name": "ethanol"}
    assert rows[1]["props"] == {"logS": "-2.5"}
    out = df_to_sdf_file(df, str(tmp_path / "out.sdf"))
    assert sdf_file_to_df(spark, out).count() == 2


def test_ensemble_aggregators(spark):
    from workbench_spark.operators.ensembles import (
        ensemble_mean,
        ensemble_vote,
        ensemble_weighted_mean,
    )

    df = spark.createDataFrame(
        [(1.0, 2.0, None), (3.0, None, None)], "p1 double, p2 double, p3 double"
    )
    m = ensemble_mean(df, ["p1", "p2", "p3"]).collect()
    assert m[0]["prediction"] == 1.5 and m[1]["prediction"] == 3.0
    wm = ensemble_weighted_mean(df, ["p1", "p2", "p3"], [1.0, 3.0, 1.0]).collect()
    assert wm[0]["prediction"] == (1.0 + 6.0) / 4.0
    v = spark.createDataFrame(
        [("a", "b", "a"), ("x", "y", None)], "c1 string, c2 string, c3 string"
    )
    votes = ensemble_vote(v, ["c1", "c2", "c3"]).collect()
    assert votes[0]["prediction"] == "a"
    assert votes[1]["prediction"] == "x"  # tie → smallest label


def test_target_health_and_feature_quality(spark):
    from workbench_spark.operators.ensembles import feature_quality, target_health

    df = spark.createDataFrame(
        [(1.0,), (1.0,), (1.0,), (2.0,), (None,)], "y double"
    )
    th = target_health(df, "y").first()
    assert th["support"] == 5 and th["nulls"] == 1
    assert th["pileup_value"] == "1.0" or th["pileup_value"] == 1.0
    assert abs(th["pileup_fraction"] - 0.6) < 1e-9

    fq = feature_quality(
        spark.createDataFrame(
            [(1.0, 2.0), (None, 4.0), (float("nan"), 6.0)], "a double, b double"
        ),
        ["a", "b"],
    )
    rows = fq.orderBy("b").collect()
    assert rows[1]["a"] == 1.0  # imputed with mean of valid values
    assert rows[1]["quality_tags"] == ["imputed_a"]
    assert rows[0]["quality_tags"] == []


def test_activity_cliffs_and_row_tags(spark):
    from workbench_spark.operators.landscape import activity_cliffs, row_tags, target_gradients

    # two tight clusters; one point with a wildly different target
    rows = [(1, 0.0, 1.0), (2, 0.01, 1.1), (3, 0.02, 9.0), (4, 5.0, 1.0), (5, 5.01, 1.05)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    cliffs = activity_cliffs(df, ["x"], "id", "y", k=2, max_distance=0.5, min_delta=3.0)
    pairs = {(r["id"], r["neighbor_id"]) for r in cliffs.collect()}
    assert (3, 2) in pairs or (3, 1) in pairs
    tags = {r["id"]: r["row_tags"] for r in row_tags(
        df, ["x"], "id", "y", k=2, cliff_distance=0.5, cliff_delta=3.0
    ).collect()}
    assert "activity_cliff" in tags[3]
    assert "activity_cliff" not in tags[4]
    grads = {r["id"]: r["max_gradient"] for r in target_gradients(df, ["x"], "id", "y", k=2).collect()}
    assert grads[3] > grads[4]


def test_multi_task_alignment(spark):
    from workbench_spark.operators.landscape import multi_task_alignment

    t1 = spark.createDataFrame([(i, float(i)) for i in range(20)], "id int, y double")
    t2 = spark.createDataFrame([(i, float(2 * i)) for i in range(15)], "id int, y double")
    t3 = spark.createDataFrame([(i, float(-i)) for i in range(10)], "id int, y double")
    out = multi_task_alignment({"a": t1, "b": t2, "c": t3}, "id", "y")
    rows = {(r["task_a"], r["task_b"]): r for r in out.collect()}
    assert abs(rows[("a", "b")]["correlation"] - 1.0) < 1e-9
    assert abs(rows[("a", "c")]["correlation"] + 1.0) < 1e-9
    assert rows[("a", "b")]["shared_rows"] == 15


def test_inference_cache_split(spark):
    from workbench_spark.api.inference_cache import InferenceCache

    with tempfile.TemporaryDirectory() as d:
        cache = InferenceCache("m1", spark, root=d, key_cols=["id", "x"])
        df = spark.createDataFrame([(i, float(i)) for i in range(10)], "id int, x double")
        need, hit = cache.split(df)
        assert need.count() == 10 and hit is None
        preds = df.filter(F.col("id") < 6).withColumn("prediction", F.col("x") * 2)
        cache.add(preds, result_cols=["prediction"])
        need2, hit2 = cache.split(df)
        assert need2.count() == 4
        assert hit2.count() == 6
        assert {r["prediction"] for r in hit2.collect()} == {0.0, 2.0, 4.0, 6.0, 8.0, 10.0}


def test_transform_abc_and_dag(spark):
    from workbench_spark.plans.transform import CleanData, DagNode, MetaEndpointDag

    df = spark.createDataFrame(
        [(1, 2.0), (1, 2.0), (2, None)], "id int, v double"
    )
    cleaned = CleanData(subset=["v"]).transform(df)
    assert cleaned.count() == 1

    base = spark.createDataFrame([(i, float(i)) for i in range(5)], "id int, x double")
    dag = MetaEndpointDag(
        [
            DagNode("double", lambda d: d.withColumn("x2", F.col("x") * 2), ["x"], ["x2"]),
            DagNode("square", lambda d: d.withColumn("xx", F.col("x") * F.col("x")), ["x"], ["xx"]),
        ]
    )
    out = dag.run(base)
    r = {row["id"]: row for row in out.collect()}
    assert r[3]["x2"] == 6.0 and r[3]["xx"] == 9.0

    bad = MetaEndpointDag([DagNode("b", lambda d: d, ["nope"], ["o"])])
    assert bad.validate(base)
    with pytest.raises(ValueError):
        bad.run(base)


def test_cache_dataframe_decorator(spark):
    from workbench_spark.api.stores import cache_dataframe

    with tempfile.TemporaryDirectory() as d:
        calls = {"n": 0}

        class Thing:
            name = "thing1"

            def __init__(self, spark):
                self.spark = spark

            @cache_dataframe("expensive", root=d)
            def compute(self):
                calls["n"] += 1
                return spark.range(5)

        t = Thing(spark)
        assert t.compute().count() == 5
        assert t.compute().count() == 5
        assert calls["n"] == 1  # second call served from the parquet cache


def test_molecular_descriptors_real_values(spark, mols):
    from workbench_spark.operators.chem import MOL_DESCRIPTOR_NAMES, molecular_descriptors

    out = molecular_descriptors(mols.filter(F.col("smiles").isNotNull()))
    assert set(MOL_DESCRIPTOR_NAMES) <= set(out.columns)
    rows = {r["id"]: r for r in out.collect()}
    # ethanol: real published values, not pseudo-values
    assert rows["m1"]["molwt"] == pytest.approx(46.069, abs=0.01)
    assert rows["m1"]["tpsa"] == pytest.approx(20.23, abs=0.01)
    assert rows["m1"]["numhdonors"] == 1 and rows["m1"]["numhacceptors"] == 1
    # written-form invariance: m2 (OCC) is the same molecule
    assert rows["m1"]["molwt"] == rows["m2"]["molwt"]
    # Kekulé benzene: ring perceived, aromatic ring counted
    assert rows["m3"]["ringcount"] == 1 and rows["m3"]["numaromaticrings"] == 1
    assert rows["m3"]["molwt"] == pytest.approx(78.11, abs=0.01)


def test_strip_salts(spark):
    """C6 — largest organic fragment kept (salts.py:57-150 policy)."""
    from workbench_spark.operators.chem import strip_salts

    rows = [
        ("s1", "CC(=O)[O-].[Na+]"),     # acetate sodium salt -> acetate ion
        ("s2", "c1ccccc1"),             # no salt: unchanged (canonical form)
        ("s3", "[Na+].[Cl-]"),          # no organic: keep heavier fragment
        ("s4", None),
    ]
    df = spark.createDataFrame(rows, "id string, smiles string")
    out = {r["id"]: r["parent_smiles"] for r in strip_salts(df).collect()}
    from workbench_spark.chem.canon import canonical_smiles

    assert out["s1"] == canonical_smiles("CC(=O)[O-]")
    assert out["s2"] == canonical_smiles("c1ccccc1")
    assert out["s3"] == canonical_smiles("[Cl-]")  # Cl (35.45) > Na (22.99)
    assert out["s4"] is None


def test_stratified_split(spark):
    from workbench_spark.operators.windows import stratified_split

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").filter(
        F.col("event_type").isNotNull()
    )
    train, hold = stratified_split(ev, "event_type", 0.7, seed=1)
    n, tn, hn = ev.count(), train.count(), hold.count()
    assert tn + hn == n  # exact partition of the input
    assert 0.5 * n < tn < 0.9 * n
    # every stratum represented on both sides
    strata = {r[0] for r in ev.select("event_type").distinct().collect()}
    assert {r[0] for r in train.select("event_type").distinct().collect()} == strata


def test_stratified_split_key_cols_and_large_dict(spark):
    """r13 ADVICE hardening: (a) explicit key_cols pins the draw, so an
    unrelated added column does NOT reshuffle assignments; (b) the default
    draw skips MapType columns instead of AnalysisException-ing, and an
    explicit MapType key is rejected loudly; (c) the >64-strata broadcast
    lookup path draws identically to the nested-CASE path."""
    from workbench_spark.operators.windows import stratified_split

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").filter(
        F.col("event_type").isNotNull()
    )
    # (a) key_cols pins assignment under schema evolution
    t1, _ = stratified_split(ev, "event_type", 0.7, seed=1,
                             key_cols=["event_id", "event_type"])
    ev2 = ev.withColumn("__noise", F.lit("x"))
    t2, _ = stratified_split(ev2, "event_type", 0.7, seed=1,
                             key_cols=["event_id", "event_type"])
    ids1 = {r[0] for r in t1.select("event_id").collect()}
    ids2 = {r[0] for r in t2.select("event_id").collect()}
    assert ids1 == ids2
    # ...while the all-columns default (documented) does reshuffle
    t3, _ = stratified_split(ev2, "event_type", 0.7, seed=1)
    ids3 = {r[0] for r in t3.select("event_id").collect()}
    assert ids3  # runs; assignment may legitimately differ from ids1

    # (b) map columns: skipped by default, rejected when explicit
    evm = ev.withColumn("__m", F.create_map(F.lit("k"), F.col("event_type")))
    tm, hm = stratified_split(evm, "event_type", 0.7, seed=1)
    assert tm.count() + hm.count() == evm.count()
    with pytest.raises(ValueError, match="MapType"):
        stratified_split(evm, "event_type", 0.7, key_cols=["__m"])

    # (c) CASE chain vs broadcast lookup: identical draws per stratum
    small = {v: 0.6 for v in ("click", "view", "purchase")}
    big = dict(small)
    big.update({f"__pad{i}": 0.5 for i in range(70)})  # absent strata: no-ops
    t_small, h_small = stratified_split(ev, "event_type", small, seed=3)
    t_big, h_big = stratified_split(ev, "event_type", big, seed=3)
    s_ids = sorted(r[0] for r in t_small.select("event_id").collect())
    b_ids = sorted(r[0] for r in t_big.select("event_id").collect())
    assert s_ids and s_ids == b_ids
    assert h_small.count() == h_big.count()


def test_stratified_split_nested_map_and_nan_strata(spark):
    """r15 ADVICE hardening: (a) columns whose type NESTS a map
    (array<map>, struct-with-map) are excluded from the default draw and
    rejected as explicit keys — the r14 guard only checked top-level
    MapType, so these died with a raw AnalysisException; (b) NaN strata
    in a float column go to the HOLDOUT under the scalar-fraction
    shortcut, matching the pre-r13 distinct-collect+CASE semantics
    (NaN != NaN) instead of riding the isNotNull() gate into train."""
    from workbench_spark.operators.windows import stratified_split

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type").isNotNull())
        .limit(200)
    )
    # (a) nested maps: array<map> and struct{m: map}
    evn = ev.withColumn(
        "__am", F.array(F.create_map(F.lit("k"), F.col("event_type")))
    ).withColumn(
        "__sm", F.struct(F.create_map(F.lit("k"), F.lit(1)).alias("m"))
    )
    tn, hn = stratified_split(evn, "event_type", 0.7, seed=1)
    assert tn.count() + hn.count() == evn.count()
    for bad_col in ("__am", "__sm"):
        with pytest.raises(ValueError, match="MapType"):
            stratified_split(evn, "event_type", 0.7, key_cols=[bad_col])

    # (b) NaN strata → holdout, NULL strata → holdout, finite gets the frac
    evf = ev.withColumn(
        "__fs",
        F.when(F.col("event_id") % 3 == 0, F.lit(float("nan")))
        .when(F.col("event_id") % 3 == 1, F.lit(None).cast("double"))
        .otherwise(F.lit(1.5)),
    )
    tr, ho = stratified_split(evf, "__fs", 0.9, seed=7,
                              key_cols=["event_id"])
    assert tr.count() + ho.count() == evf.count()
    assert tr.filter(F.isnan("__fs") | F.col("__fs").isNull()).count() == 0
    n_nan = evf.filter(F.isnan("__fs")).count()
    assert n_nan > 0
    assert ho.filter(F.isnan("__fs")).count() == n_nan
    assert tr.filter(F.col("__fs") == 1.5).count() > 0

    # (c) a NaN KEY in fractions is rejected: Spark evaluates NaN == NaN
    # as TRUE, so the dict paths would silently turn NaN into a matchable
    # stratum where every other path routes it to the holdout
    with pytest.raises(ValueError, match="NaN is not a stratum"):
        stratified_split(evf, "__fs", {float("nan"): 0.5}, seed=7,
                         key_cols=["event_id"])


def test_ruzicka_pairs_exact_values(spark):
    """ruzicka_pairs on hand-computed count vectors: sim = sum(min)/sum(max)."""
    from workbench_spark.operators.chem import ruzicka_knn, ruzicka_pairs

    # a={x:3,y:1}, b={x:1,y:1,z:2}, c={q:5}
    rows = [
        (1, "x", 3), (1, "y", 1),
        (2, "x", 1), (2, "y", 1), (2, "z", 2),
        (3, "q", 5),
    ]
    long_df = spark.createDataFrame(rows, ["id", "dim", "cnt"])
    got = {(r["id_a"], r["id_b"]): r["ruzicka"] for r in ruzicka_pairs(long_df, threshold=0.0).collect()}
    # min(a,b)=1+1=2, max=3+1+2=6 -> 1/3 ; a∩c = b∩c = 0 -> no pair rows
    assert got == {(1, 2): pytest.approx(2 / 6)}

    knn = ruzicka_knn(long_df, k=2).collect()
    by_id = {}
    for r in knn:
        by_id.setdefault(r["id"], []).append(r)
    assert [n["neighbor_id"] for n in by_id[1]] == [2]
    assert by_id[1][0]["distance"] == pytest.approx(1 - 2 / 6)
    assert by_id[1][0]["similarity"] == pytest.approx(2 / 6)
    assert 3 not in by_id  # zero-overlap rows omitted, documented semantics


def test_ruzicka_morgan_count_pipeline(spark, mols):
    """End-to-end: SMILES -> count fp map -> long form -> pairs; identical
    molecules (same canonical form under the stub) hit ruzicka == 1.0."""
    from workbench_spark.operators.chem import (
        count_fp_long,
        morgan_count_fingerprints,
        ruzicka_pairs,
    )

    fp = morgan_count_fingerprints(
        mols.filter(F.col("smiles").isNotNull()), n_bits=512
    )
    row = fp.filter(F.col("count_fp").isNotNull()).first()
    assert all(v > 0 for v in row["count_fp"].values())
    long_df = count_fp_long(fp.filter(F.col("count_fp").isNotNull()))
    found = {(r["id_a"], r["id_b"]): r["ruzicka"] for r in ruzicka_pairs(long_df, threshold=0.99).collect()}
    assert ("m1", "m2") in found and found[("m1", "m2")] == pytest.approx(1.0)


def test_ruzicka_df_cap_recall(spark):
    """df_cap drops hot dims: pairs supported only by a capped dim vanish
    (documented recall trade), pairs on cold dims survive."""
    from workbench_spark.operators.chem import ruzicka_pairs

    # dim "hot" shared by ids 1..20; dim "cold" shared by ids 1,2 only
    rows = [(i, "hot", 1) for i in range(1, 21)] + [(1, "cold", 9), (2, "cold", 9)]
    long_df = spark.createDataFrame(rows, ["id", "dim", "cnt"])
    full = ruzicka_pairs(long_df, threshold=0.01)
    capped = ruzicka_pairs(long_df, threshold=0.01, df_cap=5)
    assert full.count() == 20 * 19 // 2
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(1, 2)}  # only the cold-dim pair survives


def test_toxicity_tags_operator(spark):
    from workbench_spark.operators.chem import toxicity_tags

    rows = [
        ("t1", "CC(=O)Oc1ccccc1C(=O)O"),   # clean
        ("t2", "C(Cl)(Cl)Cl"),             # chloroform
        ("t3", "C[Hg]C"),                  # organomercury
        ("t4", None),                      # unknown
    ]
    df = spark.createDataFrame(rows, "id string, smiles string")
    out = {r["id"]: r for r in toxicity_tags(df).collect()}
    assert out["t1"]["is_toxic"] is False
    assert out["t2"]["is_toxic"] and "trichloromethyl" in out["t2"]["toxic_groups"]
    assert out["t3"]["heavy_metals"] and out["t3"]["toxic_elements"] == ["Hg"]
    assert out["t4"]["is_toxic"] is None  # unknown != safe


def test_dag_with_prediction_aggregator(spark):
    """Full reference DAG shape: parallel predictor branches → calibrated
    strategy aggregation node (aggregation_nodes.py:310-388)."""
    import numpy as np

    from workbench_spark.plans.transform import (
        DagNode,
        Mean,
        MetaEndpointDag,
        ScaledConfidenceWeighted,
        Vote,
        WeightedMean,
    )

    base = spark.createDataFrame([(i, float(i)) for i in range(6)], "id int, x double")
    branches = [
        DagNode("m1", lambda d: d.withColumn("p1", F.col("x") * 2)
                .withColumn("c1", F.lit(0.9)), ["x"], ["p1", "c1"]),
        DagNode("m2", lambda d: d.withColumn("p2", F.col("x") * 2 + 1)
                .withColumn("c2", F.lit(0.1)), ["x"], ["p2", "c2"]),
    ]
    dag = MetaEndpointDag(
        branches,
        aggregator=ScaledConfidenceWeighted("ens", model_weights=[1.0, 1.0]),
        pred_cols=["p1", "p2"],
        conf_cols=["c1", "c2"],
    )
    out = {r["id"]: r for r in dag.run(base).collect()}
    # weights ∝ conf*mw → (0.9, 0.1)/1.0; x=2: 0.9*4 + 0.1*5 = 4.1
    assert out[2]["prediction"] == pytest.approx(0.9 * 4 + 0.1 * 5)
    assert out[2]["prediction_std"] == pytest.approx(np.std([4.0, 5.0]))
    assert "confidence" in out[2].asDict()

    # Mean node over the same branches
    mean_dag = MetaEndpointDag(branches, aggregator=Mean("avg"), pred_cols=["p1", "p2"])
    m = {r["id"]: r for r in mean_dag.run(base).collect()}
    assert m[2]["prediction"] == pytest.approx(4.5)

    # contract validation: aggregator referencing an undeclared column
    bad = MetaEndpointDag(branches, aggregator=Mean("avg"), pred_cols=["nope"])
    assert any("not declared" in p for p in bad.validate(base))
    with pytest.raises(ValueError):
        bad.run(base)

    # arity validation mirrors the reference _check_arity
    with pytest.raises(ValueError, match="weights"):
        MetaEndpointDag(
            branches, aggregator=WeightedMean("w", [1.0]), pred_cols=["p1", "p2"]
        ).run(base)
    # Vote over categorical branches
    cat = [
        DagNode("a", lambda d: d.withColumn("v1", F.lit("x")), ["x"], ["v1"]),
        DagNode("b", lambda d: d.withColumn("v2", F.lit("y")), ["x"], ["v2"]),
        DagNode("c", lambda d: d.withColumn("v3", F.lit("y")), ["x"], ["v3"]),
    ]
    v = MetaEndpointDag(cat, aggregator=Vote("v"), pred_cols=["v1", "v2", "v3"]).run(base)
    assert v.select("prediction").distinct().collect()[0]["prediction"] == "y"
