"""API-layer tests (DataSource / FeatureSet / stores / Meta) — mirrors the
reference's integration-test style (SURVEY §5) against the driver tables,
with a throwaway warehouse per session."""

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
def ds(spark, warehouse):
    from workbench_spark.api import DataSource

    return DataSource(f"{SF_DIR}/orders.parquet", "orders_ds", spark=spark, warehouse=warehouse)


def test_datasource_basics(ds):
    assert ds.num_rows() == 1500
    assert ds.num_columns() == 6
    assert "o_orderkey" in ds.columns
    assert ds.column_types()["o_totalprice"] == "double"
    assert ds.ready()


def test_datasource_query(ds):
    out = ds.query(
        "SELECT o_orderpriority, count(*) AS n FROM orders_ds GROUP BY 1"
    ).collect()
    assert sum(r["n"] for r in out) == 1500


def test_datasource_views(ds):
    ds.set_display_columns(["o_orderkey", "o_totalprice"])
    v = ds.view_df("display")
    assert v.columns == ["o_orderkey", "o_totalprice"]
    out = ds.query("SELECT count(*) AS n FROM orders_ds___display").first()
    assert out["n"] == 1500


def test_datasource_stats_cached(ds):
    stats = ds.cached_stats()
    assert stats["num_rows"] == 1500
    cs = stats["column_stats"]
    assert cs["o_totalprice"]["nulls"] == 0
    assert "descriptive_stats" in cs["o_totalprice"]
    assert cs["o_orderpriority"]["unique"] == 5


def test_datasource_attach_existing(spark, warehouse, ds):
    from workbench_spark.api import DataSource

    again = DataSource(name="orders_ds", spark=spark, warehouse=warehouse)
    assert again.num_rows() == 1500


def test_feature_set_snapshot_semantics(spark, warehouse):
    from workbench_spark.api import FeatureSet

    df = spark.createDataFrame(
        [(1, "a", "2024-01-01T00:00:00.000Z"), (2, "b", "2024-01-01T00:00:00.000Z")],
        "id int, val string, event_time string",
    )
    fs = FeatureSet(df, "fs_test", id_column="id", event_time_column="event_time",
                    spark=spark, warehouse=warehouse)
    assert fs.num_rows() == 2
    # append a newer version of id=1 → snapshot keeps latest only
    df2 = spark.createDataFrame(
        [(1, "a2", "2024-02-01T00:00:00.000Z")], "id int, val string, event_time string"
    )
    fs.append(df2)
    snap = {r["id"]: r["val"] for r in fs.snapshot().collect()}
    assert snap == {1: "a2", 2: "b"}
    assert fs.offline_store().count() == 3  # versions retained


def test_feature_set_training_view_roles(spark, warehouse):
    from workbench_spark.api import FeatureSet

    df = spark.createDataFrame(
        [(i, float(i), "2024-01-01T00:00:00.000Z") for i in range(10)],
        "id int, x double, event_time string",
    )
    fs = FeatureSet(df, "fs_roles", id_column="id", event_time_column="event_time",
                    spark=spark, warehouse=warehouse)
    roles = spark.createDataFrame(
        [(0, 2.0, True, False), (1, 1.0, False, True)],
        "id int, sample_weight double, validation boolean, exclude boolean",
    )
    fs.set_training_roles(roles)
    tv = fs.training_view()
    rows = {r["id"]: r for r in tv.collect()}
    assert 1 not in rows  # excluded
    assert rows[0]["sample_weight"] == 2.0 and rows[0]["validation"] is True
    assert rows[5]["sample_weight"] == 1.0 and rows[5]["validation"] is False


def test_feature_set_type_coercion(spark, warehouse):
    from workbench_spark.api.feature_set import coerce_feature_types

    df = spark.createDataFrame(
        [(True, 1.5)], "flag boolean, x double"
    ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    out = coerce_feature_types(df)
    types = dict(out.dtypes)
    assert types["flag"] == "int"
    assert types["ts"] == "string"
    assert out.first()["ts"].endswith("Z")


def test_df_store_roundtrip(spark, warehouse):
    from workbench_spark.api import DFStore

    store = DFStore(spark, root=warehouse)
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    store.upsert("test/frame", df)
    assert store.get("test/frame").count() == 5
    store.append("test/frame", df)
    assert store.get("test/frame").count() == 10
    assert "test/frame" in store.list()
    store.delete("test/frame")
    assert store.get("test/frame") is None


def test_parameter_store_gzip(warehouse):
    from workbench_spark.api import ParameterStore

    ps = ParameterStore(root=warehouse)
    ps.upsert("small", {"a": 1})
    assert ps.get("small") == {"a": 1}
    big = {"data": "x" * 10_000}
    ps.upsert("big", big)
    assert ps.get("big") == big
    assert sorted(ps.list()) == ["big", "small"]
    ps.delete("small")
    assert ps.get("small") is None


def test_parameter_store_corrupt_entry_reads_as_miss(warehouse):
    """A reader losing a race with a writer (or a half-written gz) must
    see a cache miss, not a JSONDecodeError out of get() (r11 ADVICE:
    cross-process cached_call robustness)."""
    import os

    from workbench_spark.api import ParameterStore

    ps = ParameterStore(root=warehouse)
    ps.upsert("garbled", {"ok": True})
    with open(ps._path("garbled"), "wb") as f:
        f.write(b'{"ok": tr')  # truncated mid-token
    assert ps.get("garbled") is None
    # garbled gz variant too
    ps.upsert("garbled_gz", {"data": "x" * 10_000})
    with open(ps._path("garbled_gz") + ".gz", "wb") as f:
        f.write(b"\x1f\x8b\x08\x00partial")
    assert ps.get("garbled_gz") is None
    # upserts leave no stray tmp files behind
    ps.upsert("clean", {"a": 1})
    stray = [p for p in os.listdir(ps.root) if ".tmp" in p]
    assert stray == []


def test_inference_store(spark, warehouse):
    from workbench_spark.api import InferenceStore

    st = InferenceStore(spark, root=warehouse)
    preds = spark.createDataFrame(
        [("r1", 0.9, 17), ("r2", 0.1, 42)], "id string, pred_value double, extra int"
    )
    st.add_inference_results(preds, model="m1", meta_fields=["extra"], tags=["t1", "t2"])
    out = st.query("SELECT * FROM inference_store WHERE model = 'm1'")
    rows = out.collect()
    assert len(rows) == 2
    assert rows[0]["tags"] == ["t1", "t2"]  # string→list round-trip
    assert '"extra":17' in [r["meta"] for r in rows if r["id"] == "r1"][0]
    st.delete()


def test_graph_store(spark, warehouse):
    from workbench_spark.api import GraphStore

    gs = GraphStore(root=warehouse)
    g = {"nodes": [{"id": 1}, {"id": 2}], "links": [{"source": 1, "target": 2, "weight": 0.5}]}
    gs.upsert("nets/karate", g)
    assert gs.get("nets/karate") == g
    edges = gs.edges_df("nets/karate", spark)
    assert edges.count() == 1
    assert gs.list() == ["nets/karate"]


def test_meta_listings(spark, warehouse, ds):
    from workbench_spark.api import Meta

    m = Meta(spark, warehouse=warehouse)
    names = [r["name"] for r in m.data_sources().collect()]
    assert "orders_ds" in names
    # per-artifact getter + type guard (api/meta.py:171-215 semantics)
    assert m.data_source("orders_ds") is not None
    assert m.data_source("no_such") is None
    assert m.model("orders_ds") is None  # wrong artifact type
    cfg = m.config()
    assert cfg["warehouse"] and "spark.master" in cfg


def test_meta_champions_and_details(spark, warehouse, ds):
    from workbench_spark.api import Meta
    from workbench_spark.api.model import Model

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_totalprice",
        (F.col("o_totalprice") * 0.5).alias("f1"),
        (F.col("o_orderkey") % 3 == 0).alias("validation"),
    )
    mdl = Model.train(
        df, "meta_probe_model", target="o_totalprice", features=["f1"],
        model_type="regressor", algo="linear", warehouse=warehouse, spark=spark,
    )
    mdl.to_endpoint("meta_probe_end")
    meta = Meta(spark, warehouse=warehouse)
    details = {r["name"]: r for r in meta.models_with_details().collect()}
    assert details["meta_probe_model"]["algo"] == "linear"
    assert details["meta_probe_model"]["model_type"] == "regressor"
    champs = {r["endpoint"]: r["model"] for r in meta.champion_models().collect()}
    assert champs.get("meta_probe_end") == "meta_probe_model"
    assert meta.challenger_models("meta_probe_end") == []  # no reports store


def test_one_hot_and_undummify(spark):
    from workbench_spark.functions.encoding import one_hot_encode, undummify

    df = spark.createDataFrame(
        [(1, "tacos"), (2, "pizza"), (3, "tacos"), (4, "fish")], "id int, food string"
    )
    enc = one_hot_encode(df, ["food"])
    assert "food" not in enc.columns
    assert {"food_tacos", "food_pizza", "food_fish"} <= set(enc.columns)
    row = {r["id"]: r for r in enc.collect()}
    assert row[1]["food_tacos"] == 1 and row[1]["food_pizza"] == 0
    dec = undummify(enc.drop("id").withColumn("id", F.lit(1)))
    assert "food" in dec.columns


def test_one_hot_gate_skips_high_cardinality(spark):
    from workbench_spark.functions.encoding import one_hot_encode

    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)], "id int, c string")
    out = one_hot_encode(df, ["c"])
    assert out.columns == df.columns  # gate: nunique >= 10 → skipped


def test_athena_dialect_shim(spark, ds):
    # reference-shaped Presto SQL: double-quoted identifiers, BERNOULLI
    # sample, VARCHAR cast, random()
    out = ds.query(
        'SELECT "o_orderpriority", COUNT(DISTINCT CAST("o_custkey" AS VARCHAR)) AS n '
        "FROM orders_ds GROUP BY \"o_orderpriority\""
    )
    assert out.count() == 5
    sampled = ds.query("SELECT * FROM orders_ds TABLESAMPLE BERNOULLI(10)")
    assert 0 < sampled.count() < 1500
    lit = ds.query("SELECT 'TABLESAMPLE BERNOULLI(10) \"quoted\"' AS s").first()["s"]
    assert lit == 'TABLESAMPLE BERNOULLI(10) "quoted"'  # literals untouched


def test_athena_translate_unit():
    from workbench_spark.functions.athena_sql import translate_athena_sql as t

    assert t('SELECT "a b" FROM x') == "SELECT `a b` FROM x"
    assert t("SELECT arbitrary(x), array_agg(y), strpos(s, 'p') FROM t") == (
        "SELECT any_value(x), collect_list(y), instr(s, 'p') FROM t"
    )
    assert "approx_count_distinct(x" in t("SELECT approx_distinct(x) FROM t")
    assert t("SELECT 'it''s \"fine\"' AS s") == "SELECT 'it''s \"fine\"' AS s"


def test_athena_date_functions_translate():
    from workbench_spark.functions.athena_sql import translate_athena_sql as t

    # date_parse: MySQL pattern -> java.time, literal 'T' protected
    assert t("SELECT date_parse(s, '%Y-%m-%d %H:%i:%s') FROM t") == (
        "SELECT to_timestamp(s, 'yyyy-MM-dd HH:mm:ss') FROM t"
    )
    assert t("SELECT date_parse(s, '%Y-%m-%dT%H:%i:%s') FROM t") == (
        "SELECT to_timestamp(s, 'yyyy-MM-dd''T''HH:mm:ss') FROM t"
    )
    # Presto date_format takes MySQL patterns too
    assert t("SELECT date_format(ts, '%Y-%m') FROM t") == (
        "SELECT date_format(ts, 'yyyy-MM') FROM t"
    )
    # format_datetime (Joda ~= java.time): rename only, pattern untouched
    assert t("SELECT format_datetime(ts, 'yyyy-MM-dd') FROM t") == (
        "SELECT date_format(ts, 'yyyy-MM-dd') FROM t"
    )
    # 3-arg unit forms
    assert t("SELECT date_add('day', 3, ts) FROM t") == (
        "SELECT timestampadd(day, 3, ts) FROM t"
    )
    assert t("SELECT date_diff('hour', a, b) FROM t") == (
        "SELECT timestampdiff(hour, a, b) FROM t"
    )
    # 2-arg Spark-native date_add must NOT be rewritten
    assert t("SELECT date_add(d, 3) FROM t") == "SELECT date_add(d, 3) FROM t"
    assert t("SELECT from_iso8601_timestamp(s), to_unixtime(ts) FROM t") == (
        "SELECT to_timestamp(s), unix_timestamp(ts) FROM t"
    )
    # a % pattern in a non-date literal stays untouched
    assert t("SELECT 'keep %Y raw' AS s") == "SELECT 'keep %Y raw' AS s"


def test_athena_date_format_case_and_nesting():
    from workbench_spark.functions.athena_sql import translate_athena_sql as t

    # user-written uppercase/mixed-case heads must still convert (r2 ADVICE:
    # the old pass was case-sensitive and let MySQL codes reach Spark)
    assert t("SELECT DATE_FORMAT(ts, '%Y-%m') FROM t") == (
        "SELECT DATE_FORMAT(ts, 'yyyy-MM') FROM t"
    )
    assert t("SELECT Date_Format(ts, '%Y-%m-%d') FROM t") == (
        "SELECT Date_Format(ts, 'yyyy-MM-dd') FROM t"
    )
    # arbitrarily nested first argument (r2 ADVICE: single-level regex
    # skipped conversion silently)
    assert t(
        "SELECT date_format(coalesce(a, cast(b as timestamp)), '%Y-%m') FROM t"
    ) == "SELECT date_format(coalesce(a, cast(b as timestamp)), 'yyyy-MM') FROM t"
    # nested date_parse inside date_format: both literals convert
    assert t(
        "SELECT date_format(date_parse(s, '%Y-%m-%d'), '%H:%i') FROM t"
    ) == "SELECT date_format(to_timestamp(s, 'yyyy-MM-dd'), 'HH:mm') FROM t"
    # a format argument we cannot safely rewrite fails loudly, not silently
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cannot safely rewrite"):
        t("SELECT date_format(ts, concat('%Y', '-%m')) FROM t")


def test_athena_date_sql_runs(spark, ds):
    """Reference-shaped date-filtered SQL must run unchanged end to end."""
    out = ds.query(
        "SELECT COUNT(*) AS n FROM orders_ds "
        "WHERE o_orderdate >= date_parse('1995-01-01', '%Y-%m-%d')"
    ).first()
    assert out["n"] > 0
    fmt = ds.query(
        "SELECT format_datetime(o_orderdate, 'yyyy-MM') AS ym, "
        "date_format(o_orderdate, '%Y-%m') AS ym2 FROM orders_ds LIMIT 5"
    ).collect()
    assert all(r["ym"] == r["ym2"] and len(r["ym"]) == 7 for r in fmt)


def test_fluent_chain_ds_to_features_to_model(spark, warehouse):
    """The reference's flagship flow: DataSource → FeatureSet → Model →
    Endpoint as method chaining (SURVEY §3.2-3.3)."""
    from workbench_spark.api import DataSource

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_rev"),
        F.sum("l_quantity").alias("total_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    ds2 = DataSource(per_order, "order_feats_src", spark=spark, warehouse=warehouse)
    fs = ds2.to_features(id_column="l_orderkey")
    assert fs.num_rows() == per_order.count()
    m = fs.to_model(target="net_rev")
    ep = m.to_endpoint()
    out = ep.transform(fs.snapshot().limit(5))
    assert "prediction" in out.columns and out.count() == 5


def test_salted_join_matches_plain_join(spark):
    """Salted skew join == plain join on a corpus with one hot key."""
    from workbench_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(1 if i < 900 else i, i) for i in range(1000)], "k int, v int"
    )
    right = spark.createDataFrame([(1, "hot"), (950, "cold")], "k int, tag string")
    plain = left.join(right, "k").groupBy("k", "tag").count()
    salted = salted_join(left, right, "k", n_salts=8).groupBy("k", "tag").count()
    assert {tuple(r) for r in plain.collect()} == {tuple(r) for r in salted.collect()}


def test_athena_misc_builtins_translate(spark):
    from workbench_spark.functions.athena_sql import translate_athena_sql as t

    assert t("SELECT CARDINALITY(arr) FROM x") == "SELECT size(arr) FROM x"
    assert (
        t("SELECT json_extract_scalar(j, '$.a') FROM x")
        == "SELECT get_json_object(j, '$.a') FROM x"
    )
    assert t("SELECT CODEPOINT(c) FROM x") == "SELECT ascii(c) FROM x"
    assert t("SELECT FROM_UNIXTIME(ts) FROM x") == "SELECT timestamp_seconds(ts) FROM x"
    # and they actually run through Spark
    row = spark.sql(
        t("SELECT CARDINALITY(array(1,2,3)) AS n, "
          "json_extract_scalar('{\"a\": 5}', '$.a') AS a, "
          "FROM_UNIXTIME(0) AS ts0")
    ).first()
    assert row["n"] == 3 and row["a"] == "5"
    assert str(row["ts0"]).startswith("1970-01-01")


def test_athena_shim_round4_builtins():
    from workbench_spark.functions.athena_sql import translate_athena_sql as t

    assert t("SELECT contains(tags, 'x') FROM d") == \
        "SELECT array_contains(tags, 'x') FROM d"
    assert t("SELECT codepoint('A')") == "SELECT ascii('A')"
    assert t("SELECT json_extract_scalar(j, '$.a') FROM d") == \
        "SELECT get_json_object(j, '$.a') FROM d"
    assert t("SELECT json_extract(j, '$.a.b') FROM d") == \
        "SELECT get_json_object(j, '$.a.b') FROM d"
    # literals stay protected
    assert t("SELECT 'contains(x)' FROM d") == "SELECT 'contains(x)' FROM d"


# ---------------------------------------------------- compare_dataframes
def test_compare_dataframes_semantics(spark):
    from workbench_spark.operators.compare import compare_dataframes, dataframes_equal

    df1 = spark.createDataFrame(
        [(1, "x", 1.0, 10), (2, "", 2.0, 20), (3, None, float("nan"), 30)],
        "k int, s string, f double, i int",
    )
    # s: NULL vs '' equal; f: NaN==NaN, epsilon tolerance; i: one diff; row 4 only in df2
    df2 = spark.createDataFrame(
        [(1, "x", 1.0 + 5e-11, 10), (2, None, 2.5, 21), (3, None, float("nan"), 30), (4, "z", 4.0, 40)],
        "k int, s string, f double, i int",
    )
    rep = {(r["column"], r["status"]): r["n_differences"]
           for r in compare_dataframes(df1, df2, "k").collect()}
    assert rep[("__rows_only_in_df1", "row_count")] == 0
    assert rep[("__rows_only_in_df2", "row_count")] == 1
    assert rep[("s", "equal")] == 0          # NULL == '' per reference fillna
    assert rep[("f", "differences")] == 1    # only the 2.0 vs 2.5 row; 5e-11 within epsilon
    assert rep[("i", "differences")] == 1
    assert not dataframes_equal(df1, df2, "k")
    assert dataframes_equal(df1, df1, "k")


def test_compare_dataframes_structure_report(spark):
    from workbench_spark.operators.compare import compare_dataframes

    df1 = spark.createDataFrame([(1, "a", 5)], "k int, only1 string, both int")
    df2 = spark.createDataFrame([(1, 2.0, "5")], "k int, only2 double, both string")
    rep = {r["column"]: r["status"] for r in compare_dataframes(df1, df2, "k").collect()}
    assert rep["only1"] == "only_in_df1"
    assert rep["only2"] == "only_in_df2"
    assert rep["both"] == "type_mismatch"
    import pytest as _pt

    with _pt.raises(ValueError, match="key"):
        compare_dataframes(df1, df2, "nope")


def test_athena_round4_builtins_translate(spark):
    from workbench_spark.functions.athena_sql import translate_athena_sql as t

    # reduce == Spark aggregate (same 4-arg lambda shape)
    assert t("SELECT reduce(a, 0, (s, x) -> s + x, s -> s) FROM t") == (
        "SELECT aggregate(a, 0, (s, x) -> s + x, s -> s) FROM t"
    )
    assert t("SELECT is_nan(x), day_of_year(d), week(d) FROM t") == (
        "SELECT isnan(x), dayofyear(d), weekofyear(d) FROM t"
    )
    assert t("SELECT nan(), infinity() FROM t") == (
        "SELECT CAST('NaN' AS DOUBLE), CAST('Infinity' AS DOUBLE) FROM t"
    )
    # ISO day_of_week: Presto 1=Monday..7=Sunday == Spark weekday()+1,
    # nested args survive the balanced-paren wrap
    assert t("SELECT day_of_week(coalesce(a, cast(b as date))) FROM t") == (
        "SELECT (weekday(coalesce(a, cast(b as date))) + 1) + 1 FROM t"
    ).replace(" + 1) + 1 ", " + 1) ")  # guard against accidental double-wrap
    assert t("SELECT dow(d) FROM t") == "SELECT (weekday(d) + 1) FROM t"
    # semantics check against Spark itself: 2024-01-01 is a Monday -> 1
    sql = t("SELECT day_of_week(DATE'2024-01-01') AS dw, "
            "day_of_week(DATE'2024-01-07') AS sun")
    row = spark.sql(sql).collect()[0]
    assert row["dw"] == 1 and row["sun"] == 7
    # 'week' inside an identifier must NOT be rewritten
    assert t("SELECT week_total FROM t") == "SELECT week_total FROM t"


def test_cached_meta_ttl_and_staleness(spark, warehouse, ds):
    """CachedMeta (reference cached/cached_meta.py): fresh hits serve the
    cached listing (new artifacts invisible until TTL expiry), stale
    entries refetch, clear_meta_cache invalidates immediately, and the
    modified registry tracks per-artifact stamps."""
    import time

    from workbench_spark.api import DataSource
    from workbench_spark.api.cached_meta import CachedMeta

    cm = CachedMeta(spark, warehouse=warehouse, ttl=3600)
    assert cm.check()
    cm.clear_meta_cache()

    names = {r["name"] for r in cm.data_sources().collect()}
    assert "orders_ds" in names
    assert any(k.startswith("data_sources") for k in cm.list_meta_cache())

    # register a NEW artifact: the fresh cache must NOT see it yet
    DataSource(
        f"{SF_DIR}/region.parquet", "region_probe_ds",
        spark=spark, warehouse=warehouse,
    )
    cached_names = {r["name"] for r in cm.data_sources().collect()}
    assert "region_probe_ds" not in cached_names  # served from cache

    # singleton semantics per warehouse (reference __new__)
    assert CachedMeta(spark, warehouse=warehouse) is cm

    # force staleness: TTL 0 -> next call refetches and sees the artifact
    cm._cache_ttl = 0.0
    time.sleep(0.01)
    fresh_names = {r["name"] for r in cm.data_sources().collect()}
    assert "region_probe_ds" in fresh_names
    # modified registry merged from the listing result
    reg = cm.modified_registry("data_sources")
    assert "orders_ds" in reg and "region_probe_ds" in reg

    # dict results cache too (config), and clear_meta_cache empties all
    cm._cache_ttl = 3600.0
    cfg = cm.config()
    assert cfg["warehouse"]
    assert cm.config() == cfg
    cm.clear_meta_cache()
    assert cm.list_meta_cache() == []


def test_cached_meta_artifact_details_cached(spark, warehouse, ds):
    from workbench_spark.api.cached_meta import CachedMeta

    cm = CachedMeta(spark, warehouse=warehouse, ttl=3600)
    cm.clear_meta_cache()
    d1 = cm.data_source("orders_ds")
    assert d1 is not None and d1.get("artifact_type") == "data_source"
    # second call is a cache hit: key is stamped
    assert cm.data_source("orders_ds") == d1
    keys = cm.list_meta_cache()
    assert any(k.startswith("data_source_orders_ds") for k in keys)
    assert cm.data_source("no_such") is None


def test_cached_meta_modified_registry_numeric_max(spark, warehouse):
    """Modified stamps compare numerically (r11 ADVICE: string max() puts
    '999.5' above '1000.5'); non-numeric stamps still merge without
    crashing."""
    from workbench_spark.api.cached_meta import CachedMeta

    cm = CachedMeta(spark, warehouse=warehouse, ttl=3600)
    loc = f"{cm._MODIFIED_PREFIX}/models"
    cm._params.upsert(loc, {"m1": "999.5", "m2": "1500.0"})
    listing = spark.createDataFrame(
        [("m1", "1000.5"), ("m2", "7.0"), ("m3", "not-a-number")],
        "name string, modified string",
    )
    cm._update_modified_registry("models", listing)
    reg = cm.modified_registry("models")
    assert reg["m1"] == "1000.5"  # numeric max, not lexicographic
    assert reg["m2"] == "1500.0"  # existing newer stamp kept
    assert reg["m3"] == "not-a-number"
    cm._params.delete(loc)


def test_cached_meta_singleton_adopts_live_session(spark, warehouse):
    """Repeat construction with a live session refreshes the singleton's
    spark handle (r11 ADVICE: the cached instance outliving a stopped
    SparkSession kept the dead session forever)."""
    from workbench_spark.api.cached_meta import CachedMeta

    cm = CachedMeta(spark, warehouse=warehouse, ttl=3600)
    cm.spark = None  # simulate the original session having been stopped
    cm._dfs.spark = None
    again = CachedMeta(spark, warehouse=warehouse)
    assert again is cm
    assert again.spark is spark and again._dfs.spark is spark


def test_synthetic_partsupp_shape_and_determinism(spark):
    """partsupp generation contract: exactly 4 DISTINCT suppliers per
    part (the injectivity theorem: 0 < d < 2d < 3d < S for d = S div 4),
    suppkeys inside the supplier key domain, costs in [1.00, 1000.99],
    cents exactly 100x the float cost, and bit-identical across builds."""
    from workbench_spark.sources.synthetic import synthetic_partsupp

    sf = "/root/testdata/sf0.001"
    ps = synthetic_partsupp(spark, sf)
    n_part = spark.read.parquet(f"{sf}/part.parquet").count()
    n_supp = spark.read.parquet(f"{sf}/supplier.parquet").count()
    assert ps.count() == 4 * n_part
    per_part = ps.groupBy("ps_partkey").agg(
        F.countDistinct("ps_suppkey").alias("k"),
        F.min("ps_suppkey").alias("lo"),
        F.max("ps_suppkey").alias("hi"),
    )
    bad = per_part.filter(
        (F.col("k") != 4) | (F.col("lo") < 0) | (F.col("hi") >= n_supp)
    ).count()
    assert bad == 0
    r = ps.agg(
        F.min("ps_supplycost").alias("lo"),
        F.max("ps_supplycost").alias("hi"),
        F.sum(
            (F.col("ps_supplycost_cents") != F.round(F.col("ps_supplycost") * 100))
            .cast("int")
        ).alias("cents_mismatch"),
    ).first()
    assert 1.0 <= r["lo"] and r["hi"] <= 1000.99 and r["cents_mismatch"] == 0
    a = sorted(map(tuple, synthetic_partsupp(spark, sf).collect()))
    b = sorted(map(tuple, synthetic_partsupp(spark, sf).collect()))
    assert a == b


def test_cached_artifacts_modified_staleness(spark, warehouse):
    """CachedArtifactMixin (reference cached_artifact_mixin.py): results
    cache until the artifact's registry Modified stamp moves — an append
    (which re-stamps the meta) invalidates; refresh() force-clears."""
    from workbench_spark.api import DataSource, FeatureSet
    from workbench_spark.api.cached_artifacts import (
        CachedDataSource,
        CachedFeatureSet,
    )

    DataSource(
        f"{SF_DIR}/nation.parquet", "nation_cache_ds",
        spark=spark, warehouse=warehouse,
    )
    cds = CachedDataSource("nation_cache_ds", spark=spark, warehouse=warehouse)
    assert cds.num_rows() == 25
    # cached dict + DataFrame results round-trip through the stores
    stats = cds.column_stats()
    assert stats == cds.column_stats()
    first = sorted(map(tuple, cds.descriptive_stats().collect()))
    again = sorted(map(tuple, cds.descriptive_stats().collect()))
    assert first == again and len(first) > 0
    assert cds.refresh() > 0
    assert cds.refresh() == 0  # second refresh finds nothing

    base = spark.createDataFrame(
        [(i, float(i), "2024-01-01 00:00:00") for i in range(10)],
        "fid long, x double, event_time string",
    )
    FeatureSet(
        base, "fs_cache_probe", id_column="fid",
        event_time_column="event_time", spark=spark, warehouse=warehouse,
    )
    cfs = CachedFeatureSet("fs_cache_probe", spark=spark, warehouse=warehouse)
    assert cfs.num_rows() == 10
    # append re-stamps the registry meta -> the cached count goes stale
    cfs.append(
        spark.createDataFrame(
            [(100 + i, float(i), "2024-01-02 00:00:00") for i in range(5)],
            "fid long, x double, event_time string",
        )
    )
    assert cfs.num_rows() == 15  # refetched, not the stale 10


def test_cached_artifacts_roles_invalidate_and_refresh_isolation(spark, warehouse):
    """Review fixes (r10): set_training_roles must invalidate the cached
    training_view (it re-stamps the feature set's own meta, not just the
    supplemental roles table), and refresh() must not clear entries of
    OTHER artifacts whose name extends this one's."""
    from workbench_spark.api import DataSource, FeatureSet
    from workbench_spark.api.cached_artifacts import (
        CachedDataSource,
        CachedFeatureSet,
    )

    base = spark.createDataFrame(
        [(i, float(i), "2024-01-01 00:00:00") for i in range(8)],
        "fid long, x double, event_time string",
    )
    FeatureSet(
        base, "fs_roles_probe", id_column="fid",
        event_time_column="event_time", spark=spark, warehouse=warehouse,
    )
    cfs = CachedFeatureSet("fs_roles_probe", spark=spark, warehouse=warehouse)
    assert cfs.training_view().count() == 8
    roles = spark.createDataFrame([(0, 1.0, False, True)],
                                  "fid long, sample_weight double, validation boolean, exclude boolean")
    cfs.set_training_roles(roles)
    # stale cache would still show 8 rows; the fresh view excludes fid 0
    assert cfs.training_view().count() == 7

    # refresh isolation: 'probe' must not clear 'probe_v2' entries
    DataSource(f"{SF_DIR}/region.parquet", "probe", spark=spark, warehouse=warehouse)
    DataSource(f"{SF_DIR}/region.parquet", "probe_v2", spark=spark, warehouse=warehouse)
    a = CachedDataSource("probe", spark=spark, warehouse=warehouse)
    b = CachedDataSource("probe_v2", spark=spark, warehouse=warehouse)
    assert a.num_rows() == 5 and b.num_rows() == 5
    assert a.refresh() == 1  # exactly a's one entry, not b's
    assert b.refresh() == 1  # b's entry survived a's refresh


def test_parameter_store_concurrent_writers_never_garble(warehouse):
    """Cross-process torture for the atomic-write contract: concurrent
    writers upserting the same key while a reader polls must yield ONLY
    valid values (a reader may miss, never crash, never see a torn write
    — the r11 tmp+os.replace guarantee)."""
    import multiprocessing as mp

    from workbench_spark.api import ParameterStore

    root = warehouse

    def writer(idx: int) -> None:
        ps = ParameterStore(root=root)
        for i in range(150):
            ps.upsert("hot_key", {"writer": idx, "i": i, "pad": "x" * 100})

    procs = [mp.Process(target=writer, args=(w,)) for w in range(4)]
    for p in procs:
        p.start()
    ps = ParameterStore(root=root)
    seen_valid = 0
    try:
        while any(p.is_alive() for p in procs):
            v = ps.get("hot_key")
            if v is not None:
                assert set(v) == {"writer", "i", "pad"}, v
                seen_valid += 1
    finally:
        for p in procs:
            p.join(timeout=30)
    assert seen_valid > 0  # the reader really raced the writers
    final = ps.get("hot_key")
    assert final is not None and final["i"] == 149


def test_reference_layout_import_shims():
    """Reference-layout module paths resolve to the consolidated classes
    (drop-in import parity for ported code)."""
    from workbench_spark.api.df_store import DFStore as A
    from workbench_spark.api.endpoint import Endpoint as E
    from workbench_spark.api.graph_store import GraphStore as G
    from workbench_spark.api.inference_store import InferenceStore as I
    from workbench_spark.api.meta_endpoint import MetaEndpoint as ME
    from workbench_spark.api.parameter_store import ParameterStore as P
    from workbench_spark.api import stores, model
    from workbench_spark.plans.transform import MetaEndpointDag

    assert A is stores.DFStore and P is stores.ParameterStore
    assert I is stores.InferenceStore and G is stores.GraphStore
    assert E is model.Endpoint and ME is MetaEndpointDag
