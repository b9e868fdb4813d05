"""Graph operator tests: k-hop neighborhoods, connected components,
exact dedup clustering over MinHash pair output."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="session")
def chain_edges(spark):
    # two components: a chain 0-1-2-3-4 and a triangle 10-11-12
    rows = [(0, 1), (1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (12, 10)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_k_hop_neighborhood(spark, chain_edges):
    from workbench_spark.operators.graph import k_hop_neighborhood

    out = {r["node"]: r["hop"] for r in k_hop_neighborhood(chain_edges, [0], hops=2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}
    full = {r["node"] for r in k_hop_neighborhood(chain_edges, [0], hops=10).collect()}
    assert full == {0, 1, 2, 3, 4}  # stops at the component boundary


def test_neighborhood_subgraph(spark, chain_edges):
    from workbench_spark.operators.graph import neighborhood_subgraph

    sub = {(r["src"], r["dst"]) for r in neighborhood_subgraph(chain_edges, [0], hops=2).collect()}
    assert sub == {(0, 1), (1, 2)}


def test_connected_components(spark, chain_edges):
    from workbench_spark.operators.graph import connected_components

    cc = {r["node"]: r["component"] for r in connected_components(chain_edges).collect()}
    assert all(cc[n] == 0 for n in (0, 1, 2, 3, 4))
    assert all(cc[n] == 10 for n in (10, 11, 12))


def test_exact_dedup_clusters_from_minhash(spark):
    from workbench_spark.operators.dedup import minhash_lsh_pairs
    from workbench_spark.operators.graph import dedup_clusters_exact

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = minhash_lsh_pairs(docs, n_hashes=64, bands=16, verify_threshold=0.6)
    clusters = dedup_clusters_exact(pairs)
    rows = clusters.collect()
    by_node = {r["node"]: r["component"] for r in rows}
    # component labels are the min id of each cluster and transitive:
    # every paired doc shares its component with its partner
    for p in pairs.collect():
        assert by_node[p["id_a"]] == by_node[p["id_b"]]
        assert by_node[p["id_a"]] <= min(p["id_a"], p["id_b"])
