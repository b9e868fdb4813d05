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


def test_connected_components_star_matches_label(spark, chain_edges):
    from workbench_spark.operators.graph import connected_components

    star = {
        r["node"]: r["component"]
        for r in connected_components(chain_edges, method="star").collect()
    }
    label = {
        r["node"]: r["component"] for r in connected_components(chain_edges).collect()
    }
    assert star == label


def test_connected_components_star_random_graph(spark):
    """Star CC ≡ ground-truth union-find on a seeded random graph."""
    import random

    from workbench_spark.operators.graph import connected_components

    rng = random.Random(42)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {}
    for a, b in edges:
        truth[a] = find(a)
        truth[b] = find(b)

    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, method="star", max_iter=30).collect()
    }
    assert got == truth


def test_connected_components_star_long_chain(spark):
    """A 64-node path: diameter 63, label propagation would need ~63
    rounds; star must finish well inside max_iter=10 (O(log^2 n))."""
    from workbench_spark.operators.graph import connected_components

    edges = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, method="star", max_iter=10)
    assert {r["component"] for r in got.collect()} == {0}
    assert got.count() == 64
