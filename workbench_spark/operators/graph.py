"""Graph operators over edge DataFrames (SURVEY §2.10 M6 + the dedup
clustering completion).

Reference citations:
- M6 neighborhood subgraph — algorithms/graph/light/proximity_graph.py:70-120
  (NetworkX ego-graph on the driver; here: iterative frontier expansion
  over the edge DataFrame — distributed, any graph size).

connected_components implements iterative min-label propagation — the
exact clustering that representative-based dedup approximates. Each
iteration is one join + one aggregation (the simple variant of the
large-star/small-star map-reduce CC algorithm); iterations ≈ graph
diameter, convergence detected via a cheap change-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _undirected(edges: DataFrame, src: str, dst: str) -> DataFrame:
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    return fwd.unionAll(fwd.select(F.col("d").alias("s"), F.col("s").alias("d"))).distinct()


def k_hop_neighborhood(
    edges: DataFrame,
    start_ids: list,
    hops: int = 1,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """M6 — node ids within ``hops`` undirected hops of the start set.
    Output: (node, hop) with the minimal hop distance (start nodes = 0).
    Each hop is one broadcast-able join of the (small) frontier against
    the edge list."""
    spark = edges.sparkSession
    und = _undirected(edges, src, dst)
    visited = spark.createDataFrame([(i, 0) for i in start_ids], "node long, hop int")
    frontier = visited.select("node")
    for h in range(1, hops + 1):
        neighbors = (
            und.join(F.broadcast(frontier.withColumnRenamed("node", "s")), "s")
            .select(F.col("d").alias("node"))
            .distinct()
        )
        new_nodes = neighbors.join(visited.select("node"), "node", "left_anti")
        if new_nodes.isEmpty():
            break
        visited = visited.unionAll(new_nodes.withColumn("hop", F.lit(h)))
        frontier = new_nodes
    return visited


def neighborhood_subgraph(
    edges: DataFrame,
    start_ids: list,
    hops: int = 1,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """M6 — the induced edge set among the k-hop neighborhood (the
    reference's ego-graph, proximity_graph.py:70-120)."""
    nodes = k_hop_neighborhood(edges, start_ids, hops, src, dst).select("node")
    return (
        edges.join(F.broadcast(nodes.withColumnRenamed("node", src)), src, "left_semi")
        .join(F.broadcast(nodes.withColumnRenamed("node", dst)), dst, "left_semi")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Connected components by min-label propagation: every node starts
    labeled with its own id; each iteration assigns min(own, neighbors')
    label; stop when no label changes. Output: (node, component) with
    component = min node id in the component.

    Scale: each iteration = one shuffle join on node id + one groupBy —
    O(E) per iteration, iterations bounded by component diameter (near-dup
    clusters are tiny-diameter, so 2-3 iterations in the dedup use case).
    For web-scale general graphs use the large-star/small-star variant
    (halves diameter per round); this simple form keeps the plan legible.
    """
    und = _undirected(edges, src, dst)
    labels = (
        und.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels.withColumnRenamed("node", "d"), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("component").alias("__nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nbr_min"), F.col("component"))
                ).alias("component"),
            )
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "node")
            .filter(F.col("u.component") != F.col("l.component"))
            .limit(1)
        )
        has_change = not changed.isEmpty()
        labels = updated.localCheckpoint(eager=True)  # truncate iterative lineage
        if not has_change:
            break
    return labels


def dedup_clusters_exact(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Exact near-dup clustering from a pair list (e.g. minhash_lsh_pairs
    output): connected components over the pair graph. Output:
    (node, component); survivors = rows where node == component."""
    return connected_components(pairs, id_a, id_b)
