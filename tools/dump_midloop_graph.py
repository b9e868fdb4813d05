"""Dump the PER-ITERATION plan shape of pagerank / connected_components.

The registry-level before/after dumps for the iterative graph entries are
just localCheckpoint scans (the loop materializes per round), so the plan
evidence for the r16 loop-body rework lives here: localCheckpoint is
monkeypatched to identity, the loop is run for 2 iterations, and the
returned frame's explain("formatted") then shows the full 2-iteration
lineage — i.e. exactly what one round of the loop adds on top of the
previous frame.

"after" runs the LIVE operators (workbench_spark.operators.graph);
"before" runs verbatim copies of the r15 implementations (from git HEAD
at commit 6091d83) under the same harness.

Usage: python tools/dump_midloop_graph.py {before|after}
Writes plans/r16/{pagerank,connected_components}_midloop_<suffix>.txt
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def _no_checkpoint(self, eager=True):  # noqa: ARG001
    return self


# ---------------- r15 (before) implementations, copied verbatim ----------


def pagerank_r15(edges, src="src", dst="dst", iters=2, damping=(85, 100), scale=10**12):
    d_num, d_den = damping
    fwd = edges.select(F.col(src).alias("s"), F.col(dst).alias("d")).localCheckpoint(
        eager=True
    )
    nd = (
        fwd.select(F.col("s").alias("node"), F.lit(1).alias("__one"))
        .unionAll(fwd.select(F.col("d").alias("node"), F.lit(0).alias("__one")))
        .groupBy("node")
        .agg(F.sum("__one").cast("long").alias("__deg"))
        .localCheckpoint(eager=True)
    )
    nodes = nd.select("node")
    n = nd.count()
    base = ((d_den - d_num) * scale // d_den) // n
    ranks = nd.select("node", F.lit(scale // n).cast("long").alias("rank_scaled"))
    for it in range(iters):
        r = ranks.join(nd, "node")
        shares = r.filter(F.col("__deg") > 0).select(
            "node", F.expr("rank_scaled div __deg").alias("__share")
        )
        contrib = (
            fwd.join(shares.withColumnRenamed("node", "s"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum("__share").alias("__contrib"))
        )
        dang = (
            r.filter(F.col("__deg") == 0)
            .agg(F.coalesce(F.sum("rank_scaled"), F.lit(0)).alias("__d"))
            .select(F.expr(f"__d div {n}").alias("__dang_share"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .join(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({d_num} * (coalesce(__contrib, 0L) + __dang_share))"
                        f" div {d_den}"
                    )
                )
                .cast("long")
                .alias("rank_scaled"),
            )
        )
        if it % 3 == 2 or it == iters - 1:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def cc_r15(edges, src="src", dst="dst", max_iter=2):
    from workbench_spark.operators.graph import _undirected

    und = _undirected(edges, src, dst).localCheckpoint(eager=True)
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
                    F.col("component"),
                    F.coalesce(F.col("__nbr_min"), F.col("component")),
                ).alias("component"),
                (
                    F.col("__nbr_min").isNotNull()
                    & (F.col("__nbr_min") < F.col("component"))
                ).alias("__chg"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        labels = updated.select("node", "component")
    return labels


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after")
    from workbench_spark.session import get_spark

    spark = get_spark()
    # checkpoints -> identity so explain() shows the per-iteration lineage
    # (Spark 4: the classic DataFrame subclass defines its own method, so
    # patch the class of an actual session frame, not the facade base)
    type(spark.range(1)).localCheckpoint = _no_checkpoint

    edges = spark.range(100).selectExpr(
        "id as src", "pmod(id * 37 + 11, 100) as dst"
    )

    if suffix == "after":
        from workbench_spark.operators.graph import connected_components, pagerank

        pr = pagerank(edges, iters=2)
        cc = connected_components(edges, max_iter=2)
    else:
        pr = pagerank_r15(edges, iters=2)
        cc = cc_r15(edges, max_iter=2)

    out_dir = _REPO / "plans" / "r16"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, df in (("pagerank_midloop", pr), ("connected_components_midloop", cc)):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote plans/r16/{name}_{suffix}.txt ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
