"""Sequence packing for LLM training-data preparation.

Two packing disciplines over a document table:

- ``pack_sequences`` — GPT-style concat-and-chunk: documents in a fixed
  deterministic order form one token stream that is cut at every
  ``budget`` tokens; documents may span a cut. This is the standard
  pretraining layout (one boundary token stream, zero padding).
- ``pack_sequences_greedy`` — bin packing with whole documents
  (no splitting): first-fit-decreasing within each range partition.
  This is the SFT/eval layout where a document must not be cut; the
  price is padding waste, which ``packing_stats`` accounts for.

Scale design (the reason this file exists instead of one window call):
a naive ``SUM(tokens) OVER (ORDER BY doc_id)`` is a GLOBAL window —
Spark plans it as a sort into a SINGLE partition, the textbook
100 TB scale-killer. Instead we run the classic two-phase distributed
prefix sum:

  1. ``repartitionByRange(id)`` (range partitions are ordered by
     partition id) and pin it with ``localCheckpoint`` so the partition
     assignment cannot be resampled between jobs;
  2. one tiny aggregation of per-partition token totals — #partitions
     rows, bounded by cluster config, not data — prefix-summed on the
     driver and shipped back as a literal map;
  3. a window partitioned BY THE RANGE PARTITION for the local running
     sum, plus the partition's offset.

Every stage is O(rows/partition) memory; nothing global ever
materializes on one executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _with_tokens(df: DataFrame, id_col: str, token_col: str | None, text_col: str):
    # NULL text/token counts coalesce to 0: a null-text document is an
    # empty sequence, and a NULL poisons the driver-side offset fold in
    # _ranged_cumsum (sum over an all-null partition returns NULL)
    if token_col is not None:
        src = F.col(token_col).cast("long")
    else:
        from workbench_spark.operators.text import token_count

        src = token_count(F.col(text_col)).cast("long")
    return df.select(
        F.col(id_col).alias("id"), F.coalesce(src, F.lit(0)).alias("n_tokens")
    )


def _ranged_cumsum(tok: DataFrame, partitions: int) -> DataFrame:
    """(id, n_tokens, cum_end) with cum_end = inclusive prefix sum in
    global id order, via the two-phase distributed scan."""
    ranged = (
        tok.repartitionByRange(partitions, "id")
        .withColumn("__pid", F.spark_partition_id())
        # pin the (sampled, nondeterministic) range boundaries so the
        # totals job and the window job see the SAME partition map
        .localCheckpoint(eager=True)
    )
    totals = {
        r["__pid"]: r["t"]
        for r in ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0  # empty partition → SUM is NULL
    off_expr = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    ) if offsets else F.create_map()
    w = Window.partitionBy("__pid").orderBy("id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ranged.select(
        "id",
        "n_tokens",
        (F.sum("n_tokens").over(w) + F.coalesce(off_expr[F.col("__pid")], F.lit(0))).alias(
            "cum_end"
        ),
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    partitions: int = 32,
) -> DataFrame:
    """Concat-and-chunk packing: per-document sequence assignment.

    Output: (id, n_tokens, start_seq, end_seq, spans_boundary) where
    sequence k covers token positions [k*budget, (k+1)*budget) of the
    concatenated stream in ``id_col`` order. ``spans_boundary`` marks
    documents cut by a sequence boundary (the attention-mask reset
    points a loader needs).
    """
    tok = _with_tokens(df, id_col, token_col, text_col)
    cum = _ranged_cumsum(tok, partitions)
    start = F.col("cum_end") - F.col("n_tokens")
    end_pos = F.when(F.col("n_tokens") > 0, F.col("cum_end") - 1).otherwise(start)
    out = cum.select(
        F.col("id").alias(id_col),
        "n_tokens",
        start.alias("__s"),
        end_pos.alias("__e"),
    ).select(
        id_col,
        "n_tokens",
        F.expr(f"__s div {int(budget)}").alias("start_seq"),
        F.expr(f"__e div {int(budget)}").alias("end_seq"),
    )
    return out.withColumn("spans_boundary", F.col("end_seq") > F.col("start_seq"))


def pack_sequences_greedy(
    df: DataFrame,
    budget: int = 2048,
    id_col: str = "doc_id",
    token_col: str | None = None,
    text_col: str = "text",
    partitions: int = 32,
) -> DataFrame:
    """Whole-document bin packing: first-fit-decreasing WITHIN each range
    partition (bins never cross partitions, so packing is embarrassingly
    parallel and bin ids are (partition, local) pairs — deterministic
    given the partition map).

    Documents longer than ``budget`` get a singleton over-budget bin and
    ``oversize=true`` (the caller decides: truncate, split, or drop).

    Output: (id, n_tokens, bin_id string "pid:k", oversize). FFD's
    guarantee (≤ 11/9·OPT + 6/9 bins) holds per partition; cross-
    partition waste is at most one non-full bin per partition — noise at
    thousands of docs per partition, and the price of never moving a
    document across the cluster to pack it.
    """
    import pandas as pd

    tok = _with_tokens(df, id_col, token_col, text_col)
    ranged = (
        tok.repartitionByRange(partitions, "id")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pid = int(pdf["__pid"].iloc[0]) if len(pdf) else 0
        order = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True]
        ).reset_index(drop=True)
        bins: list[int] = []  # remaining capacity per bin
        assign, oversize = [], []
        for _, row in order.iterrows():
            t = int(row["n_tokens"])
            if t > budget:
                bins.append(0)
                assign.append(len(bins) - 1)
                oversize.append(True)
                continue
            for k, cap in enumerate(bins):
                if cap >= t:
                    bins[k] = cap - t
                    assign.append(k)
                    break
            else:
                bins.append(budget - t)
                assign.append(len(bins) - 1)
            oversize.append(False)
        order["bin_id"] = [f"{pid}:{k}" for k in assign]
        order["oversize"] = oversize
        return order[["id", "n_tokens", "bin_id", "oversize"]]

    out = ranged.groupBy("__pid").applyInPandas(
        pack, "id long, n_tokens long, bin_id string, oversize boolean"
    )
    return out.withColumnRenamed("id", id_col)


def packing_stats(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Padding-waste accounting for greedy-packed output: one row with
    n_docs, n_bins, n_oversize, total_tokens, padding_tokens (unused
    capacity of regular bins) and fill_ratio."""
    bins = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tokens").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("over"),
    )
    return bins.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("over").cast("long").alias("n_oversize"),
        F.sum("fill").cast("long").alias("total_tokens"),
        F.sum(
            F.when(F.col("over") == 0, F.lit(budget) - F.col("fill")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("padding_tokens"),
    )
