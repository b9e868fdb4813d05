"""Data-layout management for scan-time pruning at 100 TB.

The cheapest query is the one that never reads the data. Three pruning
layers, outermost first, and the writer controls all of them:

1. **Partition pruning** — ``partitionBy(cols)`` hive layout: a filter on
   a partition column never opens the other directories
   (``PartitionFilters`` in the scan node).
2. **File/row-group skipping** — parquet min/max footer statistics: if
   the rows are CLUSTERED on a column, each file covers a narrow value
   range and a range predicate skips most files (``PushedFilters``).
   ``repartitionByRange + sortWithinPartitions`` produces that
   clustering for one sort dimension.
3. **Z-order clustering** — a single sort key can only cluster one
   dimension; interleaving the bits of k normalized columns (Morton
   code) gives every interleaved column locality, so min/max skipping
   works on ALL of them at once (the technique behind Delta/Iceberg
   OPTIMIZE ZORDER). Implemented as one JVM-side bit expression —
   no UDF, stays inside whole-stage codegen.

File sizing is controlled with ``maxRecordsPerFile`` (deterministic,
compression-independent) rather than a byte target: a byte target needs
a calibration write because parquet compression ratios vary per column
— documented tradeoff, not an omission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_col(df: DataFrame, cols: list[str], bits: int = 16):
    """Morton/Z-order key over k numeric columns as ONE Column expression.

    Each column is min/max normalized to [0, 2^bits) (one small agg to
    fetch the bounds — two-pass, like any range partitioner), floored to
    an int, and the bits are interleaved:
    result bit (i*k + j) = bit i of column j.

    The whole interleave is a single SQL expression string (bits*k terms)
    — built once, codegen'd once; per-Column python loops with py4j
    round-trips are the measured slow path in this repo.
    """
    if not (1 <= len(cols) <= 3):
        raise ValueError("zorder_col supports 1-3 columns")
    if not (1 <= bits <= 20):
        raise ValueError("bits must be in [1, 20]")
    bounds = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    k = len(cols)
    scaled = []
    top = (1 << bits) - 1
    for i, c in enumerate(cols):
        mn, mx = bounds[f"mn_{i}"], bounds[f"mx_{i}"]
        if mn is None or mx is None or mx <= mn:
            scaled.append("0L")
            continue
        scaled.append(
            f"least({top}L, greatest(0L, cast((cast(`{c}` as double) - {mn!r}) "
            f"/ ({(mx - mn)!r}) * {top} as long)))"
        )
    terms = []
    for i in range(bits):
        for j in range(k):
            terms.append(f"shiftleft(shiftright(__z{j}, {i}) & 1L, {i * k + j})")
    expr = " + ".join(terms)
    inner = expr
    for j, s in enumerate(scaled):
        inner = inner.replace(f"__z{j}", f"({s})")
    return F.expr(inner)


def write_layout(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    sort_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    max_records_per_file: int | None = None,
    layout_partitions: int = 32,
    mode: str = "overwrite",
) -> None:
    """Write parquet with a pruning-friendly layout.

    - ``partition_by``: hive directory partitioning (layer 1).
    - ``sort_by``: range-repartition + in-file sort on these columns so
      per-file min/max stats are narrow (layer 2). Ignored if
      ``zorder_by`` given.
    - ``zorder_by``: Morton-interleave these columns into a temp key,
      range-repartition + sort on it, then drop it (layer 3).
    - ``max_records_per_file``: bounds file size deterministically.

    sort/zorder clustering is applied WITHIN each hive partition as a
    global range partition over the sort key — at 100 TB that is one
    shuffle, the same cost any clustered write pays, and AQE coalesces
    small output partitions.
    """
    out = df
    sort_cols = None
    if zorder_by:
        out = out.withColumn("__zorder", zorder_col(df, zorder_by))
        sort_cols = [F.col("__zorder")]
    elif sort_by:
        sort_cols = [F.col(c) for c in sort_by]
    if sort_cols is not None:
        out = out.repartitionByRange(layout_partitions, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    if zorder_by:
        # dropping AFTER sortWithinPartitions keeps the ordering: the
        # projection sits above the Sort, so rows stay clustered and the
        # key never reaches the written schema
        out = out.drop("__zorder")
    w = out.write.mode(mode)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", int(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def scan_report(df: DataFrame) -> str:
    """The formatted physical plan of a read — the thing to grep for
    ``PartitionFilters`` / ``PushedFilters`` when asserting that a layout
    actually prunes (tests do exactly that)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def file_stat_ranges(path: str, columns: list[str]) -> list[dict]:
    """Per-file min/max ranges from the parquet footers (via pyarrow) —
    the statistics the scanner skips on. Returns one dict per data file:
    {file, num_rows, <col>_min, <col>_max}. Used by tests to prove that
    a clustered layout narrows per-file ranges instead of trusting the
    writer's intent."""
    import os

    import pyarrow.parquet as pq

    out = []
    for root, _dirs, files in os.walk(path):
        for fn in sorted(files):
            if not fn.endswith(".parquet"):
                continue
            fp = os.path.join(root, fn)
            md = pq.read_metadata(fp)
            names = md.schema.names
            rec: dict = {"file": fp, "num_rows": md.num_rows}
            for col in columns:
                if col not in names:
                    continue
                idx = names.index(col)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is not None and st.has_min_max:
                        mins.append(st.min)
                        maxs.append(st.max)
                if mins:
                    rec[f"{col}_min"] = min(mins)
                    rec[f"{col}_max"] = max(maxs)
            out.append(rec)
    return out


def write_token_balanced_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
) -> dict:
    """Training-data export: write ``n_shards`` files whose TOKEN totals
    are balanced (data-parallel loaders read one shard per worker — a
    row-balanced split skews step time when document lengths are skewed;
    the balance target has to be tokens).

    Shard assignment is the two-phase distributed prefix sum over
    ``id_col`` order (operators/packing._ranged_cumsum — range partitions,
    driver offsets, local windows; NEVER a global window): shard k covers
    the contiguous token span [k·T/n, (k+1)·T/n). Contiguity preserves
    id-locality inside each shard (deterministic, resumable exports).

    Returns {"path", "n_shards", "total_tokens", "per_shard_tokens"} —
    per-shard totals come back from one groupBy, not from reading files.

    Scale: one corpus pass for counts + prefix sum, one shuffle on the
    shard id (repartition by shard → one file each), O(n_shards) driver
    state."""
    from pyspark.sql import functions as F

    from workbench_spark.operators.packing import _ranged_cumsum, _with_tokens

    tok = _with_tokens(df, id_col, token_col, text_col)
    cum = _ranged_cumsum(tok, max(n_shards, 32))
    total = cum.agg(F.max("cum_end").alias("t")).first()["t"] or 0
    span = max(1, -(-total // n_shards))  # ceil
    assigned = cum.select(
        F.col("id").alias(id_col),
        F.least(
            F.lit(n_shards - 1),
            ((F.col("cum_end") - F.col("n_tokens")) / F.lit(span)).cast("int"),
        ).alias("__shard"),
        "n_tokens",
    )
    out = df.join(assigned, id_col)
    (
        out.repartition(n_shards, "__shard")
        .sortWithinPartitions("__shard", id_col)
        .drop("n_tokens")
        .write.mode("overwrite")
        .partitionBy("__shard")
        .format(fmt)
        .save(path)
    )
    per_shard = {
        r["__shard"]: r["t"]
        for r in assigned.groupBy("__shard").agg(F.sum("n_tokens").alias("t")).collect()
    }
    return {
        "path": path,
        "n_shards": n_shards,
        "total_tokens": int(total),
        "per_shard_tokens": [int(per_shard.get(i, 0)) for i in range(n_shards)],
    }
