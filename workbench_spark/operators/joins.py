"""Join operators (SURVEY §2.3 J1-J4).

Reference semantics:
- J1 supplemental join view — core/views/pandas_to_view.py:61-138
- J2 training view w/ roles — core/views/view_utils.py:154-215
- J4 column-union DAG join  — utils/aggregation_nodes.py:36-104

Scale notes: supplemental/role tables are small by construction (the
reference hard-caps them at 1M rows, pandas_to_view.py:73-79) → broadcast
joins, no shuffle of the big side. We replace the hard cap with a
broadcast hint and let AQE fall back to shuffle join if the small side
exceeds the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def supplemental_join_view(
    base: DataFrame, supplemental: DataFrame, id_column: str, broadcast: bool = True
) -> DataFrame:
    """J1 — LEFT JOIN base × supplemental on id; overlapping non-id columns
    are taken from the supplemental side (reference drops them from the
    base, pandas_to_view.py:96-109)."""
    overlap = (set(base.columns) & set(supplemental.columns)) - {id_column}
    pruned_base = base.drop(*overlap) if overlap else base
    right = F.broadcast(supplemental) if broadcast else supplemental
    return pruned_base.join(right, on=id_column, how="left")


def training_view(
    base: DataFrame,
    roles: DataFrame | None,
    id_column: str,
    broadcast: bool = True,
) -> DataFrame:
    """J2 — model training view (view_utils.py:154-215): LEFT JOIN a sparse
    roles table (id, sample_weight, validation, exclude), COALESCE defaults
    (1.0 / false / false), then drop excluded rows
    (WHERE NOT COALESCE(exclude, false) — P5)."""
    if roles is None:
        return (
            base.withColumn("sample_weight", F.lit(1.0))
            .withColumn("validation", F.lit(False))
        )
    r = roles.select(
        id_column,
        F.col("sample_weight").cast("double").alias("__sw"),
        F.col("validation").cast("boolean").alias("__val"),
        F.col("exclude").cast("boolean").alias("__exc"),
    )
    right = F.broadcast(r) if broadcast else r
    return (
        base.join(right, on=id_column, how="left")
        .filter(~F.coalesce(F.col("__exc"), F.lit(False)))
        .withColumn("sample_weight", F.coalesce(F.col("__sw"), F.lit(1.0)))
        .withColumn("validation", F.coalesce(F.col("__val"), F.lit(False)))
        .drop("__sw", "__val", "__exc")
    )


def column_union_join(frames: list[DataFrame], row_id: str = "__dag_row_id") -> DataFrame:
    """J4 — join the feature outputs of parallel DAG branches on an injected
    row id (aggregation_nodes.py:36-104). Branches must carry ``row_id``;
    overlapping columns are taken from the leftmost branch."""
    out = frames[0]
    for f in frames[1:]:
        overlap = (set(out.columns) & set(f.columns)) - {row_id}
        out = out.join(f.drop(*overlap), on=row_id, how="inner")
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """As-of (backward) join — for each left row, the latest right row with
    right_time <= left_time per key. Spark has no native as-of join
    (SURVEY §2.3 notes the reference lacks one too); this is the scalable
    union + carry-forward-window formulation:

      union(left tagged 1, right tagged 0)
        -> window per key ordered by (time, tag): last(right payload,
           ignoreNulls) over rowsBetween(unboundedPreceding, current)
        -> keep left rows

    ONE shuffle+sort on the key (same cost as a regular sort-merge join);
    no per-group pandas (merge_asof via applyInPandas is the fallback for
    semantics this can't express, e.g. nearest/tolerance).
    Ties (equal timestamps) match the right row, like duckdb ASOF and
    pd.merge_asof(direction='backward').
    """
    from pyspark.sql import Window

    rcols = right_cols or [c for c in right.columns if c not in (on, right_time)]
    lt = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast(right.schema[right_time].dataType).alias("__rt"),
    )
    rt = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        F.col(right_time).alias("__rt"),
    )
    merged = lt.unionByName(rt)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "__is_left",
        "__l",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__cf_{c}")
            for c in rcols
        ],
        F.last("__rt", ignorenulls=True).over(w).alias("__cf_rt"),
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        F.col("__l.*"),
        *[F.col(f"__cf_{c}").alias(f"{c}{suffix}") for c in rcols],
        F.col("__cf_rt").alias(f"{right_time}{suffix}"),
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: split each hot key's left-side rows
    across ``n_salts`` shuffle partitions by appending a random salt,
    replicating the right side once per salt value.

    When to use: a single key holding >>1/shuffle-partitions of the rows
    (power-law join keys at 100 TB) makes one reducer the straggler; AQE
    skew-join splitting handles sort-merge cases, but salting also covers
    aggregations-after-join and works under any join strategy. Cost:
    right side is duplicated n_salts× (keep it the SMALL side); left adds
    one cheap column. Correctness: every (left row, right row) key match
    meets on exactly one salt value — plain-join equivalence tested in
    test_api.

    `rand()` here is per-row and nondeterministic ACROSS retries — fine
    for inner/left joins of deterministic inputs (the multiset of matches
    is salt-invariant), but don't use the salt column downstream.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left joins only (got {how!r}): the "
            "replicated right side would surface unmatched right rows "
            "n_salts times under right/full outer semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_left = left.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, keys + ["__salt"], how)
    return out.drop("__salt")


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int | float,
    on: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval range join via fixed-width binning — the other
    join Spark lacks natively (SURVEY §2.3): ``start <= point < end``,
    optionally ANDed with an equality key ``on``.

    Catalyst plans a raw inequality-only join as
    BroadcastNestedLoopJoin/CartesianProduct — O(|points|·|intervals|)
    compares, the classic 100 TB killer. The bin trick makes it an
    EQUI-join: every interval is exploded to the ⌈len/bin_width⌉+1 bins
    it overlaps, points map to exactly one bin, candidates form on
    (bin [, key]) equality, and the exact predicate filters within
    buckets. Compare cost drops to Σ|bucket|·|bucket| — linear when
    bin_width is chosen near the typical interval length (the documented
    tuning knob: too wide → fat buckets; too narrow → interval fan-out
    ≈ len/bin_width rows per interval).

    Numeric or timestamp columns both work (timestamps bin via their
    epoch seconds). ``how='left'`` keeps unmatched points with NULL
    interval columns. Output: all point columns + all interval columns
    (caller aliases collisions beforehand)."""
    if how not in ("inner", "left"):
        raise ValueError(f"range_join: how must be inner/left, got {how!r}")

    def _num(df, c):
        t = dict(df.dtypes)[c]
        col = F.col(c)
        return col.cast("double") if t not in ("timestamp", "timestamp_ntz") else (
            F.unix_timestamp(col).cast("double")
        )

    bw = float(bin_width)
    p = points.withColumn("__pb", F.floor(_num(points, point_col) / bw).cast("long"))
    iv = intervals.withColumn(
        "__bins",
        F.sequence(
            F.floor(_num(intervals, start_col) / bw).cast("long"),
            F.floor(_num(intervals, end_col) / bw).cast("long"),
        ),
    ).withColumn("__pb", F.explode("__bins")).drop("__bins")
    keys = ["__pb"] + ([on] if on else [])
    matched = p.join(iv, keys, "inner").filter(
        (F.col(start_col) <= F.col(point_col)) & (F.col(point_col) < F.col(end_col))
    ).drop("__pb")
    if how == "inner":
        return matched
    iv_cols = [c for c in intervals.columns if c != on]
    missing = p.join(
        matched.select(*[F.col(c) for c in points.columns]).distinct(),
        points.columns,
        "left_anti",
    ).drop("__pb")
    for c in iv_cols:
        missing = missing.withColumn(c, F.lit(None).cast(dict(intervals.dtypes)[c]))
    return matched.unionByName(missing)
