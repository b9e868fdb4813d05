"""Window operators (SURVEY §2.5 W1-W5, §2.6 O4-O5).

Reference semantics:
- W1 latest-snapshot dedup — feature_set_core.py:370-391
- W2 max-time-per-group    — utils/chem_utils/misc.py:35-36
- W3 top-N per group       — algorithms/sql/outliers.py:192-216
- W4 quantile-bucket split — utils/pandas_utils.py:244-268
- O5 temporal split        — utils/pandas_utils.py:398-434

Scale notes: every operator here is a single hash-partitioned window
(shuffle on the partition key only). W4's global ntile is the exception —
a global ORDER BY window is single-task; at 100 TB use the range-
partitioned variant (ntile_buckets with pre_rank_col) or percent_rank
over a repartitionByRange sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_snapshot(
    df: DataFrame,
    id_column: str,
    event_time_column: str,
    tiebreakers: list[str] | None = None,
    deleted_column: str | None = None,
) -> DataFrame:
    """W1 — keep the latest row per id by event time (feature_set_core.py:
    370-391): row_number() OVER (PARTITION BY id ORDER BY event_time DESC,
    <tiebreakers> DESC) == 1, then drop soft-deleted rows.

    One shuffle on id_column; at scale this is the canonical
    'current snapshot of an upsert log' pattern.
    """
    order = [F.col(event_time_column).desc()] + [
        F.col(c).desc() for c in (tiebreakers or [])
    ]
    w = Window.partitionBy(id_column).orderBy(*order)
    out = df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    if deleted_column is not None and deleted_column in df.columns:
        out = out.filter(~F.coalesce(F.col(deleted_column), F.lit(False)))
    return out


def max_time_per_group(df: DataFrame, id_column: str, time_column: str) -> DataFrame:
    """W2 — keep rows whose time equals the per-id max (misc.py:35-36)."""
    w = Window.partitionBy(id_column)
    return (
        df.withColumn("__maxt", F.max(time_column).over(w))
        .filter(F.col(time_column) == F.col("__maxt"))
        .drop("__maxt")
    )


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list,
    n: int,
) -> DataFrame:
    """W3 — top-N rows per group (outliers.py:192-216 nlargest/nsmallest).
    ``order_cols`` are Column expressions (include explicit tiebreakers for
    determinism)."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def ntile_buckets(df: DataFrame, order_col: str, q: int, tiebreakers: list[str] | None = None) -> DataFrame:
    """W4 — assign quantile bucket 1..q by order_col
    (split_dataframe_by_quantiles, pandas_utils.py:244-268).

    NOTE: global ORDER BY window = single task. Fine at test SF; at 100 TB
    use percent_rank over repartitionByRange or approx-quantile cut points
    (ntile_buckets_scalable below).
    """
    order = [F.col(order_col)] + [F.col(c) for c in (tiebreakers or [])]
    w = Window.orderBy(*order)
    return df.withColumn("bucket", F.ntile(q).over(w))


def ntile_buckets_scalable(
    df: DataFrame, order_col: str, q: int, relative_error: float = 1e-4
) -> DataFrame:
    """Scale path for W4: bucket by approx-quantile cut points — no global
    sort, one lightweight quantile pass + a map-side bucket assignment.
    Bucket boundaries are approximate but the operator is fully parallel."""
    probs = [i / q for i in range(1, q)]
    cuts = df.approxQuantile(order_col, probs, relative_error)
    expr = F.lit(q)
    for i in reversed(range(len(cuts))):
        expr = F.when(F.col(order_col) <= cuts[i], F.lit(i + 1)).otherwise(expr)
    return df.withColumn("bucket", expr)


def temporal_split(
    df: DataFrame, time_column: str, cutoff: str
) -> tuple[DataFrame, DataFrame]:
    """O5 — (train, holdout) at a date cutoff (pandas_utils.py:398-434):
    rows with time <= cutoff OR unparseable/null → train; > cutoff → holdout.
    Both sides are pushdown-able filters over the same scan."""
    ts = F.to_timestamp(F.col(time_column))
    cut = F.lit(cutoff).cast("timestamp")
    train = df.filter(ts.isNull() | (ts <= cut))
    holdout = df.filter(ts > cut)
    return train, holdout


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Sessionization: lag(ts) per user + cumulative-sum over gap>threshold
    — the canonical event-stream session assignment (no reference
    equivalent; standard OLAP pattern). Adds ``session_id`` =
    '{user}_{n}'. One shuffle on user_col; both windows share it."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # via-timestamp cast: TIMESTAMP_NTZ can't cast to double directly
    secs = F.col(ts_col).cast("timestamp").cast("double")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("__new", new_session)
        .withColumn(
            "session_num",
            F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "session_id",
            F.concat_ws("_", F.col(user_col).cast("string"), F.col("session_num")),
        )
        .drop("__new")
    )


def stratified_split(
    df: DataFrame,
    strata_col: str,
    fractions: dict | float,
    seed: int = 42,
    key_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """O4 — stratified (train, holdout) split by column
    (pandas_utils.py:1077+): per-stratum Bernoulli via a deterministic
    per-row hash draw. ``fractions`` is a per-value dict or one fraction
    applied to every stratum. The holdout is the literal predicate
    complement, so the two sides partition the input by construction.

    Why a hash draw and not sampleBy (r13 — caught by the
    hostile-partitioning certification sweep): sampleBy's per-row rand
    depends on partition layout AND re-rolls on every plan re-execution,
    so the anti-join "complement" could overlap the train side whenever
    the sample re-evaluated differently (monotonically_increasing_id has
    the same two diseases). The draw here is u = xxhash64(seed, keys) mod
    1e6 < frac·1e6 — a pure row function: reproducible across runs,
    partitionings, and retries (the capture-sampling / sample_to_mixture
    convention). Rows with identical key values get identical draws and
    land on the same side. Strata absent from ``fractions`` (and NULL
    strata) go entirely to the holdout, matching sampleBy's contract.

    ``key_cols`` pins the hash input (r13 ADVICE): by default EVERY
    hashable column feeds the draw, which means adding/dropping/reordering
    any column reshuffles every row's assignment — pass an explicit stable
    key (e.g. the id column) when the schema may evolve under a fixed
    seed. Columns whose type contains a MapType ANYWHERE (top-level,
    array element, struct field — Spark refuses to hash maps at any
    nesting depth) are excluded from the default and rejected with a
    clear error when requested explicitly (r15 ADVICE: the r14 guard
    only caught top-level maps, so array<map> / struct-with-map columns
    still died with a raw AnalysisException).

    Floating strata containing NaN go to the HOLDOUT in every path
    (r15 ADVICE, contract pinned r15 review): NaN is not a stratum —
    it behaves like NULL. The scalar-fraction shortcut's ``isNotNull()``
    gate alone would hand NaN rows the fraction (NaN is not NULL), so
    float/double strata get an explicit ``~isnan`` guard. In the dict
    paths a NaN row can never match a FINITE key (NaN == finite is
    false), but Spark evaluates NaN == NaN as TRUE, so a NaN *key* in
    ``fractions`` would silently turn NaN into a matchable stratum in
    the dict paths only — NaN keys are rejected with a ValueError to
    keep the contract uniform.

    Large ``fractions`` dicts (> ~64 strata) switch from a nested-CASE cut
    expression to a broadcast (stratum, cut) lookup join: the CASE chain's
    expression tree grows linearly with the dict and bloats codegen, while
    the broadcast join is one hash probe per row at any cardinality."""
    from pyspark.sql import types as T

    def _contains_map(dt) -> bool:
        if isinstance(dt, T.MapType):
            return True
        if isinstance(dt, T.ArrayType):
            return _contains_map(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_contains_map(f.dataType) for f in dt.fields)
        return False

    if key_cols is None:
        key_cols = [
            f.name for f in df.schema.fields
            if not _contains_map(f.dataType)
        ]
        if not key_cols:
            raise ValueError("stratified_split: no hashable columns to draw on")
    else:
        bad = [c for c in key_cols if _contains_map(df.schema[c].dataType)]
        if bad:
            raise ValueError(
                f"stratified_split: key_cols {bad} contain MapType (possibly "
                f"nested) and cannot feed the hash draw (Spark disallows "
                f"hashing maps at any depth) — hash the map's sorted entries "
                f"into a string column first"
            )
    if isinstance(fractions, dict):
        import math

        if any(
            isinstance(k, float) and math.isnan(k) for k in fractions
        ):
            raise ValueError(
                "stratified_split: NaN is not a stratum (it routes to the "
                "holdout like NULL) — remove the NaN key from fractions"
            )
    u = F.pmod(
        F.xxhash64(F.lit(int(seed)), *[F.col(c) for c in key_cols]),
        F.lit(1_000_000),
    )
    if not isinstance(fractions, dict):
        # one fraction for every observed stratum == every non-NULL value;
        # no distinct-collect needed (the per-value dict it used to build
        # is semantically a constant over non-NULL strata). NaN strata in
        # float/double columns are NOT a stratum value (NaN != NaN in the
        # CASE paths) — they go to the holdout, same as NULL.
        eligible = F.col(strata_col).isNotNull()
        if isinstance(
            df.schema[strata_col].dataType, (T.FloatType, T.DoubleType)
        ):
            eligible = eligible & ~F.isnan(F.col(strata_col))
        cut = F.when(
            eligible,
            F.lit(int(float(fractions) * 1_000_000)),
        ).otherwise(F.lit(0))
    elif len(fractions) <= 64:
        cut = F.lit(0)
        for v, frac in fractions.items():
            cut = F.when(
                F.col(strata_col) == F.lit(v), F.lit(int(float(frac) * 1_000_000))
            ).otherwise(cut)
    else:
        clash = {"__stratum", "__cut"} & set(df.columns)
        if clash:
            raise ValueError(
                f"stratified_split: input columns {sorted(clash)} collide "
                f"with the broadcast-lookup join's internal names — rename "
                f"them (or pass <=64 strata to use the CASE path)"
            )
        lut = df.sparkSession.createDataFrame(
            [(v, int(float(frac) * 1_000_000)) for v, frac in fractions.items()],
            schema=T.StructType([
                T.StructField("__stratum", df.schema[strata_col].dataType),
                T.StructField("__cut", T.IntegerType()),
            ]),
        )
        joined = df.join(
            F.broadcast(lut), F.col(strata_col) == F.col("__stratum"), "left"
        )
        keep = u < F.coalesce(F.col("__cut"), F.lit(0))
        drop = ["__stratum", "__cut"]
        return joined.filter(keep).drop(*drop), joined.filter(~keep).drop(*drop)
    keep = u < cut
    return df.filter(keep), df.filter(~keep)


def resample_timeseries(
    df: DataFrame,
    time_col: str,
    value_col: str,
    group_col: str | None = None,
    step_seconds: int = 3600,
    agg: str = "avg",
    fill: str = "ffill",
) -> DataFrame:
    """Regularize an event stream onto a fixed time grid with gap
    filling — the batch twin of the streaming hourly rollup (and the op a
    training pipeline needs before any windowed feature join).

    Semantics: bucket events into ``step_seconds`` bins (floor of the
    epoch), aggregate ``value_col`` per (group, bin) with ``agg``
    (avg/sum/min/max/count), then DENSIFY: emit a row for every grid step
    between each group's first and last bin and fill empty bins —
    ``fill='ffill'`` carries the last observed value forward (the
    standard as-of semantics), ``'zero'`` fills 0, ``'null'`` leaves
    gaps NULL. Output: (group?, bucket_ts, value, is_filled).

    Spark-first shape: the dense grid comes from ONE sequence()/explode
    per group (never a driver loop or a calendar-table cross join), and
    forward-fill is last(value, ignorenulls=True) over an unbounded
    preceding window per group — a single shuffle on the group key, which
    the preceding aggregation already paid. At 100 TB the grid size is
    bounded by (time span / step) per group, independent of event count.
    """
    if agg not in ("avg", "sum", "min", "max", "count"):
        raise ValueError(f"agg must be avg/sum/min/max/count, got {agg!r}")
    if fill not in ("ffill", "zero", "null"):
        raise ValueError(f"fill must be ffill/zero/null, got {fill!r}")
    step = int(step_seconds)
    bucket = (F.floor(F.unix_timestamp(F.col(time_col)) / step) * step).cast("long")
    keys = [group_col] if group_col else []
    agg_fn = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
              "count": lambda c: F.count(c)}[agg]
    binned = (
        df.select(*keys, bucket.alias("__b"), F.col(value_col).cast("double").alias("__v"))
        .groupBy(*keys, "__b")
        .agg(agg_fn(F.col("__v")).alias("__v"))
    )
    span = binned.groupBy(*keys).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = span.select(
        *keys,
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))).alias("__b"),
    )
    joined = grid.join(binned, keys + ["__b"], "left").withColumn(
        "is_filled", F.col("__v").isNull()
    )
    if fill == "ffill":
        w = Window.partitionBy(*keys).orderBy("__b").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        filled = F.last("__v", ignorenulls=True).over(w)
    elif fill == "zero":
        filled = F.coalesce(F.col("__v"), F.lit(0.0))
    else:
        filled = F.col("__v")
    return joined.select(
        *keys,
        F.timestamp_seconds(F.col("__b")).alias("bucket_ts"),
        filled.alias("value"),
        "is_filled",
    )


_GRAIN_ORDER = ["year", "month", "week", "day", "hour", "minute"]


def time_rollup(
    df: DataFrame,
    time_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("month", "day", "hour"),
    group_col: str | None = None,
) -> DataFrame:
    """Hypertable-style continuous aggregate: ONE pass produces the
    rollup at every time granularity plus the grand total — the
    multi-resolution dashboard table TimescaleDB materializes per
    hypertable, expressed as Spark's native hierarchical ROLLUP over
    date_trunc columns (coarse → fine, so the grouping sets are exactly
    (), (month), (month,day), (month,day,hour)).

    Output per row: grain ('total'|grain name), bucket_ts (the truncated
    timestamp at that grain; NULL for 'total'), optional group column,
    n_rows, value sum/min/max/avg.

    Scale shape: a single shuffle with map-side partial aggregation for
    ALL grains at once (Expand + partial HashAggregate — Spark plans
    rollup as one exchange, not one per grain); no window functions, no
    self-unions over the fact table. At 100 TB this is the difference
    between one scan and len(grains)+1 scans."""
    bad = [g for g in grains if g not in _GRAIN_ORDER]
    if bad:
        raise ValueError(f"unknown grains {bad}; pick from {_GRAIN_ORDER}")
    ordered = [g for g in _GRAIN_ORDER if g in grains]  # coarse -> fine
    gcols = [F.date_trunc(g, F.col(time_col)).alias(f"__{g}") for g in ordered]
    keys = [F.col(group_col)] if group_col else []
    rolled = (
        df.select(*keys, *gcols, F.col(value_col).cast("double").alias("__v"))
        .rollup(*([group_col] if group_col else []), *[f"__{g}" for g in ordered])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("__v").alias("value_sum"),
            F.min("__v").alias("value_min"),
            F.max("__v").alias("value_max"),
            # grouping() is only legal inside the rollup's own agg —
            # capture the flags here, label grains in the next select
            *[F.grouping(f"__{g}").alias(f"__g_{g}") for g in ordered],
            *(
                [F.grouping(group_col).alias("__g_key")]
                if group_col
                else []
            ),
        )
    )
    if group_col:
        # drop the all-groups grand-total slice: keep rows where the group
        # key is a real value (grouping(group)=0) — the per-group hierarchy
        rolled = rolled.filter(F.col("__g_key") == 0)
    grain = F.lit("total")
    for g in ordered:  # finest non-rolled-up wins
        grain = F.when(F.col(f"__g_{g}") == 0, F.lit(g)).otherwise(grain)
    bucket = F.coalesce(*[F.col(f"__{g}") for g in reversed(ordered)])
    out_keys = [group_col] if group_col else []
    return rolled.select(
        grain.alias("grain"),
        bucket.alias("bucket_ts"),
        *out_keys,
        "n_rows",
        "value_sum",
        "value_min",
        "value_max",
    )


def event_gap_profile(
    df: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str | None = "event_id",
) -> DataFrame:
    """Inter-arrival-time profile per event type — the ops-analytics panel
    behind rate alerting and sessionization-gap tuning: for each type,
    the count / mean / exact median / exact p95 of the gap (seconds)
    between a user's consecutive events, the gap attributed to the LATER
    event's type.

    Determinism: gaps are per-row doubles (epoch-seconds differences —
    identical in any engine); the MEAN is an integer-quantized fold
    (micro-second units, commutative), and median/p95 use exact
    ``percentile`` (the quantile_cont contract). Window is partitioned by
    user — never a global order.

    Output: (event_type, n_gaps, mean_gap_s, median_gap_s, p95_gap_s),
    type ascending."""
    from pyspark.sql import Window

    # Tiebreak the per-user ordering on id_col: two equal-ts events would
    # otherwise make gap-to-type attribution engine/partition-dependent
    # (the gap is attributed to the LATER event's type).
    tie = [F.col("__id")] if id_col is not None and id_col in df.columns else []
    lagged = df.select(
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("double").alias("__t"),
        F.col(user_col).alias("__u"),
        *([F.col(id_col).alias("__id")] if tie else []),
    ).withColumn(
        "__gap",
        F.col("__t")
        - F.lag(F.col("__t")).over(
            Window.partitionBy("__u").orderBy(F.col("__t"), *tie)
        ),
    )
    gaps = lagged.filter(F.col("__gap").isNotNull())
    fr = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            fr(
                F.sum(
                    F.floor(F.col("__gap") * F.lit(1e6) + F.lit(0.5)).cast("long")
                ).cast("double")
                / F.count(F.lit(1))
                / F.lit(1e6)
            ).alias("mean_gap_s"),
            F.expr("percentile(__gap, 0.5)").alias("median_gap_s"),
            F.expr("percentile(__gap, 0.95)").alias("p95_gap_s"),
        )
        .orderBy("event_type")
    )
