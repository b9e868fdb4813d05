"""Uncertainty quantification — the reference's full v0/v1/v2 family
(SURVEY §2.10 M4). Named-mode map (UQ_VERSIONS at the bottom):

- UQ v0 — algorithms/dataframe/uq_model_v0.py:1-367: the lightweight
  (prediction, std)-only calibrator. Quantile-bin the predictions (10
  bins), fit IsotonicRegression(std → |residual|) per bin with a global
  fallback for under-populated bins, confidence = 1 − percentile rank of
  the calibrated expected residual, intervals = split-conformal scale
  factors q_α · std (nonconformity |y−ŷ|/max(std, 1e-10), scale_α at the
  ceil((n+1)α)/n quantile). → class UQv0 here.
- UQ v1 — uq_model_v1.py:13-433: residual features
  [prediction, prediction_std, knn_distance, knn_target_std,
  local_pred_gap] → RandomForest error model predicting |residual| →
  NORMALIZED CONFORMAL calibration (nonconformity = |y-ŷ|/expected;
  scale_α = the ceil((n+1)α)/n empirical quantile) → intervals
  ŷ ± scale_α·expected, plus a percentile-rank confidence score.
  → class UQConformal here.
- UQ v2 — uq_model_v2.py:1-419: pure applicability-domain score — no
  fitted model; confidence = (1-dist_pctile)·(1-var_pctile) against the
  training distribution, intervals = neighbor-target quantiles centered
  on the neighbor median (deliberately NOT on the prediction).
  → uq_applicability here.
- neighbor-spread sigma (the pre-v0 heuristic) stays in
  ml_analysis.uq_from_neighbors.

Spark-first design:
- The error model is MLlib RandomForestRegressor (distributed fit).
- Neighborhoods come through operators/similarity.euclidean_knn — exact
  broadcast for oracle parity, BRP-LSH equi-join via knn_method='bucketed'
  at scale.
- Conformal scale factors and the 101-point calibration CDF are
  driver-side CONSTANTS (a handful of doubles — O(1) state independent of
  data size); ranking against them is a literal-array expression, fully
  codegen'd, no shuffle, no Python per row.
- Finite-sample guarantee: on the calibration frame itself, coverage of
  the α-interval is ≥ α by construction — that is the oracle-checkable
  invariant (m4_uq_coverage).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEFAULT_LEVELS = (0.50, 0.68, 0.80, 0.90, 0.95)


def uq_feature_frame(
    preds: DataFrame,
    id_col: str,
    prediction: str,
    feature_cols: list[str],
    k: int = 10,
    prediction_std: str | None = None,
    knn_method: str = "exact",
) -> DataFrame:
    """Per-row UQ features (uq_model_v1.py FEATURE_ORDER): prediction,
    prediction_std (0.0 if absent), knn_distance (mean distance to the k
    neighbors), knn_target_std (std of neighbor predictions),
    local_pred_gap (|own - mean neighbor prediction|)."""
    from workbench_spark.operators.similarity import euclidean_knn

    knn = euclidean_knn(preds, feature_cols, id_col, k=k, method=knn_method)
    neigh = knn.join(
        preds.select(
            F.col(id_col).alias("neighbor_id"), F.col(prediction).alias("__np")
        ),
        "neighbor_id",
    )
    per_row = neigh.groupBy("id").agg(
        F.avg("distance").alias("knn_distance"),
        F.stddev("__np").alias("knn_target_std"),
        F.avg("__np").alias("__nbr_mean"),
    )
    std_col = (
        F.col(prediction_std).cast("double")
        if prediction_std
        else F.lit(0.0)
    )
    return (
        preds.join(per_row.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            F.col(id_col),
            F.col(prediction).cast("double").alias("prediction"),
            std_col.alias("prediction_std"),
            F.coalesce(F.col("knn_distance"), F.lit(0.0)).alias("knn_distance"),
            F.coalesce(F.col("knn_target_std"), F.lit(0.0)).alias("knn_target_std"),
            F.coalesce(
                F.abs(F.col(prediction) - F.col("__nbr_mean")), F.lit(0.0)
            ).alias("local_pred_gap"),
        )
    )


def _rank_expr(value_col: str, boundaries: list[float]):
    """Fraction of calibration boundary points <= value — the percentile
    rank against a driver-side constant CDF, as one codegen'd expression."""
    arr = "array(" + ", ".join(repr(float(b)) for b in boundaries) + ")"
    return F.expr(
        f"size(filter({arr}, p -> p <= {value_col})) / {len(boundaries)}"
    ).cast("double")


class UQConformal:
    """v1 — conformalized residual-estimator UQ (uq_model_v1.py:13-433).

    fit() on an out-of-fold calibration frame (id, y_true, prediction
    [, prediction_std]); predict() emits expected_residual, confidence and
    lower_/upper_ bounds for each confidence level.
    """

    FEATURES = [
        "prediction",
        "prediction_std",
        "knn_distance",
        "knn_target_std",
        "local_pred_gap",
    ]

    def __init__(
        self,
        feature_cols: list[str],
        id_col: str = "id",
        confidence_levels: tuple[float, ...] = _DEFAULT_LEVELS,
        k: int = 10,
        n_trees: int = 50,
        max_depth: int = 8,
        seed: int = 42,
        knn_method: str = "exact",
    ):
        self.feature_cols = feature_cols
        self.id_col = id_col
        self.confidence_levels = tuple(confidence_levels)
        self.k = k
        self.n_trees = n_trees
        self.max_depth = max_depth
        self.seed = seed
        self.knn_method = knn_method
        self.error_model = None
        self.scale_factors: dict[float, float] | None = None
        self.residual_percentiles: list[float] | None = None
        self._cal_feats: DataFrame | None = None

    def release(self) -> None:
        """Unpersist the cached calibration feature frame (fit() caches it
        for predict(None); repeated fits in one session would otherwise
        leak cached blocks until LRU eviction)."""
        if self._cal_feats is not None:
            self._cal_feats.unpersist()
            self._cal_feats = None

    # ---------------------------------------------------------------- fit
    def fit(
        self,
        cal: DataFrame,
        target: str,
        prediction: str,
        prediction_std: str | None = None,
    ) -> "UQConformal":
        from pyspark.ml.feature import VectorAssembler
        from pyspark.ml.regression import RandomForestRegressor

        self.release()  # re-fit: drop the previous calibration cache
        feats = uq_feature_frame(
            cal, self.id_col, prediction, self.feature_cols,
            k=self.k, prediction_std=prediction_std, knn_method=self.knn_method,
        ).persist()
        self._cal_feats = feats  # reused by predict(None) — cal-set scoring
        y = cal.select(
            F.col(self.id_col),
            F.col(target).cast("double").alias("__y"),
        )
        frame = feats.join(y, self.id_col).withColumn(
            "__abs_resid", F.abs(F.col("__y") - F.col("prediction"))
        )
        va = VectorAssembler(inputCols=self.FEATURES, outputCol="__X")
        assembled = va.transform(frame)
        rf = RandomForestRegressor(
            featuresCol="__X",
            labelCol="__abs_resid",
            predictionCol="__expected",
            numTrees=self.n_trees,
            maxDepth=self.max_depth,
            seed=self.seed,
        )
        self.error_model = rf.fit(assembled)
        scored = self.error_model.transform(assembled).withColumn(
            "__nonconf",
            F.col("__abs_resid") / F.greatest(F.col("__expected"), F.lit(1e-10)),
        )
        scored = scored.persist()
        n = scored.count()
        # conformal quantile per level: ceil((n+1)·α)/n, capped at 1 —
        # ONE exact multi-quantile pass (percentile with an array arg)
        probs = [
            min(math.ceil((n + 1) * a) / n, 1.0) for a in self.confidence_levels
        ]
        row = scored.agg(
            F.percentile(
                F.col("__nonconf"), F.array(*[F.lit(p) for p in probs])
            ).alias("__q"),
            F.percentile(
                F.col("__expected"),
                F.array(*[F.lit(p / 100.0) for p in range(101)]),
            ).alias("__cdf"),
        ).first()
        scored.unpersist()
        self.scale_factors = dict(zip(self.confidence_levels, row["__q"]))
        self.residual_percentiles = list(row["__cdf"])
        return self

    # ------------------------------------------------------------ predict
    def predict(
        self,
        df: DataFrame | None,
        prediction: str,
        prediction_std: str | None = None,
    ) -> DataFrame:
        """(id, prediction, expected_residual, confidence, lower_XX /
        upper_XX per level). confidence = 1 - percentile rank of
        expected_residual against the calibration distribution.
        df=None scores the calibration frame itself (features persisted at
        fit time — no second KNN pass)."""
        if self.error_model is None:
            raise RuntimeError("UQConformal not fitted — call .fit() first")
        from pyspark.ml.feature import VectorAssembler

        if df is None:
            feats = self._cal_feats
        else:
            feats = uq_feature_frame(
                df, self.id_col, prediction, self.feature_cols,
                k=self.k, prediction_std=prediction_std, knn_method=self.knn_method,
            )
        va = VectorAssembler(inputCols=self.FEATURES, outputCol="__X")
        scored = self.error_model.transform(va.transform(feats))
        out = scored.select(
            self.id_col,
            "prediction",
            F.col("__expected").alias("expected_residual"),
            (1.0 - _rank_expr("__expected", self.residual_percentiles)).alias(
                "confidence"
            ),
        )
        # bounds use the SAME 1e-10 floor as the nonconformity denominator
        # at fit time — otherwise a row where the RF predicts ~0 expected
        # residual counts as covered in the quantile accounting yet gets a
        # zero-width interval, a marginal hole in the coverage guarantee
        floored = F.greatest(F.col("expected_residual"), F.lit(1e-10))
        for a in self.confidence_levels:
            s = self.scale_factors[a]
            tag = f"{int(round(a * 100)):02d}"
            out = out.withColumn(
                f"lower_{tag}", F.col("prediction") - s * floored
            ).withColumn(
                f"upper_{tag}", F.col("prediction") + s * floored
            )
        return out


def _pava_blocks(x, y):
    """Weighted pool-adjacent-violators over (x, y): sort by x, average y
    at duplicate x, pool adjacent decreasing blocks to their weighted
    mean. Returns (thresholds, fitted) — the block representation sklearn
    IsotonicRegression stores as X_/y_thresholds_, so np.interp over it is
    the identical piecewise-linear calibrator the reference applies
    (uq_model_v0.py:60-133). Labels here are |residual| ≥ 0, so the
    fitted block means satisfy y_min=0 without an explicit clip."""
    import numpy as np

    order = np.argsort(x, kind="mergesort")
    x, y = np.asarray(x, float)[order], np.asarray(y, float)[order]
    ux, inv, cnt = np.unique(x, return_inverse=True, return_counts=True)
    sums = np.zeros(len(ux))
    np.add.at(sums, inv, y)
    vals = list(sums / cnt)
    wts = list(cnt.astype(float))
    lens = [1] * len(vals)
    out_v, out_w, out_l = [], [], []
    for v, w, length in zip(vals, wts, lens):
        out_v.append(v), out_w.append(w), out_l.append(length)
        while len(out_v) > 1 and out_v[-2] > out_v[-1]:
            tw = out_w[-2] + out_w[-1]
            out_v[-2] = (out_v[-2] * out_w[-2] + out_v[-1] * out_w[-1]) / tw
            out_w[-2] = tw
            merged_len = out_l.pop()
            out_l[-1] += merged_len
            out_v.pop(), out_w.pop()
    fitted = np.repeat(out_v, out_l)
    return ux, fitted


def _grid_interp_sql(x_col: str, lo: float, hi: float, ys: list[float]) -> str:
    """Linear interpolation over a UNIFORM grid as ONE SQL expression:
    clamp x to [lo, hi], map to a fractional grid index, blend the two
    surrounding values with element_at — pure O(1) arithmetic per row.

    Why uniform: a thresholds-array formulation (size(filter(...)) rank
    search over the PAVA block boundaries) was the first version and
    measured ~50x slower at sf0.01 — Spark evaluates higher-order
    functions interpreted, so every row paid five O(thresholds) lambda
    scans. Resampling the isotonic fit onto an even grid keeps the stored
    state O(grid) and turns inference into two element_at calls that stay
    inside whole-stage codegen."""
    from workbench_spark.operators.similarity import _dlit

    g = len(ys)
    if g == 1 or hi <= lo:
        return _dlit(ys[0])
    ya = "array(" + ", ".join(_dlit(v) for v in ys) + ")"
    t = (
        f"(least(greatest(({x_col} - {_dlit(lo)}) / {_dlit(hi - lo)}, 0.0D), 1.0D)"
        f" * {g - 1})"
    )
    i = f"least(cast(floor({t}) as int), {g - 2})"
    return (
        f"element_at({ya}, {i} + 1)"
        f" + (element_at({ya}, {i} + 2) - element_at({ya}, {i} + 1))"
        f" * ({t} - {i})"
    )


class UQv0:
    """v0 — isotonic-on-(prediction, std) calibrator (uq_model_v0.py).

    The lightweight member of the family: no neighborhoods, no error
    model. fit() on an out-of-fold calibration frame; predict() emits
    expected_residual, confidence, q_50 = prediction and the conformal
    interval columns (q_025..q_975 per confidence level).

    Spark-first shape:
    - Bin edges + conformal scale factors + the 101-point residual CDF
      are driver-side constants from TWO exact multi-percentile passes.
    - The per-bin isotonic fits run as ONE distributed job
      (groupBy(bin).applyInPandas over a numpy PAVA) — quantile bins are
      balanced by construction, so each task sees ~n/10 rows and the
      <MIN_SAMPLES global fallback is structurally gated by an explicit
      n < bins·MIN_SAMPLES check (≤200 rows can ever cross the driver);
      a degenerate bin at large n (quantile ties) borrows the nearest
      fitted bin's calibrator instead of pulling the frame.
    - Calibrator state per bin is the PAVA fit resampled onto a uniform
      ``grid_points`` std grid — (lo, hi, values) — so stored state is
      O(bins·grid) regardless of calibration size and inference is pure
      O(1) arithmetic per row (clamp → fractional index → two element_at,
      fully codegen'd; see _grid_interp_sql for why the thresholds-array
      form was abandoned). No Python per row, no shuffle at predict.
    """

    N_BINS = 10
    MIN_SAMPLES_PER_BIN = 20

    def __init__(
        self,
        id_col: str = "id",
        confidence_levels: tuple[float, ...] = _DEFAULT_LEVELS,
        n_bins: int = N_BINS,
        grid_points: int = 65,
    ):
        self.id_col = id_col
        self.confidence_levels = tuple(confidence_levels)
        self.n_bins = n_bins
        self.grid_points = grid_points
        self.bin_edges: list[float] | None = None
        # bin -> (lo, hi, grid values)
        self.calibrators: dict[int, tuple[float, float, list[float]]] | None = None
        self.scale_factors: dict[float, float] | None = None
        self.residual_percentiles: list[float] | None = None

    # ---------------------------------------------------------------- fit
    def fit(
        self, cal: DataFrame, target: str, prediction: str, prediction_std: str
    ) -> "UQv0":
        import numpy as np
        import pandas as pd

        y = F.col(target).cast("double")
        pred = F.col(prediction).cast("double")
        std = F.col(prediction_std).cast("double")
        frame = cal.select(
            pred.alias("__p"),
            std.alias("__s"),
            F.abs(y - pred).alias("__r"),
            (F.abs(y - pred) / F.greatest(std, F.lit(1e-10))).alias("__nc"),
        ).persist()
        n = frame.count()
        if n == 0:
            raise ValueError("UQv0.fit needs a non-empty calibration frame")
        probs = [min(math.ceil((n + 1) * a) / n, 1.0) for a in self.confidence_levels]
        row = frame.agg(
            F.percentile(F.col("__nc"), F.array(*[F.lit(p) for p in probs])).alias("__q"),
            F.percentile(
                F.col("__p"),
                F.array(*[F.lit(i / self.n_bins) for i in range(self.n_bins + 1)]),
            ).alias("__edges"),
        ).first()
        self.scale_factors = dict(zip(self.confidence_levels, row["__q"]))
        edges = sorted(set(row["__edges"]))  # np.unique on quantile points
        if len(edges) == 1:
            # constant predictions: every quantile edge is the same value —
            # degrade to ONE bin spanning it rather than an empty CASE
            edges = [edges[0], edges[0]]
        edges[0] -= 1e-6
        edges[-1] += 1e-6
        self.bin_edges = [float(e) for e in edges]
        n_bins = len(edges) - 1

        edge_arr = "array(" + ", ".join(repr(e) for e in self.bin_edges) + ")"
        bin_expr = F.expr(
            f"least(greatest(size(filter({edge_arr}, e -> e <= __p)) - 1, 0), {n_bins - 1})"
        )
        binned = frame.withColumn("__bin", bin_expr)
        counts = {
            r["__bin"]: r["n"]
            for r in binned.groupBy("__bin").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        gpts = self.grid_points

        def to_grid(xs, ys):
            """PAVA blocks → (lo, hi, uniform-grid values)."""
            if len(xs) == 1 or xs[-1] <= xs[0]:
                return float(xs[0]), float(xs[0]), [float(ys[0])]
            grid = np.linspace(xs[0], xs[-1], gpts)
            return float(xs[0]), float(xs[-1]), [
                float(v) for v in np.interp(grid, xs, ys)
            ]

        def fit_bin(pdf: pd.DataFrame) -> pd.DataFrame:
            lo, hi, vals = to_grid(
                *_pava_blocks(pdf["__s"].to_numpy(), pdf["__r"].to_numpy())
            )
            return pd.DataFrame(
                {"bin": [int(pdf["__bin"].iloc[0])], "lo": [lo], "hi": [hi],
                 "ys": [vals]}
            )

        big = [b for b, c in counts.items() if c >= self.MIN_SAMPLES_PER_BIN]
        fits = (
            binned.filter(F.col("__bin").isin(big))
            .groupBy("__bin")
            .applyInPandas(fit_bin, "bin int, lo double, hi double, ys array<double>")
            .collect()
            if big
            else []
        )
        self.calibrators = {r["bin"]: (r["lo"], r["hi"], list(r["ys"])) for r in fits}
        if len(self.calibrators) < n_bins:
            total_n = sum(counts.values())
            if total_n < n_bins * self.MIN_SAMPLES_PER_BIN:
                # small-n global fallback — the pull is structurally bounded
                # by this check: at most n_bins·MIN_SAMPLES rows ever cross
                # the driver, regardless of how the frame was built
                gpdf = frame.select("__s", "__r").toPandas()
                g = to_grid(
                    *_pava_blocks(gpdf["__s"].to_numpy(), gpdf["__r"].to_numpy())
                )
                for b in range(n_bins):
                    self.calibrators.setdefault(b, g)
            else:
                # large n but quantile ties left a degenerate bin: borrow
                # the nearest fitted bin's calibrator (pigeonhole guarantees
                # at least one bin fit) — never a full-frame driver pull
                fitted = sorted(self.calibrators)
                for b in range(n_bins):
                    if b not in self.calibrators:
                        nearest = min(fitted, key=lambda f: abs(f - b))
                        self.calibrators[b] = self.calibrators[nearest]

        # 101-point CDF of the calibrated residual on the cal set itself
        expected = self._expected_expr("__p", "__s")
        cdf = (
            binned.select(expected.alias("__e"))
            .agg(
                F.percentile(
                    F.col("__e"), F.array(*[F.lit(p / 100.0) for p in range(101)])
                ).alias("__cdf")
            )
            .first()
        )
        self.residual_percentiles = [float(v) for v in cdf["__cdf"]]
        frame.unpersist()
        return self

    # ------------------------------------------------------------ helpers
    def _expected_expr(self, pred_col: str, std_col: str):
        """expected_residual as one codegen'd CASE over the bins."""
        n_bins = len(self.bin_edges) - 1
        edge_arr = "array(" + ", ".join(repr(e) for e in self.bin_edges) + ")"
        idx = f"least(greatest(size(filter({edge_arr}, e -> e <= {pred_col})) - 1, 0), {n_bins - 1})"
        branches = " ".join(
            f"WHEN {b} THEN greatest({_grid_interp_sql(std_col, *self.calibrators[b])}, 0.0d)"
            for b in range(n_bins)
        )
        return F.expr(f"CASE {idx} {branches} END")

    # ------------------------------------------------------------ predict
    def predict(
        self, df: DataFrame, prediction: str, prediction_std: str
    ) -> DataFrame:
        """(id, prediction, expected_residual, confidence, q_025..q_975).
        Pure column expressions against the fitted driver-side constants —
        scores any size frame with zero shuffles."""
        if self.calibrators is None:
            raise RuntimeError("UQv0 not fitted — call .fit() first")
        pred = F.col(prediction).cast("double")
        std = F.col(prediction_std).cast("double")
        out = df.select(
            self.id_col,
            pred.alias("prediction"),
            pred.alias("__p"),
            std.alias("__s"),
        ).withColumn("__e", self._expected_expr("__p", "__s"))
        rank = _rank_expr("__e", self.residual_percentiles)
        out = out.withColumn(
            "confidence",
            F.least(F.greatest(1.0 - rank, F.lit(0.0)), F.lit(1.0)),
        ).withColumn("q_50", F.col("prediction"))
        safe_std = F.greatest(F.col("__s"), F.lit(1e-10))
        for a in self.confidence_levels:
            if a not in _UQ_LEVEL_COLS:
                continue
            lo_col, hi_col = _UQ_LEVEL_COLS[a]
            q = self.scale_factors[a]
            out = out.withColumn(lo_col, F.col("prediction") - q * safe_std)
            out = out.withColumn(hi_col, F.col("prediction") + q * safe_std)
        return out.select(
            self.id_col,
            "prediction",
            F.col("__e").alias("expected_residual"),
            "confidence",
            *[c for pair in _UQ_LEVEL_COLS.values() for c in pair if c in out.columns],
            "q_50",
        )


# quantile column names by confidence level — shared across UQ versions
# (uq_model_v0.py:47-53)
_UQ_LEVEL_COLS = {
    0.50: ("q_25", "q_75"),
    0.68: ("q_16", "q_84"),
    0.80: ("q_10", "q_90"),
    0.90: ("q_05", "q_95"),
    0.95: ("q_025", "q_975"),
}


def uq_applicability(
    train: DataFrame,
    queries: DataFrame | None,
    feature_cols: list[str],
    id_col: str,
    target: str,
    k: int = 10,
    quantiles: tuple[float, ...] = (0.05, 0.25, 0.50, 0.75, 0.95),
    knn_method: str = "exact",
) -> DataFrame:
    """v2 — applicability-domain confidence (uq_model_v2.py:1-419): no
    fitted model. Per query: mean distance + target-std of its k unique
    nearest TRAINING neighbors; confidence =
    (1-dist_percentile)·(1-var_percentile) ranked against the training
    set's own distribution; intervals = neighbor-target quantiles
    (centered on the neighbor median, deliberately not on the model
    prediction — the gap IS the cliff diagnostic).

    queries=None scores the training frame against itself (the
    fit-time distribution pass and the predict pass share one code path);
    a queries frame restricts output to its ids (they must exist in
    ``train`` — novel-vector scoring goes through the same path after a
    union-with-null-target, as in the reference's query_df dispatch).
    """
    from workbench_spark.operators.similarity import euclidean_knn

    base = train.select(
        F.col(id_col), *[F.col(c) for c in feature_cols], F.col(target)
    )
    qframe = base if queries is None else queries
    # one unioned KNN pass keyed by origin (train rows rank the training
    # distribution; query rows get scored) — single candidate join
    knn = euclidean_knn(base, feature_cols, id_col, k=k, method=knn_method)
    y = base.select(F.col(id_col).alias("neighbor_id"), F.col(target).alias("__ny"))
    neigh = knn.join(y, "neighbor_id")
    stats = neigh.groupBy("id").agg(
        F.avg("distance").alias("mean_dist"),
        F.stddev("__ny").alias("target_std"),
        F.percentile(F.col("__ny"), F.array(*[F.lit(q) for q in quantiles])).alias(
            "__nq"
        ),
        F.percentile(F.col("__ny"), F.lit(0.5)).alias("neighbor_median"),
    )
    # training distribution of the two stats: 101-point CDFs, driver-side
    # constants (O(1) regardless of N)
    cdf = stats.agg(
        F.percentile(
            F.col("mean_dist"), F.array(*[F.lit(p / 100.0) for p in range(101)])
        ).alias("__dcdf"),
        F.percentile(
            F.col("target_std"), F.array(*[F.lit(p / 100.0) for p in range(101)])
        ).alias("__vcdf"),
    ).first()
    dist_rank = _rank_expr("mean_dist", list(cdf["__dcdf"]))
    var_rank = _rank_expr("target_std", list(cdf["__vcdf"]))
    out = stats.select(
        "id",
        "mean_dist",
        "target_std",
        "neighbor_median",
        ((1.0 - dist_rank) * (1.0 - var_rank)).alias("confidence"),
        *[
            F.element_at("__nq", i + 1).alias(f"q_{str(q).replace('0.', '')}")
            for i, q in enumerate(quantiles)
        ],
    )
    if queries is not None:
        out = out.join(
            qframe.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
    return out


# ---------------------------------------------------------------------------
# UQ evaluation panel (model_utils.py:540-686 uq_metrics)
# ---------------------------------------------------------------------------

# Abramowitz & Stegun 7.1.26 rational erf approximation (|err| < 1.5e-7),
# published closed form — used because neither Spark SQL nor DuckDB ships
# erf, and a scipy.norm UDF would drop the whole panel out of codegen.
_AS_P = 0.3275911
_AS_A = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
_SQRT2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)
_INV_SQRT_PI = 1.0 / math.sqrt(math.pi)


def _erf_as(x):
    """erf(x) for x >= 0 via A&S 7.1.26: 1 - poly(t)·e^(−x²), t=1/(1+px)."""
    t = 1.0 / (1.0 + _AS_P * x)
    poly = sum(
        (F.lit(a) * t ** (i + 1) for i, a in enumerate(_AS_A[1:], start=1)),
        F.lit(_AS_A[0]) * t,
    )
    return 1.0 - poly * F.exp(-x * x)


def _norm_cdf(z):
    """Φ(z) = (1 + sign(z)·erf(|z|/√2)) / 2 — odd-symmetry extension of
    the x>=0 approximation."""
    e = _erf_as(F.abs(z) / _SQRT2)
    return (1.0 + F.signum(z) * e) / 2.0


def _norm_pdf(z):
    return F.lit(_INV_SQRT_2PI) * F.exp(-z * z / 2.0)


# z-multipliers for the Gaussian-derived central intervals, exactly the
# constants the reference hard-codes (model_utils.py:601-611)
_GAUSS_Z = {50: 0.674, 68: 1.0, 80: 1.282, 90: 1.645, 95: 1.96}
_QCOLS = {
    95: ("q_025", "q_975"),
    90: ("q_05", "q_95"),
    80: ("q_10", "q_90"),
    68: ("q_16", "q_84"),
    50: ("q_25", "q_75"),
}


def uq_metrics(
    df: DataFrame,
    target_col: str,
    prediction: str = "prediction",
    prediction_std: str = "prediction_std",
    exact: bool = True,
) -> DataFrame:
    """The UQ evaluation panel (model_utils.py:540-686) as ONE aggregation
    pass: coverage@{68,80,90,95}, median std / interval widths, Gaussian
    CRPS, interval score@95, Spearman(width_68, |residual|) and
    Spearman(confidence, |residual|) when a confidence column exists.

    Interval bounds come from explicit quantile columns (q_025..q_975,
    with the reference's q_16/q_84 → q_10/q_90 fallback) when present,
    else from prediction ± z·prediction_std. Rows with NULL/NaN in any
    input column are dropped first (reference's dropna). Φ uses the
    published A&S 7.1.26 erf approximation (<1.5e-7 absolute error, the
    price of staying JVM-side); medians are exact percentiles when
    ``exact`` (oracle mode), percentile_approx otherwise (constant-memory
    sketch for the 100 TB path).

    Output: one row, metric columns wide — coverage_68..95, median_std,
    median_width_50..95, mean_crps, mean_interval_score_95,
    interval_to_error_corr, confidence_to_error_corr (NULL when absent),
    n_samples.
    """
    from workbench_spark.operators.metrics import _avg_rank

    if target_col not in df.columns:
        raise ValueError(f"Target column '{target_col}' not found in DataFrame.")
    if prediction not in df.columns:
        raise ValueError(f"Prediction column '{prediction}' not found in DataFrame.")
    has_q = all(c in df.columns for q in (95, 50) for c in _QCOLS[q])
    if not has_q and prediction_std not in df.columns:
        raise ValueError(
            "Either quantile columns (q_025, q_975, q_25, q_75) or "
            f"'{prediction_std}' column must be present."
        )
    has_conf = "confidence" in df.columns

    # dropna over every column the metrics read (model_utils.py:567-585)
    used = [target_col, prediction]
    if prediction_std in df.columns:
        used.append(prediction_std)
    if has_conf:
        used.append("confidence")
    if has_q:
        used += [c for q in _QCOLS.values() for c in q if c in df.columns]
    cond = None
    for c in used:
        ok = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        cond = ok if cond is None else (cond & ok)
    d = df.filter(cond)

    y = F.col(target_col).cast("double")
    pred = F.col(prediction).cast("double")
    std = F.col(prediction_std).cast("double") if prediction_std in df.columns else None

    def bounds(level: int):
        # per-level resolution: this level's quantile columns if present
        # (68% borrows 80%'s per the reference), else Gaussian bounds from
        # prediction_std, else NULL bounds (that level's metrics come back
        # NULL instead of a missing-column AnalysisException — a frame
        # carrying exactly q_025/q_975/q_25/q_75 and no std is legal per
        # this function's own error message).
        if has_q:
            lo, hi = _QCOLS[level]
            if level == 68 and lo not in df.columns:
                lo, hi = _QCOLS[80]  # reference fallback
            if lo in df.columns and hi in df.columns:
                return F.col(lo).cast("double"), F.col(hi).cast("double")
        if std is not None:
            z = _GAUSS_Z[level]
            return pred - z * std, pred + z * std
        return F.lit(None).cast("double"), F.lit(None).cast("double")

    med = (
        (lambda c: F.percentile(c, F.lit(0.5)))
        if exact
        else (lambda c: F.percentile_approx(c, F.lit(0.5), F.lit(10000)))
    )

    def qmean(term, alias):
        """Exact-mode mean: integer-quantized fold (r15 ROUND(SUM) audit
        conversion — crps/interval-score terms have no value grid, so a
        float AVG's accumulation order could flip the entry's d=4
        rounding). Terms quantize to 1e-6 units in decimal(38,0) (the
        Σq² headroom convention: interval-score terms reach ~1e12 units,
        BIGINT would overflow past ~sf1). Degenerate terms NULL the
        WHOLE mean instead of silently saturating or dropping — and
        "degenerate" must include NULL itself: under ANSI-off, std=0
        makes z = (y-pred)/0.0 evaluate to NULL (not Inf — Spark NULLs
        double division by zero), so a guard that only checked
        NaN/±Inf would let the NULL term fall out of the SUM while
        COUNT(*) still counted the row, biasing the mean (r15 review
        catch). `ok` leads with isNotNull so the boolean is never
        three-valued."""
        ok = (
            term.isNotNull()
            & ~F.isnan(term)
            & (term != F.lit(float("inf")))
            & (term != F.lit(float("-inf")))
        )
        s = F.sum(
            F.when(ok, F.floor(term * F.lit(1e6) + F.lit(0.5)))
            .otherwise(F.lit(None))
            .cast("decimal(38,0)")
        )
        n_bad = F.sum(F.when(~ok, F.lit(1)).otherwise(F.lit(0)))
        return (
            F.when(n_bad > 0, F.lit(None).cast("double"))
            .otherwise(s.cast("double") / F.count(F.lit(1)) / F.lit(1e6))
            .alias(alias)
        )

    aggs = []
    for level in (68, 80, 90, 95):
        lo, hi = bounds(level)
        aggs.append(F.avg(((y >= lo) & (y <= hi)).cast("double")).alias(f"coverage_{level}"))
    for level in (50, 68, 80, 90, 95):
        lo, hi = bounds(level)
        aggs.append(med(hi - lo).alias(f"median_width_{level}"))
    if std is not None:
        aggs.append(med(std).alias("median_std"))
        z = (y - pred) / std
        crps = std * (
            z * (2.0 * _norm_cdf(z) - 1.0) + 2.0 * _norm_pdf(z) - _INV_SQRT_PI
        )
        aggs.append(qmean(crps, "mean_crps") if exact
                    else F.avg(crps).alias("mean_crps"))
    else:
        aggs.append(F.lit(None).cast("double").alias("median_std"))
        aggs.append(F.lit(None).cast("double").alias("mean_crps"))
    lo95, hi95 = bounds(95)
    alpha = 0.05
    is95 = (
        (hi95 - lo95)
        + (2.0 / alpha) * (lo95 - y) * (y < lo95).cast("double")
        + (2.0 / alpha) * (y - hi95) * (y > hi95).cast("double")
    )
    aggs.append(qmean(is95, "mean_interval_score_95") if exact
                else F.avg(is95).alias("mean_interval_score_95"))
    aggs.append(F.count(F.lit(1)).alias("n_samples"))

    # Spearman correlations need rank columns (a window pass) before the agg
    lo68, hi68 = bounds(68)
    ranked = (
        d.withColumn("__w68", hi68 - lo68)
        .withColumn("__ar", F.abs(y - pred))
        .withColumn("__rw", _avg_rank("__w68"))
        .withColumn("__rr", _avg_rank("__ar"))
    )
    # _safe_corr: ANSI mode makes F.corr raise DIVIDE_BY_ZERO on constant
    # columns (e.g. uniform interval widths); NULL matches DuckDB corr().
    # exact mode uses the integer-sufficient-statistics rank corr instead
    # (r15 — order-invariant where the engines' stable pairwise corr
    # merges are not; same NULL-on-zero-variance contract)
    from workbench_spark.operators.ensembles import _safe_corr
    from workbench_spark.operators.metrics import exact_midrank_corr

    _corr = exact_midrank_corr if exact else _safe_corr
    aggs.append(_corr(F.col("__rw"), F.col("__rr")).alias("interval_to_error_corr"))
    if has_conf:
        ranked = ranked.withColumn("__rc", _avg_rank("confidence"))
        aggs.append(_corr(F.col("__rc"), F.col("__rr")).alias("confidence_to_error_corr"))
    else:
        aggs.append(F.lit(None).cast("double").alias("confidence_to_error_corr"))

    order = (
        [f"coverage_{x}" for x in (68, 80, 90, 95)]
        + ["median_std"]
        + [f"median_width_{x}" for x in (50, 68, 80, 90, 95)]
        + ["mean_crps", "mean_interval_score_95",
           "interval_to_error_corr", "confidence_to_error_corr", "n_samples"]
    )
    return ranked.agg(*aggs).select(*order)


# --------------------------------------------------------------------------
# named-mode registry: the reference ships three distinct UQ models
# (uq_model_v0/v1/v2.py) behind one family — map each version name to its
# engine twin so callers can dispatch by the reference's own version tags.
UQ_VERSIONS = {
    "v0": UQv0,              # isotonic (prediction, std) calibrator + split conformal
    "v1": UQConformal,       # residual features + RF error model + normalized conformal
    "v2": uq_applicability,  # pure applicability-domain score from neighbors
}
