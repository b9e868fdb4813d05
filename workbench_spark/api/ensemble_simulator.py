"""EnsembleSimulator — the full analysis/simulation surface of the
reference's utils/ensemble_simulator.py (886 lines), Spark-first.

Reference surface re-expressed (reference = SuperCowPowers/workbench):
- load + align cross-fold predictions across models (ensemble_simulator.py:52-84)
- model_performance / residual_correlations / model_agreement /
  confidence_analysis (py:175-343)
- ensemble_weights + strategy_comparison (py:344-456 — the comparison
  half already lives in operators/ensembles.py; this class delegates)
- confidence_weight_distribution / ensemble_confidence_analysis /
  best_ensemble_predictions / get_best_strategy_config /
  ensemble_failure_analysis (py:458-763)
- reproduce_deployed (py:86-174)
- ensemble_confidence / conf_weights_with_fallback (ensemble_utils.py:12-57
  — the weight half is operators.ensembles._branch_weights)

Spark-first design:
- One WIDE combined frame (id, target, {m}_pred, {m}_conf), built by
  inner-joining the per-model frames on the id column (the reference's
  common-id intersection + sort alignment) and persisted — every analysis
  is an aggregation over it, never a driver-side matrix.
- All per-model statistics for a method come out of ONE aggregation pass
  (M models → M·k aggregate expressions, driver gets M·k scalars).
- Spearman correlations: ``exact=True`` (default — calibration frames are
  modest) ranks via the documented single-task window
  (operators.metrics._avg_rank); ``exact=False`` switches every Spearman
  to bucketed approximate ranks (the spearman_approx pattern) — the
  100 TB path, same exact/sketch convention as the library stats.
- Error-by-quartile tables (confidence_analysis / model_agreement) honor
  the same switch: exact mode uses the reference's equal-count ``ntile(4)``
  global-sort window; ``exact=False`` derives cut points with
  ``percentile_approx`` and buckets map-side (when-chain), with
  ``percentile_approx`` per-bucket medians — under ``exact=False`` NO code
  path contains a ``Window.orderBy`` without a ``partitionBy`` (AST-enforced
  by tests/test_plan_shapes.py).
- The scenario sweep (simulate_strategies) composes the
  SyntheticDataGenerator.ensemble_branch_data generator over a
  noise × error-correlation grid — the simulation half the reference
  performs by loading alternative model sets — and ranks the seven
  strategies across scenarios.

The class never calls numpy/scipy on row data; driver-side work is
O(models²) scalars.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from workbench_spark.operators.ensembles import (
    _branch_weights,
    _safe_corr,
    strategy_comparison,
)
from workbench_spark.operators.metrics import _avg_rank

_ALPHAS = [round(0.05 * i, 2) for i in range(21)]


def _pop_std(cols: list) -> "F.Column":
    """Population std across the row's branch predictions (numpy
    .std(axis=1) default ddof=0), as one codegen'd expression."""
    m = len(cols)
    mean = sum(cols[1:], cols[0]) / m
    var = sum((c * c for c in cols[1:]), cols[0] * cols[0]) / m - mean * mean
    return F.sqrt(F.greatest(var, F.lit(0.0)))


def ensemble_confidence_col(
    pred_cols: list, conf_cols: list, corr_scale: list[float],
    model_weights: list[float], alpha: float,
) -> "F.Column":
    """ensemble_utils.ensemble_confidence (py:27-57) as a column:
    alpha·agreement + (1−alpha)·cal_conf with agreement = 1/(1+pred_std)
    and cal_conf = Σ cᵢ·scaleᵢ·wᵢ."""
    agreement = 1.0 / (1.0 + _pop_std(pred_cols))
    cal = sum(
        (c * F.lit(s) * F.lit(w) for c, s, w in zip(conf_cols[1:], corr_scale[1:], model_weights[1:])),
        conf_cols[0] * F.lit(corr_scale[0]) * F.lit(model_weights[0]),
    )
    return F.lit(alpha) * agreement + F.lit(1.0 - alpha) * cal


class EnsembleSimulator:
    """Analyze whether an ensemble of child models beats the individuals,
    from their aligned prediction frames.

    ``predictions`` maps model name → DataFrame with (id_column, target,
    prediction[, confidence]); a missing confidence column is treated as
    constant 0 (conf_error_corr 0.0, the reference's fallback). Use
    ``EnsembleSimulator.from_endpoints`` to load the S16 capture dirs the
    Endpoint.inference(capture=True) path writes.
    """

    def __init__(
        self,
        predictions: dict[str, DataFrame],
        id_column: str = "id",
        target_column: str | None = None,
        exact: bool = True,
    ):
        if len(predictions) < 2:
            raise ValueError("EnsembleSimulator needs at least 2 models")
        self.model_names = list(predictions)
        self.id_column = id_column
        self.exact = exact
        first = next(iter(predictions.values()))
        if target_column is None:
            cands = [c for c in first.columns if c not in (id_column, "prediction", "confidence")]
            if not cands:
                raise ValueError("cannot infer target column; pass target_column=")
            target_column = cands[0]
        self.target_column = target_column
        combined = None
        for name, df in predictions.items():
            conf = (
                F.col("confidence").cast("double")
                if "confidence" in df.columns
                else F.lit(0.0)
            )
            part = df.select(
                F.col(id_column),
                F.col(target_column).cast("double").alias("__tgt"),
                F.col("prediction").cast("double").alias(f"{name}_pred"),
                conf.alias(f"{name}_conf"),
            )
            if combined is None:
                combined = part
            else:
                # inner join = the reference's common-id intersection
                combined = combined.join(part.drop("__tgt"), id_column)
        self.combined = combined.withColumnRenamed("__tgt", "target").persist()
        self.pred_cols = [f"{n}_pred" for n in self.model_names]
        self.conf_cols = [f"{n}_conf" for n in self.model_names]
        self._params: dict | None = None

    @classmethod
    def from_endpoints(
        cls,
        spark: SparkSession,
        endpoint_names: list[str],
        id_column: str = "id",
        target_column: str | None = None,
        registry=None,
        **kw,
    ) -> "EnsembleSimulator":
        """Load each endpoint's S16 capture directory (the JSONL frames
        Endpoint.inference(capture=True) appends) — the reference's
        get_inference_predictions path."""
        import os

        from workbench_spark.api.registry import Registry

        reg = registry or Registry()
        frames = {}
        for name in endpoint_names:
            cap = os.path.join(reg.artifact_dir(name), "capture")
            if not os.path.isdir(cap):
                raise ValueError(
                    f"No inference capture found for endpoint '{name}'. "
                    "Run endpoint inference first."
                )
            frames[name] = spark.read.json(cap)
        return cls(frames, id_column=id_column, target_column=target_column, **kw)

    def release(self) -> None:
        self.combined.unpersist()

    # ------------------------------------------------------------ helpers
    def _spearman_many(self, df: DataFrame, pairs: list[tuple]) -> list[float]:
        """Spearman for many (col_expr, col_expr) pairs in two passes:
        one projection adding average-ranks (exact mode: rank windows —
        single-task sorts, the documented exact path for calibration-sized
        frames; approx mode: 1000-bucket quantile ranks, the scale path),
        one aggregation of all the Pearson corrs over the ranks.

        Expressions are deduped by their string form, so a shared column
        (the alpha sweep ranks ONE error column against 21 blends) is
        projected and ranked exactly once."""
        uniq: dict[str, str] = {}
        proj = df
        keyed = []
        for a, b in pairs:
            ks = []
            for e in (a, b):
                key = str(e)
                if key not in uniq:
                    name = f"__s_{len(uniq)}"
                    uniq[key] = name
                    proj = proj.withColumn(name, e)
                ks.append(uniq[key])
            keyed.append(tuple(ks))
        flat = list(uniq.values())
        if self.exact:
            ranked = proj.select(*[_avg_rank(c).alias(f"r{c}") for c in flat])
        else:
            buckets = 1000
            probs = [i / buckets for i in range(1, buckets)]
            proj = proj.persist()
            cuts = {c: proj.approxQuantile(c, probs, 1e-4) for c in flat}

            def bucket(c):
                arr = F.array(*[F.lit(float(x)) for x in cuts[c]])
                return F.size(F.filter(arr, lambda x: x <= F.col(c).cast("double")))

            ranked = proj.select(*[bucket(c).alias(f"r{c}") for c in flat])
        row = ranked.agg(
            *[
                _safe_corr(F.col(f"r{a}"), F.col(f"r{b}")).alias(f"c{i}")
                for i, (a, b) in enumerate(keyed)
            ]
        ).collect()[0]
        if not self.exact:
            proj.unpersist()
        return [float(row[f"c{i}"]) if row[f"c{i}"] is not None else 0.0 for i in range(len(pairs))]

    def _base_params(self) -> dict:
        """One aggregation pass for the shared strategy parameters:
        per-model MAE, inverse-MAE weights, |conf-error Pearson| scale."""
        if self._params is not None:
            return self._params
        tgt = F.col("target")
        row = self.combined.agg(
            *[F.avg(F.abs(F.col(p) - tgt)).alias(f"mae_{i}") for i, p in enumerate(self.pred_cols)],
            *[
                _safe_corr(F.col(c), F.abs(F.col(p) - tgt)).alias(f"cec_{i}")
                for i, (p, c) in enumerate(zip(self.pred_cols, self.conf_cols))
            ],
        ).collect()[0]
        m = len(self.pred_cols)
        maes = [float(row[f"mae_{i}"]) for i in range(m)]
        inv = [1.0 / max(x, 1e-12) for x in maes]
        weights = [w / sum(inv) for w in inv]
        cec = [float(row[f"cec_{i}"]) if row[f"cec_{i}"] is not None else 0.0 for i in range(m)]
        self._params = {
            "maes": maes,
            "weights": weights,
            "conf_error_corr": cec,
            "corr_scale": [abs(x) for x in cec],
        }
        return self._params

    # ---------------------------------------------------------- analyses
    def model_performance(self) -> DataFrame:
        """Per-model rmse/mae/r2/spearman/mean_conf/conf_err_corr
        (py:307-342) — one agg pass + one Spearman pass."""
        tgt = F.col("target")
        m = len(self.pred_cols)
        row = self.combined.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(tgt).alias("ybar"),
            F.sum(tgt * tgt).alias("syy"),
            *[F.sum(F.pow(F.col(p) - tgt, 2)).alias(f"sse_{i}") for i, p in enumerate(self.pred_cols)],
            *[F.avg(F.abs(F.col(p) - tgt)).alias(f"mae_{i}") for i, p in enumerate(self.pred_cols)],
            *[F.avg(F.col(c)).alias(f"mc_{i}") for i, c in enumerate(self.conf_cols)],
        ).collect()[0]
        spear = self._spearman_many(
            self.combined, [(tgt, F.col(p)) for p in self.pred_cols]
        )
        cec = self._base_params()["conf_error_corr"]
        sst = row["syy"] - row["n"] * row["ybar"] ** 2
        recs = []
        for i, name in enumerate(self.model_names):
            sse = float(row[f"sse_{i}"])
            recs.append(
                (
                    name,
                    math.sqrt(sse / row["n"]),
                    float(row[f"mae_{i}"]),
                    1.0 - sse / sst if sst > 0 else float("nan"),
                    spear[i],
                    float(row[f"mc_{i}"]),
                    cec[i],
                )
            )
        return self.combined.sparkSession.createDataFrame(
            recs,
            "model string, rmse double, mae double, r2 double, "
            "spearman double, mean_conf double, conf_err_corr double",
        )

    def residual_correlations(self) -> DataFrame:
        """Pairwise Pearson + Spearman correlation of residuals
        (py:235-259) — long form (model_a, model_b, pearson, spearman);
        low correlation = diverse errors = ensemble upside."""
        tgt = F.col("target")
        res = {n: F.col(p) - tgt for n, p in zip(self.model_names, self.pred_cols)}
        pairs = [
            (a, b)
            for i, a in enumerate(self.model_names)
            for b in self.model_names[i + 1:]
        ]
        row = self.combined.agg(
            *[
                _safe_corr(res[a], res[b]).alias(f"p_{i}")
                for i, (a, b) in enumerate(pairs)
            ]
        ).collect()[0]
        spear = self._spearman_many(self.combined, [(res[a], res[b]) for a, b in pairs])
        recs = [
            (a, b, float(row[f"p_{i}"]) if row[f"p_{i}"] is not None else 0.0, spear[i])
            for i, (a, b) in enumerate(pairs)
        ]
        return self.combined.sparkSession.createDataFrame(
            recs, "model_a string, model_b string, pearson double, spearman double"
        )

    @staticmethod
    def _quartile_bucket(col: str, cuts: list) -> "F.Column":
        """Map-side quartile assignment from three pre-computed cut points:
        q = 1 + #cuts strictly below the value (sum-of-booleans, codegen'd,
        no window). The scale twin of ``ntile(4)`` — equal-count bins become
        value-quantile bins, identical for continuous scores, and ties at a
        boundary land in one bin instead of being split by sort order.

        ``cuts`` may be None (percentile_approx over an all-null or empty
        column) — then every row lands in bucket 1 and the quartile table
        is padded to 4 zero-count rows downstream."""
        b = F.lit(1)
        for cut in cuts or []:
            if cut is None:
                continue
            b = b + (F.col(col) > F.lit(float(cut))).cast("int")
        return b

    @staticmethod
    def _pad_quartiles(rows: list) -> list:
        """Both exact (ntile) and sketch (cut-point) modes can return fewer
        than 4 quartile rows — ntile on <4 rows, tied cut points collapsing
        buckets, or all-null cuts. Pad the missing quartiles with zero-count
        rows so consumers always see the same 4-row shape in either mode."""
        present = {r["q"] for r in rows}
        pad = [
            {"q": q, "mean": 0.0, "median": 0.0, "count": 0}
            for q in range(1, 5)
            if q not in present
        ]
        out = list(rows) + pad
        out.sort(key=lambda r: r["q"])
        return out

    def confidence_analysis(self) -> dict[str, dict]:
        """Per-model confidence stats + Pearson/Spearman vs |residual| +
        error-by-confidence-quartile table (py:192-233).

        Quartile tables honor the ``exact=`` switch: exact mode keeps the
        reference's equal-count ``ntile(4)`` (a global sort — the documented
        calibration-frame path); ``exact=False`` derives the three cut points
        with ``percentile_approx`` and buckets with a when-chain (the
        operators.proba.confidence_profile scale pattern) — ONE stacked
        partial-aggregable groupBy for all M models, no global sort, and the
        per-bucket median switches to ``percentile_approx`` so no aggregation
        buffer holds a bucket's full value list."""
        tgt = F.col("target")
        m = len(self.model_names)
        row = self.combined.agg(
            *[
                e
                for i, c in enumerate(self.conf_cols)
                for e in (
                    F.avg(F.col(c)).alias(f"m_{i}"),
                    F.stddev(F.col(c)).alias(f"s_{i}"),
                    F.min(F.col(c)).alias(f"lo_{i}"),
                    F.max(F.col(c)).alias(f"hi_{i}"),
                )
            ]
        ).collect()[0]
        spear = self._spearman_many(
            self.combined,
            [
                (F.col(c), F.abs(F.col(p) - tgt))
                for p, c in zip(self.pred_cols, self.conf_cols)
            ],
        )
        cec = self._base_params()["conf_error_corr"]
        tables: dict[int, list] = {}
        if self.exact:
            for i in range(m):
                tables[i] = (
                    self.combined.select(
                        F.ntile(4).over(Window.orderBy(F.col(self.conf_cols[i]))).alias("q"),
                        F.abs(F.col(self.pred_cols[i]) - tgt).alias("ae"),
                    )
                    .groupBy("q")
                    .agg(
                        F.avg("ae").alias("mean"),
                        F.median("ae").alias("median"),
                        F.count(F.lit(1)).alias("count"),
                    )
                    .orderBy("q")
                    .collect()
                )
        else:
            cuts_row = self.combined.agg(
                *[
                    F.percentile_approx(F.col(c), [0.25, 0.5, 0.75], 10000).alias(f"cut_{i}")
                    for i, c in enumerate(self.conf_cols)
                ]
            ).collect()[0]
            stacked = self.combined.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(i).alias("mi"),
                                self._quartile_bucket(
                                    self.conf_cols[i], cuts_row[f"cut_{i}"]
                                ).alias("q"),
                                F.abs(F.col(self.pred_cols[i]) - tgt).alias("ae"),
                            )
                            for i in range(m)
                        ]
                    )
                ).alias("s")
            ).select("s.mi", "s.q", "s.ae")
            qrows = (
                stacked.groupBy("mi", "q")
                .agg(
                    F.avg("ae").alias("mean"),
                    F.percentile_approx("ae", 0.5, 10000).alias("median"),
                    F.count(F.lit(1)).alias("count"),
                )
                .collect()
            )
            for r in qrows:
                tables.setdefault(r["mi"], []).append(r)
            for i in tables:
                tables[i].sort(key=lambda r: r["q"])
        out = {}
        for i, name in enumerate(self.model_names):
            out[name] = {
                "mean_conf": float(row[f"m_{i}"]),
                "std_conf": float(row[f"s_{i}"]) if row[f"s_{i}"] is not None else 0.0,
                "min_conf": float(row[f"lo_{i}"]),
                "max_conf": float(row[f"hi_{i}"]),
                "pearson_r": cec[i],
                "spearman_r": spear[i],
                "error_by_quartile": [
                    {"quartile": r["q"], "mean": r["mean"], "median": r["median"], "count": r["count"]}
                    for r in self._pad_quartiles(tables.get(i, []))
                ],
            }
        return out

    def model_agreement(self) -> dict:
        """Disagreement (pred std across models per row) vs ensemble error
        (py:261-305): Spearman + error-by-disagreement-quartile."""
        tgt = F.col("target")
        preds = [F.col(p) for p in self.pred_cols]
        std = _pop_std(preds)
        mean = sum(preds[1:], preds[0]) / len(preds)
        frame = self.combined.select(
            std.alias("__std"), F.abs(mean - tgt).alias("__eae")
        ).persist()
        med_expr = (
            F.median("__std")
            if self.exact
            else F.percentile_approx("__std", 0.5, 10000)
        )
        agg_exprs = [
            F.avg("__std").alias("mu"),
            med_expr.alias("med"),
            F.max("__std").alias("mx"),
        ]
        if not self.exact:
            # one extra sketch in the SAME pass: quartile cut points for the
            # map-side bucket assignment below (no global ntile sort).
            agg_exprs.append(
                F.percentile_approx("__std", [0.25, 0.5, 0.75], 10000).alias("cuts")
            )
        row = frame.agg(*agg_exprs).collect()[0]
        corr = self._spearman_many(frame, [(F.col("__std"), F.col("__eae"))])[0]
        if self.exact:
            q_col = F.ntile(4).over(Window.orderBy(F.col("__std"))).alias("q")
            med_ae = F.median("__eae")
        else:
            q_col = self._quartile_bucket("__std", row["cuts"]).alias("q")
            med_ae = F.percentile_approx("__eae", 0.5, 10000)
        quart = (
            frame.select(q_col, "__eae")
            .groupBy("q")
            .agg(
                F.avg("__eae").alias("mean"),
                med_ae.alias("median"),
                F.count(F.lit(1)).alias("count"),
            )
            .orderBy("q")
            .collect()
        )
        frame.unpersist()
        return {
            "mean_disagreement": float(row["mu"]),
            "median_disagreement": float(row["med"]),
            "max_disagreement": float(row["mx"]),
            "disagreement_error_corr": corr,
            "error_by_quartile": [
                {"quartile": r["q"], "mean": r["mean"], "median": r["median"], "count": r["count"]}
                for r in self._pad_quartiles(quart)
            ],
        }

    def ensemble_weights(self) -> dict[str, float]:
        """Inverse-MAE static weights (py:344-366)."""
        return dict(zip(self.model_names, self._base_params()["weights"]))

    def strategy_comparison(self) -> DataFrame:
        """Seven strategies ranked by MAE (py:368-456) — delegates to the
        distributed operators.ensembles.strategy_comparison."""
        return strategy_comparison(
            self.combined, self.pred_cols, self.conf_cols, "target"
        )

    def confidence_weight_distribution(self) -> DataFrame:
        """Per-model confidence-weight stats + share of rows where the
        model carries the highest weight (py:458-488). Weights are the
        raw per-row normalization cᵢ/Σc (NULL on all-zero rows, matching
        the reference's NaN)."""
        confs = [F.col(c) for c in self.conf_cols]
        total = sum(confs[1:], confs[0])
        ws = [F.try_divide(c, total) for c in confs]
        # winner = first model attaining the row max (pandas idxmax rule)
        mx = F.greatest(*ws) if len(ws) > 1 else ws[0]
        winner = F.coalesce(
            *[F.when(w == mx, F.lit(i)) for i, w in enumerate(ws)]
        )
        row = self.combined.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                e
                for i, w in enumerate(ws)
                for e in (
                    F.avg(w).alias(f"m_{i}"),
                    F.stddev(w).alias(f"s_{i}"),
                    F.min(w).alias(f"lo_{i}"),
                    F.max(w).alias(f"hi_{i}"),
                    F.sum((winner == i).cast("long")).alias(f"w_{i}"),
                )
            ],
        ).collect()[0]
        recs = [
            (
                name,
                float(row[f"m_{i}"]) if row[f"m_{i}"] is not None else float("nan"),
                float(row[f"s_{i}"]) if row[f"s_{i}"] is not None else float("nan"),
                float(row[f"lo_{i}"]) if row[f"lo_{i}"] is not None else float("nan"),
                float(row[f"hi_{i}"]) if row[f"hi_{i}"] is not None else float("nan"),
                int(row[f"w_{i}"]),
                float(row[f"w_{i}"]) / row["n"],
            )
            for i, name in enumerate(self.model_names)
        ]
        return self.combined.sparkSession.createDataFrame(
            recs,
            "model string, mean_weight double, std_weight double, min_weight double, "
            "max_weight double, n_highest long, highest_frac double",
        )

    def _alpha_sweep(self, err_col: "F.Column") -> tuple[float, float, list[dict]]:
        """Spearman(blended-confidence, |err|) over the 21-point alpha grid
        in ONE rank projection + ONE corr aggregation (the reference loops
        21 scipy spearmans)."""
        p = self._base_params()
        preds = [F.col(c) for c in self.pred_cols]
        confs = [F.col(c) for c in self.conf_cols]
        pairs = [
            (
                ensemble_confidence_col(preds, confs, p["corr_scale"], p["weights"], a),
                err_col,
            )
            for a in _ALPHAS
        ]
        corrs = self._spearman_many(self.combined, pairs)
        sweep = [{"alpha": a, "conf_error_corr": c} for a, c in zip(_ALPHAS, corrs)]
        # more negative = better; ties at equal corr go to the SMALLEST
        # alpha (the reference's strict < scan from alpha=0 upward)
        best = min(sweep, key=lambda r: (r["conf_error_corr"], r["alpha"]))
        return best["alpha"], best["conf_error_corr"], sweep

    def ensemble_confidence_analysis(self) -> dict:
        """Blend agreement with calibrated confidence and grid-search the
        blend (py:490-564)."""
        preds = [F.col(p) for p in self.pred_cols]
        err = F.abs(sum(preds[1:], preds[0]) / len(preds) - F.col("target"))
        best_alpha, best_corr, sweep = self._alpha_sweep(err)
        return {
            "agreement_corr": sweep[-1]["conf_error_corr"],
            "calibrated_conf_corr": sweep[0]["conf_error_corr"],
            "best_alpha": best_alpha,
            "best_blend_corr": best_corr,
            "alpha_sweep": sweep,
        }

    # ------------------------------------------------- strategy machinery
    def _strategy_exprs(self, names: list[str], pretty: bool) -> dict:
        """The strategy prediction expressions over a model subset, with
        either display names (py:368-456) or config keys (py:686-763)."""
        idx = [self.model_names.index(n) for n in names]
        preds = [F.col(self.pred_cols[i]) for i in idx]
        confs = [F.col(self.conf_cols[i]) for i in idx]
        p = self._base_params()
        maes = [p["maes"][i] for i in idx]
        cs = [p["corr_scale"][i] for i in idx]
        inv = [1.0 / max(x, 1e-12) for x in maes]
        mw = [w / sum(inv) for w in inv]
        m = len(names)

        def blended(weights):
            return sum((pr * w for pr, w in zip(preds[1:], weights[1:])), preds[0] * weights[0])

        best_i = min(range(m), key=lambda i: maes[i])
        worst_i = max(range(m), key=lambda i: maes[i])
        out = {
            ("Simple Mean" if pretty else "simple_mean"): sum(preds[1:], preds[0]) / m,
            ("Confidence-Weighted" if pretty else "confidence_weighted"): blended(
                _branch_weights(confs, None, mw)
            ),
            ("Inverse-MAE Weighted" if pretty else "inverse_mae_weighted"): blended(
                [F.lit(w) for w in mw]
            ),
            ("Scaled Conf-Weighted" if pretty else "scaled_conf_weighted"): blended(
                _branch_weights(confs, [c * F.lit(w) for c, w in zip(confs, mw)], mw)
            ),
            ("Calibrated Conf-Weighted" if pretty else "calibrated_conf_weighted"): blended(
                _branch_weights(confs, [c * F.lit(s) for c, s in zip(confs, cs)], mw)
            ),
        }
        if pretty:
            out[f"Best Model Only ({names[best_i]})"] = preds[best_i]
        if m > 2:
            keep = [pr for i, pr in enumerate(preds) if i != worst_i]
            out[
                f"Drop Worst ({names[worst_i]})" if pretty else "drop_worst"
            ] = sum(keep[1:], keep[0]) / len(keep)
        return out, mw, cs, names[worst_i]

    def _compute_strategy_config(self, names: list[str]) -> dict:
        """Best strategy + deployable parameters over a model subset
        (py:686-763): snake_case strategy keys, model weights, corr scale,
        and the optimal confidence-blend alpha."""
        strategies, mw, cs, worst = self._strategy_exprs(names, pretty=False)
        row = self.combined.agg(
            *[
                F.avg(F.abs(e - F.col("target"))).alias(f"s_{i}")
                for i, e in enumerate(strategies.values())
            ]
        ).collect()[0]
        maes = {n: float(row[f"s_{i}"]) for i, n in enumerate(strategies)}
        best = min(maes, key=lambda n: (maes[n], n))
        best_alpha, best_corr, _ = self._alpha_sweep(
            F.abs(strategies[best] - F.col("target"))
        )
        return {
            "aggregation_strategy": best,
            "model_weights": dict(zip(names, mw)),
            "corr_scale": dict(zip(names, cs)),
            "optimal_alpha": best_alpha,
            "endpoints": list(names),
            "target_column": self.target_column,
            "strategy_maes": maes,
            "_worst_model": worst,
        }

    def get_best_strategy_config(self) -> dict:
        """py:659-684 — and when drop_worst wins, re-evaluate on the
        reduced model set (the deployed endpoint only aggregates the
        survivors)."""
        config = self._compute_strategy_config(self.model_names)
        if config["aggregation_strategy"] == "drop_worst":
            remaining = [n for n in self.model_names if n != config["_worst_model"]]
            config = self._compute_strategy_config(remaining)
        config.pop("_worst_model", None)
        return config

    def best_ensemble_predictions(self) -> DataFrame:
        """Predictions of the best strategy with blended ensemble
        confidence at the optimal alpha (py:566-657): (id, target,
        prediction, confidence, residual, abs_residual)."""
        p = self._base_params()
        strategies, _, _, _ = self._strategy_exprs(self.model_names, pretty=True)
        # py:601-612 — the Best-Model-Only degenerate "ensemble" is
        # excluded from this surface
        strategies = {
            k: v for k, v in strategies.items() if not k.startswith("Best Model Only")
        }
        row = self.combined.agg(
            *[
                F.avg(F.abs(e - F.col("target"))).alias(f"s_{i}")
                for i, e in enumerate(strategies.values())
            ]
        ).collect()[0]
        maes = {n: float(row[f"s_{i}"]) for i, n in enumerate(strategies)}
        best = min(maes, key=lambda n: (maes[n], n))
        best_expr = strategies[best]
        best_alpha, _, _ = self._alpha_sweep(F.abs(best_expr - F.col("target")))
        conf = ensemble_confidence_col(
            [F.col(c) for c in self.pred_cols],
            [F.col(c) for c in self.conf_cols],
            p["corr_scale"],
            p["weights"],
            best_alpha,
        )
        return self.combined.select(
            F.col(self.id_column),
            F.col("target").alias(self.target_column),
            best_expr.alias("prediction"),
            conf.alias("confidence"),
            (best_expr - F.col("target")).alias("residual"),
            F.abs(best_expr - F.col("target")).alias("abs_residual"),
        )

    def ensemble_failure_analysis(self) -> dict:
        """Best true ensemble vs best single model, with per-row win rates
        and conditional error means (py:764-863)."""
        p = self._base_params()
        tgt = F.col("target")
        strategies, _, _, _ = self._strategy_exprs(self.model_names, pretty=True)
        strategies = {
            k: v for k, v in strategies.items() if not k.startswith("Best Model Only")
        }
        row = self.combined.agg(
            *[
                F.avg(F.abs(e - tgt)).alias(f"s_{i}")
                for i, e in enumerate(strategies.values())
            ]
        ).collect()[0]
        maes = {n: float(row[f"s_{i}"]) for i, n in enumerate(strategies)}
        best_strategy = min(maes, key=lambda n: (maes[n], n))
        best_i = min(range(len(self.model_names)), key=lambda i: p["maes"][i])
        best_model = self.model_names[best_i]
        ens_err = F.abs(strategies[best_strategy] - tgt)
        mdl_err = F.abs(F.col(self.pred_cols[best_i]) - tgt)
        win = ens_err < mdl_err
        r = self.combined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(win.cast("long")).alias("wins"),
            F.avg(F.when(win, ens_err)).alias("win_ens"),
            F.avg(F.when(win, mdl_err)).alias("win_mdl"),
            F.avg(F.when(~win, ens_err)).alias("lose_ens"),
            F.avg(F.when(~win, mdl_err)).alias("lose_mdl"),
        ).collect()[0]
        return {
            "ensemble_mae": maes[best_strategy],
            "best_strategy": best_strategy,
            "best_model": best_model,
            "best_model_mae": p["maes"][best_i],
            "ensemble_win_rate": r["wins"] / r["n"],
            "when_ensemble_wins": {"ensemble_err": r["win_ens"], "best_model_err": r["win_mdl"]},
            "when_model_wins": {"ensemble_err": r["lose_ens"], "best_model_err": r["lose_mdl"]},
        }

    def reproduce_deployed(
        self,
        aggregation_strategy: str,
        model_weights: dict[str, float],
        corr_scale: dict[str, float] | None = None,
        optimal_alpha: float = 0.5,
        endpoint_to_model: dict[str, str] | None = None,
    ) -> DataFrame:
        """Replay the deployed meta-endpoint aggregation 1:1 (py:86-174):
        (id, target, prediction, prediction_std, confidence)."""
        names = self.model_names
        if endpoint_to_model:
            back = {m: ep for ep, m in endpoint_to_model.items()}
            mw = [model_weights.get(back.get(n, n), 1.0) for n in names]
            cs = [(corr_scale or {}).get(back.get(n, n), 1.0) for n in names]
        else:
            mw = [model_weights.get(n, 1.0) for n in names]
            cs = [(corr_scale or {}).get(n, 1.0) for n in names]
        total = sum(mw)
        mw = [w / total for w in mw] if total > 0 else [1.0 / len(names)] * len(names)
        preds = [F.col(p) for p in self.pred_cols]
        confs = [F.col(c) for c in self.conf_cols]
        key = aggregation_strategy
        if key == "simple_mean":
            pred = sum(preds[1:], preds[0]) / len(preds)
        elif key == "inverse_mae_weighted":
            pred = sum((p * F.lit(w) for p, w in zip(preds[1:], mw[1:])), preds[0] * F.lit(mw[0]))
        elif key == "confidence_weighted":
            ws = _branch_weights(confs, None, mw)
            pred = sum((p * w for p, w in zip(preds[1:], ws[1:])), preds[0] * ws[0])
        elif key == "scaled_conf_weighted":
            ws = _branch_weights(confs, [c * F.lit(w) for c, w in zip(confs, mw)], mw)
            pred = sum((p * w for p, w in zip(preds[1:], ws[1:])), preds[0] * ws[0])
        elif key == "calibrated_conf_weighted":
            ws = _branch_weights(confs, [c * F.lit(s) for c, s in zip(confs, cs)], mw)
            pred = sum((p * w for p, w in zip(preds[1:], ws[1:])), preds[0] * ws[0])
        else:
            raise ValueError(f"unknown aggregation_strategy: {aggregation_strategy}")
        conf = ensemble_confidence_col(preds, confs, cs, mw, optimal_alpha)
        return self.combined.select(
            F.col(self.id_column),
            F.col("target").alias(self.target_column),
            pred.alias("prediction"),
            _pop_std(preds).alias("prediction_std"),
            conf.alias("confidence"),
        )

    def report(self, details: bool = False) -> dict:
        """The py:175-190 composite — runs the full analysis stack and
        returns everything as one dict (printing is the caller's concern;
        a distributed engine returns data)."""
        out = {
            "model_performance": self.model_performance().collect(),
            "residual_correlations": self.residual_correlations().collect(),
            "strategy_comparison": self.strategy_comparison().collect(),
            "ensemble_confidence_analysis": self.ensemble_confidence_analysis(),
            "ensemble_failure_analysis": self.ensemble_failure_analysis(),
        }
        if details:
            out["confidence_analysis"] = self.confidence_analysis()
            out["model_agreement"] = self.model_agreement()
            out["ensemble_weights"] = self.ensemble_weights()
            out["confidence_weight_distribution"] = (
                self.confidence_weight_distribution().collect()
            )
        return out


# ------------------------------------------------------------- scenario sweep
def simulate_strategies(
    spark: SparkSession,
    scenarios: list[dict] | None = None,
    n_rows: int = 2000,
    n_branches: int = 3,
    seed: int = 42,
) -> DataFrame:
    """The simulation half of EnsembleSimulator: synthesize child-model
    branches over a noise × error-correlation × confidence-quality grid
    (SyntheticDataGenerator.ensemble_branch_data) and rank the seven
    strategies within each scenario. Output: one row per
    (scenario, strategy) with the scenario knobs, the strategy MAE, and
    its within-scenario rank (1 = best, MAE then name tiebreak).

    Each scenario is an independent distributed strategy_comparison (two
    aggregation passes over n_rows); the scenario loop is driver-side
    over a handful of parameter dicts — O(#scenarios) scalars. Use
    rank_strategies() for the cross-scenario aggregate ranking."""
    from workbench_spark.api.synthetic import SyntheticDataGenerator

    if scenarios is None:
        scenarios = [
            {"noise": nz, "error_corr": ec, "conf_quality": 0.6}
            for nz in (0.5, 1.5)
            for ec in (0.0, 0.5, 0.9)
        ]
    gen = SyntheticDataGenerator(spark, seed=seed)
    pred_cols = [f"p_{i}" for i in range(n_branches)]
    conf_cols = [f"c_{i}" for i in range(n_branches)]
    out = None
    for s_id, sc in enumerate(scenarios):
        branches = gen.ensemble_branch_data(
            n_samples=n_rows, n_branches=n_branches, **sc
        )
        cmp = strategy_comparison(branches, pred_cols, conf_cols, "target")
        rows = cmp.collect()  # 7 rows — strategy scalars, driver-side rank
        ranked = sorted(rows, key=lambda r: (r["mae"], r["strategy"]))
        recs = [
            (
                s_id,
                float(sc["noise"]),
                float(sc["error_corr"]),
                float(sc.get("conf_quality", 0.6)),
                r["strategy"],
                float(r["mae"]),
                rank + 1,
            )
            for rank, r in enumerate(ranked)
        ]
        part = spark.createDataFrame(
            recs,
            "scenario int, noise double, error_corr double, conf_quality double, "
            "strategy string, mae double, rank int",
        )
        out = part if out is None else out.unionByName(part)
    return out


def rank_strategies(sweep: DataFrame) -> DataFrame:
    """Cross-scenario ranking of a simulate_strategies sweep: per strategy,
    the mean rank, number of scenario wins, and mean MAE — best mean rank
    first (the 'which strategy should we deploy overall' answer)."""
    return (
        sweep.groupBy("strategy")
        .agg(
            F.avg("rank").alias("mean_rank"),
            F.sum((F.col("rank") == 1).cast("long")).alias("wins"),
            F.avg("mae").alias("mean_mae"),
            F.count(F.lit(1)).alias("n_scenarios"),
        )
        .orderBy("mean_rank", "strategy")
    )
