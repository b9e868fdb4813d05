"""Hyperparameter-search harness (SURVEY §2.12 training tier).

Reference surface being re-expressed (reference = SuperCowPowers/workbench):
- search-space specs + SearchSpace editor — training/hpo_harness.py:44-220
  (IntRange/FloatRange/Choice with defaults, `dist` wire form, to_frame)
- run_search / evaluate_configs / HpoResult — hpo_harness.py:232-337
- shortlist + finalist re-rank with the baseline riding along —
  hpo_runner.py:528-660 (winner's-curse correction: the search's minimum
  is optimistically biased, so finalists AND the caller's baseline are
  re-scored independently and a searched config publishes only by beating
  a measured baseline; ties go to the baseline)
- trial records / summary — hpo_runner.py:384-527

Spark-first divergences (deliberate, documented):
- The reference samples with Optuna TPE and offloads parallel trials to
  Ray Tune; neither library is a dependency here. The sampler is seeded
  RANDOM SEARCH (Bergstra & Bengio, JMLR 2012 — at equal budget random
  search dominates grid search whenever some knobs matter more than
  others), and parallelism comes from Spark itself: `mllib_search` wraps
  pyspark.ml.tuning CrossValidator / TrainValidationSplit, so every
  candidate's *training* is already distributed across the cluster and
  the tuner additionally evaluates `parallelism` candidates concurrently.
  At 100 TB the per-trial fit is the dominant cost and it scales with the
  cluster; the search loop itself is O(n_trials) driver-side scalars.
- The reference's per-framework spaces (xgb_hpo.py:36-51) use XGBoost
  knob names; the shipped spaces here use the MLlib Param names of the
  estimators Model.train builds, so a winning config feeds Model.train
  verbatim.

Provenance note (copy hygiene): the IntRange/FloatRange/Choice spec
dataclasses below are declarative data contracts — their field names,
validation rules, and ``to_dict`` wire form are transcribed from the
reference's hpo_harness.py:44-220 ON PURPOSE, because API parity requires
the wire form to match byte-for-byte. The reference is MIT-licensed
(SuperCowPowers/workbench LICENSE: "MIT License, Copyright (c) 2021-2026
SuperCowPowers LLC"); this section is used under that license with
attribution, the same
discipline as the published-coefficient tables in chem/crippen.py. All
search/tuner/re-rank logic in this module (mllib_search onward) is
original Spark-first work.
"""

from __future__ import annotations

import json
import math
import random
from dataclasses import dataclass, field
from typing import Callable, Sequence, Union

# --------------------------------------------------------------- specs


@dataclass(frozen=True)
class IntRange:
    """Integer knob sampled in [low, high] on a ``step`` grid
    (hpo_harness.py:47-62)."""

    low: int
    high: int
    step: int = 1
    default: Union[int, None] = None

    def __post_init__(self):
        if self.low >= self.high:
            raise ValueError(f"IntRange requires low < high (got {self.low} >= {self.high})")
        if self.step < 1:
            raise ValueError(f"IntRange step must be a positive integer (got {self.step})")

    def to_dict(self) -> dict:
        return _spec_dict("int", {"low": self.low, "high": self.high, "step": self.step}, self.default)

    def sample(self, rng: random.Random):
        n_steps = (self.high - self.low) // self.step
        return self.low + self.step * rng.randint(0, n_steps)


@dataclass(frozen=True)
class FloatRange:
    """Float knob in [low, high]; ``log`` samples log-uniformly, ``step``
    (linear only) quantizes to a grid (hpo_harness.py:65-84)."""

    low: float
    high: float
    step: Union[float, None] = None
    log: bool = False
    default: Union[float, None] = None

    def __post_init__(self):
        if self.low >= self.high:
            raise ValueError(f"FloatRange requires low < high (got {self.low} >= {self.high})")
        if self.log and self.low <= 0:
            raise ValueError(f"log-uniform sampling requires low > 0 (got {self.low})")

    def to_dict(self) -> dict:
        fields = {"low": self.low, "high": self.high, "step": self.step, "log": self.log}
        return _spec_dict("float", fields, self.default)

    def sample(self, rng: random.Random):
        if self.log:
            return math.exp(rng.uniform(math.log(self.low), math.log(self.high)))
        if self.step is not None:
            n_steps = int((self.high - self.low) / self.step)
            return min(self.high, self.low + self.step * rng.randint(0, n_steps))
        return rng.uniform(self.low, self.high)


@dataclass(frozen=True)
class Choice:
    """Categorical knob; options may be unhashable (hpo_harness.py:87-99)."""

    options: Sequence
    default: object = None

    def __post_init__(self):
        if not len(self.options):
            raise ValueError("Choice requires a non-empty options sequence")

    def to_dict(self) -> dict:
        return _spec_dict("choice", {"options": list(self.options)}, self.default)

    def sample(self, rng: random.Random):
        # sample an index, map back — keeps unhashable options legal, the
        # same reason the reference suggests categorical indices
        return list(self.options)[rng.randrange(len(self.options))]


Spec = Union[IntRange, FloatRange, Choice]
_SPEC_CLASSES = {"int": IntRange, "float": FloatRange, "choice": Choice}


def _spec_dict(dist: str, fields: dict, default) -> dict:
    out = {"dist": dist, **{k: v for k, v in fields.items() if v is not None}}
    if default is not None:
        out["default"] = default
    return out


def spec_from_dict(spec: dict) -> Spec:
    """Wire form → spec; ``dist`` required (``low: 1`` vs ``low: 1.0`` is
    too thin a signal to infer int vs float — hpo_harness.py:120-131)."""
    fields = dict(spec)
    dist = fields.pop("dist", None)
    if dist not in _SPEC_CLASSES:
        raise ValueError(f"spec dict must carry dist in {sorted(_SPEC_CLASSES)} (got {dist!r})")
    try:
        return _SPEC_CLASSES[dist](**fields)
    except TypeError as e:
        raise ValueError(f"invalid fields for dist={dist!r}: {e}") from e


# --------------------------------------------------------- search space

# Shipped spaces keyed by the algo names Model.train accepts; knob names
# are the MLlib Param names so best_config feeds Model.train(hyperparams=)
# verbatim. Defaults = the MLlib estimator defaults (the untuned baseline).
_FRAMEWORK_SPACES: dict[str, Callable[[], dict]] = {
    "gbt": lambda: {
        "maxDepth": IntRange(2, 10, 1, default=5),
        "maxIter": IntRange(10, 60, 5, default=20),
        "stepSize": FloatRange(0.01, 0.3, log=True, default=0.1),
        "subsamplingRate": FloatRange(0.5, 1.0, step=0.05, default=1.0),
        "minInstancesPerNode": IntRange(1, 30, 1, default=1),
    },
    "rf": lambda: {
        "numTrees": IntRange(10, 100, 10, default=20),
        "maxDepth": IntRange(2, 12, 1, default=5),
        "featureSubsetStrategy": Choice(["auto", "sqrt", "onethird", "all"], default="auto"),
        "minInstancesPerNode": IntRange(1, 30, 1, default=1),
    },
    "linear": lambda: {
        "regParam": FloatRange(1e-6, 1.0, log=True, default=0.0),
        "elasticNetParam": FloatRange(0.0, 1.0, step=0.1, default=0.0),
    },
    "logistic": lambda: {
        "regParam": FloatRange(1e-6, 1.0, log=True, default=0.0),
        "elasticNetParam": FloatRange(0.0, 1.0, step=0.1, default=0.0),
    },
}
_FRAMEWORK_SPACES["xgb"] = _FRAMEWORK_SPACES["gbt"]  # Model.train alias


class SearchSpace(dict):
    """A {knob: Spec} space with JSON in/out (hpo_harness.py:146-220).
    Subclasses dict so a plain dict works everywhere a SearchSpace does —
    start from a shipped space, adjust the knobs you have an opinion
    about, hand to `mllib_search` / `run_search`."""

    def __init__(self, framework: str | None = None, knobs: dict | None = None):
        if framework is not None and knobs is not None:
            raise ValueError("pass either framework= or knobs=, not both")
        self.framework = framework
        if framework is not None:
            if framework not in _FRAMEWORK_SPACES:
                raise ValueError(
                    f"No HPO search space for framework {framework!r} "
                    f"(have {sorted(_FRAMEWORK_SPACES)})"
                )
            super().__init__(_FRAMEWORK_SPACES[framework]())
        else:
            super().__init__(knobs or {})

    @classmethod
    def from_dict(cls, spec: dict) -> "SearchSpace":
        return cls(knobs={knob: spec_from_dict(f) for knob, f in spec.items()})

    def to_dict(self) -> dict:
        return {knob: spec.to_dict() for knob, spec in self.items()}

    def to_frame(self):
        """One row per knob: knob/default/dist + a spec JSON blob
        (hpo_harness.py:183-206). `default` stays object-typed — it holds
        each knob's native type, not a float upcast."""
        import pandas as pd

        rows = []
        for knob, spec in self.items():
            fields = spec.to_dict()
            rows.append((knob, fields.pop("default", None), fields.pop("dist"), json.dumps(fields)))
        return pd.DataFrame(
            {
                "knob": [r[0] for r in rows],
                "default": pd.Series([r[1] for r in rows], dtype=object),
                "dist": [r[2] for r in rows],
                "spec": [r[3] for r in rows],
            }
        )


def space_defaults(search_space: dict) -> dict:
    """{knob: default} — the untuned config the space searches around."""
    return {k: s.default for k, s in search_space.items()}


def sample_config(search_space: dict, rng: random.Random) -> dict:
    """One random config from the space (seeded — searches replay)."""
    return {k: s.sample(rng) for k, s in search_space.items()}


# ----------------------------------------------------------- run_search


@dataclass
class HpoResult:
    """Outcome of a search: winning config + a record of every trial
    (hpo_harness.py:228-238)."""

    best_config: dict
    best_value: float
    metric: str
    mode: str
    n_trials: int
    trials: list = field(default_factory=list)


def run_search(
    trial_fn: Callable[[dict], float],
    search_space: dict,
    *,
    n_trials: int = 20,
    metric: str = "holdout_mae",
    mode: str = "min",
    seed: int = 42,
) -> HpoResult:
    """Seeded random search: sample ``n_trials`` configs, score each with
    ``trial_fn(config) -> float``, rank explicitly. A trial that raises or
    returns NaN is recorded FAILED rather than aborting the search; zero
    usable trials raises with the reference's diagnostic (a NaN objective
    — e.g. an unlabeled target — fails every trial and would otherwise
    surface as an opaque 'no best trial')."""
    if mode not in ("min", "max"):
        raise ValueError(f"mode must be 'min' or 'max', got {mode!r}")
    rng = random.Random(seed)
    trials = []
    for i in range(n_trials):
        config = sample_config(search_space, rng)
        try:
            value = float(trial_fn(config))
            state = "FAILED" if math.isnan(value) else "COMPLETE"
        except Exception:
            value, state = None, "FAILED"
        trials.append({"number": i, "value": value, "state": state, "config": config})
    completed = [t for t in trials if t["state"] == "COMPLETE"]
    if not completed:
        states: dict = {}
        for t in trials:
            states[t["state"]] = states.get(t["state"], 0) + 1
        raise RuntimeError(
            f"HPO search produced no usable trial (states: {states}). If trials FAILED, "
            "a NaN objective is the usual cause — check the target column has non-NaN values."
        )
    best = min(completed, key=lambda t: t["value"]) if mode == "min" else max(
        completed, key=lambda t: t["value"]
    )
    return HpoResult(
        best_config=best["config"],
        best_value=best["value"],
        metric=metric,
        mode=mode,
        n_trials=len(trials),
        trials=trials,
    )


def evaluate_configs(
    eval_fn: Callable[[dict, int], float], configs: Sequence[dict]
) -> list:
    """Score a fixed list of configs — no sampling (hpo_harness.py:300-337).
    The confirmation/re-rank counterpart to run_search; None where scoring
    failed."""
    values = []
    for i, config in enumerate(list(configs)):
        try:
            v = float(eval_fn(config, i))
            values.append(None if math.isnan(v) else v)
        except Exception:
            values.append(None)
    return values


def shortlist_configs(trials: list, top_k: int, mode: str = "min") -> list:
    """The top-k completed configs, best first (hpo_runner.py:528-543)."""
    done = [t for t in trials if t["state"] == "COMPLETE" and t["value"] is not None]
    done.sort(key=lambda t: t["value"], reverse=(mode == "max"))
    return [t["config"] for t in done[:top_k]]


def rerank_finalists(
    eval_fn: Callable[[dict, int], float],
    result: HpoResult,
    *,
    top_k: int = 2,
) -> tuple[dict, dict]:
    """Winner's-curse correction (hpo_runner.py:545-660): re-score the
    baseline (empty config — estimator defaults) plus the search's top-k
    finalists with ``eval_fn`` (the caller gives it a FRESH seed/split —
    trials are deterministic, so the search seed would replay rather than
    redraw). A finalist publishes only by strictly beating the measured
    baseline; ties — and a baseline that failed to score — publish the
    baseline. Returns (winning_config, info) where info carries the
    per-candidate record."""
    if top_k <= 0:
        return result.best_config, {}
    candidates = [{}] + shortlist_configs(result.trials, top_k, result.mode)
    if len(candidates) == 1:
        return result.best_config, {}
    values = evaluate_configs(eval_fn, candidates)
    rows = [
        {
            "candidate": "baseline" if i == 0 else f"search_rank_{i}",
            "config": c,
            result.metric: v,
        }
        for i, (c, v) in enumerate(zip(candidates, values))
    ]
    info = {"candidates": rows, "baseline_value": values[0], "best_value": None}
    if values[0] is None:
        return {}, info
    better = (lambda a, b: a < b) if result.mode == "min" else (lambda a, b: a > b)
    win_i, win_v = 0, values[0]
    for i, v in enumerate(values[1:], start=1):
        if v is not None and better(v, win_v):
            win_i, win_v = i, v
    info["best_value"] = win_v
    return candidates[win_i], info


# ------------------------------------------------------- MLlib tuners

# metric registry: name -> (evaluator family, MLlib metricName). Mode is
# taken from the evaluator's own isLargerBetter, so CrossValidator and
# the explicit ranking here can never disagree about direction.
_METRICS = {
    "rmse": ("regression", "rmse"),
    "mse": ("regression", "mse"),
    "mae": ("regression", "mae"),
    "r2": ("regression", "r2"),
    "f1": ("multiclass", "f1"),
    "accuracy": ("multiclass", "accuracy"),
    "weighted_precision": ("multiclass", "weightedPrecision"),
    "weighted_recall": ("multiclass", "weightedRecall"),
    "log_loss": ("multiclass", "logLoss"),
    "auc": ("binary", "areaUnderROC"),
    "aupr": ("binary", "areaUnderPR"),
}


def _evaluator(metric: str, label_col: str):
    from pyspark.ml.evaluation import (
        BinaryClassificationEvaluator,
        MulticlassClassificationEvaluator,
        RegressionEvaluator,
    )

    if metric not in _METRICS:
        raise ValueError(f"unknown metric {metric!r} (have {sorted(_METRICS)})")
    family, name = _METRICS[metric]
    if family == "regression":
        return RegressionEvaluator(labelCol=label_col, predictionCol="prediction", metricName=name)
    if family == "multiclass":
        return MulticlassClassificationEvaluator(
            labelCol=label_col, predictionCol="prediction", metricName=name
        )
    return BinaryClassificationEvaluator(
        labelCol=label_col, rawPredictionCol="rawPrediction", metricName=name
    )


def _build_pipeline(target: str, features: list[str], model_type: str, algo: str):
    """The same Pipeline shape Model.train builds (api/model.py:88-104),
    so a winning config trains identically when published."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import StringIndexer, VectorAssembler

    from workbench_spark.api.model import CLASSIFIERS, REGRESSORS

    assembler = VectorAssembler(inputCols=features, outputCol="__features", handleInvalid="skip")
    if model_type == "classifier":
        indexer = StringIndexer(inputCol=target, outputCol="__label", handleInvalid="skip")
        est = CLASSIFIERS[algo](featuresCol="__features", labelCol="__label")
        return Pipeline(stages=[assembler, indexer, est]), est, "__label"
    est = REGRESSORS[algo](featuresCol="__features", labelCol=target)
    return Pipeline(stages=[assembler, est]), est, target


def mllib_search(
    df,
    target: str,
    features: list[str],
    model_type: str = "regressor",
    algo: str = "gbt",
    search_space: dict | None = None,
    n_trials: int = 8,
    metric: str | None = None,
    tuner: str = "cv",
    k: int = 3,
    train_ratio: float = 0.8,
    parallelism: int = 4,
    seed: int = 42,
) -> HpoResult:
    """Param-grid search through MLlib's tuners: sample ``n_trials``
    configs from ``search_space`` (seeded random search), hand them to
    CrossValidator (tuner='cv', k folds) or TrainValidationSplit
    (tuner='tvs', ``train_ratio``) as explicit ParamMaps, rank by the
    registry ``metric`` (default: rmse for regressors, f1 for
    classifiers).

    Scale shape: each candidate fit is itself a distributed MLlib job, the
    tuner trains ``parallelism`` candidates concurrently, and the input is
    scanned once per fold (the tuner caches fold splits) — nothing here is
    driver-bound except the n_trials×k scalar metric matrix. This is the
    Spark-native stand-in for the reference's Optuna/Ray trial loop
    (hpo_harness.py:386-433), which schedules whole single-node trainings.
    """
    from pyspark.ml.tuning import CrossValidator, TrainValidationSplit

    space = search_space if search_space is not None else SearchSpace(algo)
    metric = metric or ("rmse" if model_type == "regressor" else "f1")
    pipeline, est, label_col = _build_pipeline(target, features, model_type, algo)
    evaluator = _evaluator(metric, label_col)
    rng = random.Random(seed)
    configs = [sample_config(space, rng) for _ in range(n_trials)]
    param_maps = [
        {getattr(est, knob): value for knob, value in cfg.items()} for cfg in configs
    ]
    common = dict(
        estimator=pipeline,
        estimatorParamMaps=param_maps,
        evaluator=evaluator,
        parallelism=parallelism,
        seed=seed,
    )
    if tuner == "cv":
        fitted = CrossValidator(numFolds=k, **common).fit(df)
        values = list(fitted.avgMetrics)
    elif tuner == "tvs":
        fitted = TrainValidationSplit(trainRatio=train_ratio, **common).fit(df)
        values = list(fitted.validationMetrics)
    else:
        raise ValueError(f"tuner must be 'cv' or 'tvs', got {tuner!r}")
    mode = "max" if evaluator.isLargerBetter() else "min"
    trials = [
        {"number": i, "value": float(v), "state": "COMPLETE", "config": c}
        for i, (c, v) in enumerate(zip(configs, values))
    ]
    pick = max if mode == "max" else min
    best = pick(trials, key=lambda t: t["value"])
    return HpoResult(
        best_config=best["config"],
        best_value=best["value"],
        metric=metric,
        mode=mode,
        n_trials=n_trials,
        trials=trials,
    )


def hpo_train(
    df,
    name: str,
    target: str,
    features: list[str],
    model_type: str = "regressor",
    algo: str = "gbt",
    search_space: dict | None = None,
    n_trials: int = 8,
    metric: str | None = None,
    tuner: str = "cv",
    k: int = 3,
    rerank_top_k: int = 2,
    seed: int = 42,
    spark=None,
    warehouse: str | None = None,
) -> dict:
    """End-to-end HPO (the fs.to_model(hyperparameters={'hpo': ...}) flow,
    hpo_runner.py:156-354): search on the training rows, re-rank the
    finalists + baseline on the held-out validation rows with a fresh
    seed, publish the winner as a Model, and feed the outcome into the
    contest machinery.

    Split: honors a J2 ``validation`` boolean column when present, else a
    deterministic crc32 80/20 holdout (engine-portable, replayable).

    Returns {result, best_config, rerank, model, baseline_model, contest,
    trials_frame}: ``model`` is the published winner (baseline config if
    no finalist beat it — HPO can never make the model worse), ``contest``
    is model_comparison.contest_report(baseline → champion, tuned →
    challenger) so the tuning outcome lands in the same champion/
    challenger reporting as any other promotion."""
    import pandas as pd
    from pyspark.sql import functions as F

    from workbench_spark.api.model import Model
    from workbench_spark.api.model_comparison import contest_report

    space = search_space if search_space is not None else SearchSpace(algo)
    if "validation" in df.columns:
        val_flag = F.coalesce(F.col("validation"), F.lit(False))
    else:
        # crc32 over feature values — or, with no feature list, over ALL
        # columns — so the 80/20 split is row-content-keyed and replayable
        # across runs/cluster layouts (monotonically_increasing_id is not:
        # it depends on partition layout).
        key_cols = features if features else list(df.columns)
        key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
        val_flag = F.crc32(key.cast("string")) % 5 == 0
    frame = df.withColumn("__val", val_flag)
    train_df = frame.filter(~F.col("__val")).drop("__val")
    val_df = frame.filter(F.col("__val")).drop("__val")

    result = mllib_search(
        train_df, target, features, model_type, algo, space,
        n_trials=n_trials, metric=metric, tuner=tuner, k=k, seed=seed,
    )

    # re-rank on the true holdout with a fresh training per candidate
    pipeline_tpl, est, label_col = _build_pipeline(target, features, model_type, algo)
    evaluator = _evaluator(result.metric, label_col)

    def eval_on_holdout(config: dict, _i: int) -> float:
        pm = {getattr(est, knob): value for knob, value in config.items()}
        fitted = pipeline_tpl.copy(pm).fit(train_df)
        return evaluator.evaluate(fitted.transform(val_df))

    best_config, rerank = rerank_finalists(eval_on_holdout, result, top_k=rerank_top_k)

    val_marked = train_df.withColumn("validation", F.lit(False)).unionByName(
        val_df.withColumn("validation", F.lit(True))
    )
    model = Model.train(
        val_marked, name, target=target, features=features, model_type=model_type,
        algo=algo, hyperparams=best_config, spark=spark, warehouse=warehouse,
    )
    baseline = Model.train(
        val_marked, f"{name}_baseline", target=target, features=features,
        model_type=model_type, algo=algo, hyperparams={}, spark=spark, warehouse=warehouse,
    )
    contest = contest_report(baseline, [model], endpoint_name=f"{name}_end")
    trials_frame = pd.DataFrame(
        [
            {"number": t["number"], "value": t["value"], "state": t["state"],
             "config": json.dumps(t["config"])}
            for t in result.trials
        ]
    )
    return {
        "result": result,
        "best_config": best_config,
        "rerank": rerank,
        "model": model,
        "baseline_model": baseline,
        "contest": contest,
        "trials_frame": trials_frame,
    }
