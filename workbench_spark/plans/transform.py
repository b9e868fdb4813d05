"""Transform ABC + DAG composition (SURVEY §2.12).

Reference citations:
- Transform template ABC — core/transforms/transform.py:38-152:
  pre_transform → transform_impl → post_transform, typed input/output
  artifact kinds, @final transform().
- DataToDataLight / CleanData example — data_to_data/light/clean_data.py:8-53
- MetaEndpoint DAG + aggregation nodes, statically-validated column
  contracts — utils/aggregation_nodes.py:1-40, api/meta_endpoint.py:1-328

Spark-first: transform_impl maps DataFrame→DataFrame; the DAG validates
column contracts against DataFrame schemas before execution (static,
no job run), then composes branches with the J4 row-id join and A13
aggregators.
"""

from __future__ import annotations

import abc
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Transform(abc.ABC):
    """User-defined table→table transform with the reference's template
    lifecycle. Subclass and implement transform_impl."""

    def __init__(self, **params):
        self.params = params

    def pre_transform(self, df: DataFrame) -> DataFrame:
        return df

    @abc.abstractmethod
    def transform_impl(self, df: DataFrame) -> DataFrame: ...

    def post_transform(self, df: DataFrame) -> DataFrame:
        return df

    def transform(self, df: DataFrame) -> DataFrame:
        """The @final template (transform.py:38-152)."""
        return self.post_transform(self.transform_impl(self.pre_transform(df)))


class CleanData(Transform):
    """The reference's canonical example transform (clean_data.py:8-53):
    drop rows with NULLs in the subset columns + drop duplicates."""

    def transform_impl(self, df: DataFrame) -> DataFrame:
        subset = self.params.get("subset") or df.columns
        return df.na.drop(subset=subset).dropDuplicates()


class DagNode:
    """One DAG stage: fn(DataFrame)→DataFrame with declared input/output
    column contracts (the feature-endpoint input_columns/output_columns
    contract, api/__init__.py:10-15)."""

    def __init__(
        self,
        name: str,
        fn: Callable[[DataFrame], DataFrame],
        input_columns: list[str],
        output_columns: list[str],
    ):
        self.name = name
        self.fn = fn
        self.input_columns = input_columns
        self.output_columns = output_columns


class MetaEndpointDag:
    """Parallel branches over a shared input, joined on an injected row id
    (J4) then reduced with an ensemble aggregator (A13). Column contracts
    are validated statically before any job runs
    (meta_endpoint.py:1-328 static validation)."""

    ROW_ID = "__dag_row_id"

    def __init__(
        self,
        branches: list[DagNode],
        aggregator: "PredictionAggregator | None" = None,
        pred_cols: list[str] | None = None,
        conf_cols: list[str] | None = None,
    ):
        """Optionally reduce the joined branch outputs with a prediction
        aggregation node (the reference's [endpoints] → Mean/Vote/strategy
        DAG shape, meta_endpoint_dag.py + aggregation_nodes.py). pred_cols
        (and conf_cols for the calibrated strategies) name the branch
        output columns to combine; they must be declared branch outputs."""
        self.branches = branches
        self.aggregator = aggregator
        self.pred_cols = pred_cols or []
        self.conf_cols = conf_cols

    def validate(self, df: DataFrame) -> list[str]:
        """Static contract check against the input schema; returns problems."""
        problems = []
        cols = set(df.columns)
        for b in self.branches:
            missing = set(b.input_columns) - cols
            if missing:
                problems.append(f"branch {b.name}: missing input columns {sorted(missing)}")
        seen: dict[str, str] = {}
        for b in self.branches:
            for c in b.output_columns:
                if c in seen:
                    problems.append(
                        f"branch {b.name}: output column {c!r} collides with {seen[c]}"
                    )
                seen[c] = b.name
        if self.aggregator is not None:
            declared = {c for b in self.branches for c in b.output_columns}
            for c in list(self.pred_cols) + list(self.conf_cols or []):
                if c not in declared:
                    problems.append(
                        f"aggregator {self.aggregator.name}: column {c!r} "
                        "is not declared by any branch"
                    )
        return problems

    def run(self, df: DataFrame) -> DataFrame:
        problems = self.validate(df)
        if problems:
            raise ValueError("DAG contract validation failed: " + "; ".join(problems))
        from workbench_spark.operators.joins import column_union_join

        base = df.withColumn(self.ROW_ID, F.monotonically_increasing_id())
        outs = []
        for b in self.branches:
            branch_in = base.select(self.ROW_ID, *b.input_columns)
            out = b.fn(branch_in)
            outs.append(out.select(self.ROW_ID, *b.output_columns))
        joined = column_union_join([base] + outs, self.ROW_ID)
        if self.aggregator is not None:
            joined = self.aggregator.apply(joined, self.pred_cols, self.conf_cols)
        return joined.drop(self.ROW_ID)


# ------------------------------------------------------ aggregation nodes
class PredictionAggregator:
    """Base prediction-aggregation node (aggregation_nodes.py:120-185):
    combines per-branch prediction columns after the DAG join into a
    single ``prediction`` (and, for the calibrated strategies,
    ``prediction_std`` + ``confidence``). Pure column math from
    operators/ensembles — no extra shuffle beyond the DAG join itself."""

    def __init__(self, name: str):
        self.name = name

    def output_columns(self) -> list[str]:
        return ["prediction"]

    def apply(
        self, df: DataFrame, pred_cols: list[str], conf_cols: list[str] | None = None
    ) -> DataFrame:
        raise NotImplementedError

    def _check_arity(self, pred_cols: list[str], n: int) -> None:
        if len(pred_cols) != n:
            raise ValueError(
                f"{type(self).__name__}[{self.name}]: got {len(pred_cols)} "
                f"upstream prediction columns but {n} weights"
            )


class Mean(PredictionAggregator):
    """aggregation_nodes.py:187-199 — row-wise branch average."""

    def apply(self, df, pred_cols, conf_cols=None):
        from workbench_spark.operators.ensembles import ensemble_mean

        return ensemble_mean(df, pred_cols)


class WeightedMean(PredictionAggregator):
    """aggregation_nodes.py:201-228 — static-weight branch average."""

    def __init__(self, name: str, weights: list[float]):
        super().__init__(name)
        self.weights = [float(w) for w in weights]

    def apply(self, df, pred_cols, conf_cols=None):
        from workbench_spark.operators.ensembles import ensemble_weighted_mean

        self._check_arity(pred_cols, len(self.weights))
        return ensemble_weighted_mean(df, pred_cols, self.weights)


class Vote(PredictionAggregator):
    """aggregation_nodes.py:230-271 — majority vote, smallest-label ties."""

    def apply(self, df, pred_cols, conf_cols=None):
        from workbench_spark.operators.ensembles import ensemble_vote

        return ensemble_vote(df, pred_cols)


class _StrategyAggregator(PredictionAggregator):
    """aggregation_nodes.py:273-308 — shared parameters for the calibrated
    strategies; validation mirrors _StrategyAggregator.__init__."""

    STRATEGY = ""

    def __init__(
        self,
        name: str,
        model_weights: list[float],
        corr_scale: list[float] | None = None,
        optimal_alpha: float = 0.5,
    ):
        super().__init__(name)
        self.model_weights = [float(w) for w in model_weights]
        self.corr_scale = corr_scale
        self.optimal_alpha = float(optimal_alpha)

    def output_columns(self) -> list[str]:
        return ["prediction", "prediction_std", "confidence"]

    def apply(self, df, pred_cols, conf_cols=None):
        from workbench_spark.operators.ensembles import ensemble_strategy

        if conf_cols is None:
            raise ValueError(f"{type(self).__name__}[{self.name}]: needs conf_cols")
        self._check_arity(pred_cols, len(self.model_weights))
        return ensemble_strategy(
            df,
            pred_cols,
            conf_cols,
            strategy=self.STRATEGY,
            model_weights=self.model_weights,
            corr_scale=self.corr_scale,
            optimal_alpha=self.optimal_alpha,
        )


class ConfidenceWeighted(_StrategyAggregator):
    """aggregation_nodes.py:310-327."""

    STRATEGY = "confidence"


class InverseMaeWeighted(_StrategyAggregator):
    """aggregation_nodes.py:329-347."""

    STRATEGY = "inverse_mae"


class ScaledConfidenceWeighted(_StrategyAggregator):
    """aggregation_nodes.py:349-368."""

    STRATEGY = "scaled_confidence"


class CalibratedConfidenceWeighted(_StrategyAggregator):
    """aggregation_nodes.py:370-388."""

    STRATEGY = "calibrated_confidence"
