"""Public API surface — mirrors ``workbench.api`` (reference:
src/workbench/api/__init__.py:26-58): DataSource, FeatureSet, Meta,
DFStore, ParameterStore, InferenceStore, GraphStore. Model/Endpoint live
in workbench_spark.api.model (MLlib-backed)."""

from workbench_spark.api.data_source import DataSource
from workbench_spark.api.feature_set import FeatureSet
from workbench_spark.api.ensemble_simulator import (
    EnsembleSimulator,
    rank_strategies,
    simulate_strategies,
)
from workbench_spark.api.hpo import SearchSpace, hpo_train, mllib_search, run_search
from workbench_spark.api.inference_cache import InferenceCache
from workbench_spark.api.cached_artifacts import (
    CachedArtifactMixin,
    CachedDataSource,
    CachedFeatureSet,
)
from workbench_spark.api.cached_meta import CachedMeta
from workbench_spark.api.meta import Meta
from workbench_spark.api.model import Endpoint, Model
from workbench_spark.api.monitor import Monitor
from workbench_spark.api.registry import Registry
from workbench_spark.api.stores import (
    DFStore,
    GraphStore,
    InferenceStore,
    ParameterStore,
    cache_dataframe,
)

__all__ = [
    "DataSource",
    "FeatureSet",
    "Model",
    "Endpoint",
    "CachedArtifactMixin",
    "CachedDataSource",
    "CachedFeatureSet",
    "CachedMeta",
    "Meta",
    "Monitor",
    "Registry",
    "DFStore",
    "GraphStore",
    "InferenceStore",
    "InferenceCache",
    "ParameterStore",
    "cache_dataframe",
    "EnsembleSimulator",
    "simulate_strategies",
    "rank_strategies",
    "SearchSpace",
    "run_search",
    "mllib_search",
    "hpo_train",
]
