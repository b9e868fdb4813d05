"""Cached artifact classes — Modified-timestamp staleness over the expensive
artifact methods (reference: cached/cached_artifact_mixin.py:1-88 and its
subclasses cached_data_source.py / cached_feature_set.py / cached_model.py /
cached_endpoint.py — each wraps summary/details/health/sample-style methods
in a cache invalidated by the artifact's Modified stamp, unlike CachedMeta's
plain TTL).

Staleness model mirrored from the reference: a cached entry is fresh while
its recorded Modified stamp is >= the registry's current Modified stamp for
the artifact (every ``Registry.upsert_meta`` re-stamps ``modified``), so a
re-ingest/append/tag-change invalidates all that artifact's cached results
at the next call. ``refresh()`` force-clears one artifact's entries.

Backing stores match CachedMeta: DataFrame results round-trip through the
DFStore (cross-process parquet), JSON-able results through the
ParameterStore next to their stamps. Everything cached here is
catalog/sample-sized (stats dicts, 100-row samples, k-row aggregates) —
bounded by the artifact's metadata, never its data."""

from __future__ import annotations

from functools import wraps

from pyspark.sql import DataFrame

from workbench_spark.api.cached_meta import flatten_key
from workbench_spark.api.data_source import DataSource
from workbench_spark.api.feature_set import FeatureSet
from workbench_spark.api.stores import DFStore, ParameterStore

_STAMP_PREFIX = "artifact_cache/stamps"
_VALUE_PREFIX = "artifact_cache/values"
_DF_PREFIX = "/artifact_cache/frames"


class CachedArtifactMixin:
    """Mixin: ``@CachedArtifactMixin.cache_result`` on any method of a class
    with ``self.name`` / ``self.registry`` / ``self.spark`` caches its result
    until the artifact's registry Modified stamp moves past the cached one."""

    def _stores(self) -> tuple[ParameterStore, DFStore]:
        root = str(self.registry.warehouse)
        if getattr(self, "_ac_params", None) is None:
            self._ac_params = ParameterStore(root=root)
            self._ac_dfs = DFStore(self.spark, root=root)
        return self._ac_params, self._ac_dfs

    def _cache_prefix(self) -> str:
        return f"{type(self).__name__.lower()}_{self.name}"

    def _current_modified(self) -> float:
        try:
            m = self.registry.read_meta(self.name).get("modified")
        except Exception:
            m = None
        return float(m) if m is not None else 0.0

    @classmethod
    def cache_result(cls, method):
        @wraps(method)
        def wrapper(self, *args, **kwargs):
            params, dfs = self._stores()
            key = f"{self._cache_prefix()}_{flatten_key(method.__name__, *args, **kwargs)}"
            current = self._current_modified()
            stamp = params.get(f"{_STAMP_PREFIX}/{key}")
            if stamp is not None and float(stamp["modified"]) >= current:
                if stamp.get("kind") == "df":
                    cached = dfs.get(f"{_DF_PREFIX}/{key}")
                    if cached is not None:
                        return cached
                else:
                    entry = params.get(f"{_VALUE_PREFIX}/{key}")
                    if entry is not None:
                        return entry["value"]
            result = method(self, *args, **kwargs)
            if isinstance(result, DataFrame):
                dfs.upsert(f"{_DF_PREFIX}/{key}", result)
                params.upsert(
                    f"{_STAMP_PREFIX}/{key}", {"modified": current, "kind": "df"}
                )
                return dfs.get(f"{_DF_PREFIX}/{key}")
            params.upsert(f"{_VALUE_PREFIX}/{key}", {"value": result})
            params.upsert(
                f"{_STAMP_PREFIX}/{key}", {"modified": current, "kind": "value"}
            )
            return result

        return wrapper

    def refresh(self) -> int:
        """Force-clear this artifact's cached entries (reference
        cached_artifact_mixin.refresh). Returns entries deleted."""
        params, dfs = self._stores()
        prefix = f"{_STAMP_PREFIX}/{self._cache_prefix()}_"
        n = 0
        for name in params.list(_STAMP_PREFIX):
            if name.startswith(prefix):
                key = name[len(f"{_STAMP_PREFIX}/"):]
                params.delete(name)
                params.delete(f"{_VALUE_PREFIX}/{key}")
                dfs.delete(f"{_DF_PREFIX}/{key}")
                n += 1
        return n


class CachedDataSource(CachedArtifactMixin, DataSource):
    """DataSource with Modified-stamped caching over its summary-tier
    methods (reference cached_data_source.py — summary/details/
    health_check/smart_sample)."""

    def __init__(self, name: str, spark=None, warehouse: str | None = None):
        DataSource.__init__(self, None, name, spark=spark, warehouse=warehouse)

    @CachedArtifactMixin.cache_result
    def num_rows(self) -> int:
        return super().num_rows()

    @CachedArtifactMixin.cache_result
    def column_stats(self, exact: bool = False) -> dict:
        return super().column_stats(exact=exact)

    @CachedArtifactMixin.cache_result
    def descriptive_stats(self, exact: bool = False) -> DataFrame:
        return super().descriptive_stats(exact=exact)

    @CachedArtifactMixin.cache_result
    def smart_sample(self) -> DataFrame:
        return super().smart_sample()

    @CachedArtifactMixin.cache_result
    def correlations(self) -> DataFrame:
        return super().correlations()


class CachedFeatureSet(CachedArtifactMixin, FeatureSet):
    """FeatureSet with Modified-stamped caching (reference
    cached_feature_set.py). Appends re-stamp the registry meta, so cached
    counts/views invalidate on the next call."""

    def __init__(self, name: str, spark=None, warehouse: str | None = None):
        FeatureSet.__init__(self, None, name, spark=spark, warehouse=warehouse)

    @CachedArtifactMixin.cache_result
    def num_rows(self) -> int:
        return super().num_rows()

    @CachedArtifactMixin.cache_result
    def training_view(self) -> DataFrame:
        return super().training_view()
