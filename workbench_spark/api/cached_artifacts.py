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
at the next call. A MISSING registry meta (deleted artifact, transient read
failure) is treated as always-stale — the wrapped method then runs and
fails exactly like the uncached artifact would, instead of serving ghost
results. ``refresh()`` force-clears one artifact's entries.

Backing stores and the stamp/kind protocol are shared with CachedMeta
(``cached_meta.cached_call``): DataFrame results round-trip through the
DFStore (cross-process parquet), JSON-able results through the
ParameterStore next to their stamps. Everything cached here is
catalog/sample-sized (stats dicts, 100-row samples, k-row aggregates) —
bounded by the artifact's metadata, never its data."""

from __future__ import annotations

import math
from functools import wraps

from pyspark.sql import DataFrame

from workbench_spark.api.cached_meta import cached_call, flatten_key
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

    def _cache_segment(self) -> str:
        # class and artifact name as PATH SEGMENTS — an underscore-joined
        # prefix would make refresh('sales') also match 'sales_v2'
        return f"{type(self).__name__.lower()}/{self.name}"

    def _current_modified(self) -> float:
        """The artifact's registry Modified stamp; +inf (always stale) when
        the meta is missing or unreadable, so a deleted artifact's wrapped
        methods re-run and fail loudly instead of serving cached ghosts."""
        try:
            m = self.registry.read_meta(self.name).get("modified")
        except Exception:
            m = None
        return float(m) if m is not None else math.inf

    @classmethod
    def cache_result(cls, method):
        @wraps(method)
        def wrapper(self, *args, **kwargs):
            params, dfs = self._stores()
            key = (
                f"{self._cache_segment()}/"
                f"{flatten_key(method.__name__, *args, **kwargs)}"
            )
            current = self._current_modified()
            return cached_call(
                params,
                dfs,
                (
                    f"{_STAMP_PREFIX}/{key}",
                    f"{_VALUE_PREFIX}/{key}",
                    f"{_DF_PREFIX}/{key}",
                ),
                # isfinite: current=inf (missing meta) must never be
                # "fresh", even against a previously-written inf stamp
                lambda stamp: math.isfinite(current)
                and float(stamp["modified"]) >= current,
                lambda: {"modified": current},
                lambda: method(self, *args, **kwargs),
            )

        return wrapper

    def refresh(self) -> int:
        """Force-clear this artifact's cached entries (reference
        cached_artifact_mixin.refresh). Returns entries deleted."""
        params, dfs = self._stores()
        prefix = f"{_STAMP_PREFIX}/{self._cache_segment()}/"
        n = 0
        for name in params.list(prefix):
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
    cached_feature_set.py). Appends and set_training_roles re-stamp the
    registry meta, so cached counts/views invalidate on the next call."""

    def __init__(self, name: str, spark=None, warehouse: str | None = None):
        FeatureSet.__init__(self, None, name, spark=spark, warehouse=warehouse)

    @CachedArtifactMixin.cache_result
    def num_rows(self) -> int:
        return super().num_rows()

    @CachedArtifactMixin.cache_result
    def training_view(self) -> DataFrame:
        return super().training_view()
