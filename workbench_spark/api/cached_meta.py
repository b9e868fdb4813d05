"""CachedMeta — TTL-stamped caching tier over Meta listings and artifact
details (reference: cached/cached_meta.py:1-502 — a 30 s-TTL singleton
wrapping every Meta list/detail method via a ``cache_result`` decorator,
backed by the shared WorkbenchCache; here the backing stores are the
local DFStore (DataFrame results, cross-process via parquet) and
ParameterStore (dict results + TTL stamps), so cached listings survive
and are shared across Spark sessions exactly like the reference's
Redis-backed cache).

Semantics mirrored from the reference:
- same interface as Meta — a drop-in, faster replacement;
- singleton per warehouse (reference: module-level singleton);
- per-method+args cache keys (``flatten_key``);
- TTL staleness check at read time (default 30 s), stale entries
  refetched and re-stamped;
- ``check`` / ``list_meta_cache`` / ``clear_meta_cache`` admin surface;
- a Modified registry merged from listing results (max(existing, new)
  per artifact) so dashboards can cheaply detect artifact-level change.

Scale note: Meta listings are catalog-sized (rows = number of registered
artifacts, never data-sized), so caching them as small parquet/JSON
artifacts is bounded by the catalog, not the data.
"""

from __future__ import annotations

import time
from functools import wraps

from pyspark.sql import DataFrame, SparkSession

from workbench_spark.api.meta import Meta
from workbench_spark.api.stores import DFStore, ParameterStore


def flatten_key(method_name: str, *args, **kwargs) -> str:
    """Stable cache key from method + positional/keyword args (reference:
    WorkbenchCache.flatten_key). Slashes are flattened so keys stay valid
    single-segment store locations."""
    parts = [method_name]
    parts += [str(a) for a in args]
    parts += [f"{k}={kwargs[k]}" for k in sorted(kwargs)]
    return "_".join(p.replace("/", "_") for p in parts) or method_name


def cached_call(params, dfs, locs, is_fresh, stamp_fields, compute, on_df=None):
    """The shared stamp/store protocol for both caching tiers (CachedMeta's
    TTL stamps and CachedArtifactMixin's Modified stamps — one
    implementation so the kind-dispatch / DFStore-roundtrip subtleties
    can't drift between them).

    locs = (stamp_loc, value_loc, df_loc); ``is_fresh(stamp)`` decides
    freshness from a previously written stamp; ``stamp_fields()`` produces
    the fields recorded next to ``kind`` on a write; DataFrame results go
    through the DFStore (and are re-read so repeated callers share the
    stored copy), everything JSON-able through the ParameterStore."""
    stamp_loc, value_loc, df_loc = locs
    stamp = params.get(stamp_loc)
    if stamp is not None and is_fresh(stamp):
        if stamp.get("kind") == "df":
            cached = dfs.get(df_loc)
            if cached is not None:
                return cached
        else:
            entry = params.get(value_loc)
            if entry is not None:
                return entry["value"]
    result = compute()
    if isinstance(result, DataFrame):
        dfs.upsert(df_loc, result)
        params.upsert(stamp_loc, {**stamp_fields(), "kind": "df"})
        if on_df is not None:
            on_df(result)
        return dfs.get(df_loc)
    params.upsert(value_loc, {"value": result})
    params.upsert(stamp_loc, {**stamp_fields(), "kind": "value"})
    return result


def cache_result(method):
    """TTL-stamped memoization for Meta methods (reference
    cached_meta.cache_result): fresh hits return the cached result;
    stale/first calls run the real method and re-stamp."""

    @wraps(method)
    def wrapper(self, *args, **kwargs):
        key = flatten_key(method.__name__, *args, **kwargs)
        now = time.time()
        return cached_call(
            self._params,
            self._dfs,
            (
                f"{self._STAMP_PREFIX}/{key}",
                f"{self._VALUE_PREFIX}/{key}",
                f"{self._DF_PREFIX}/{key}",
            ),
            lambda stamp: (now - float(stamp["at"])) < self._cache_ttl,
            lambda: {"at": now},
            lambda: method(self, *args, **kwargs),
            on_df=lambda df: self._update_modified_registry(method.__name__, df),
        )

    return wrapper


class CachedMeta(Meta):
    """Drop-in Meta with a TTL cache (reference cached/cached_meta.py).

    Usage::

        meta = CachedMeta()          # singleton per warehouse
        meta.models()                # first call fetches + stamps
        meta.models()                # within TTL: served from the cache
        meta.clear_meta_cache()      # manual invalidation
    """

    _instances: dict[str, "CachedMeta"] = {}
    _cache_ttl = 30.0  # seconds, reference default
    _STAMP_PREFIX = "meta_cache/stamps"
    _VALUE_PREFIX = "meta_cache/values"
    _DF_PREFIX = "/meta_cache/frames"
    _MODIFIED_PREFIX = "meta_cache/modified_registry"

    # listing methods whose results carry per-artifact modified stamps
    _registry_config = {
        "data_sources": {"name_column": "name"},
        "feature_sets": {"name_column": "name"},
        "models": {"name_column": "name"},
        "endpoints": {"name_column": "name"},
    }

    def __new__(cls, spark=None, warehouse: str | None = None, ttl: float | None = None):
        inst_key = str(warehouse)
        if inst_key not in cls._instances:
            cls._instances[inst_key] = super().__new__(cls)
        return cls._instances[inst_key]

    def __init__(
        self,
        spark: SparkSession | None = None,
        warehouse: str | None = None,
        ttl: float | None = None,
    ):
        if getattr(self, "_initialized", False):
            if ttl is not None:
                self._cache_ttl = float(ttl)
            # the singleton may outlive the SparkSession it was built with
            # (test teardown, notebook restart): adopt a live session passed
            # to a repeat construction so listings keep working
            if spark is not None and spark is not self.spark:
                self.spark = spark
                self._dfs.spark = spark
            return
        super().__init__(spark, warehouse)
        root = str(self.registry.warehouse)
        self._dfs = DFStore(self.spark, root=root)
        self._params = ParameterStore(root=root)
        if ttl is not None:
            self._cache_ttl = float(ttl)
        self._initialized = True

    # ------------------------------------------------------------ admin
    def check(self) -> bool:
        """Round-trip probe of the backing stores (reference: check())."""
        probe = f"{self._STAMP_PREFIX}/__check__"
        self._params.upsert(probe, {"at": time.time(), "kind": "probe"})
        ok = self._params.get(probe) is not None
        self._params.delete(probe)
        return ok

    def list_meta_cache(self) -> list[str]:
        """Cached entry keys (stamp names, one per cached call)."""
        prefix = f"{self._STAMP_PREFIX}/"
        return sorted(
            n[len(prefix):]
            for n in self._params.list(self._STAMP_PREFIX)
            if n.startswith(prefix)
        )

    def clear_meta_cache(self) -> None:
        for name in self._params.list(self._STAMP_PREFIX):
            self._params.delete(name)
        for name in self._params.list(self._VALUE_PREFIX):
            self._params.delete(name)
        for loc in self._dfs.list(self._DF_PREFIX):
            self._dfs.delete(loc)

    # ------------------------------------------- modified-stamp registry
    def _update_modified_registry(self, method_name: str, df: DataFrame) -> None:
        """Merge per-artifact modified stamps from a listing result
        (reference: add new, drop deleted, keep max(existing, new))."""
        config = self._registry_config.get(method_name)
        if config is None or "modified" not in df.columns:
            return
        name_col = config["name_column"]
        # catalog-sized listing: bounded by artifact count, never data rows
        new = {r[name_col]: str(r["modified"]) for r in df.collect()}
        existing = (
            self._params.get(f"{self._MODIFIED_PREFIX}/{method_name}") or {}
        )

        def _stamp_key(s: str):
            # numeric stamps compare numerically (epoch floats of differing
            # integer-part length order wrong as strings); non-numeric stamps
            # (ISO strings) fall back to lexicographic, sorted after floats
            # only within their own kind
            try:
                return (0, float(s), s)
            except (TypeError, ValueError):
                return (1, 0.0, s)

        merged = {
            name: max(existing.get(name, ts), ts, key=_stamp_key)
            for name, ts in new.items()
        }
        self._params.upsert(f"{self._MODIFIED_PREFIX}/{method_name}", merged)

    def modified_registry(self, method_name: str) -> dict:
        """name -> latest modified stamp seen for a listing method."""
        return self._params.get(f"{self._MODIFIED_PREFIX}/{method_name}") or {}

    # ----------------------------------------------------- cached facade
    @cache_result
    def data_sources(self) -> DataFrame:
        return super().data_sources()

    @cache_result
    def feature_sets(self) -> DataFrame:
        return super().feature_sets()

    @cache_result
    def models(self) -> DataFrame:
        return super().models()

    @cache_result
    def endpoints(self) -> DataFrame:
        return super().endpoints()

    @cache_result
    def models_with_details(self) -> DataFrame:
        return super().models_with_details()

    @cache_result
    def champion_models(self) -> DataFrame:
        return super().champion_models()

    @cache_result
    def config(self) -> dict:
        return super().config()

    @cache_result
    def data_source(self, name: str) -> dict | None:
        return super().data_source(name)

    @cache_result
    def feature_set(self, name: str) -> dict | None:
        return super().feature_set(name)

    @cache_result
    def model(self, name: str) -> dict | None:
        return super().model(name)

    @cache_result
    def endpoint(self, name: str) -> dict | None:
        return super().endpoint(name)
