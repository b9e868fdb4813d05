"""Encoding functions (SURVEY §2.8 F7/F8).

- one_hot_encode — pandas_to_features.py:186-231: only encode columns with
  1 < nunique < 10; dummies are int; names sanitized + shortened to ≤20
  chars (shorten_column_name, pandas_to_features.py:154-172).
- undummify — pandas_utils.py:923-952 (reverse one-hot).

Spark-first: the category inventory is one small agg; encoding is a
map-side CASE per category (no shuffle, no StringIndexer fitting pass
needed for the reference's semantics, which key off the value itself).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def shorten_column_name(name: str, max_len: int = 20) -> str:
    """pandas_to_features.py:154-172 — sanitize then truncate."""
    clean = re.sub(r"[^a-zA-Z0-9_]", "_", name).lower()
    return clean[:max_len]


def one_hot_encode(
    df: DataFrame, columns: list[str], min_unique: int = 1, max_unique: int = 10
) -> DataFrame:
    """F7 — dummy-encode each eligible column; the unique-count gate
    (1 < u < 10) and int dummies mirror pandas_to_features.py:186-231.
    Ineligible columns pass through unchanged (reference warns + skips)."""
    eligible: dict[str, list[str]] = {}
    gate = df.agg(*[F.countDistinct(c).alias(c) for c in columns]).first()
    for c in columns:
        u = gate[c]
        if u is None or not (min_unique < u < max_unique):
            continue
        vals = [
            r[0]
            for r in df.select(c).filter(F.col(c).isNotNull()).distinct().orderBy(c).collect()
        ]
        eligible[c] = vals
    out = df
    for c, vals in eligible.items():
        for v in vals:
            dummy = shorten_column_name(f"{c}_{v}")
            # NULL input -> all-zero dummies (pandas get_dummies semantics;
            # a bare equality cast would yield NULL dummies for NULL rows)
            out = out.withColumn(
                dummy, F.coalesce((F.col(c) == F.lit(v)).cast("int"), F.lit(0))
            )
        out = out.drop(c)
    return out


def get_dummy_cols(df: DataFrame) -> list[str]:
    """F8 helper — columns that look like int 0/1 dummies (pandas_utils.py
    get_dummy_cols): integer-typed with values ⊆ {0,1}."""
    int_cols = [f.name for f in df.schema.fields if f.dataType.simpleString() in ("int", "bigint", "smallint", "tinyint")]
    if not int_cols:
        return []
    row = df.agg(
        *[F.max(F.col(c)).alias(f"{c}__mx") for c in int_cols],
        *[F.min(F.col(c)).alias(f"{c}__mn") for c in int_cols],
    ).first()
    return [
        c
        for c in int_cols
        if row[f"{c}__mn"] is not None and row[f"{c}__mn"] >= 0 and row[f"{c}__mx"] <= 1
    ]


def undummify(df: DataFrame, prefix_sep: str = "_") -> DataFrame:
    """F8 — collapse dummy column groups back to categorical columns
    (pandas_utils.py:923-952): group dummies by prefix, pick the suffix of
    the max-valued dummy per row."""
    dummies = get_dummy_cols(df)
    groups: dict[str, list[str]] = {}
    for c in dummies:
        if prefix_sep not in c:
            continue
        prefix = c.split(prefix_sep)[0]
        groups.setdefault(prefix, []).append(c)
    out = df
    for prefix, cols in groups.items():
        if len(cols) < 2:
            continue
        # when() without otherwise() yields NULL on no-match → coalesce
        # picks the first dummy that fires
        branches = [
            F.when(F.col(c) == 1, F.lit(c.split(prefix_sep, 1)[1])) for c in sorted(cols)
        ]
        out = out.withColumn(prefix, F.coalesce(*branches)).drop(*cols)
    return out
