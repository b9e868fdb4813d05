"""Scalar function families (SURVEY §2.8 F2-F6, F11-F13).

Reference citations:
- F3 ISO-8601 round-trip — utils/datetime_utils.py (used at
  pandas_to_features.py:113-129, athena_source.py:495-496)
- F4 unit math — utils/chem_utils/misc.py:49-80
- F5 geometric mean — misc.py:12-14
- F6 JSON pack/unpack — inference_store.py:70-76, pandas_utils.py:1045-1076
- F11 string shortening — pandas_utils.py:886-921
- F13 tags string↔list — inference_store.py:127-129
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ISO_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


# ------------------------------------------------------------------ F3
def to_iso8601(col) -> Column:
    return F.date_format(col, ISO_FMT)


def from_iso8601(col) -> Column:
    return F.to_timestamp(col, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'")


# ------------------------------------------------------------------ F4
def micromolar_to_log(col, floor: float = 1e-10) -> Column:
    """misc.py:49-80 — -log10(µM → M) with a floor to avoid log(0):
    log value = -log10(max(x, floor) * 1e-6)."""
    return -F.log10(F.greatest(col.cast("double"), F.lit(floor)) * F.lit(1e-6))


def log_to_micromolar(col) -> Column:
    return F.pow(F.lit(10.0), -col.cast("double")) * F.lit(1e6)


# ------------------------------------------------------------------ F5
def geometric_mean(col) -> Column:
    """Aggregate: exp(avg(ln(x))) (misc.py:12-14). Positive inputs only."""
    return F.exp(F.avg(F.log(col)))


# ------------------------------------------------------------------ F6
def pack_json(*cols: str) -> Column:
    """Meta fields → JSON object string (inference_store.py:70-76)."""
    return F.to_json(F.struct(*[F.col(c) for c in cols]))


def unpack_json_field(col, path: str) -> Column:
    """JSON-string probe (`JSON_EXTRACT` contract, pandas_to_data.py:147-153)."""
    return F.get_json_object(col, path)


def expand_proba_column(df, proba_col: str, class_labels: list[str]):
    """pandas_utils.py:1045-1076 — explode a JSON probability-vector column
    into one double column per class, named {label}_proba."""
    out = df
    for i, label in enumerate(class_labels):
        out = out.withColumn(
            f"{label}_proba",
            F.get_json_object(F.col(proba_col), f"$[{i}]").cast("double"),
        )
    return out


# ------------------------------------------------------------------ F11
def shorten_values(col, max_len: int = 100) -> Column:
    """Display-shortening (pandas_utils.py:886-921): truncate + ellipsis."""
    return F.when(
        F.length(col) > max_len, F.concat(F.substring(col, 1, max_len), F.lit("..."))
    ).otherwise(col)


# ------------------------------------------------------------------ F13
def tags_to_list(col) -> Column:
    """'[a, b]' → array<string> (inference_store.py:127-129)."""
    return F.filter(
        F.split(F.regexp_replace(col, r"^\[|\]$", ""), ",\\s*"),
        lambda t: F.length(t) > 0,
    )


def list_to_tags(col) -> Column:
    """array<string> → '[a, b]'."""
    return F.concat(F.lit("["), F.array_join(col, ", "), F.lit("]"))
