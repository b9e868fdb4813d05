"""Champion/challenger model comparison + contest reports.

Reference citations:
- model_comparison / prediction_comparison / rank_models /
  contest_ranking / contest_report / _contested —
  utils/model_comparison.py:19-233
- find_contests / contest_summary — utils/contest_utils.py:15-100

Metric tables here are driver-scale by construction (one row per model,
a handful of scalar metrics pulled from Model.metrics()), so they are
plain pandas DataFrames like the reference returns — there is nothing to
distribute. prediction_comparison is the exception: it stacks per-row
predictions from two endpoints and stays a Spark DataFrame end to end.

Classifier note: the reference compares on its metrics table's 'all'
summary row. Our classification_metrics (operators/metrics.py) emits
per-class rows only, so the 'all' row is synthesized as the
support-weighted average of precision/recall/f1 (sklearn's
"weighted avg" — the same row the reference's arbiter ranks on).
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metrics where a lower value is better; everything else (r2, spearman,
# precision, recall, f1, ...) is higher-is-better. support falls through
# to the plain b - a difference (model_comparison.py:18)
LOWER_IS_BETTER = {"rmse", "mae", "medae"}

# A contest is "contested" when the best real challenger is better than the
# champion, or at most this many percent worse, on the primary metric
# (model_comparison.py:21-26)
CONTESTED_PCT = -1.0

# Challengers within this Δ of the champion are its frozen promotion twin
# (float noise, not a real difference) and are skipped (model_comparison.py:28-31)
TWIN_EPS = 1e-6

CONTEST_PREFIX = "contests/"
RECENT_CHANGE_HOURS = 72


def _report_frame(reports, location: str) -> pd.DataFrame | None:
    """Fetch a published report as pandas. Our Reports store returns Spark
    DataFrames (reference returns pandas); reports are driver-scale tables
    so toPandas here is O(#models in the contest)."""
    df = reports.get(location)
    if df is None:
        return None
    return df.toPandas() if hasattr(df, "toPandas") else df


def _metrics_row(model) -> pd.Series | None:
    """The single metrics row to compare on (model_comparison.py:82-90):
    the scalar regression metrics, or the synthesized 'all' row for
    classifiers. None when the model has no captured metrics."""
    m = model.metrics()
    if not m:
        return None
    if "class_metrics" in m:
        rows = m["class_metrics"]
        if not rows:
            return None
        total = sum(r["support"] for r in rows)
        if total == 0:
            return None
        agg = {
            k: sum(r[k] * r["support"] for r in rows) / total
            for k in ("precision", "recall", "f1")
        }
        agg["support"] = float(total)
        row = pd.Series(agg, name=model.name)
    else:
        row = pd.Series(
            {k: v for k, v in m.items() if isinstance(v, (int, float))},
            name=model.name,
        )
    row = pd.to_numeric(row, errors="coerce").dropna()
    return row if not row.empty else None


def _delta(row_a: pd.Series, row_b: pd.Series, col: str) -> float:
    """Metrics-aware improvement of b over a: positive always means b is
    better (model_comparison.py:63-66)."""
    if col in LOWER_IS_BETTER:
        return row_a[col] - row_b[col]
    return row_b[col] - row_a[col]


def model_comparison(model_a, model_b) -> pd.DataFrame | None:
    """Three rows [a, b, delta], one column per shared metric
    (model_comparison.py:30-67). None when either model has no metrics or
    a regressor/classifier mismatch leaves no shared columns."""
    row_a, row_b = _metrics_row(model_a), _metrics_row(model_b)
    if row_a is None or row_b is None:
        return None
    shared = [c for c in row_a.index if c in row_b.index]
    if not shared:
        return None
    row_a, row_b = row_a[shared], row_b[shared]
    delta = pd.Series({c: _delta(row_a, row_b, c) for c in shared}, name="delta")
    return pd.DataFrame([row_a, row_b, delta])


def prediction_comparison(endpoint_a, endpoint_b, eval_df: DataFrame) -> DataFrame:
    """Both endpoints' predictions stacked with a 'model' label column
    (model_comparison.py:69-95) — unionByName of the two transform plans;
    the eval frame is scanned once per endpoint and never collected."""
    outs = []
    for end in (endpoint_a, endpoint_b):
        out = end.transform(eval_df).withColumn("model", F.lit(end.model.name))
        outs.append(out.drop("__features", "rawPrediction", "probability", "__label"))
    return outs[0].unionByName(outs[1], allowMissingColumns=True)


def rank_models(models: list) -> pd.DataFrame:
    """One metrics row per model, best first: rmse ascending for
    regressors, 'all'-row f1 descending for classifiers
    (model_comparison.py:97-126). Models without metrics are skipped."""
    rows = [r for r in (_metrics_row(m) for m in models) if r is not None]
    if not rows:
        return pd.DataFrame()
    table = pd.DataFrame(rows)
    if "rmse" in table.columns:
        return table.sort_values("rmse")
    if "f1" in table.columns:
        return table.sort_values("f1", ascending=False)
    return table


def contest_ranking(champion, challengers: list) -> pd.DataFrame:
    """rank_models of the challengers with a Δ column after each metric the
    champion shares (positive = challenger better; support gets no Δ) —
    model_comparison.py:128-160."""
    ranked = rank_models(challengers)
    champ_row = _metrics_row(champion)
    if champ_row is None or ranked.empty:
        return ranked
    ordered = []
    for col in list(ranked.columns):
        ordered.append(col)
        if col in champ_row.index and col != "support":
            if col in LOWER_IS_BETTER:
                ranked[f"Δ{col}"] = champ_row[col] - ranked[col]
            else:
                ranked[f"Δ{col}"] = ranked[col] - champ_row[col]
            ordered.append(f"Δ{col}")
    return ranked[ordered]


def _framework(model) -> str:
    """model_comparison.py:235-248 — multi-task when the target is a list;
    otherwise the recorded algorithm (MLlib here; the reference's chemprop
    'hybrid' branch has no MLlib counterpart)."""
    try:
        meta = model.meta()
        if isinstance(meta.get("target"), list):
            return "multi-task"
        return meta.get("algo") or meta.get("model_type") or "mllib"
    except Exception:
        return "unknown"


def _contested(champ_row: pd.DataFrame, chall_rows: pd.DataFrame) -> bool:
    """model_comparison.py:208-233 — best real (non-twin) challenger beats
    or nearly ties the champion on the primary metric."""
    if champ_row.empty or chall_rows.empty:
        return False
    if "rmse" in champ_row.columns:
        primary = "rmse"
    elif "f1" in champ_row.columns:
        primary = "f1"
    else:
        return False
    if f"Δ{primary}" not in chall_rows.columns:
        return False
    champ_value = champ_row.iloc[0][primary]
    if champ_value is None or (isinstance(champ_value, float) and math.isnan(champ_value)) or champ_value == 0:
        return False
    deltas = chall_rows[f"Δ{primary}"]
    real = deltas[deltas.notna() & (deltas.abs() > TWIN_EPS)]
    if real.empty:
        return False
    return bool(real.iloc[0] / abs(champ_value) * 100 >= CONTESTED_PCT)


def contest_report(champion, challengers: list, endpoint_name: str) -> pd.DataFrame | None:
    """The publishable contest table (model_comparison.py:162-206):
    champion first then challengers best-first, with role/framework/
    endpoint columns, champion Δs zeroed, and the contest-level
    'contested' flag repeated on every row."""
    champ_row = rank_models([champion])
    chall_rows = contest_ranking(champion, challengers)
    if champ_row.empty and chall_rows.empty:
        return None
    cols = list(chall_rows.columns) if not chall_rows.empty else list(champ_row.columns)
    report = pd.concat([champ_row, chall_rows])[cols]
    report.insert(0, "model", report.index)
    report.insert(1, "role", ["champion"] * len(champ_row) + ["challenger"] * len(chall_rows))
    in_report = set(report["model"])
    models = {m.name: m for m in [champion, *challengers] if m.name in in_report}
    report.insert(2, "framework", report["model"].map({n: _framework(m) for n, m in models.items()}))
    report.insert(3, "endpoint", endpoint_name)
    delta_cols = [c for c in report.columns if c.startswith("Δ")]
    report.loc[report["role"] == "champion", delta_cols] = 0.0
    report["timestamp"] = datetime.now(timezone.utc)
    report["contested"] = _contested(champ_row, chall_rows)
    return report.reset_index(drop=True)


def find_contests(model_name: str, reports) -> list:
    """contest_utils.py:15-52 — contests a model takes part in, looked up
    from the published report rows under /contests/."""
    hits = []
    for location in reports.list():
        if not location.lstrip("/").startswith(CONTEST_PREFIX):
            continue
        df = _report_frame(reports, location)
        if df is None or "model" not in df.columns:
            continue
        rows = df[df["model"] == model_name]
        if not rows.empty:
            row = rows.iloc[0]
            hits.append(
                {
                    "contest": location,
                    "role": row.get("role"),
                    "endpoint": row.get("endpoint"),
                }
            )
    return hits


def contest_summary(reports) -> list:
    """contest_utils.py:54-100 — one dict per published contest report,
    most recent first, with the contested and recent-change flags."""
    out = []
    cutoff = datetime.now(timezone.utc) - timedelta(hours=RECENT_CHANGE_HOURS)
    for location in reports.list():
        if not location.lstrip("/").startswith(CONTEST_PREFIX):
            continue
        df = _report_frame(reports, location)
        if df is None or df.empty:
            continue
        champ = df[df.get("role") == "champion"] if "role" in df.columns else df.iloc[:0]
        ts = pd.to_datetime(df["timestamp"].iloc[0], utc=True) if "timestamp" in df.columns else None
        out.append(
            {
                "contest": location,
                "endpoint": df["endpoint"].iloc[0] if "endpoint" in df.columns else None,
                "champion": champ["model"].iloc[0] if not champ.empty else None,
                "n_challengers": int((df.get("role") == "challenger").sum()) if "role" in df.columns else 0,
                "contested": bool(df["contested"].iloc[0]) if "contested" in df.columns else False,
                "recent_change": bool(ts is not None and ts >= cutoff),
                "timestamp": ts,
            }
        )
    out.sort(key=lambda d: (d["timestamp"] is not None, d["timestamp"]), reverse=True)
    return out
