"""DSIR importance resampling (operators/dsir.py) — hand-computed Python
twin of the full weight pipeline, selection semantics, and edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


MOD = 1_000_000_007


def _poly(s: str) -> int:
    a = 0
    for ch in s:
        a = (a * 31 + ord(ch)) % MOD
    return a


def _grams(text: str) -> list[str]:
    toks = [t for t in " ".join(text.lower().split()).split(" ") if t]
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _py_weights(raw: dict[int, str], target: dict[int, str], b: int, alpha: float = 1.0):
    """Pure-Python DSIR twin: same buckets, smoothing, micro-nat floor."""
    tcnt: dict[int, int] = {}
    rcnt: dict[int, int] = {}
    for txt in target.values():
        for g in _grams(txt):
            k = _poly(g) % b
            tcnt[k] = tcnt.get(k, 0) + 1
    for txt in raw.values():
        for g in _grams(txt):
            k = _poly(g) % b
            rcnt[k] = rcnt.get(k, 0) + 1
    tt, rt = sum(tcnt.values()), sum(rcnt.values())
    lam = {
        i: math.floor(
            (
                math.log((tcnt.get(i, 0) + alpha) / (tt + alpha * b))
                - math.log((rcnt.get(i, 0) + alpha) / (rt + alpha * b))
            )
            * 1e6
            + 0.5
        )
        for i in range(b)
    }
    return {
        did: sum(lam[_poly(g) % b] for g in _grams(txt))
        for did, txt in raw.items()
    }


RAW = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "le renard brun rapide saute",
    3: "the the the the of of and",
    4: "",
    5: "zzz qqq xxx",
}
TARGET = {
    10: "the quick dog runs over the hill",
    11: "a lazy dog and a quick fox",
}


def _frames(spark):
    raw = spark.createDataFrame(list(RAW.items()), "doc_id int, text string")
    tgt = spark.createDataFrame(list(TARGET.items()), "doc_id int, text string")
    return raw, tgt


def test_dsir_weights_match_python_twin(spark):
    from workbench_spark.operators.dsir import dsir_weights

    raw, tgt = _frames(spark)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_w_micro"])
        for r in dsir_weights(raw, tgt, n_buckets=64).collect()
    }
    want = _py_weights(RAW, TARGET, 64)
    assert set(got) == set(RAW)
    for did, txt in RAW.items():
        assert got[did][0] == len(_grams(txt)), did
        assert got[did][1] == want[did], did
    # target-like English docs must outrank the noise/OOV docs per gram
    per_gram = {d: got[d][1] / max(got[d][0], 1) for d in got}
    assert per_gram[1] > per_gram[5]
    # the empty doc carries zero evidence
    assert got[4] == (0, 0)


def test_dsir_lambda_reuse_and_artifact_shape(spark):
    """A persisted λ table reproduces the inline fit; the model is a full
    fixed-size bucket table (the broadcastable artifact)."""
    from workbench_spark.operators.dsir import (
        dsir_bucket_counts,
        dsir_lambda_table,
        dsir_weights,
    )

    raw, tgt = _frames(spark)
    tc = dsir_bucket_counts(tgt, n_buckets=64)
    rc = dsir_bucket_counts(raw, n_buckets=64)
    lam = dsir_lambda_table(tc, rc, 64)
    assert lam.count() == 64
    inline = {r["doc_id"]: r["log_w_micro"] for r in dsir_weights(raw, tgt, n_buckets=64).collect()}
    reused = {
        r["doc_id"]: r["log_w_micro"]
        for r in dsir_weights(raw, tgt, n_buckets=64, lam=lam).collect()
    }
    assert inline == reused


def test_dsir_resample_without_replacement_and_deterministic(spark):
    from workbench_spark.operators.dsir import dsir_resample, dsir_weights

    raw, tgt = _frames(spark)
    w = dsir_weights(raw, tgt, n_buckets=64)
    sel = dsir_resample(w, 3).collect()
    assert len(sel) == 3
    ids = [r["doc_id"] for r in sel]
    assert len(set(ids)) == 3  # without replacement
    # deterministic across invocations and partitionings
    again = [r["doc_id"] for r in dsir_resample(w.repartition(5), 3).collect()]
    assert ids == again
    # keys are strictly ordered in the output
    keys = [r["key_micro"] for r in sel]
    assert keys == sorted(keys, reverse=True)


def test_dsir_resample_prefers_heavy_weights(spark):
    """With one overwhelming weight, Gumbel-top-1 must pick it: the gumbel
    micro-noise is bounded (~±14e6 for u in (1e-6, 1-1e-6)) while the
    planted weight gap is huge."""
    from workbench_spark.operators.dsir import dsir_resample

    w = spark.createDataFrame(
        [(1, 10**9), (2, 0), (3, -(10**9))],
        "doc_id int, log_w_micro long",
    )
    top = dsir_resample(w, 1).collect()
    assert top[0]["doc_id"] == 1


def test_nb_classifier_separable_and_priors(spark):
    """nb_train/nb_score: perfectly separable vocabularies classify 100%
    on held-out docs; gram-less docs fall back to the prior argmax
    (majority class); model shape is dense k x B."""
    from workbench_spark.operators.dsir import nb_score, nb_train

    spam = [f"buy cheap pills now offer {i}" for i in range(8)]
    ham = [f"meeting notes quarterly report agenda {i}" for i in range(4)]
    train = spark.createDataFrame(
        [(i, "spam", t) for i, t in enumerate(spam)]
        + [(100 + i, "ham", t) for i, t in enumerate(ham)],
        "doc_id int, label string, text string",
    )
    model = nb_train(train, "label", n_buckets=64)
    assert model.count() == 2 * 64
    test = spark.createDataFrame(
        [(1000, "cheap pills offer"), (1001, "quarterly agenda report"),
         (1002, "")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["label_pred"] for r in nb_score(test, model, n_buckets=64).collect()}
    assert got[1000] == "spam"
    assert got[1001] == "ham"
    # empty doc: prior argmax = majority class (8 spam vs 4 ham)
    assert got[1002] == "spam"
