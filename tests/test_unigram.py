"""Unigram-LM tokenizer (operators/unigram.py): Viterbi optimality vs
brute force, deterministic hard-EM properties, tokenize integration."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def _brute_best(word, logp, unk=-10_000_000, max_len=8):
    """Enumerate every segmentation of a short word; return the max score."""
    best = None
    n = len(word)
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        for i, c in enumerate(cuts, start=1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        if any(len(p) > max_len for p in pieces):
            continue
        s = 0
        ok = True
        for p in pieces:
            lp = logp.get(p)
            if lp is None:
                if len(p) == 1:
                    lp = unk
                else:
                    ok = False
                    break
            s += lp
        if ok and (best is None or s > best):
            best = s
    return best


def test_viterbi_matches_brute_force():
    from workbench_spark.operators.unigram import viterbi_segment

    logp = {c: -2_000_000 for c in "abcdeth"}
    logp.update({"th": -1_500_000, "he": -1_510_000, "the": -1_400_000,
                 "ab": -1_600_000, "cd": -1_650_000, "abc": -1_450_000})
    for w in ["the", "abcde", "ththe", "aabbcc", "xyz", "a", "thethe"]:
        pieces, score = viterbi_segment(w, logp)
        assert "".join(pieces) == w
        assert score == _brute_best(w, logp), w
        # reported score equals the sum of its own pieces' scores
        s = sum(logp.get(p, -10_000_000 if len(p) == 1 else None) for p in pieces)
        assert s == score


def test_hard_em_learns_real_pieces():
    """On a corpus dominated by two words, EM must keep whole-word pieces
    with the highest probabilities; singles never pruned; budget held."""
    from workbench_spark.operators.unigram import (
        train_pieces_from_counts,
        viterbi_segment,
    )

    words = [("spark", 100), ("scala", 80), ("sql", 5)]
    cands = []
    for w, f in words:
        for i in range(len(w)):
            for l in range(1, len(w) - i + 1):
                cands.append((w[i:i + l], f))
    agg = {}
    for p, f in cands:
        agg[p] = agg.get(p, 0) + f
    pieces = train_pieces_from_counts(
        sorted(agg.items()), sorted(agg.items()), vocab_size=12, num_iters=4
    )
    logp = dict(pieces)
    # the dominant word survives as a whole piece and wins its own
    # segmentation; the runner-up compresses to at most 2 pieces (the
    # 12-piece budget over an 8-char alphabet leaves only 4 multi slots)
    assert viterbi_segment("spark", logp)[0] == ["spark"]
    assert len(viterbi_segment("scala", logp)[0]) <= 2
    # every single char of the corpus alphabet survives pruning
    for ch in set("sparkscalasql"):
        assert ch in logp, ch
    # training is deterministic
    again = train_pieces_from_counts(
        sorted(agg.items()), sorted(agg.items()), vocab_size=12, num_iters=4
    )
    assert pieces == again


def test_unigram_tokenize_and_count(spark):
    from workbench_spark.operators.unigram import (
        unigram_token_count,
        unigram_tokenize,
    )

    logp = [(c, -2_000_000) for c in "abcdefghijklmnopqrstuvwxyz"] + [
        ("he", -1_500_000), ("llo", -1_550_000), ("hello", -1_200_000)
    ]
    docs = spark.createDataFrame(
        [(1, "Hello, HELLO world!"), (2, ""), (3, "Zz")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in unigram_tokenize(docs, logp).collect()}
    assert out[1]["pieces"][:2] == ["hello", "hello"]  # whole-word piece wins
    assert out[2]["pieces"] == [] and out[2]["score_micro"] == 0
    assert out[3]["pieces"] == ["z", "z"]
    cnt = {r["doc_id"]: r["n_tokens"] for r in unigram_token_count(docs, logp).collect()}
    assert cnt[1] == 2 + 5  # hello, hello + w,o,r,l,d singles
    assert cnt[2] == 0
    # deterministic under repartition
    again = {r["doc_id"]: r["pieces"] for r in unigram_tokenize(docs.repartition(3), logp).collect()}
    assert again == {i: r["pieces"] for i, r in out.items()}


def test_unigram_train_end_to_end(spark):
    from workbench_spark.operators.unigram import unigram_train, unigram_tokenize

    docs = spark.createDataFrame(
        [(i, "tokenize the corpus tokenize everything " * 3) for i in range(10)],
        "doc_id int, text string",
    )
    pieces = unigram_train(docs, vocab_size=40, seed_size=200, min_count=1, max_words=100)
    logp = {r["piece"]: r["logp_micro"] for r in pieces.collect()}
    assert "tokenize" in logp  # dominant word became a piece
    toks = unigram_tokenize(docs.limit(1), pieces).first()["pieces"]
    assert "tokenize" in toks
