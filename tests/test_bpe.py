"""BPE tokenizer: hand-computed merge training, apply-BPE round trips,
overlap fold semantics, and the packing integration (real token counts
feeding pack_sequences)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from workbench_spark.operators.bpe import (
    bpe_token_count,
    bpe_tokenize,
    bpe_train,
    encode_word,
    merge_fold,
    train_merges_from_counts,
)


@pytest.fixture(scope="session")
def spark():
    from workbench_spark.session import get_spark

    return get_spark("tests", extra_conf={"spark.sql.shuffle.partitions": "8"})


def test_merge_fold_overlap_semantics():
    # Sennrich regex semantics: leftmost-nonoverlapping
    assert merge_fold(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert merge_fold(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert merge_fold(["x", "a", "b", "a", "b"], "a", "b") == ["x", "ab", "ab"]
    # freshly merged symbol does not re-merge in the same pass
    assert merge_fold(["a", "b", "b"], "a", "b") == ["ab", "b"]


def test_train_merges_hand_computed():
    """Classic Sennrich example shape: {low:5, lower:2, newest:6, widest:3}.
    First merge must be (e, s) — 'es' appears in newest(6) + widest(3) = 9,
    beating every other pair."""
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_merges_from_counts(wf, 3)
    assert merges[0][1:] == ("e", "s", "es", 9)
    # second: 'es'+'t' also 9 (newest+widest)
    assert merges[1][1:] == ("es", "t", "est", 9)
    # third: 'est'+'</w>' = 9
    assert merges[2][1:] == ("est", "</w>", "est</w>", 9)


def test_train_tiebreak_deterministic():
    # two pairs with equal weighted counts -> lexicographically smallest
    wf = [("ab", 3), ("cd", 3)]
    merges = train_merges_from_counts(wf, 1)
    # pairs: (a,b):3 (b,</w>):3 (c,d):3 (d,</w>):3 -> (a,b) wins
    assert merges[0][1:3] == ("a", "b")


def test_encode_word_follows_training_order():
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_merges_from_counts(wf, 10)
    ranks = {(m[1], m[2]): m[0] for m in merges}
    toks = encode_word("newest", ranks)
    # reconstruction invariant
    assert "".join(toks).replace("</w>", "") == "newest"
    # trained-on word should compress well below char count
    assert len(toks) < len("newest") + 1
    # unseen word still round-trips
    toks2 = encode_word("zzz", ranks)
    assert "".join(toks2).replace("</w>", "") == "zzz"


def test_bpe_train_and_tokenize_spark(spark):
    from workbench_spark.session import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents")
    merges = bpe_train(d, num_merges=30, min_count=2, max_words=5000)
    mrows = merges.collect()
    assert len(mrows) == 30
    assert [r["merge_rank"] for r in sorted(mrows, key=lambda r: r["merge_rank"])] == list(range(30))
    toked = bpe_tokenize(d.limit(50), merges)
    rows = toked.select("text", "bpe_tokens").collect()
    for r in rows:
        # byte-level reconstruction: concatenating tokens and stripping
        # the end-of-word marker recovers the normalized word stream
        rebuilt = "".join(r["bpe_tokens"]).replace("</w>", " ").strip()
        import re

        norm = " ".join(w for w in re.split(r"[^a-z0-9]+", r["text"].lower()) if w)
        assert rebuilt == norm


def test_bpe_token_count_packing_integration(spark):
    """Real token counts drive sequence packing: every packed bin of
    whole documents respects the budget, and totals reconcile."""
    from workbench_spark.operators.packing import pack_sequences_greedy
    from workbench_spark.session import read_table

    d = read_table(spark, "/root/testdata/sf0.001", "documents").limit(200)
    merges = bpe_train(d, num_merges=20, min_count=2, max_words=5000)
    counted = bpe_token_count(d, merges)
    budget = 256
    packed = pack_sequences_greedy(
        counted, budget=budget, id_col="doc_id", token_col="bpe_token_count"
    )
    per_bin = (
        packed.filter(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    )
    assert per_bin, "packing produced no bins"
    assert all(r["tot"] <= budget for r in per_bin)
    # every document lands in exactly one bin (oversize ones singleton)
    assert packed.count() == counted.count()
    # token totals reconcile between the count operator and the packing
    tot_in = counted.agg(F.sum("bpe_token_count")).collect()[0][0]
    tot_out = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert tot_in == tot_out


def _naive_train(word_freqs, num_merges, end_of_word="</w>"):
    """The pre-r8 O(vocab)-per-merge loop, kept as the semantics oracle
    for the incremental (heap + delta-count) trainer."""
    from workbench_spark.operators.bpe import merge_fold

    vocab = [(list(w) + [end_of_word], f) for w, f in word_freqs]
    merges = []
    for rank in range(num_merges):
        counts = {}
        for syms, freq in vocab:
            for i in range(len(syms) - 1):
                pair = (syms[i], syms[i + 1])
                counts[pair] = counts.get(pair, 0) + freq
        if not counts:
            break
        (left, right), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, left, right, left + right, cnt))
        vocab = [(merge_fold(syms, left, right), f) for syms, f in vocab]
    return merges


def test_incremental_trainer_matches_naive():
    """The incremental trainer must reproduce the naive loop's merge
    SEQUENCE byte-for-byte — selection order, tie-breaks, and counts —
    on a corpus engineered to exercise overlaps ('aaaa'), ties, and
    words rewritten by many successive merges."""
    from workbench_spark.operators.bpe import train_merges_from_counts

    wf = [
        ("aaaa", 7), ("aaab", 5), ("abab", 5), ("banana", 4),
        ("bandana", 3), ("cabana", 3), ("the", 10), ("then", 6),
        ("there", 4), ("other", 4), ("lowest", 2), ("lower", 3),
        ("low", 7), ("newest", 2), ("newer", 3), ("new", 6),
        ("zzz", 1), ("az", 2), ("za", 2),
    ]
    for n in (1, 5, 20, 60, 200):
        assert train_merges_from_counts(wf, n) == _naive_train(wf, n), n
