"""Byte-pair-encoding tokenizer: distributed training + encoding.

No counterpart in the reference (it is chem-domain; closest is the token
plumbing in utils/token_utils — absent); this is part of the LLM
training-data-pipeline operator set. Algorithm: Sennrich, Haddow & Birch
2016, "Neural Machine Translation of Rare Words with Subword Units"
(ACL 2016) — the public learn-BPE/apply-BPE algorithm, re-expressed for
Spark's execution model:

- ``bpe_train``: the corpus-scale half (word counting) is a distributed
  ``explode → groupBy``; the merge loop then runs driver-side on the
  size-capped distinct-word frequency table (the ``pq_train`` precedent:
  driver-side training over a bounded aggregate, never over corpus rows).
  This split is how production BPE trainers behave (HuggingFace
  tokenizers, SentencePiece): merge learning is O(distinct words · merge
  count), not O(corpus bytes) — at 100 TB the groupBy shrinks terabytes
  of text to a few million (word, freq) rows, and the cap keeps the
  driver pull bounded no matter the corpus.
- ``bpe_tokenize``: Arrow-batched ``pandas_udf`` with a word→tokens memo
  per batch — Zipf makes the memo hit rate ≈ the corpus' type/token
  ratio, so the per-row Python cost amortizes to near-dictionary-lookup.
- Merge application is the leftmost-nonoverlapping greedy fold (exactly
  Sennrich's regex-replace semantics, including the ``aaa``+(a,a)→
  ``aa,a`` overlap rule). The DuckDB oracle replays the identical fold
  with ``list_reduce`` (queries_pipeline: ``text_bpe_merges``), so the
  merge SEQUENCE — selection order, tie-breaks, counts — is certified
  exactly, not just row counts.

Determinism: pair selection orders by (count DESC, left ASC, right ASC);
word-table capping orders by (freq DESC, word ASC). No RNG anywhere.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# word segmentation shared by train + tokenize + the DuckDB oracle:
# lowercase, split on any non-alphanumeric run
WORD_SPLIT_RE = "[^a-z0-9]+"
END_OF_WORD = "</w>"

MERGES_SCHEMA = (
    "merge_rank int, merge_left string, merge_right string, "
    "merged string, pair_count bigint"
)


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    max_words: int = 50_000,
) -> DataFrame:
    """Distributed (word, freq) table: the only corpus-scale pass in BPE
    training. Capped at ``max_words`` by (freq DESC, word ASC) so the
    driver-side merge loop's input is bounded regardless of corpus size
    (rare tail words below the cap contribute no high-frequency pairs)."""
    words = df.select(
        F.explode(
            F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE)
        ).alias("word")
    ).filter(F.length("word") > 0)
    wc = (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= min_count)
    )
    return wc.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)


def merge_fold(syms: list[str], left: str, right: str) -> list[str]:
    """Leftmost-nonoverlapping greedy application of one merge — the
    Python twin of the DuckDB ``list_reduce`` fold in the oracle (and of
    Sennrich's regex replace): walk left→right, merging (left, right)
    whenever the accumulator's tail is ``left`` and the next symbol is
    ``right``; a freshly merged symbol never re-merges in the same pass
    (left+right == left would need an empty right)."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def train_merges_from_counts(
    word_freqs: list[tuple[str, int]],
    num_merges: int,
    end_of_word: str = END_OF_WORD,
) -> list[tuple[int, str, str, str, int]]:
    """The deterministic merge loop over an in-memory (word, freq) table:
    per iteration pick the pair with the highest frequency-weighted
    adjacent count (overlapping occurrences count, matching the zip-based
    oracle), tie-broken (count DESC, left ASC, right ASC), and fold it
    into every word containing it. Returns
    [(rank, left, right, merged, pair_count)].

    Incremental (the standard learn-BPE optimization, as in Sennrich's
    reference implementation): pair counts and a pair → affected-word
    index are maintained under deltas, so each merge re-folds ONLY the
    words containing the merged pair instead of recounting all pairs over
    all words — O(affected words) per merge instead of O(vocab). Selection
    uses a lazy-deletion heap keyed (-count, left, right): stale entries
    (count changed since push) are re-pushed with the current count and
    skipped, so the pop order is identical to a full argmin per iteration
    — the merge SEQUENCE is byte-identical to the naive loop (certified by
    the text_bpe_merges oracle and the equivalence test in test_bpe.py)."""
    import heapq

    vocab: list[tuple[list[str], int]] = [
        (list(w) + [end_of_word], f) for w, f in word_freqs
    ]
    counts: dict[tuple[str, str], int] = {}
    index: dict[tuple[str, str], set[int]] = {}
    for wi, (syms, freq) in enumerate(vocab):
        for i in range(len(syms) - 1):
            pair = (syms[i], syms[i + 1])
            counts[pair] = counts.get(pair, 0) + freq
            index.setdefault(pair, set()).add(wi)
    heap = [(-c, p[0], p[1]) for p, c in counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(num_merges):
        best = None
        while heap:
            negc, left, right = heapq.heappop(heap)
            cur = counts.get((left, right), 0)
            if cur <= 0:
                continue  # fully merged away — dead entry
            if -negc != cur:
                # stale: re-push at the current count and keep popping
                heapq.heappush(heap, (-cur, left, right))
                continue
            best = (left, right, cur)
            break
        if best is None:
            break
        left, right, cnt = best
        merges.append((rank, left, right, left + right, cnt))
        changed: set[tuple[str, str]] = set()
        for wi in sorted(index.pop((left, right), ())):
            syms, freq = vocab[wi]
            new_syms = merge_fold(syms, left, right)
            vocab[wi] = (new_syms, freq)
            old_pairs = [(syms[i], syms[i + 1]) for i in range(len(syms) - 1)]
            new_pairs = [
                (new_syms[i], new_syms[i + 1]) for i in range(len(new_syms) - 1)
            ]
            for p in old_pairs:
                counts[p] -= freq
                changed.add(p)
            for p in new_pairs:
                counts[p] = counts.get(p, 0) + freq
                changed.add(p)
            for p in set(old_pairs) - set(new_pairs):
                s = index.get(p)
                if s is not None:
                    s.discard(wi)
            for p in set(new_pairs) - set(old_pairs):
                index.setdefault(p, set()).add(wi)
        changed.discard((left, right))
        for p in changed:
            c = counts.get(p, 0)
            if c > 0:
                heapq.heappush(heap, (-c, p[0], p[1]))
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    min_count: int = 2,
    max_words: int = 50_000,
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Train a BPE vocabulary; returns the merges table
    (merge_rank, merge_left, merge_right, merged, pair_count) — the
    persistable artifact ``bpe_tokenize`` consumes. One distributed
    word-count pass; the merge loop is driver-side over the capped table
    (bounded by ``max_words`` rows — see module docstring)."""
    spark = df.sparkSession
    wf = [
        (r["word"], r["freq"])
        for r in word_frequencies(df, text_col, min_count, max_words).collect()
    ]
    merges = train_merges_from_counts(wf, num_merges, end_of_word)
    if not merges:
        return spark.createDataFrame([], MERGES_SCHEMA)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def _merge_list(merges: DataFrame | list) -> list[tuple[str, str]]:
    """(left, right) in rank order from a merges DataFrame or list.
    A DataFrame pull here is bounded by num_merges (a vocab-sized
    artifact table — typically ≤ 30k rows — never corpus data)."""
    if isinstance(merges, DataFrame):
        rows = merges.orderBy("merge_rank").collect()
        return [(r["merge_left"], r["merge_right"]) for r in rows]
    out = []
    for m in merges:
        out.append((m[1], m[2]) if len(m) >= 4 else (m[0], m[1]))
    return out


def encode_word(
    word: str,
    ranks: dict[tuple[str, str], int],
    end_of_word: str = END_OF_WORD,
) -> list[str]:
    """Apply learned merges to one word in training order: repeatedly
    fold the lowest-rank pair present until none applies (apply-BPE)."""
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = (syms[i], syms[i + 1])
        if best_pair is None:
            break
        syms = merge_fold(syms, best_pair[0], best_pair[1])
    return syms


def bpe_tokenize(
    df: DataFrame,
    merges: DataFrame | list,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str = END_OF_WORD,
) -> DataFrame:
    """Add ``out_col`` (array<string>) = BPE tokens of ``text_col`` under
    the trained merges. Arrow-batched pandas_udf; the merges table rides
    to executors inside the serialized closure (vocab-sized, ≤ a few
    hundred KB — the broadcast-a-dict pattern), and a per-executor
    word→tokens memo makes repeated words dictionary lookups."""
    import re

    pairs = _merge_list(merges)
    ranks = {p: i for i, p in enumerate(pairs)}
    splitter = re.compile(WORD_SPLIT_RE)
    # Hoisted into the closure so it persists across Arrow batches within a
    # Python worker (the closure is deserialized once per worker, not per
    # batch) — Zipf makes the hit rate ≈ the corpus' type/token ratio.
    memo: dict[str, list[str]] = {}

    @F.pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        def enc(text: str) -> list[str]:
            if text is None:
                return []
            out: list[str] = []
            for w in splitter.split(text.lower()):
                if not w:
                    continue
                toks = memo.get(w)
                if toks is None:
                    if len(memo) >= 1_000_000:
                        memo.clear()  # bound worker-lifetime growth on
                        # heavy-tailed corpora; Zipf means the head refills
                        # almost immediately
                    toks = encode_word(w, ranks, end_of_word)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, _encode(F.col(text_col)))


def bpe_token_count(
    df: DataFrame,
    merges: DataFrame | list,
    text_col: str = "text",
    out_col: str = "bpe_token_count",
) -> DataFrame:
    """Real (tokenizer-based) token counts — the drop-in upgrade for the
    whitespace counts feeding operators/packing.py sequence packing and
    text.mixture_weights token budgeting."""
    tmp = "__bpe_toks"
    out = bpe_tokenize(df, merges, text_col, tmp)
    return out.withColumn(out_col, F.size(F.col(tmp)).cast("long")).drop(tmp)
