"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization",
ACL 2018 — the SentencePiece unigram model): the other public tokenizer
family next to BPE (operators/bpe.py). No counterpart in the reference;
part of the LLM training-data-pipeline operator set.

Split of labor (the bpe_train precedent):
- Corpus-scale work is distributed: the (word, freq) table is one
  explode → groupBy (shared ``bpe.word_frequencies``), and the seed
  piece inventory is a substring explode → groupBy sum over the CAPPED
  word table — both bounded driver pulls regardless of corpus size.
- The EM loop runs driver-side over the capped word table (O(words ·
  word_len · max_piece_len) per iteration — the same cost class
  SentencePiece pays; it also trains on a word-frequency table).
- ``unigram_tokenize`` is an Arrow-batched pandas_udf Viterbi with a
  worker-lifetime word→pieces memo (Zipf amortization, as bpe_tokenize).

Determinism and oracle-ability:
- NO randomness anywhere: seeding is top-by-(weight DESC, piece ASC),
  EM is hard-EM (Viterbi counts — the deterministic variant of Kudo's
  expected-count E-step; same fixed points on unambiguous corpora and
  reproducible everywhere), pruning drops (count ASC, piece DESC).
- Piece log-probs are quantized to integer micro-nats at every M-step,
  so Viterbi DP is EXACT integer arithmetic: the engine's segmentation
  scores can be certified by a DuckDB list_reduce DP fold that computes
  the optimal score per word (queries_pipeline: text_unigram_scores) —
  the hash match proves the pandas_udf's segmentations are OPTIMAL,
  not merely plausible.
- Viterbi tiebreak (shared by trainer, tokenizer, and tests): maximize
  score; on ties prefer the longer last piece (smaller backpointer).

Unknown single characters score ``UNK_MICRO`` (a large penalty, not
-inf, so every word segments; SentencePiece's <unk> piece).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from workbench_spark.operators.bpe import WORD_SPLIT_RE, word_frequencies

UNK_MICRO = -10_000_000
MAX_PIECE_LEN = 8

PIECES_SCHEMA = "piece string, logp_micro bigint"


def viterbi_segment(
    word: str, logp: dict[str, int], max_piece_len: int = MAX_PIECE_LEN
) -> tuple[list[str], int]:
    """Optimal segmentation of one word under integer micro-nat piece
    log-probs. Returns (pieces, total_score_micro). Unknown single chars
    cost UNK_MICRO. Tiebreak: longer last piece (smaller backpointer)."""
    L = len(word)
    dp: list[int] = [0] + [0] * L
    bp: list[int] = [0] * (L + 1)
    for i in range(1, L + 1):
        best = None
        bestj = -1
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j == 1:
                    lp = UNK_MICRO
                else:
                    continue
            cand = dp[j] + lp
            if best is None or cand > best or (cand == best and j < bestj):
                best = cand
                bestj = j
        dp[i] = best  # always set: single-char fallback exists
        bp[i] = bestj
    pieces: list[str] = []
    i = L
    while i > 0:
        pieces.append(word[bp[i]:i])
        i = bp[i]
    pieces.reverse()
    return pieces, dp[L]


def seed_pieces(
    words: DataFrame,
    seed_size: int = 2000,
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Candidate piece inventory from the capped (word, freq) table: all
    substrings up to ``max_piece_len``, weighted by word frequency, top
    ``seed_size`` by (weight DESC, piece ASC) PLUS every single
    character (so Viterbi always has a path). Two chained explodes —
    single-level lambdas only (the nested-lambda codegen cliff)."""
    starts = words.select(
        "word",
        "freq",
        F.explode(F.expr("sequence(1, length(word))")).alias("i"),
    ).withColumn(
        "maxl", F.least(F.lit(max_piece_len), F.length("word") - F.col("i") + 1)
    )
    lens = starts.select(
        "word", "i", "freq", F.explode(F.expr("sequence(1, maxl)")).alias("l")
    )
    subs = lens.select(F.expr("substring(word, i, l)").alias("piece"), "freq")
    weighted = subs.groupBy("piece").agg(F.sum("freq").alias("weight"))
    top = weighted.orderBy(F.desc("weight"), F.asc("piece")).limit(seed_size)
    chars = weighted.filter(F.length("piece") == 1)
    return top.unionByName(chars).dropDuplicates(["piece"])


def train_pieces_from_counts(
    word_freqs: list[tuple[str, int]],
    candidates: list[tuple[str, int]],
    vocab_size: int = 500,
    num_iters: int = 4,
    prune_frac: float = 0.25,
    max_piece_len: int = MAX_PIECE_LEN,
) -> list[tuple[str, int]]:
    """Driver-side hard-EM over the capped word table (Python twin used
    directly by unigram_train and by the tests). Returns the final
    (piece, logp_micro) inventory, ≤ max(vocab_size, #chars) entries."""
    singles = {p for p, _ in candidates if len(p) == 1}
    for w, _ in word_freqs:
        singles.update(w)
    total0 = sum(max(c, 1) for _, c in candidates) or 1
    logp = {
        p: math.floor(math.log(max(c, 1) / total0) * 1e6 + 0.5)
        for p, c in candidates
    }
    for ch in singles:
        logp.setdefault(ch, math.floor(math.log(1 / total0) * 1e6 + 0.5))
    for _ in range(num_iters):
        counts: dict[str, int] = {}
        for w, f in word_freqs:
            pieces, _ = viterbi_segment(w, logp, max_piece_len)
            for p in pieces:
                counts[p] = counts.get(p, 0) + f
        # prune: drop the lowest-count multi-char pieces until the budget
        # holds (never singles — they are the fallback alphabet)
        alive = set(counts) | singles
        excess = len(alive) - max(vocab_size, len(singles))
        if excess > 0:
            multi = sorted(
                ((counts.get(p, 0), p) for p in alive if len(p) > 1),
                key=lambda t: (t[0], tuple(-ord(c) for c in t[1])),
            )
            k = min(excess, max(1, int(len(multi) * prune_frac)))
            dropped = {p for _, p in multi[:k]}
            alive -= dropped
        total = sum(counts.get(p, 0) + 1 for p in alive)
        logp = {
            p: math.floor(math.log((counts.get(p, 0) + 1) / total) * 1e6 + 0.5)
            for p in alive
        }
    return sorted(logp.items())


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 500,
    seed_size: int = 2000,
    min_count: int = 2,
    max_words: int = 50_000,
    num_iters: int = 4,
    prune_frac: float = 0.25,
) -> DataFrame:
    """Train the unigram piece inventory: distributed word/substring
    counting, driver-side hard-EM (see module docstring for the split and
    its 100 TB argument). Output DataFrame: (piece, logp_micro)."""
    words = word_frequencies(df, text_col, min_count, max_words)
    cands = seed_pieces(words, seed_size)
    # bounded driver pulls: |words| <= max_words, |cands| <= seed_size + alphabet
    wf = [(r["word"], r["freq"]) for r in words.collect()]
    cs = [(r["piece"], r["weight"]) for r in cands.collect()]
    pieces = train_pieces_from_counts(
        wf, cs, vocab_size, num_iters, prune_frac
    )
    return df.sparkSession.createDataFrame(pieces, PIECES_SCHEMA)


def _pieces_dict(pieces: DataFrame | list[tuple[str, int]]) -> dict[str, int]:
    if isinstance(pieces, DataFrame):
        return {r["piece"]: r["logp_micro"] for r in pieces.collect()}
    return dict(pieces)


_WORKER_MEMO: dict[tuple[int, str], tuple[list[str], int]] = {}
_WORKER_MEMO_CAP = 1_000_000


def unigram_tokenize(
    df: DataFrame,
    pieces: DataFrame | list[tuple[str, int]],
    text_col: str = "text",
    out_col: str = "pieces",
    score_col: str | None = "score_micro",
) -> DataFrame:
    """Viterbi-tokenize a text column: ``out_col`` = array of pieces over
    all words (bpe's WORD_SPLIT_RE segmentation), ``score_col`` = the
    exact integer total score (Σ per-word optimal DP scores — the value
    the text_unigram_scores oracle certifies). Arrow-batched pandas_udf
    with a worker-lifetime word memo."""
    logp = _pieces_dict(pieces)
    # memo namespace per model within a worker: a content fingerprint, not
    # id() (driver object ids can be GC-reused across models)
    key = (len(logp), sum(logp.values()) & ((1 << 62) - 1))

    @F.pandas_udf("struct<pieces: array<string>, score_micro: bigint>")
    def seg(texts: pd.Series) -> pd.DataFrame:
        import re

        splitter = re.compile(WORD_SPLIT_RE)
        outs = []
        scores = []
        for t in texts:
            toks: list[str] = []
            total = 0
            for w in splitter.split((t or "").lower()):
                if not w:
                    continue
                hit = _WORKER_MEMO.get((key, w))
                if hit is None:
                    hit = viterbi_segment(w, logp)
                    if len(_WORKER_MEMO) < _WORKER_MEMO_CAP:
                        _WORKER_MEMO[(key, w)] = hit
                toks.extend(hit[0])
                total += hit[1]
            outs.append(toks)
            scores.append(total)
        return pd.DataFrame({"pieces": outs, "score_micro": scores})

    out = df.withColumn("__seg", seg(F.col(text_col)))
    out = out.withColumn(out_col, F.col("__seg.pieces"))
    if score_col:
        out = out.withColumn(score_col, F.col("__seg.score_micro"))
    return out.drop("__seg")


def unigram_token_count(
    df: DataFrame,
    pieces: DataFrame | list[tuple[str, int]],
    text_col: str = "text",
    out_col: str = "n_tokens",
) -> DataFrame:
    """Per-document unigram token count (the packing/mixture accounting
    hook, like bpe_token_count)."""
    tokenized = unigram_tokenize(df, pieces, text_col, "__pieces", None)
    return tokenized.withColumn(out_col, F.size("__pieces")).drop("__pieces")
