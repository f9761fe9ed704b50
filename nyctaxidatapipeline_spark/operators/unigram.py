"""Unigram-LM tokenizer training (Kudo 2018, the SentencePiece model).

The other standard tokenizer-training dataflow next to BPE
(``operators/bpe.py``): instead of greedy merges, learn a probability
over a piece vocabulary and segment by maximum likelihood. Same
100 TB discipline as BPE:

  * The corpus is reduced to the ``(word, n)`` table ONCE — the only
    pass that touches 100 TB. Everything after runs against the word
    table, whose size is the corpus VOCABULARY (tens of millions of
    rows at web scale), not its token count.
  * Seeding: one explode of per-word substrings (bounded length) over
    the word table — a map-side-combined aggregate; the seed vocab is
    the top candidates by count·len (the SentencePiece seed heuristic).
  * EM rounds (Viterbi / hard EM): the piece table (10k–1M entries)
    broadcasts to executors as a plain dict inside an Arrow-batched
    ``mapInPandas`` over the WORD table; each round is one Arrow pass
    (per-word Viterbi DP, vocabulary-sized work) + one piece-count
    aggregate + a driver-side renormalize of |V| floats. Exact
    SentencePiece uses full forward–backward expectations; Viterbi-EM
    is the standard hard variant — documented, deterministic, and the
    E-step plumbing is identical (swap the DP body to upgrade).
  * Pruning: after EM, keep the top ``vocab_size`` pieces by
    probability; single characters are always kept so segmentation
    totals (no unreachable word).

Determinism: DP ties prefer the LONGER piece at each position; the
piece probs are computed once on the driver per round, so every
executor sees identical floats. Data-dependent iteration => unit-gated
(reference-replication fixtures), like ``bpe_train`` — see COVERAGE.md.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.bpe import word_counts

#: log-prob floor for characters absent from the piece table (an OOV
#: char costs more than any real piece, but never makes a word
#: unsegmentable).
_UNK_LOGP = -100.0


def viterbi_pieces(word: str, logp: dict[str, float],
                   max_piece_len: int) -> list[str]:
    """Max-likelihood segmentation of one word under piece log-probs.
    Ties prefer the longer piece ending at each position (checked last
    wins with >=). Pure function — shared by the executor kernel and
    the tests' reference implementation."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for klen in range(1, min(max_piece_len, i) + 1):
            piece = word[i - klen:i]
            lp = logp.get(piece)
            if lp is None:
                lp = _UNK_LOGP if klen == 1 else None
            if lp is None:
                continue
            cand = best[i - klen] + lp
            if cand >= best[i]:
                best[i] = cand
                back[i] = klen
    out = []
    i = n
    while i > 0:
        out.append(word[i - back[i]:i])
        i -= back[i]
    return out[::-1]


def seed_pieces(words: DataFrame, max_piece_len: int = 4,
                seed_size: int = 4096) -> list[tuple[str, int]]:
    """Candidate pieces: every substring of length <= ``max_piece_len``
    of every word, weighted by word count; top ``seed_size`` by the
    count·len seed score (ties by piece, so the seed set is a pure
    function of the word counts). One explode + one aggregate over the
    word table; the result is driver-sized by construction."""
    empty = F.array().cast("array<string>")
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.lit(max_piece_len)),
        # guard: sequence(1, n) flips to a DESCENDING sequence when
        # n < 1, so short words need an explicit empty arm
        lambda k: F.when(
            F.length("word") >= k,
            F.transform(F.sequence(F.lit(1), F.length("word") - k + 1),
                        lambda s: F.substring(F.col("word"), s, k)))
        .otherwise(empty)))
    scored = (words
              .select(F.explode(subs).alias("piece"), "n")
              .filter(F.length("piece") > 0)
              .groupBy("piece").agg(F.sum("n").alias("cnt"))
              .select("piece", "cnt",
                      (F.col("cnt") * F.length("piece")).alias("score"))
              .orderBy(F.desc("score"), "piece")
              .limit(seed_size))
    return [(r["piece"], int(r["cnt"])) for r in scored.collect()]


def _estep_counts(words: DataFrame, logp: dict[str, float],
                  max_piece_len: int) -> dict[str, int]:
    """One hard-EM E-step: Viterbi-segment every word under ``logp``
    (broadcast dict, Arrow-batched) and aggregate piece counts
    weighted by word frequency. Returns the |V|-sized count dict."""
    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pieces, ns = [], []
            for word, n in zip(pdf["word"], pdf["n"]):
                for p in viterbi_pieces(word, logp, max_piece_len):
                    pieces.append(p)
                    ns.append(int(n))
            yield pd.DataFrame({"piece": pieces, "cnt": ns})

    agg = (words.mapInPandas(kern, "piece string, cnt long")
           .groupBy("piece").agg(F.sum("cnt").alias("cnt")))
    return {r["piece"]: int(r["cnt"]) for r in agg.collect()}


def _normalize(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    return {p: math.log(c) - math.log(total)
            for p, c in counts.items() if c > 0}


def unigram_train(df: DataFrame, text_col: str, vocab_size: int = 1024,
                  n_em: int = 2, max_piece_len: int = 4,
                  seed_size: int = 4096) -> dict[str, float]:
    """Learn a unigram piece vocabulary from the corpus; returns
    ``{piece: logprob}`` of at most ``vocab_size`` entries (single
    characters always retained)."""
    words = word_counts(df, text_col).localCheckpoint(eager=False)
    logp = _normalize(dict(seed_pieces(words, max_piece_len, seed_size)))
    for _ in range(n_em):
        logp = _normalize(_estep_counts(words, logp, max_piece_len))
    if len(logp) > vocab_size:
        keep = sorted(logp,
                      key=lambda p: (len(p) > 1, -logp[p], p))[:vocab_size]
        kept = set(keep) | {p for p in logp if len(p) == 1}
        logp = _normalize({p: round(math.exp(lp) * 1e9)
                           for p, lp in logp.items() if p in kept})
    return logp


def unigram_segment(df: DataFrame, text_col: str, id_col: str,
                    vocab: dict[str, float],
                    max_piece_len: int = 4) -> DataFrame:
    """Segment every document with a trained vocabulary: one
    Arrow-batched projection (broadcast vocab dict), no shuffle.
    Emits ``(id, pieces array<string>, n_pieces, logprob)`` — the
    tokenization surface a training pipeline feeds to packing."""
    from nyctaxidatapipeline_spark.functions.text import tokens

    src = df.select(F.col(id_col).alias("_id"),
                    tokens(text_col).alias("_words"))
    id_type = src.schema["_id"].dataType.simpleString()

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, ws in zip(pdf["_id"], pdf["_words"]):
                pieces: list[str] = []
                lp = 0.0
                for w in (ws if ws is not None else []):
                    for p in viterbi_pieces(w, vocab, max_piece_len):
                        pieces.append(p)
                        lp += vocab.get(p, _UNK_LOGP)
                out.append((_id, pieces, len(pieces), lp))
            yield pd.DataFrame(
                out, columns=["id", "pieces", "n_pieces", "logprob"])

    return src.mapInPandas(
        kern, f"id {id_type}, pieces array<string>, n_pieces int, "
              f"logprob double")
