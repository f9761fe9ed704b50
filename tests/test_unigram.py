"""Unigram-LM tokenizer (SentencePiece-style Viterbi-EM) — training,
segmentation, determinism, reference replication."""

import math

import pytest

from nyctaxidatapipeline_spark.operators.bpe import word_counts
from nyctaxidatapipeline_spark.operators.unigram import (
    _estep_counts,
    seed_pieces,
    unigram_segment,
    unigram_train,
    viterbi_pieces,
)


def _corpus(spark):
    rows = [(0, "abab abab banana"), (1, "abab banana banana"),
            (2, "cab abab"), (3, "banana abab abab")]
    return spark.createDataFrame(rows, "doc_id long, text string")


# ----------------------------------------------------------------- viterbi

def test_viterbi_prefers_high_prob_pieces():
    logp = {"ab": math.log(0.4), "a": math.log(0.1),
            "b": math.log(0.1), "abab": math.log(0.05)}
    # 2x 'ab' = log 0.16 beats 'abab' = log 0.05 and 4 chars = 1e-4
    assert viterbi_pieces("abab", logp, 4) == ["ab", "ab"]
    logp["abab"] = math.log(0.2)
    assert viterbi_pieces("abab", logp, 4) == ["abab"]


def test_viterbi_oov_chars_never_unsegmentable():
    logp = {"a": math.log(0.5)}
    assert viterbi_pieces("axa", logp, 4) == ["a", "x", "a"]


def test_viterbi_tie_prefers_longer_piece():
    logp = {"aa": math.log(0.25), "a": math.log(0.5)}
    # 'aa' (log 0.25) ties 'a'+'a' (log 0.25): longer piece wins
    assert viterbi_pieces("aa", logp, 4) == ["aa"]


# ------------------------------------------------------------------- seed

def test_seed_pieces_scored_by_count_times_len(spark):
    words = word_counts(_corpus(spark), "text")
    seeds = dict(seed_pieces(words, max_piece_len=3, seed_size=1000))
    # 'abab' appears 6x, 'banana' 4x, 'cab' 1x
    assert seeds["aba"] == 6 and seeds["ana"] == 8  # 2 per banana
    assert seeds["a"] == 6 * 2 + 4 * 3 + 1  # all a's
    assert "abab" not in seeds  # > max_piece_len


def test_estep_matches_single_process_reference(spark):
    words = word_counts(_corpus(spark), "text")
    logp = {p: math.log(c) for p, c in
            seed_pieces(words, max_piece_len=3, seed_size=1000)}
    got = _estep_counts(words, logp, 3)
    ref: dict[str, int] = {}
    for r in words.collect():
        for p in viterbi_pieces(r["word"], logp, 3):
            ref[p] = ref.get(p, 0) + int(r["n"])
    assert got == ref


# ------------------------------------------------------------------ train

def test_train_learns_frequent_pieces_and_is_deterministic(spark):
    df = _corpus(spark)
    v1 = unigram_train(df, "text", vocab_size=20, n_em=2,
                       max_piece_len=3)
    v2 = unigram_train(df.repartition(7), "text", vocab_size=20,
                       n_em=2, max_piece_len=3)
    assert v1 == v2  # repartition invariance, bit-exact
    assert len(v1) <= 20 + 26  # vocab_size plus retained singles
    # frequent multi-char pieces survive pruning and outrank rare ones
    assert "ab" in v1 or "aba" in v1
    assert all(len(p) >= 1 for p in v1)
    # probabilities normalized: logsumexp == 0
    total = sum(math.exp(lp) for lp in v1.values())
    assert total == pytest.approx(1.0)


def test_segment_surface(spark):
    df = _corpus(spark)
    vocab = unigram_train(df, "text", vocab_size=50, n_em=2,
                          max_piece_len=3)
    seg = {r.id: r for r in
           unigram_segment(df, "text", "doc_id", vocab,
                           max_piece_len=3).collect()}
    assert set(seg) == {0, 1, 2, 3}
    r = seg[0]
    assert "".join(r.pieces) == "ababababbanana"
    assert r.n_pieces == len(r.pieces)
    assert r.logprob == pytest.approx(
        sum(vocab.get(p, -100.0) for p in r.pieces))
    # pieces reconstruct every doc's words losslessly
    for rid, row in seg.items():
        txt = dict((d.doc_id, d.text) for d in df.collect())[rid]
        assert "".join(row.pieces) == txt.replace(" ", "")
