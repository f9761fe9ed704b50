"""BPE training on the classic Sennrich fixture + segmentation rules."""

from __future__ import annotations

from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.bpe import (
    bpe_segment,
    bpe_train,
    word_counts,
)


def _corpus(spark):
    # the worked example from Sennrich et al. (2016): word frequencies
    # low:5 lower:2 newest:6 widest:3
    docs = []
    docs += ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame([Row(doc_id=i, text=t)
                                  for i, t in enumerate(docs)])


def test_word_counts(spark):
    wc = {r["word"]: r["n"] for r in
          word_counts(_corpus(spark), "text").collect()}
    assert wc == {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_bpe_learns_the_classic_merges(spark):
    merges = bpe_train(_corpus(spark), "text", n_merges=4)
    # round 1: ('e','s') count 9 (newest 6 + widest 3)
    # round 2: ('es','t</w>') count 9 — t carries the end marker
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t</w>")
    # 'est</w>' is now a single learned subword token
    assert len(merges) == 4


def test_bpe_train_deterministic(spark):
    df = _corpus(spark)
    assert bpe_train(df, "text", 3) == \
        bpe_train(df.repartition(7), "text", 3)


def test_bpe_segment_applies_merges_in_order(spark):
    df = _corpus(spark)
    merges = bpe_train(df, "text", n_merges=2)
    doc = spark.createDataFrame([Row(doc_id=1, text="newest low")])
    segs = {tuple(r["symbols"]) for r in
            bpe_segment(doc, "text", "doc_id", merges).collect()}
    # 'newest' ends in the learned est</w>; 'low' stays char-split
    assert ("n", "e", "w", "est</w>") in segs
    assert ("l", "o", "w</w>") in segs


def test_bpe_stops_when_no_pair_qualifies(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="ab cd ef")])
    assert bpe_train(df, "text", n_merges=5, min_pair_count=2) == []
