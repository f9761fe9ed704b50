"""TF-IDF / BM25 relevance scoring — hand-computed micro-corpus checks
(the fixture-scale values are pinned by the `bm25_scores` differential
oracle; these pin the formula itself on numbers small enough to verify
by hand)."""

from __future__ import annotations

import math

from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.relevance import (
    bm25_scores,
    tfidf_weights,
)

K1, B = 1.2, 0.75


def _bm25_term(tf, df, n_docs, dl, avgdl):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * (tf * (K1 + 1.0)) / (
        tf + K1 * (1.0 - B + B * dl / avgdl))


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame([
        Row(doc_id=0, text="spark joins data with spark"),
        Row(doc_id=1, text="duck db joins tables"),
        Row(doc_id=2, text="nothing relevant here"),
    ])
    out = {r["doc_id"]: r for r in
           bm25_scores(docs, ["spark", "joins"], "text",
                       "doc_id").collect()}
    # doc 2 matches no term -> absent
    assert set(out) == {0, 1}
    avgdl = round((5 + 4 + 3) / 3, 6)
    exp0 = (round(_bm25_term(2, 1, 3, 5, avgdl), 6)    # spark tf=2 df=1
            + round(_bm25_term(1, 2, 3, 5, avgdl), 6))  # joins tf=1 df=2
    assert out[0]["n_terms"] == 2
    assert out[0]["bm25"] == round(exp0, 6)
    exp1 = round(_bm25_term(1, 2, 3, 4, avgdl), 6)
    assert out[1]["n_terms"] == 1
    assert out[1]["bm25"] == round(exp1, 6)
    # two matching terms with higher tf outrank one
    assert out[0]["bm25"] > out[1]["bm25"]


def test_tfidf_rare_terms_weigh_more(spark):
    docs = spark.createDataFrame([
        Row(doc_id=i, text="common " + ("rare" if i == 0 else "filler"))
        for i in range(10)])
    w = {(r["doc_id"], r["token"]): r for r in
         tfidf_weights(docs, "text", "doc_id").collect()}
    assert w[(0, "rare")]["doc_freq"] == 1
    assert w[(0, "common")]["doc_freq"] == 10
    assert w[(0, "rare")]["tfidf"] > w[(0, "common")]["tfidf"]


def test_tfidf_min_doc_freq_prunes(spark):
    docs = spark.createDataFrame([
        Row(doc_id=i, text="common " + ("rare" if i == 0 else "filler"))
        for i in range(10)])
    toks = {r["token"] for r in
            tfidf_weights(docs, "text", "doc_id",
                          min_doc_freq=2).collect()}
    assert "rare" not in toks and "common" in toks
