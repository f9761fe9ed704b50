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


def test_bm25_multi_single_query_matches_bm25_scores(spark):
    # One query bag through the multi-query path must reproduce the
    # proven single-bag operator score-for-score.
    from nyctaxidatapipeline_spark.operators.relevance import bm25_multi

    docs = spark.createDataFrame([
        Row(doc_id=1, text="spark joins vectors with spark"),
        Row(doc_id=2, text="vectors and joins"),
        Row(doc_id=3, text="nothing relevant here"),
        Row(doc_id=4, text="spark spark spark"),
    ])
    single = {r.doc_id: (r.n_terms, r.bm25)
              for r in bm25_scores(docs, ["spark", "joins"],
                                   "text", "doc_id").collect()}
    q = spark.createDataFrame([Row(query_id=7, term="spark"),
                               Row(query_id=7, term="joins")])
    multi = {r.doc_id: (r.n_terms, r.bm25)
             for r in bm25_multi(docs, q, "text", "doc_id").collect()}
    assert multi == single and set(multi) == {1, 2, 4}


def test_bm25_multi_docfreq_is_corpus_level(spark):
    # A term shared by two queries must keep its corpus doc_freq — the
    # window runs before the query join, so duplicated query rows can't
    # inflate it (scores for both queries must be identical).
    from nyctaxidatapipeline_spark.operators.relevance import bm25_multi

    docs = spark.createDataFrame([
        Row(doc_id=1, text="alpha beta"),
        Row(doc_id=2, text="alpha gamma"),
    ])
    q = spark.createDataFrame([Row(query_id=1, term="alpha"),
                               Row(query_id=2, term="alpha")])
    out = bm25_multi(docs, q, "text", "doc_id").collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, {})[r.doc_id] = r.bm25
    assert by_q[1] == by_q[2] and set(by_q[1]) == {1, 2}


def test_top_query_terms_longest_distinct(spark):
    from nyctaxidatapipeline_spark.operators.relevance import (
        top_query_terms,
    )

    docs = spark.createDataFrame([
        Row(doc_id=1, text="bb aaaa aaaa cc dddd"),
    ])
    got = sorted((r.term for r in
                  top_query_terms(docs, "text", "doc_id",
                                  n_terms=3).collect()))
    # longest first (aaaa, dddd), then 2-char ties break
    # alphabetically (bb before cc); duplicates collapse
    assert got == ["aaaa", "bb", "dddd"]


def test_rrf_fuse_hand_computed(spark):
    from nyctaxidatapipeline_spark.operators.relevance import rrf_fuse

    a = spark.createDataFrame([Row(query_id=1, doc_id=10, rank=1),
                               Row(query_id=1, doc_id=11, rank=2)])
    b = spark.createDataFrame([Row(query_id=1, doc_id=11, rank=1),
                               Row(query_id=1, doc_id=12, rank=2)])
    out = {r.doc_id: (r.n_lists, r.rrf, r.rank)
           for r in rrf_fuse([a, b], k=3, c=60).collect()}
    # doc 11: 1/62 + 1/61; docs 10/12: 1/61 and 1/62 alone
    assert out[11] == (2, round(1 / 62 + 1 / 61, 6), 1)
    assert out[10] == (1, round(1 / 61, 6), 2)
    assert out[12] == (1, round(1 / 62, 6), 3)


def test_bm25_multi_empty_queries(spark):
    from pyspark.sql import types as T

    from nyctaxidatapipeline_spark.operators.relevance import bm25_multi

    docs = spark.createDataFrame([Row(doc_id=1, text="hello world")])
    empty_q = spark.createDataFrame(
        [], schema=T.StructType([
            T.StructField("query_id", T.LongType()),
            T.StructField("term", T.StringType())]))
    out = bm25_multi(docs, empty_q, "text", "doc_id")
    # plans and evaluates (no zero-arg isin error), matches nothing,
    # keeps the non-empty path's id types
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "doc_id", "n_terms", "bm25"]
    assert isinstance(out.schema["doc_id"].dataType, T.LongType)
