"""Unit tests: language ID, quality scoring, fingerprinting."""

from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.text_analysis import (
    fingerprint,
    fingerprint_dedup,
    language_id,
    quality_score,
    token_stats,
)


def test_language_id_rules(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, text="the cat is on the mat and it is happy"),
        Row(doc_id=1, text="der hund ist nicht mit der katze"),
        Row(doc_id=2, text="el perro es un animal que corre por la calle"),
        Row(doc_id=3, text="le chien est dans une maison pour nous"),
        Row(doc_id=4, text="这是 一个 测试 文档"),
        Row(doc_id=5, text="xyzzy plugh quux"),
        Row(doc_id=6, text=""),
    ])
    got = {r.doc_id: r.pred_lang
           for r in language_id(df, "text").collect()}
    assert got == {0: "en", 1: "de", 2: "es", 3: "fr", 4: "zh",
                   5: "und", 6: "und"}


def test_token_stats_empty_text(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="ab cde"),
                                Row(doc_id=1, text="   ")])
    got = {r.doc_id: (r.n_tokens, r.n_chars, r.avg_token_len)
           for r in token_stats(df, "text", "doc_id").collect()}
    assert got[0] == (2, 6, 2.5)
    assert got[1] == (0, 3, None)  # whitespace-only: no tokens, NULL avg


def test_quality_score_bounds(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox, it is fast! " * 20),
        Row(doc_id=1, text="zz"),
    ])
    got = {r.doc_id: r for r in quality_score(df, "text", "doc_id").collect()}
    assert 0.0 <= got[1].quality_score < got[0].quality_score <= 1.0
    assert got[0].length_score == 1.0  # capped at 100 tokens
    assert got[1].stopword_ratio == 0.0


def test_fingerprint_normalizes_case_and_space(spark):
    df = spark.createDataFrame([
        Row(doc_id=0, text="Hello   World"),
        Row(doc_id=1, text="hello world"),
        Row(doc_id=2, text="different entirely"),
    ])
    fps = {r.doc_id: r.fingerprint
           for r in fingerprint(df, "text", "doc_id").collect()}
    assert fps[0] == fps[1] != fps[2]
    dedup = {r.fingerprint: (r.doc_id, r.n_copies)
             for r in fingerprint_dedup(df, "text", "doc_id").collect()}
    assert dedup[fps[0]] == (0, 2)
