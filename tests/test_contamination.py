"""Benchmark decontamination operator (operators/contamination.py)."""

from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.contamination import (
    decontaminate,
    ngram_contamination,
)


def _frames(spark):
    corpus = spark.createDataFrame([
        # contains the benchmark trigram "the quick brown" + "quick brown fox"
        Row(doc_id=1, text="the quick brown fox jumps high"),
        # clean document
        Row(doc_id=2, text="a totally unrelated piece of text"),
        # verbatim benchmark copy — fully contaminated
        Row(doc_id=3, text="the quick brown fox"),
        # too short for a trigram — absent from the output
        Row(doc_id=4, text="two words"),
    ])
    benchmark = spark.createDataFrame([
        Row(doc_id=100, text="the quick brown fox"),
    ])
    return corpus, benchmark


def test_contamination_counts(spark):
    corpus, benchmark = _frames(spark)
    out = {r.doc_id: r for r in
           ngram_contamination(corpus, benchmark, "text", "doc_id",
                               n=3).collect()}
    assert set(out) == {1, 2, 3}          # doc 4: no trigrams, absent
    # doc 1: 4 trigrams, 2 of them benchmark trigrams
    assert out[1].n_ngrams == 4 and out[1].n_hits == 2
    assert abs(out[1].contamination - 0.5) < 1e-9
    assert out[2].n_hits == 0 and out[2].contamination == 0.0
    # doc 3 is a verbatim copy
    assert out[3].n_hits == out[3].n_ngrams
    assert out[3].contamination == 1.0


def test_decontaminate_drops_only_contaminated(spark):
    corpus, benchmark = _frames(spark)
    kept = {r.doc_id for r in
            decontaminate(corpus, benchmark, "text", "doc_id",
                          n=3).collect()}
    # docs 1 and 3 overlap the benchmark; 2 is clean; 4 has no trigrams
    # (cannot be n-gram-contaminated) and must survive
    assert kept == {2, 4}


def test_decontaminate_threshold(spark):
    corpus, benchmark = _frames(spark)
    kept = {r.doc_id for r in
            decontaminate(corpus, benchmark, "text", "doc_id", n=3,
                          max_contamination=0.6).collect()}
    # only the verbatim copy (contamination 1.0) exceeds 0.6
    assert kept == {1, 2, 4}
