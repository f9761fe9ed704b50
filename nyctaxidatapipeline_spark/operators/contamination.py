"""Benchmark decontamination — n-gram overlap between a training corpus
and an evaluation/benchmark set.

Standard LLM-training hygiene (the reference, a taxi ETL, has no
counterpart — this is part of the training-data surface this engine adds):
a training document is contaminated when it shares word n-grams with a
benchmark document; contaminated docs are reported (and typically dropped
or redacted) before training.

Scale shape (100 TB corpus, benchmark sets of at most a few million
n-grams): the benchmark side reduces to its DISTINCT shingle set and
BROADCASTS — the corpus is never shuffled by shingle, so cost is one scan
of the corpus plus one hash-aggregate by doc id. The corpus side's
per-document shingle sets reuse ``dedup.doc_shingles`` (distinct
(id, shingle) pairs, fanned out to cluster parallelism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.dedup import doc_shingles


def ngram_contamination(corpus: DataFrame, benchmark: DataFrame,
                        text_col: str, id_col: str,
                        n: int = 3) -> DataFrame:
    """Per-document benchmark n-gram overlap.

    Output: (id, n_ngrams, n_hits, contamination) — one row per corpus
    document that produces at least one n-gram; ``n_hits`` counts its
    DISTINCT n-grams that appear anywhere in the benchmark set and
    ``contamination`` = n_hits / n_ngrams rounded to 6 dp. Documents
    shorter than ``n`` tokens yield no shingles and are absent (they
    cannot be n-gram-contaminated).
    """
    corpus_sh = doc_shingles(corpus, text_col, id_col, n)
    bench_sh = (doc_shingles(benchmark, text_col, id_col, n)
                .select("shingle").distinct())
    totals = corpus_sh.groupBy(id_col).agg(F.count("*").alias("n_ngrams"))
    hits = (corpus_sh.join(F.broadcast(bench_sh), "shingle")
                     .groupBy(id_col).agg(F.count("*").alias("n_hits")))
    return (totals.join(hits, id_col, "left")
                  .select(id_col, "n_ngrams",
                          F.coalesce(F.col("n_hits"), F.lit(0))
                           .alias("n_hits"),
                          F.round(F.coalesce(F.col("n_hits"), F.lit(0))
                                  / F.col("n_ngrams"), 6)
                           .alias("contamination")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str, id_col: str, n: int = 3,
                  max_contamination: float = 0.0) -> DataFrame:
    """Drop corpus documents whose benchmark n-gram overlap exceeds
    ``max_contamination`` (default: any overlap). Anti-join on the flagged
    ids — the corpus keeps its schema and never shuffles."""
    flagged = (ngram_contamination(corpus, benchmark, text_col, id_col, n)
               .filter(F.col("contamination") > max_contamination)
               .select(id_col))
    return corpus.join(flagged, id_col, "left_anti")
