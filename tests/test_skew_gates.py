"""Planted-skew CORRECTNESS gates (bench.py only A/Bs skew *timing*).

A hot key must not change WHAT the dedup operators output, however the
input happens to be partitioned: one cluster of near-identical documents
collapses every shingle/band bucket it touches into a single giant
posting list (the Zipf/boilerplate regime at 100 TB), and the result
must be hash-identical whether that cluster arrives in one partition or
scattered across thirteen. Catches any operator that leaks partition
order into results (collect_list without sort, first() without order,
row_number over an under-specified window)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.dedup import (
    connected_components,
    jaccard_pairs,
    minhash_lsh_pairs,
)
from nyctaxidatapipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"
HOT_BASE = 10_000_000
N_HOT = 200


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """sf0.1 documents + a planted 200-doc hot cluster: near-identical
    boilerplate (tiny per-doc suffix), so every one of its shingles has
    df≈200 and every MinHash band bucket it hits holds all 200 ids."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    boiler = ("breaking news widget footer subscribe to our newsletter "
              "all rights reserved terms of service apply today ")
    hot = spark.range(N_HOT).select(
        (F.col("id") + HOT_BASE).alias("doc_id"),
        F.concat(F.lit(boiler * 3),
                 (F.pmod(F.col("id"), F.lit(5))).cast("string"))
         .alias("text"))
    return docs.unionByName(hot).localCheckpoint()


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_minhash_pairs_invariant_under_repartition(skewed_docs):
    # max_bucket=None: this gate exercises the UNCAPPED exhaustive
    # semantics on purpose — the 200-doc hot cluster's posting lists
    # must expand identically however the input is partitioned (the
    # r9 default flip to the capped-32 production semantics would
    # otherwise skip exactly the buckets this test exists to stress)
    plain = minhash_lsh_pairs(skewed_docs, "text", "doc_id",
                              threshold=0.5, max_bucket=None)
    scattered = minhash_lsh_pairs(
        skewed_docs.repartition(13, "doc_id"), "text", "doc_id",
        threshold=0.5, max_bucket=None)
    a, b = _canon(plain), _canon(scattered)
    assert a == b
    # the hot cluster is genuinely exercised: its pairs dominate
    hot_pairs = [p for p in a if p[0] >= HOT_BASE and p[1] >= HOT_BASE]
    assert len(hot_pairs) >= N_HOT * (N_HOT // 5 - 1) // 2


def test_near_dup_groups_invariant_under_repartition(skewed_docs):
    # max_df must admit the df~200 hot shingles so the posting-list hot
    # path (the thing this gate stresses) actually runs
    def groups(df):
        pairs = jaccard_pairs(df, "text", "doc_id", n=3, threshold=0.5,
                              max_df=1000)
        return connected_components(pairs).select(
            F.col("id").alias("doc_id"), F.col("comp").alias("group_id"))

    a = _canon(groups(skewed_docs))
    b = _canon(groups(skewed_docs.repartition(13, "doc_id")))
    assert a == b
    # the suffix variants stay above 0.5 Jaccard of each other, so the
    # whole hot cluster resolves into ONE giant component labeled by its
    # min doc_id — i.e. the near-clique really was expanded and closed
    comps = {g for d, g in a if d >= HOT_BASE}
    assert comps == {HOT_BASE}
    assert sum(1 for d, _ in a if d >= HOT_BASE) == N_HOT
