"""k-means clustering + SemDeDup semantic dedup.

Assignment determinism and the oracle-mirroring tie rule are covered by
the differential gate (`kmeans_assign` / `semantic_dedup`); these tests
pin the pieces the oracle can't see — Lloyd refinement (order-sensitive
mean arithmetic), zero-vector handling, and SemDeDup recall against the
exact all-pairs twin on planted-cluster data (the workload the blocking
is designed for).
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    kmeans_objective,
    seed_centroids,
    semantic_dedup_pairs,
)
from nyctaxidatapipeline_spark.operators.similarity import (
    embedding_near_dup,
)
from nyctaxidatapipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _planted(spark, n_clusters=6, per_cluster=30, dim=16, n_dups=20,
             seed=7):
    """Gaussian clusters on the sphere + planted near-dups (cosine
    ~0.99 to their source)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for ci in range(n_clusters):
        vecs.extend(centers[ci]
                    + 0.12 * rng.normal(size=(per_cluster, dim)))
    base = np.array(vecs)
    n = len(base)
    rows = [Row(vec_id=i, embedding=[float(x) for x in base[i]])
            for i in range(n)]
    for j in range(n_dups):
        src = int(rng.integers(0, n))
        rows.append(Row(vec_id=n + j,
                        embedding=[float(x) for x in
                                   base[src]
                                   + 0.01 * rng.normal(size=dim)]))
    return spark.createDataFrame(rows)


def test_assignment_total_and_stable(spark):
    emb = load_table(spark, SF, "embeddings")
    cents = seed_centroids(emb, 4)
    a1 = assign_clusters(emb, cents).collect()
    a2 = assign_clusters(emb, cents).collect()
    assert {r["vec_id"] for r in a1} == \
        {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a2))
    assert all(0 <= r["cluster_id"] < 4 for r in a1)


def test_zero_vector_dropped_and_seed_guard(spark):
    df = spark.createDataFrame(
        [Row(vec_id=0, embedding=[1.0, 0.0]),
         Row(vec_id=1, embedding=[0.0, 1.0]),
         Row(vec_id=2, embedding=[0.0, 0.0])])
    cents = seed_centroids(df, 2, vec_col="embedding")
    out = assign_clusters(df, cents).collect()
    assert {r["vec_id"] for r in out} == {0, 1}
    with pytest.raises(ValueError, match="non-degenerate"):
        seed_centroids(df, 3)


def test_lloyd_refinement_improves_objective(spark):
    df = _planted(spark)
    seeds = seed_centroids(df, 6)
    refined = kmeans_fit(df, 6, iters=3)
    o_seed = kmeans_objective(df, seeds)
    o_ref = kmeans_objective(df, refined)
    assert o_ref >= o_seed - 1e-9
    # refined centroids are unit-normalized
    for c in refined:
        assert math.isclose(sum(x * x for x in c), 1.0, rel_tol=1e-9)


def test_semantic_dedup_precision_and_recall(spark):
    df = _planted(spark)
    exact = {(r.id_a, r.id_b)
             for r in embedding_near_dup(df, 0.95, dim=16).collect()}
    assert len(exact) >= 15  # planted dups are really there
    cents = kmeans_fit(df, 6, iters=2)
    sem = {(r.id_a, r.id_b)
           for r in semantic_dedup_pairs(df, cents, threshold=0.95,
                                         dim=16).collect()}
    # within-cluster pairs use the true cosine -> no false positives
    assert sem <= exact
    # near-identical vectors land in the same cluster -> high recall
    assert len(sem & exact) / len(exact) >= 0.9


def test_semdedup_n_clusters_pins_pair_volume(spark):
    """The scaling contract: with k = semdedup_n_clusters(n), expected
    within-cluster pair volume n²/k stays <= n * target — linear in
    the corpus — at every scale; k is monotone in n."""
    from nyctaxidatapipeline_spark.operators.clustering import (
        semdedup_n_clusters,
    )

    prev = 0
    for n in (100, 10_000, 1_000_000, 100_000_000):
        k = semdedup_n_clusters(n, target_cluster_size=200)
        assert n * n / k <= n * 200
        assert k >= prev
        prev = k
    assert semdedup_n_clusters(1) == 1
    assert semdedup_n_clusters(401, target_cluster_size=200) == 3


def test_semdedup_blas_matches_expression_path(spark):
    """The BLAS execution path must produce the identical pair set and
    6-dp cosines as the expression path — same semantics, different
    engine placement."""
    from nyctaxidatapipeline_spark.operators.clustering import (
        seed_centroids,
        semantic_dedup_pairs,
        semantic_dedup_pairs_blas,
    )
    from nyctaxidatapipeline_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = seed_centroids(emb, 5)
    a = sorted(map(tuple,
                   semantic_dedup_pairs(emb, cents,
                                        threshold=0.4).collect()))
    b = sorted(map(tuple,
                   semantic_dedup_pairs_blas(emb, cents,
                                             threshold=0.4).collect()))
    assert a == b
