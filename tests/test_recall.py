"""Recall regression gates for the sketch/approximate paths.

Every approximate operator (MinHash LSH, RP-LSH, IVF) has an exact,
oracle-checked twin. These gates pin recall-vs-twin so a parameter or
algorithm regression that silently drops recall can never stay green.

Operating points matter: the `embeddings` fixture is ISOTROPIC random
data (max pairwise cosine ≈ 0.48, no clusters, no planted near-dups) —
at a 0.4 cosine threshold the bit-agreement gap between "similar" (~0.64)
and random (~0.5) pairs is so small that NO hyperplane-LSH parameters
separate them without degenerating to all-pairs; likewise IVF pruning
cannot beat random-list luck when neighbors are spread uniformly. So:

  * MinHash is gated on the real `documents` fixture (its twin's 0.5
    Jaccard threshold IS a realistic near-dup operating point).
  * RP-LSH and IVF are gated on planted-structure corpora (clusters +
    true near-dups at cosine >= 0.95) — the workload these indexes are
    designed for, per the standard LSH/IVF analyses.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_pairs,
)
from nyctaxidatapipeline_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dup,
    ivf_topk,
    rp_lsh_near_dup,
)
from nyctaxidatapipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
RECALL_FLOOR = 0.9


def _recall(sketch: set, exact: set) -> float:
    return 1.0 if not exact else len(sketch & exact) / len(exact)


def _clustered_corpus(spark, n_clusters=8, per_cluster=40, dim=32,
                      n_dups=30, seed=11):
    """Gaussian clusters on the sphere + planted near-dup pairs: dup j is
    vector j plus tiny noise (cosine >= ~0.99). Returns (df, dup_pairs)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = []
    for ci in range(n_clusters):
        pts = centers[ci] + 0.15 * rng.normal(size=(per_cluster, dim))
        vecs.extend(pts)
    base = np.array(vecs)
    n = len(base)
    dup_pairs = set()
    rows = [Row(vec_id=i, embedding=[float(x) for x in base[i]])
            for i in range(n)]
    for j in range(n_dups):
        src = int(rng.integers(0, n))
        dup = base[src] + 0.01 * rng.normal(size=dim)
        rows.append(Row(vec_id=n + j,
                        embedding=[float(x) for x in dup]))
        dup_pairs.add((src, n + j))
    return spark.createDataFrame(rows), dup_pairs


def test_minhash_recall_vs_exact_jaccard_fixture(spark):
    # The scale path must find >= 90% of the exact twin's pairs on the
    # real documents fixture at the registered query's operating point.
    docs = load_table(spark, SF, "documents")
    exact = {(r.id_a, r.id_b)
             for r in jaccard_pairs(docs, "text", "doc_id", n=3,
                                    threshold=0.5, max_df=20).collect()}
    # portable=True is the registered query's operating point; the
    # xxhash64 production variant shares everything but the hash family
    sketch = {(r.id_a, r.id_b)
              for r in minhash_lsh_pairs(docs, "text", "doc_id", n=3,
                                         num_hashes=32, bands=8,
                                         threshold=0.5,
                                         portable=True).collect()}
    assert exact, "fixture lost its planted near-dups — fixture problem"
    # verification guarantees precision; the gate is recall
    assert sketch <= exact | sketch
    assert _recall(sketch, exact) >= RECALL_FLOOR


def test_rp_lsh_recall_on_planted_near_dups(spark):
    df, _ = _clustered_corpus(spark)
    exact = {(r.id_a, r.id_b)
             for r in embedding_near_dup(df, 0.95, dim=32).collect()}
    assert len(exact) >= 25  # the planted pairs are really there
    # both plane families (xxhash64 default and the md5-portable one the
    # registered query runs) must clear the same recall floor
    for portable in (False, True):
        sketch = {(r.id_a, r.id_b)
                  for r in rp_lsh_near_dup(df, 0.95, planes=24, bands=8,
                                           dim=32,
                                           portable=portable).collect()}
        assert _recall(sketch, exact) >= RECALL_FLOOR
        # exact-cosine verification means no false positives ever
        assert sketch <= exact


def test_ivf_recall_on_clustered_corpus(spark):
    df, _ = _clustered_corpus(spark)
    queries = df.filter(F.col("vec_id") % 37 == 0).limit(8)
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(df, queries, k=10, dim=32).collect()}
    approx = {(r.query_id, r.vec_id)
              for r in ivf_topk(df, queries, k=10, n_centroids=16,
                                nprobe=4, dim=32,
                                kmeans_iters=2).collect()}
    assert _recall(approx, exact) >= RECALL_FLOOR


def test_ivf_lloyd_refinement_improves_recall(spark):
    # The refined quantizer must never be worse than raw hash seeds at
    # the same nprobe on clustered data (the workload IVF exists for).
    df, _ = _clustered_corpus(spark, seed=23)
    queries = df.filter(F.col("vec_id") % 41 == 0).limit(8)
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(df, queries, k=10, dim=32).collect()}
    rec = {}
    for iters in (0, 2):
        approx = {(r.query_id, r.vec_id)
                  for r in ivf_topk(df, queries, k=10, n_centroids=16,
                                    nprobe=4, dim=32,
                                    kmeans_iters=iters).collect()}
        rec[iters] = _recall(approx, exact)
    assert rec[2] >= rec[0]
    assert rec[2] >= RECALL_FLOOR


def test_quantized_ann_recall(spark):
    """int8-quantized vectors must preserve cosine top-k: recall@10 of
    brute force over dequantized codes vs full-precision >= floor."""
    from nyctaxidatapipeline_spark.operators.quantize import (
        dequantize_expr,
        dim_bounds,
        quantize,
    )
    from nyctaxidatapipeline_spark.sources import load_table

    df = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    lo, hi = dim_bounds(df)
    deq = (quantize(df, lo, hi)
           .select("vec_id",
                   dequantize_expr(F.col("codes"), lo, hi)
                   .alias("embedding")))
    queries = df.filter(F.col("vec_id") < 8)
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(df, queries, k=10).collect()}
    approx = {(r.query_id, r.vec_id)
              for r in brute_force_topk(
                  deq, queries.select("vec_id", "embedding"),
                  k=10).collect()}
    assert _recall(approx, exact) >= RECALL_FLOOR


def test_pq_recall_on_clustered_corpus(spark):
    # PQ/ADC candidate selection + exact rerank must recover >= 90% of
    # the exact top-10 on clustered data (the m=4 x 16-code operating
    # point the registered ann_pq query runs).
    from nyctaxidatapipeline_spark.operators.pq import pq_topk

    df, _ = _clustered_corpus(spark)
    queries = df.filter(F.col("vec_id") % 37 == 0).limit(8)
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(df, queries, k=10, dim=32).collect()}
    approx = {(r.query_id, r.vec_id)
              for r in pq_topk(df, queries, k=10, n_codes=16, m=4,
                               rerank=50, dim=32).collect()}
    assert _recall(approx, exact) >= RECALL_FLOOR


def test_ivfpq_recall_on_clustered_corpus(spark):
    # The composed IVF->PQ/ADC->rerank pipeline (the registered
    # ann_ivfpq shape: 16 lists, nprobe=4, m=4 x 16 codes, rerank=50)
    # bounds the compression + pruning error jointly: recall@10 vs
    # full-precision brute force >= floor — so the hash-match at sf0.01
    # is backed by a geometric guarantee, not just reproducibility.
    from nyctaxidatapipeline_spark.operators.pq import ivfpq_topk

    df, _ = _clustered_corpus(spark)
    queries = df.filter(F.col("vec_id") % 37 == 0).limit(8)
    exact = {(r.query_id, r.vec_id)
             for r in brute_force_topk(df, queries, k=10, dim=32).collect()}
    approx = {(r.query_id, r.vec_id)
              for r in ivfpq_topk(df, queries, k=10, n_centroids=16,
                                  nprobe=4, n_codes=16, m=4, rerank=50,
                                  dim=32).collect()}
    assert _recall(approx, exact) >= RECALL_FLOOR


def test_rp_lsh_params_scaling_laws(spark):
    """The auto-parameterization's three contracts: random-candidate
    volume stays ~linear in n, the recall formula clears the target,
    and parameters grow monotonically with corpus size."""
    import math

    from nyctaxidatapipeline_spark.operators.similarity import (
        rp_lsh_params,
    )

    prev_planes = 0
    for n in (1_000, 100_000, 10_000_000):
        planes, bands = rp_lsh_params(n, threshold=0.95,
                                      target_recall=0.9)
        w = planes // bands
        assert planes % bands == 0
        # expected random collisions per band ~ n^2 / 2^w <= 2n
        assert n * n * (0.5 ** w) <= 2 * n
        # recall formula >= target at the chosen (w, b)
        p = 1.0 - math.acos(0.95) / math.pi
        recall = 1.0 - (1.0 - p ** w) ** bands
        assert recall >= 0.9 or bands == 128  # cap is the only out
        assert planes >= prev_planes
        prev_planes = planes
    # degenerate corpus
    assert rp_lsh_params(1) == (4, 1)


def test_knn_graph_ivf_recall_on_clustered_corpus(spark):
    # The approximate kNN graph (IVF, queries=corpus, self excluded)
    # must recover >= 90% of the exact graph's edges on clustered data
    # — at the registered AUTO-sized shape (n_centroids =
    # ceil(sqrt(nprobe*n)), the default) with Lloyd-refined centroids.
    from nyctaxidatapipeline_spark.operators.similarity import (
        knn_graph,
        knn_graph_ivf,
    )

    df, _ = _clustered_corpus(spark)
    exact = {(r.query_id, r.vec_id)
             for r in knn_graph(df, k=5, n_blocks=4).collect()}
    approx = {(r.query_id, r.vec_id)
              for r in knn_graph_ivf(df, k=5, nprobe=4,
                                     dim=32).collect()}
    assert _recall(approx, exact) >= RECALL_FLOOR
    # every anchor keeps a full (or near-full) neighbor list
    anchors = {q for q, _ in approx}
    assert len(anchors) == df.count()


def test_rp_lsh_auto_recall_on_planted_dups(spark):
    # End-to-end auto operator (count -> rp_lsh_params -> banded
    # buckets -> rerank): the default near-dup operating point must
    # clear the recall floor on the planted-dup workload, with exact
    # rerank guaranteeing zero false positives.
    from nyctaxidatapipeline_spark.operators.similarity import (
        rp_lsh_near_dup_auto,
    )

    df, _ = _clustered_corpus(spark)
    exact = {(r.id_a, r.id_b)
             for r in embedding_near_dup(df, 0.95, dim=32).collect()}
    assert len(exact) >= 25
    sketch = {(r.id_a, r.id_b)
              for r in rp_lsh_near_dup_auto(df, threshold=0.95,
                                            target_recall=0.9,
                                            dim=32).collect()}
    assert _recall(sketch, exact) >= RECALL_FLOOR
    assert sketch <= exact


def test_rp_lsh_params_drive_recall_on_planted_dups(spark):
    # end-to-end: params chosen FROM the corpus size still clear the
    # recall floor on the planted-near-dup workload
    from nyctaxidatapipeline_spark.operators.similarity import (
        rp_lsh_params,
    )

    df, _ = _clustered_corpus(spark)
    n = df.count()
    planes, bands = rp_lsh_params(n, threshold=0.95, target_recall=0.9)
    exact = {(r.id_a, r.id_b)
             for r in embedding_near_dup(df, 0.95, dim=32).collect()}
    sketch = {(r.id_a, r.id_b)
              for r in rp_lsh_near_dup(df, 0.95, planes=planes,
                                       bands=bands, dim=32).collect()}
    assert _recall(sketch, exact) >= RECALL_FLOOR
    assert sketch <= exact
