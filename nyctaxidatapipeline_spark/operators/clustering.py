"""Distributed clustering over embedding columns: spherical k-means and
SemDeDup-style semantic dedup.

Extends the training-data surface (BASELINE.json north stars) past
pairwise near-dup: cluster the corpus embedding space, then (a) use the
cluster id as a routing / blocking key and (b) deduplicate *within*
clusters only — the SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540): k-means the embeddings, then drop cosine-near pairs
inside each cluster, which turns the O(n²) all-pairs search into
O(sum of cluster sizes²) with k tuned so clusters stay bounded.

Design for Spark:
  * **Assignment is a pure projection** — the k centroids are baked into
    the plan as literal arrays, each row computes its k cosines and takes
    the argmax with array expressions (`array_max` / `array_position`).
    Zero shuffle, embarrassingly parallel, whole-stage-codegen'd when the
    dimension is statically unrolled. No join, no window.
  * **Seeding is deterministic** — the k seed vectors are the k lowest
    rows by ``(md5(id), id)`` (same portable-hash trick as
    ``sampling.hash_bucket``), so every engine picks the same seeds and
    the assignment step is DuckDB-oracle-checkable bit-for-bit.
  * **Lloyd refinement is one shuffle per iteration** — per-dimension
    ``avg`` under ``groupBy(cluster_id)`` (map-side partial aggregation;
    k×dim doubles cross the wire), collect k centroids (bounded — k rows,
    never the data), re-bake, repeat. Mean arithmetic is order-sensitive,
    so refined centroids are unit-tested (objective must not degrade),
    not oracle-hashed; the iteration-0 assignment is the oracle surface.

Scale notes (100 TB): k should grow with the corpus (SemDeDup uses
~10⁴-10⁵ clusters for web scale) so per-cluster pair counts stay bounded;
the within-cluster self-join shuffles on ``cluster_id`` — skewed cluster
sizes are the known hazard, handled by raising k and by AQE skew-join
splitting. Assignment cost is O(n·k·dim) flops with no data movement —
for very large k, route through the IVF index (`similarity.ivf_index`)
instead of literal unrolling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.similarity import (
    as_double,
    dot,
    embedding_dim,
    l2_norm,
)
from nyctaxidatapipeline_spark.plans.util import fan_out


def _norm_py(c: list[float]) -> float:
    """Centroid L2 norm, computed driver-side with the identical
    sequential 0.0-seeded fold (Python floats ARE doubles) — bitwise
    equal to ``sqrt(list_dot_product(cv, cv))`` in the oracle."""
    acc = 0.0
    for x in c:
        acc = acc + float(x) * float(x)
    return acc ** 0.5


def seed_centroids(df: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic k seed vectors: the k lowest rows by
    ``(md5(id), id)`` — a portable pseudo-random draw (md5 is
    bit-identical in Spark / DuckDB / hashlib, unlike ``rand()`` whose
    stream is partition-dependent). Returns plain Python lists (k rows —
    a bounded TakeOrdered collect, never the corpus).

    Zero-norm vectors are excluded (cosine to them is undefined).
    """
    rows = (df.filter(l2_norm(as_double(vec_col)) > 0)
              .select(F.col(id_col), as_double(vec_col).alias("v"))
              .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
              .limit(k)
              .collect())
    if len(rows) < k:
        raise ValueError(f"corpus has only {len(rows)} non-degenerate "
                         f"vectors, need k={k} seeds")
    return [list(r["v"]) for r in rows]


def assign_clusters(df: DataFrame, centroids: list[list[float]],
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    keep_vec: bool = False) -> DataFrame:
    """Assign every vector to its max-cosine centroid — shuffle-free.

    Output: (id, cluster_id int, cosine) — ``cosine`` is the similarity
    to the winning centroid, rounded to 6 dp *before* the argmax so ties
    resolve identically across engines (first / lowest cluster_id wins,
    matching ``ORDER BY cosine DESC, cluster_id`` in the oracle).
    Zero-norm vectors are dropped (no defined nearest centroid).

    Expression-tree discipline (this formulation is deliberate): the
    k per-centroid cosines use the *interpreted fold* path
    (``F.aggregate`` over ``zip_with`` — ``similarity.dot`` with no
    static dim), NOT the statically-unrolled dot. Unrolling k·dim
    element terms into one projection (or letting the zero-norm filter
    push a dim-term unrolled predicate into the scan) grows the
    generated method past janino's 64 KB limit; the whole stage then
    silently falls back to fully-interpreted evaluation after a
    seconds-long failed compile (observed 9-15 s for a 5 k-row
    assignment vs ~1 s for this shape — check executor logs for
    ``Code grows beyond 64 KB`` when touching this). The fold is
    interpreted per element but the tree is O(k·dim) literal nodes, and
    the fold order matches DuckDB's ``list_dot_product`` bit-for-bit.
    """
    k = len(centroids)
    v = F.col("_v")
    n = F.col("_n")
    sims = F.array(*[
        # one array literal per centroid (NOT per-element F.lit calls —
        # k·dim py4j round-trips add seconds of driver-side build time)
        F.round(dot(v, F.lit([float(x) for x in c]))
                / (n * F.lit(_norm_py(c))), 6)
        for c in centroids])
    base = (fan_out(df, id_col)
            .select(F.col(id_col), as_double(vec_col).alias("_v"),
                    l2_norm(as_double(vec_col)).alias("_n"))
            .filter(n > 0)
            .select(F.col(id_col), sims.alias("_sims"),
                    *([v.alias("_vec"), n.alias("_norm")]
                      if keep_vec else [])))
    best = F.array_max(F.col("_sims"))
    return base.select(
        id_col,
        (F.array_position(F.col("_sims"), best) - 1)
         .cast("int").alias("cluster_id"),
        best.alias("cosine"),
        *([F.col("_vec"), F.col("_norm")] if keep_vec else []))


def kmeans_fit(df: DataFrame, k: int, iters: int = 2,
               id_col: str = "vec_id", vec_col: str = "embedding",
               dim: int | None = None) -> list[list[float]]:
    """Spherical k-means: deterministic seeding + ``iters`` Lloyd rounds.

    Each round: shuffle-free assignment, then one ``groupBy(cluster_id)``
    aggregate of per-dimension means (map-side combined; k×dim doubles
    shuffle), L2-normalized on the driver (k rows collected — bounded).
    Empty clusters keep their previous centroid. Deterministic given the
    input set (mean addition order may vary in ulps across runs — callers
    needing cross-engine hashes use iteration-0 assignment).
    """
    if dim is None:
        dim = embedding_dim(df, vec_col)
    centroids = seed_centroids(df, k, id_col, vec_col)
    for _ in range(iters):
        assigned = assign_clusters(df, centroids, id_col, vec_col,
                                   keep_vec=True)
        means = (assigned.groupBy("cluster_id")
                 .agg(*[F.avg(F.element_at(F.col("_vec"), i + 1))
                        .alias(f"m{i}") for i in range(dim)])
                 .collect())
        new = {int(r["cluster_id"]): [float(r[f"m{i}"])
                                      for i in range(dim)]
               for r in means}
        for cid, vec in new.items():
            norm = sum(x * x for x in vec) ** 0.5
            if norm > 0:
                centroids[cid] = [x / norm for x in vec]
    return centroids


def kmeans_objective(df: DataFrame, centroids: list[list[float]],
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> float:
    """Mean max-cosine over the corpus (spherical k-means objective —
    higher is better). One scan, one scalar aggregate."""
    assigned = assign_clusters(df, centroids, id_col, vec_col)
    row = assigned.agg(F.avg("cosine").alias("obj")).first()
    return float(row["obj"])


def semdedup_n_clusters(n: int, target_cluster_size: int = 200) -> int:
    """Corpus-size-aware cluster count for SemDeDup — the fix-in-code
    for the full-suite sf1 finding (PLANS.md #12: `semantic_dedup`
    18.7x at 10x data with a FIXED k): within-cluster candidate pairs
    scale as ``n²/k`` for fixed k, so 10x corpus = 100x pairs. With
    ``k = ceil(n / target_cluster_size)`` the expected cluster size is
    pinned and pair volume stays ``~n·target/2`` — LINEAR in the
    corpus — which is exactly how SemDeDup deployments size their
    FAISS k-means (k grows with n, cluster size stays constant).
    Centroid state is k×dim doubles on the driver: at n = 10 B docs and
    target 200 that is 50 M × dim — past that, swap the driver k-means
    for a hierarchical/two-level quantizer; the pair math downstream
    is unchanged. Registered queries keep fixed k for oracle
    reproducibility."""
    import math

    if target_cluster_size < 1:
        raise ValueError("target_cluster_size must be >= 1, got "
                         f"{target_cluster_size}")
    return max(1, math.ceil(n / target_cluster_size))


def semantic_dedup_pairs_blas(df: DataFrame,
                              centroids: list[list[float]],
                              threshold: float = 0.95,
                              id_col: str = "vec_id",
                              vec_col: str = "embedding") -> DataFrame:
    """SemDeDup with BLAS kernels — the auto-parameterized operating
    point's execution path. Identical semantics and output contract to
    ``semantic_dedup_pairs``; the difference is WHERE the arithmetic
    runs. With corpus-size-aware k (``semdedup_n_clusters``) the
    literal-centroid argmax assignment costs n·k interpreted fold dots
    — measured the dominant term at 10x bench scale (k grows with n,
    so the fold path is O(n²/target) overall). Here:

      * assignment is one Arrow-batched ``mapInPandas`` matmul against
        the k x d centroid matrix (rounded 6 dp half-away, argmax ties
        to the lowest cluster id — bit-matching the expression path's
        first-position argmax and the DuckDB twin);
      * within-cluster pairs are one |members|² matmul per cluster in
        ``applyInPandas`` keyed by cluster_id (the ``knn_graph_ivf``
        shape), emitting only pairs with rounded cosine >= threshold.

    Zero vectors are dropped up front (no cosine signal), matching the
    expression path and the oracle's norm filter.
    """
    from collections.abc import Iterator

    import pandas as pd

    from nyctaxidatapipeline_spark.operators.similarity import (
        _round6_half_away,
    )

    cmat_list = [list(map(float, c)) for c in centroids]

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cmat = np.array(cmat_list, dtype=np.float64)
        cmat = cmat / np.maximum(
            np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
        for pdf in batches:
            if not len(pdf):
                continue
            vm = np.stack(pdf["_vec"].to_numpy()).astype(np.float64)
            norms = np.linalg.norm(vm, axis=1)
            keep = norms > 0
            if not keep.any():
                continue
            vm = vm[keep] / norms[keep, None]
            sims = vm @ cmat.T
            _round6_half_away(sims, np.empty_like(sims))
            cid = np.argmax(sims, axis=1)  # first max = lowest cluster
            yield pd.DataFrame({
                "cluster_id": cid.astype("int32"),
                "_id": pdf["_id"].to_numpy()[keep],
                "_vec": [list(v) for v in vm]})

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame({
            "id_a": pd.array([], dtype="int64"),
            "id_b": pd.array([], dtype="int64"),
            "cluster_id": pd.array([], dtype="int32"),
            "cosine": pd.array([], dtype="float64")})
        if len(pdf) < 2:
            return empty
        ids = pdf["_id"].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = np.stack(pdf["_vec"].to_numpy())[order]  # unit rows
        sims = mat @ mat.T
        _round6_half_away(sims, np.empty_like(sims))
        ia, ib = np.triu_indices(len(ids), k=1)
        vals = sims[ia, ib]
        keep = vals >= threshold
        return pd.DataFrame({
            "id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
            "cluster_id": np.full(int(keep.sum()),
                                  int(pdf["cluster_id"].iat[0]),
                                  dtype="int32"),
            "cosine": vals[keep]})

    base = df.select(F.col(id_col).alias("_id"),
                     F.transform(F.col(vec_col),
                                 lambda x: x.cast("double")).alias("_vec"))
    assigned = base.mapInPandas(
        assign, schema="cluster_id int, _id long, _vec array<double>")
    out = assigned.groupBy("cluster_id").applyInPandas(
        pairs,
        schema="id_a long, id_b long, cluster_id int, cosine double")
    return out.select("id_a", "id_b", "cluster_id", "cosine")


def semantic_dedup_pairs(df: DataFrame, centroids: list[list[float]],
                         threshold: float = 0.95,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         dim: int | None = None) -> DataFrame:
    """SemDeDup: candidate near-dup pairs restricted to the same cluster.

    Within each cluster, all pairs with ``cosine >= threshold`` —
    the exact pair math of ``similarity.embedding_near_dup`` (fold-order
    dot, 6 dp half-away rounding) but blocked by cluster id, so the join
    is an equi-join on ``cluster_id`` instead of an O(n²) cross join.
    Recall < 1 by construction (cross-cluster dups are invisible) — the
    recall gate in tests measures it against the exact twin; raise k for
    tighter clusters / higher precision, lower k for recall.

    Output: (id_a, id_b, cluster_id, cosine) with id_a < id_b.
    """
    if dim is None:
        dim = embedding_dim(df, vec_col)
    assigned = assign_clusters(df, centroids, id_col, vec_col,
                               keep_vec=True)
    a = assigned.select(F.col(id_col).alias("id_a"),
                        F.col("cluster_id"),
                        F.col("_vec").alias("vec_a"),
                        F.col("_norm").alias("norm_a"))
    b = assigned.select(F.col(id_col).alias("id_b"),
                        F.col("cluster_id"),
                        F.col("_vec").alias("vec_b"),
                        F.col("_norm").alias("norm_b"))
    return (a.join(b, ["cluster_id"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "cluster_id",
                     F.round(dot(F.col("vec_a"), F.col("vec_b"))
                             / (F.col("norm_a") * F.col("norm_b")), 6)
                      .alias("cosine"))
             .filter(F.col("cosine") >= threshold))
