"""Product-quantization ANN — the billion-scale memory/compute path.

PQ (Jégou, Douze, Schmid, "Product Quantization for Nearest Neighbor
Search", TPAMI 2011; the FAISS ``PQ``/``IVFPQ`` building block): split
the ``dim``-dimensional space into ``m`` contiguous subspaces, learn a
``n_codes``-entry codebook per subspace, and store each vector as ``m``
small codes (m bytes at n_codes<=256) instead of ``dim`` floats — a
16-64x compression that lets a 100 TB embedding corpus's index live in
executor memory. Search is ADC (asymmetric distance computation): per
query, ONE ``m x n_codes`` table of query-sub-vector/centroid distances
is computed, and every corpus vector's approximate distance is just
``m`` table lookups over its codes — no float vector is touched until
the exact rerank of the short candidate list.

Spark shape (all Catalyst array lambdas — no Python in the hot path):

  * codebook training — driver-side, on a BOUNDED deterministic sample
    (same recipe and rationale as ``similarity.ivf_kmeans_centroids``:
    FAISS trains PQ codebooks on <=256k sampled vectors; the corpus
    itself is encoded once, distributed);
  * encode — one projection per corpus row: per subspace, argmin over
    the literal codebook of ``<c,c> - 2<x_m,c>`` (the ``||x_m||^2``
    term is constant across codes and dropped — identical argmin);
  * ADC — codes frame (id, m smallints) joined to the broadcast query
    table frame; the score is a sequential fold of ``m`` lookups;
  * rerank — top ``rerank`` candidates per query by (rounded ADC,
    vec_id) join BACK to the corpus vectors by id for exact cosine.
    Only ``queries x rerank`` vectors are ever re-read — at scale this
    is the only stage that touches the fat vector column, so the scan
    of the codes table dominates and it is ~dim*4/m times smaller than
    the corpus.

Reproducibility: ``pq_seed_codebooks_portable`` derives codebooks from
the ``n_codes`` corpus vectors with the smallest ``(md5(id), id)`` —
bit-identical in Spark, DuckDB, and Python — and every distance is
expressed through sequential-fold dot products, so the registered query
is value-hash-checked against a pure-SQL DuckDB twin end-to-end
(seeds -> encode -> ADC -> rerank). K-means-refined codebooks
(``pq_kmeans_codebooks``) are the production default, exactly like the
IVF coarse quantizer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.similarity import (
    _centroid_dots,
    as_double,
    dot,
    ivf_kmeans_centroids,
    l2_norm,
)
from nyctaxidatapipeline_spark.operators.windows import top_k_per_group
from nyctaxidatapipeline_spark.plans.util import fan_out

Codebooks = list[list[list[float]]]  # [subspace][code][component]


def _check_geometry(dim: int, m: int) -> int:
    if dim % m:
        raise ValueError(f"dim {dim} must divide into m={m} subspaces")
    return dim // m


def pq_seed_codebooks_portable(df: DataFrame, n_codes: int = 16,
                               m: int = 4, dim: int | None = None,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding") -> Codebooks:
    """Cross-engine-reproducible codebooks: the ``n_codes`` non-zero
    corpus vectors with the smallest ``(md5(id), id)``, sliced into the
    ``m`` subspaces. One bounded TakeOrdered collect (n_codes rows,
    never the corpus) — the portable twin of ``pq_kmeans_codebooks``,
    mirroring ``similarity.ivf_seed_centroids_portable``."""
    rows = (df.select(F.col(id_col).alias("i"),
                      as_double(vec_col).alias("v"))
              .filter(l2_norm(as_double(vec_col)) > 0)
              .orderBy(F.md5(F.col("i").cast("string")), "i")
              .limit(n_codes).collect())
    if not rows:
        return []
    d = dim if dim is not None else len(rows[0]["v"])
    sub = _check_geometry(d, m)
    return [[[float(x) for x in r["v"][mi * sub:(mi + 1) * sub]]
             for r in rows]
            for mi in range(m)]


def pq_kmeans_codebooks(df: DataFrame, n_codes: int = 16, m: int = 4,
                        iters: int = 4, dim: int | None = None,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        max_sample_rows: int = 1 << 17) -> Codebooks:
    """Lloyd-refined per-subspace codebooks trained on a bounded
    deterministic sample — the production quantizer (FAISS recipe:
    codebooks train on a <=256k-row sample; the corpus is encoded once,
    distributed). Seeds with the portable hash-min picks, then runs
    ``iters`` standard (L2) Lloyd steps per subspace as numpy matmuls.
    Driver traffic is capped at ``max_sample_rows x dim`` doubles
    regardless of corpus size. Empty cells keep their previous centroid
    (the usual Lloyd guard)."""
    import numpy as np

    books = pq_seed_codebooks_portable(df, n_codes, m, dim, id_col,
                                       vec_col)
    if not books or not iters:
        return books
    rows = (df.select(as_double(vec_col).alias("v"),
                      F.xxhash64(F.col(id_col).cast("string")).alias("h"),
                      F.col(id_col).alias("i"))
              .filter(F.size("v") > 0)
              .orderBy("h", "i")
              .limit(max_sample_rows).collect())
    if not rows:
        return books
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    sub = mat.shape[1] // m
    out: Codebooks = []
    for mi in range(m):
        x = mat[:, mi * sub:(mi + 1) * sub]
        c = np.array(books[mi], dtype=np.float64)
        for _ in range(iters):
            # L2 argmin via ||x||^2 - 2<x,c> + ||c||^2 (||x||^2 constant)
            d2 = (c * c).sum(axis=1)[None, :] - 2.0 * (x @ c.T)
            assign = d2.argmin(axis=1)
            for j in range(len(c)):
                members = x[assign == j]
                if len(members):
                    c[j] = members.mean(axis=0)
        out.append(c.tolist())
    return out


def _lit_arr(vals: list[float]) -> str:
    return "array(" + ", ".join(f"{v!r}D" for v in vals) + ")"


def _fold_dot(a_expr: str, b_expr: str) -> str:
    """Sequential-fold dot product as a SQL string — the same 0.0-seeded
    left-to-right order as ``similarity.dot``/DuckDB list_dot_product."""
    return (f"aggregate(zip_with({a_expr}, {b_expr}, (x, c) -> x * c), "
            f"0.0D, (acc, x) -> acc + x)")


def _self_dot(c: list[float]) -> float:
    """``<c,c>`` computed with EXACTLY the fold's operation order
    (0.0 seed; per element one multiply then one add, left to right —
    each individually rounded, no FMA) so the driver-side constant is
    bit-identical to what the runtime ``aggregate(zip_with(...))`` fold
    produced — Python floats and Spark doubles are the same IEEE 754
    binary64 operations."""
    acc = 0.0
    for x in c:
        acc = acc + x * x
    return acc


def _sub_scores(vec_name: str, book: list[list[float]], mi: int,
                sub: int) -> str:
    """array<double> of ``<c,c> - 2<x_mi,c>`` for every code of subspace
    ``mi`` — the shared encode/ADC score expression (the engines agree
    bitwise because both factor through sequential-fold dots).

    r16 (guide §1.2 per-task work): the ``<c,c>`` term is a pure
    function of the literal codebook, but Catalyst does NOT constant-
    fold higher-order functions, so the r15 shape paid ``m x n_codes``
    runtime folds PER ROW (and Catalyst planned a tree twice this
    size). It is now a driver-computed literal with the identical
    operation order (``_self_dot``), halving both the expression tree
    the optimizer walks and the per-row lambda work; values are
    bit-identical (pinned in tests/test_compressed.py)."""
    sl = f"slice({vec_name}, {mi * sub + 1}, {sub})"
    terms = []
    for c in book:
        arr = _lit_arr(c)
        terms.append(f"{_self_dot(c)!r}D - 2.0D * ({_fold_dot(sl, arr)})")
    return "array(" + ", ".join(terms) + ")"


def pq_encode(df: DataFrame, codebooks: Codebooks,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>) — each vector's per-subspace nearest-code
    indices (ties to the lowest code, Spark's first-position
    array_position). One scan, one projection; this is the index build.
    At 100 TB write the output as its own (bucketed) table: the ADC
    scan then reads m ints per vector instead of dim floats."""
    m = len(codebooks)
    sub = len(codebooks[0][0]) if m else 0
    base = (fan_out(df, id_col)
            .filter(F.size(F.col(vec_col)) > 0)
            .select(F.col(id_col), as_double(vec_col).alias("_v")))
    score_cols = {f"_s{mi}": F.expr(_sub_scores("_v", codebooks[mi],
                                                mi, sub))
                  for mi in range(m)}
    code = [(F.expr(f"array_position(_s{mi}, array_min(_s{mi}))") - 1)
            .cast("int") for mi in range(m)]
    return (base.withColumns(score_cols)
                .select(F.col(id_col), F.array(*code).alias("codes")))


def pq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
            n_codes: int = 16, m: int = 4, rerank: int = 50,
            id_col: str = "vec_id", vec_col: str = "embedding",
            query_id_col: str = "query_id", dim: int | None = None,
            kmeans_iters: int = 4,
            codebooks: Codebooks | None = None) -> DataFrame:
    """PQ/ADC approximate top-k with exact rerank.

    Output contract matches ``brute_force_topk``/``ivf_topk``:
    (query_id, vec_id, cosine, rank), rank 1..k per query, cosine from
    the EXACT vectors (rounded 6 dp), ties to the lowest vec_id. The
    approximation only selects WHICH ``rerank`` candidates get the
    exact treatment — with ``rerank >= |corpus|`` results equal brute
    force (unit-tested parity).

    ``codebooks`` overrides training (pass
    ``pq_seed_codebooks_portable(...)`` for the SQL-oracle-reproducible
    variant); the default trains ``pq_kmeans_codebooks``.
    """
    if codebooks is None:
        codebooks = pq_kmeans_codebooks(corpus, n_codes, m, kmeans_iters,
                                        dim, id_col, vec_col)
    mm = len(codebooks)
    sub = len(codebooks[0][0]) if mm else 0
    enc = pq_encode(corpus, codebooks, id_col, vec_col)
    vec_d = as_double(F.col(vec_col))
    cvecs = corpus.select(F.col(id_col), vec_d.alias("c_vec"),
                          l2_norm(vec_d, dim).alias("c_norm"))
    # Per-query ADC table: array<array<double>> (m x n_codes), computed
    # in ONE projection over the broadcast query frame.
    tab = F.expr("array(" + ", ".join(
        _sub_scores("q_vec", codebooks[mi], mi, sub)
        for mi in range(mm)) + ")")
    q = (queries.select(F.col(id_col).alias(query_id_col),
                        vec_d.alias("q_vec"),
                        l2_norm(vec_d, dim).alias("q_norm"))
                .withColumn("_t", tab))
    # ADC: m table lookups per corpus vector, sequentially folded (the
    # 0.0 seed adds exactly, so both engines sum in the same order).
    adc = F.expr("aggregate(zip_with(codes, _t, (c, t) -> "
                 "element_at(t, c + 1)), 0.0D, (acc, x) -> acc + x)")
    scored_codes = (enc.join(F.broadcast(q.select(query_id_col, "_t")))
                       .select(query_id_col, id_col,
                               F.round(adc, 6).alias("_approx")))
    cand = top_k_per_group(
        scored_codes, [query_id_col],
        [F.col("_approx").asc(), F.col(id_col).asc()],
        k=rerank, desc=False, rank_col="_crank").drop("_crank", "_approx")
    exact = (cand.join(cvecs, id_col)
                 .join(F.broadcast(q.select(query_id_col, "q_vec",
                                            "q_norm")), query_id_col)
                 .select(query_id_col, id_col,
                         F.round(dot(F.col("q_vec"), F.col("c_vec"))
                                 / (F.col("q_norm") * F.col("c_norm")), 6)
                          .alias("cosine")))
    return top_k_per_group(
        exact, [query_id_col],
        [F.col("cosine").desc(), F.col(id_col).asc()],
        k=k, desc=False, rank_col="rank")


def ivfpq_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
               n_centroids: int = 16, nprobe: int = 4,
               n_codes: int = 16, m: int = 4, rerank: int = 50,
               id_col: str = "vec_id", vec_col: str = "embedding",
               query_id_col: str = "query_id", dim: int | None = None,
               kmeans_iters: int = 2, pq_kmeans_iters: int = 4,
               centroids: list[list[float]] | None = None,
               codebooks: Codebooks | None = None,
               by_residual: bool = False) -> DataFrame:
    """IVF-PQ approximate top-k — the full FAISS ``IVFPQ`` shape: a
    coarse quantizer prunes the scan to ``nprobe`` of ``n_centroids``
    inverted lists per query, and within the probed lists the candidate
    scores are PQ/ADC table lookups over ``m`` small codes — the scan
    touches neither most of the corpus (IVF) nor any float vector (PQ)
    until the exact rerank of ``rerank`` candidates.

    ``by_residual=False`` PQ-encodes the RAW vectors; ``True`` encodes
    the RESIDUAL ``v - centroid[list_id]`` (FAISS's default): residuals
    are smaller than raw vectors on clustered data, so the same m x
    n_codes bitrate carries more precision (recall-gated >= the raw
    variant in ``tests/test_recall.py``). The cost is an ADC table per
    (query, PROBED LIST) instead of per query — still only
    nprobe·m·n_codes doubles per query in the broadcast — plus the
    per-probe ``||q - c_l||^2`` constant folded into the score so
    candidate distances stay comparable ACROSS probed lists.

    Index = ONE projection per corpus row producing (id, list_id,
    codes) — the coarse argmax and the ``m`` code argmins share the
    scan, and the result is ``m`` ints + 1 int per vector. At 100 TB
    write it out partitioned by ``list_id``: probes then prune at the
    file level and the candidate scan reads ~``nprobe/n_centroids *
    m/dim/4`` of the corpus bytes. Output contract matches
    ``brute_force_topk``; with ``nprobe == n_centroids`` and ``rerank
    >= |corpus|`` results equal brute force (unit-tested parity).
    ``centroids``/``codebooks`` override training (pass the portable
    seed variants for SQL-oracle reproducibility).
    """
    if centroids is None:
        centroids = ivf_kmeans_centroids(corpus, n_centroids,
                                         kmeans_iters, id_col, vec_col,
                                         dim=dim)
    vec_d = as_double(F.col(vec_col))
    cent_mat = "array(" + ", ".join(_lit_arr(c) for c in centroids) + ")"

    # index build: coarse list + PQ codes in one pass over the vectors
    base = (fan_out(corpus, id_col)
            .filter(F.size(F.col(vec_col)) > 0)
            .select(F.col(id_col), vec_d.alias("_v"))
            .withColumn("_dots", _centroid_dots("_v", centroids))
            .withColumn("list_id",
                        (F.expr("array_position(_dots, array_max(_dots))")
                          - 1).cast("int")))
    enc_col = "_v"
    if by_residual:
        base = base.withColumn(
            "_r", F.expr(f"zip_with(_v, element_at({cent_mat}, "
                         "list_id + 1), (x, c) -> x - c)"))
        enc_col = "_r"
    if codebooks is None:
        train = (base.select(F.col(id_col),
                             F.col(enc_col).alias(vec_col))
                 if by_residual else corpus)
        codebooks = pq_kmeans_codebooks(train, n_codes, m,
                                        pq_kmeans_iters, dim, id_col,
                                        vec_col)
    mm = len(codebooks)
    sub = len(codebooks[0][0]) if mm else 0
    score_cols = {f"_s{mi}": F.expr(_sub_scores(enc_col, codebooks[mi],
                                                mi, sub))
                  for mi in range(mm)}
    code = [(F.expr(f"array_position(_s{mi}, array_min(_s{mi}))") - 1)
            .cast("int") for mi in range(mm)]
    index = (base.withColumns(score_cols)
                 .select(F.col(id_col), "list_id",
                         F.array(*code).alias("codes")))
    cvecs = corpus.select(F.col(id_col), vec_d.alias("c_vec"),
                          l2_norm(vec_d, dim).alias("c_norm"))

    # queries: nprobe probed lists + the per-query ADC table
    probes = F.expr(
        f"transform(slice(array_sort(zip_with(_cdots, "
        f"sequence(0, {len(centroids) - 1}), (d, i) -> struct(-d AS nd, "
        f"i AS cid))), 1, {min(nprobe, len(centroids))}), s -> s.cid)")
    q = (queries.select(F.col(id_col).alias(query_id_col),
                        vec_d.alias("q_vec"),
                        l2_norm(vec_d, dim).alias("q_norm"))
                .withColumn("_cdots", _centroid_dots("q_vec", centroids))
                .withColumn("_probe", F.explode(probes))
                .withColumn("list_id", F.col("_probe").cast("int"))
                .drop("_cdots", "_probe"))
    if by_residual:
        # per-(query, probed list) table over the query residual, plus
        # the ||q - c_l||^2 constant that makes ADC distances
        # comparable across lists
        q = (q.withColumn(
                "_qr", F.expr(f"zip_with(q_vec, element_at({cent_mat}, "
                              "list_id + 1), (x, c) -> x - c)"))
              .withColumn("_t", F.expr("array(" + ", ".join(
                  _sub_scores("_qr", codebooks[mi], mi, sub)
                  for mi in range(mm)) + ")"))
              .withColumn("_qc", F.expr(_fold_dot("_qr", "_qr")))
              .drop("_qr"))
        probe_cols = [query_id_col, "list_id", "_t", "_qc"]
        approx = "aggregate(zip_with(codes, _t, (c, t) -> " \
                 "element_at(t, c + 1)), 0.0D, (acc, x) -> acc + x) + _qc"
    else:
        q = q.withColumn("_t", F.expr("array(" + ", ".join(
            _sub_scores("q_vec", codebooks[mi], mi, sub)
            for mi in range(mm)) + ")"))
        probe_cols = [query_id_col, "list_id", "_t"]
        approx = "aggregate(zip_with(codes, _t, (c, t) -> " \
                 "element_at(t, c + 1)), 0.0D, (acc, x) -> acc + x)"
    scored_codes = (index.join(
        F.broadcast(q.select(*probe_cols)), "list_id")
        .select(query_id_col, id_col,
                F.round(F.expr(approx), 6).alias("_approx")))
    cand = top_k_per_group(
        scored_codes, [query_id_col],
        [F.col("_approx").asc(), F.col(id_col).asc()],
        k=rerank, desc=False, rank_col="_crank").drop("_crank", "_approx")
    exact = (cand.join(cvecs, id_col)
                 .join(F.broadcast(q.select(query_id_col, "q_vec",
                                            "q_norm").distinct()),
                       query_id_col)
                 .select(query_id_col, id_col,
                         F.round(dot(F.col("q_vec"), F.col("c_vec"))
                                 / (F.col("q_norm") * F.col("c_norm")), 6)
                          .alias("cosine")))
    return top_k_per_group(
        exact, [query_id_col],
        [F.col("cosine").desc(), F.col(id_col).asc()],
        k=k, desc=False, rank_col="rank")
