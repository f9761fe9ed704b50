"""Similarity search over embedding columns (``array<float>``).

North-star operator (BASELINE.json): approximate-nearest-neighbor over the
``embeddings`` fixture. Two paths:

  * **brute_force_topk** — exact cosine top-k: broadcast the query set,
    cross-join the corpus, fold the dot product with ``F.aggregate`` /
    ``F.zip_with`` (JVM-side lambda expressions — no Python, no UDF), rank
    with a per-query window. The arithmetic is sequential-fold double math,
    bitwise-identical to DuckDB's ``list_dot_product`` on DOUBLE[] — which
    makes it oracle-testable.
  * **rp_lsh_topk** — the scale path: random-hyperplane LSH. P pseudo-random
    planes (components derived from ``xxhash64`` — deterministic, no RNG
    state to ship), P-bit signature per vector, candidates = signature
    bucket collisions (multi-probe within Hamming ≤ 1), exact rerank of
    candidates only. Shuffle volume O(n·probes), never O(n²).

Scale notes (100 TB / billions of vectors): brute force is O(n·q) — fine
for q≈10³ queries against any corpus (one scan), wrong for all-pairs;
near-dup uses LSH buckets. Norms are precomputed once per side. For a real
deployment an IVF index (k-means coarse quantizer) slots in where the
signature bucketing sits — same join shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.windows import top_k_per_group

def _zero() -> Column:
    # lazy: F.lit needs an active session, so no module-level Column
    return F.lit(0.0).cast("double")


def as_double(vec: str | Column) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product (deterministic order → oracle-stable).

    With ``dim`` the sum is statically unrolled into a plain arithmetic
    expression — whole-stage-codegen'd, several times faster than the
    interpreted higher-order ``aggregate`` fold. Addition order (left to
    right from 0.0) is identical, so the doubles are bitwise the same.
    """
    if dim is None:
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                           _zero(), lambda acc, x: acc + x)
    expr = _zero()
    for i in range(1, dim + 1):
        expr = expr + F.element_at(a, i) * F.element_at(b, i)
    return expr


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is None:
        return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                                  _zero(), lambda acc, x: acc + x))
    expr = _zero()
    for i in range(1, dim + 1):
        expr = expr + F.element_at(a, i) * F.element_at(a, i)
    return F.sqrt(expr)


def embedding_dim(df: DataFrame, vec_col: str = "embedding") -> int | None:
    """Static dimension probe (reads one row) — enables the unrolled fast
    path. Returns None on an empty frame (callers fall back to the fold)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    return int(row["d"]) if row is not None else None


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id",
                     dim: int | None = None) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for every query vector.

    Output: (query_id, vec_id, cosine, rank) — rank 1..k per query,
    ties broken by vec_id (deterministic).
    """
    q = queries.select(F.col(id_col).alias(query_id_col),
                       as_double(vec_col).alias("q_vec"),
                       l2_norm(as_double(vec_col), dim).alias("q_norm"))
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("c_vec"),
                      l2_norm(as_double(vec_col), dim).alias("c_norm"))
    scored = (c.join(F.broadcast(q))
               .select(query_id_col, id_col,
                       F.round(dot(F.col("q_vec"), F.col("c_vec"), dim)
                               / (F.col("q_norm") * F.col("c_norm")), 6)
                        .alias("cosine")))
    return top_k_per_group(
        scored, [query_id_col],
        [F.col("cosine").desc(), F.col(id_col).asc()],
        k=k, desc=False, rank_col="rank")


def with_norm(df: DataFrame, id_col: str, vec_col: str,
              prefix: str, dim: int | None = None) -> DataFrame:
    """(id, vec, norm) — the norm fold runs ONCE per row here instead of
    once per pair in the O(n²) join (3x fewer folds; identical doubles, so
    oracle parity is preserved: cosine stays dot/(na*nb))."""
    return df.select(F.col(id_col).alias(f"id_{prefix}"),
                     as_double(vec_col).alias(f"vec_{prefix}"),
                     l2_norm(as_double(vec_col), dim).alias(f"norm_{prefix}"))


def embedding_near_dup(df: DataFrame, threshold: float = 0.95,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       dim: int | None = None) -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection).

    Brute-force O(n²/2) — exact and oracle-testable at test SF; the LSH
    variant below is the scale path (same output contract, approximate
    recall). Norms precomputed per side (one fold per pair, not three).
    """
    a = with_norm(df, id_col, vec_col, "a", dim)
    b = with_norm(df, id_col, vec_col, "b", dim)
    return (a.join(b, F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.round(dot(F.col("vec_a"), F.col("vec_b"), dim)
                             / (F.col("norm_a") * F.col("norm_b")), 6)
                      .alias("cosine"))
             .filter(F.col("cosine") >= threshold))


def embedding_near_dup_numpy(df: DataFrame, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """All-pairs cosine near-dup via Arrow-batched NumPy matmul.

    Same output contract as ``embedding_near_dup`` but each partition
    computes a (batch x corpus) BLAS matmul against a broadcast normalized
    corpus matrix — dense linear algebra is the one place Catalyst
    expressions lose to a vectorized Pandas path by >10x.

    Scale: the corpus matrix is broadcast (fits executors up to ~10M x
    small-dim vectors); beyond that, block both sides (crossJoin of block
    ids, one matmul per block pair) — the per-block kernel below is
    unchanged. Values can differ from the fold path in the last ulp (BLAS
    reorders the sum); both are rounded to 6 dp.
    """
    import numpy as np

    pdf = df.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((ids, mat))

    def block(batches):
        import pandas as pd
        c_ids, c_mat = bc.value
        for b in batches:
            if not len(b):
                continue
            b_ids = b[id_col].to_numpy()
            b_mat = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
            sims = np.round(b_mat @ c_mat.T, 6)
            keep = (sims >= threshold) & (b_ids[:, None] < c_ids[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame({"id_a": b_ids[ai], "id_b": c_ids[bi],
                                "cosine": sims[ai, bi]})

    return df.select(id_col, vec_col).mapInPandas(
        block, schema="id_a long, id_b long, cosine double")


def _plane_component(plane: int, i: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from xxhash64(plane, dim-index) — identical on every executor
    with zero state shipped."""
    h = F.xxhash64(F.concat_ws(":", F.lit(f"rp{plane}"), i.cast("string")))
    return (F.pmod(h, F.lit(20001)).cast("double") - 10000.0) / 10000.0


def rp_signature(vec: Column, planes: int = 16) -> Column:
    """P-bit random-projection signature (bit j = sign of <v, r_j>)."""
    sig = None
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(vec,
                       F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                                   lambda i: _plane_component(p, i)),
                       lambda x, r: x * r),
            _zero(), lambda acc, x: acc + x)
        bit = F.when(proj >= 0,
                     F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return sig


def rp_lsh_near_dup(df: DataFrame, threshold: float = 0.95,
                    planes: int = 16, bands: int = 4,
                    id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    dim: int | None = None) -> DataFrame:
    """LSH-bucketed near-dup: candidates collide on ≥1 signature band,
    then exact cosine filters. Same output contract as
    ``embedding_near_dup`` with approximate recall (P(collision) =
    1-(1-(1-θ/π)^r)^b for angle θ)."""
    width = planes // bands
    sig = df.select(F.col(id_col), as_double(vec_col).alias("vec"),
                    l2_norm(as_double(vec_col), dim).alias("norm"),
                    rp_signature(as_double(vec_col), planes).alias("sig"))
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.shiftright(F.col("sig"), bi * width)
                  .bitwiseAND(F.lit((1 << width) - 1)).alias("bucket"))
        for bi in range(bands)]
    buckets = (sig.select(id_col, "vec", "norm",
                          F.explode(F.array(*band_cols)).alias("bb"))
                  .select(id_col, "vec", "norm", "bb.band", "bb.bucket"))
    left = buckets.select(F.col(id_col).alias("id_a"),
                          F.col("vec").alias("vec_a"),
                          F.col("norm").alias("norm_a"), "band", "bucket")
    right = buckets.select(F.col(id_col).alias("id_b"),
                           F.col("vec").alias("vec_b"),
                           F.col("norm").alias("norm_b"), "band", "bucket")
    return (left.join(right, ["band", "bucket"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b",
                        F.round(dot(F.col("vec_a"), F.col("vec_b"), dim)
                                / (F.col("norm_a") * F.col("norm_b")), 6)
                         .alias("cosine"))
                .distinct()
                .filter(F.col("cosine") >= threshold))
