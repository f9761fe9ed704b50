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


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order → oracle-stable)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       _zero(), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              _zero(), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k of ``corpus`` for every query vector.

    Output: (query_id, vec_id, cosine, rank) — rank 1..k per query,
    ties broken by vec_id (deterministic).
    """
    q = queries.select(F.col(id_col).alias(query_id_col),
                       as_double(vec_col).alias("q_vec"))
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("c_vec"))
    scored = (c.join(F.broadcast(q))
               .select(query_id_col, id_col,
                       F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
                        .alias("cosine")))
    return top_k_per_group(
        scored, [query_id_col],
        [F.col("cosine").desc(), F.col(id_col).asc()],
        k=k, desc=False, rank_col="rank")


def embedding_near_dup(df: DataFrame, threshold: float = 0.95,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine ≥ threshold (embedding near-dup detection).

    Brute-force O(n²/2) — exact and oracle-testable at test SF; the LSH
    variant below is the scale path (same output contract, approximate
    recall).
    """
    a = df.select(F.col(id_col).alias("id_a"),
                  as_double(vec_col).alias("vec_a"))
    b = df.select(F.col(id_col).alias("id_b"),
                  as_double(vec_col).alias("vec_b"))
    return (a.join(b, F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
                      .alias("cosine"))
             .filter(F.col("cosine") >= threshold))


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
                    vec_col: str = "embedding") -> DataFrame:
    """LSH-bucketed near-dup: candidates collide on ≥1 signature band,
    then exact cosine filters. Same output contract as
    ``embedding_near_dup`` with approximate recall (P(collision) =
    1-(1-(1-θ/π)^r)^b for angle θ)."""
    width = planes // bands
    sig = df.select(F.col(id_col), as_double(vec_col).alias("vec"),
                    rp_signature(as_double(vec_col), planes).alias("sig"))
    band_cols = [
        F.struct(F.lit(bi).alias("band"),
                 F.shiftright(F.col("sig"), bi * width)
                  .bitwiseAND(F.lit((1 << width) - 1)).alias("bucket"))
        for bi in range(bands)]
    buckets = (sig.select(id_col, "vec",
                          F.explode(F.array(*band_cols)).alias("bb"))
                  .select(id_col, "vec", "bb.band", "bb.bucket"))
    left = buckets.select(F.col(id_col).alias("id_a"),
                          F.col("vec").alias("vec_a"), "band", "bucket")
    right = buckets.select(F.col(id_col).alias("id_b"),
                           F.col("vec").alias("vec_b"), "band", "bucket")
    return (left.join(right, ["band", "bucket"])
                .filter(F.col("id_a") < F.col("id_b"))
                .select("id_a", "id_b",
                        F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6)
                         .alias("cosine"))
                .distinct()
                .filter(F.col("cosine") >= threshold))
