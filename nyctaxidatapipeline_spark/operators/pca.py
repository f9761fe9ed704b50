"""Distributed PCA over an embedding column — the tall-skinny recipe.

A 100 TB corpus of d-dim embeddings (d in the dozens-to-low-thousands)
has a covariance matrix of only d x d doubles, so the scale-correct plan
is the textbook one used by every large-scale PCA (Spark MLlib's own
``RowMatrix.computePrincipalComponents`` does the same):

  1. ONE distributed pass accumulates the sufficient statistics
     (count, per-dim sums, upper-triangle cross-product sums) via a
     row-local array-lambda generator + a single map-side-combined
     aggregate — the shuffle carries at most ``d*(d+3)/2 + 1`` groups
     per map task, independent of corpus size;
  2. the d x d covariance is assembled from those statistics by tiny
     broadcast joins (still a DataFrame — oracle-checkable);
  3. the eigenvector solve happens on the DRIVER over the collected
     d x d matrix (the only driver-side data — bounded by the embedding
     width, never the corpus), exactly like the bounded k-centroid
     collects in ``clustering``/``similarity``;
  4. projection back over the corpus is a shuffle-free narrow map with
     the component broadcast as a literal array.

Cross-engine determinism (the oracle story): every floating-point
reduction is order-sensitive, so raw covariances differ from a
sequential engine's in the last ulps. As elsewhere in this repo the
statistics are ROUNDed — here to ``FIT_DECIMALS`` (9 dp) — BEFORE the
eigen-iteration, so Spark and the DuckDB twin iterate on bit-identical
matrices. The power iteration itself re-rounds its iterate to 9 dp each
step (both sides), so per-step matvec drift (~1e-16) can never
accumulate; after a FIXED number of steps both engines hold the same
vector. Sign is fixed by the largest-|coordinate| rule. The oracle twin
(`__spark_entry__._pca_oracle_sql`) unrolls the identical iteration as
generated CTEs, like PageRank's unrolled-CTE twin.

The reference (colinthekkinedath/nyctaxidatapipeline) has no linear
algebra surface; this extends the engine's training-data toolkit
(SemDeDup/IVF/PQ in ``clustering``/``similarity``/``pq`` all want a
decorrelating or dim-reducing front end — FAISS applies exactly this
PCA step before IVFPQ).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimals for the fitted statistics (covariance) — fine enough to keep
#: ~6 significant figures on unit-scale embeddings, coarse enough that
#: 1-ulp cross-engine reduction drift rounds away.
FIT_DECIMALS = 9


def embedding_dim(df: DataFrame, vec_col: str = "embedding") -> int:
    """Width of the embedding column (1-row bounded probe)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from {vec_col!r}")
    return int(row["d"])


def _moment_structs(vec_col: str) -> F.Column:
    """Row-local generator of the sufficient-statistic terms.

    Emits, per row: ``(i, j, x_i*x_j)`` for every upper-triangle pair
    (i <= j), ``(i, -1, x_i)`` per-dim sums, and one ``(-1, -1, 1.0)``
    count term. All array lambdas — no join, no shuffle; the downstream
    aggregate's map-side combine collapses each task to O(d^2) rows.
    """
    v = vec_col
    pairs = (
        f"flatten(transform({v}, (x, i) -> "
        f"  transform(slice({v}, i + 1, size({v}) - i), (y, k) -> "
        f"    struct(i AS i, i + k AS j, "
        f"           CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS v))))")
    sums = (f"transform({v}, (x, i) -> "
            f"  struct(i AS i, -1 AS j, CAST(x AS DOUBLE) AS v))")
    cnt = "array(struct(-1 AS i, -1 AS j, CAST(1.0 AS DOUBLE) AS v))"
    return F.expr(f"concat({pairs}, {sums}, {cnt})")


def embedding_moments(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, s): one-pass sufficient statistics for mean + covariance.

    ``(i, j>=i)`` rows hold sum(x_i * x_j); ``(i, -1)`` rows hold
    sum(x_i); the ``(-1, -1)`` row holds the row count. One pass over
    the corpus; shuffle volume is O(tasks · d²) partial-sum rows.

    ORDER-INDEPENDENT BY SCALED-INTEGER SUMS: a raw double sum drifts
    in the last ulps with partition count, which intermittently crossed
    the downstream 6-dp rounding boundary (CORRECTNESS_r05
    ``embedding_covariance`` hash flake). Each term is snapped to a
    1e-12 grid as a scaled INT64 — ``CAST(ROUND(v * 1e12, 0) AS
    BIGINT)`` (half-away ties, identical in Spark and DuckDB; the
    scaled magnitude of a unit-scale product is ~1e12 ≪ 2^53, so the
    double arithmetic is exact) — and integer addition is exact and
    associative, so the aggregate is bit-identical under ANY
    partitioning / reduction order. 1e-12 term resolution sits far
    below the coarsest output rounding (6 dp).

    Two-level aggregation keeps the hot adds in whole-stage-codegen
    LONG arithmetic (a precision-38 decimal accumulator here measured
    4× slower — BigDecimal-backed adds on every exploded term,
    PLANS.md #17): per-Spark-partition LONG partial sums (exact while
    a partition's |sum| < 2^63, i.e. < ~9e6 unit-scale terms · 1e12 —
    a 128 MB partition of 64-dim embeddings holds ~5e5 rows, 18×
    headroom), then a d²-group DECIMAL(38,0) merge that is overflow-
    proof at any corpus size. The final ``CAST(... AS DOUBLE) / 1e12``
    is one correctly-rounded int→double conversion and one IEEE divide,
    bit-identical on both engines.

    The half-away round itself is the SIGN·FLOOR(|x|+0.5) idiom, not
    Spark's ``ROUND``: ROUND on DoubleType allocates a BigDecimal per
    term (measured 2× on this aggregate), while the idiom stays in
    primitive codegen AND is exactly round-half-away in our range —
    0.5 is a power of two, so ``|x| + 0.5`` is computed exactly for
    any |x| < 2^52 (ulp ≤ 0.5), and scaled terms are ~1e12-1e13.
    DuckDB's native ``ROUND`` (std::round, exact half-away) therefore
    produces the identical integer.
    """
    term = "CAST(SIGN(m.v) AS BIGINT) * FLOOR(ABS(m.v * 1e12) + 0.5D)"
    # The d²-term explode is the whole cost of this pass (d=64 ⇒ 2,081
    # terms/row). A single-row-group fixture scan plans as ONE task, so
    # without the fan_out the explode+partial agg ran on one core
    # (r15: embedding_covariance 2.8 s at sf0.1). Results are exact
    # under ANY partitioning — the per-partition LONG partials merge by
    # integer addition — and fan_out is a no-op on real-scale scans.
    from nyctaxidatapipeline_spark.plans.util import fan_out

    partials = (fan_out(df)
                .select(F.explode(_moment_structs(vec_col)).alias("m"),
                        F.spark_partition_id().alias("_p"))
                .groupBy(F.col("m.i").alias("i"), F.col("m.j").alias("j"),
                         F.col("_p"))
                .agg(F.sum(F.expr(term)).alias("ps")))
    return (partials
            .groupBy("i", "j")
            .agg((F.sum(F.col("ps").cast("decimal(38,0)")).cast("double")
                  / F.lit(1e12)).alias("s")))


def covariance_matrix(df: DataFrame, vec_col: str = "embedding",
                      decimals: int = FIT_DECIMALS) -> DataFrame:
    """(i, j, cov): FULL symmetric population covariance of the
    embedding column, rounded to ``decimals``.

    cov(i, j) = (Sxy - Sx*Sy/n) / n — the exact expression the DuckDB
    twin uses, term for term, so both engines round the same doubles.
    Assembly is broadcast joins over the O(d^2) moments frame.
    """
    m = embedding_moments(df, vec_col).localCheckpoint(eager=False)
    n = m.filter((F.col("i") == -1) & (F.col("j") == -1)) \
         .select(F.col("s").alias("n"))
    sums = m.filter((F.col("i") >= 0) & (F.col("j") == -1)) \
            .select(F.col("i").alias("k"), F.col("s").alias("sk"))
    cross = m.filter(F.col("j") >= 0)
    upper = (cross
             .join(F.broadcast(sums.withColumnRenamed("k", "i")
                                   .withColumnRenamed("sk", "si")), "i")
             .join(F.broadcast(sums.withColumnRenamed("k", "j")
                                   .withColumnRenamed("sk", "sj")), "j")
             .crossJoin(F.broadcast(n))
             # + 0.0 canonicalizes signed zero: a tiny negative covariance
             # rounds to -0.0 under DuckDB ROUND but +0.0 under Spark's,
             # and the driver's value hash is byte-sensitive (r5/r6 red).
             .select("i", "j",
                     (F.round((F.col("s")
                               - F.col("si") * F.col("sj") / F.col("n"))
                              / F.col("n"), decimals)
                      + F.lit(0.0)).alias("cov")))
    lower = (upper.filter(F.col("i") < F.col("j"))
                  .select(F.col("j").alias("i"), F.col("i").alias("j"),
                          "cov"))
    return upper.select("i", "j", "cov").unionByName(lower)


def power_iteration(cov_rows: list[tuple[int, int, float]], dim: int,
                    iters: int = 24,
                    decimals: int = FIT_DECIMALS) -> list[float]:
    """Top eigenvector of a (full, symmetric) covariance given as
    (i, j, cov) rows — plain-Python power iteration that MIRRORS the
    oracle's unrolled SQL step for step.

    Each step: w = C v; v = round(w / max|w|, decimals). Infinity-norm
    normalization keeps every op either exact (max, abs) or a
    single IEEE division of identical operands, so the only drift
    source is the matvec sum — killed by the per-step rounding. After
    ``iters`` FIXED steps: sign-fix by the largest-|coordinate| rule
    (ties to lowest index), L2-normalize once, round.

    Driver-side by design: the input is d x d, independent of corpus
    size.
    """
    mat = [[0.0] * dim for _ in range(dim)]
    for i, j, c in cov_rows:
        mat[i][j] = float(c)
    v = [round(1.0 / math.sqrt(dim), decimals)] * dim
    for _ in range(iters):
        w = [sum(mat[i][j] * v[j] for j in range(dim))
             for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0.0:  # degenerate (all-zero covariance)
            return [0.0] * dim
        v = [round(x / m, decimals) for x in w]
    # Sign convention: coordinate with the largest |value| (lowest index
    # wins ties) is made positive — same rule in the SQL twin.
    k = max(range(dim), key=lambda i: (abs(v[i]), -i))
    s = -1.0 if v[k] < 0 else 1.0
    nrm = math.sqrt(sum(x * x for x in v))
    return [round(s * x / nrm, decimals) for x in v]


def pca_top_component(df: DataFrame, vec_col: str = "embedding",
                      iters: int = 24) -> list[float]:
    """Fit the first principal component: distributed moments ->
    bounded d x d collect -> driver power iteration."""
    dim = embedding_dim(df, vec_col)
    rows = [(r["i"], r["j"], r["cov"])
            for r in covariance_matrix(df, vec_col).collect()]
    return power_iteration(rows, dim, iters=iters)


def pca_project_top(df: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id", iters: int = 24,
                    out_col: str = "pc1") -> DataFrame:
    """(id, pc1): each vector's score on the first principal component.

    The component rides along as a literal array, so the projection is
    a shuffle-free narrow map (sequential fold — deterministic within
    Spark; the 6 dp output rounding absorbs the oracle's different sum
    order).
    """
    comp = pca_top_component(df, vec_col, iters=iters)
    lit = "array(" + ", ".join(f"CAST({x!r} AS DOUBLE)" for x in comp) + ")"
    score = F.expr(
        f"aggregate(zip_with({vec_col}, {lit}, "
        f"(a, b) -> CAST(a AS DOUBLE) * b), "
        f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
    return df.select(F.col(id_col),
                     (F.round(score, 6) + F.lit(0.0)).alias(out_col))
