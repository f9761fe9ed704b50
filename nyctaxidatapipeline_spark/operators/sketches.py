"""HyperLogLog distinct-count sketches (Flajolet et al. 2007).

THE bounded-memory answer to ``COUNT(DISTINCT ...)`` at 100 TB: an
exact distinct shuffles every distinct key (the reference's
``distinct_parts``-style queries carry the full key set through the
exchange), while an HLL carries ``m = 2^b`` single-byte registers per
group — the shuffle volume is O(groups x m) REGARDLESS of corpus
size, and registers merge by max() so map-side combine does almost
all the work. Spark's built-in ``approx_count_distinct`` is exactly
this sketch; it is re-derived here because the built-in's hash
(xxhash64) and estimator internals aren't reproducible in the DuckDB
oracle — this one is deterministic BIT-FOR-BIT across engines:

  * base hash: the repo's portable 32-bit md5-prefix idiom
    (``dedup.portable_base_hash``; DuckDB ``('0x'||substr(md5,1,8))
    ::BIGINT``);
  * register index = ``h mod m``; remainder ``w = h div m`` is a
    ``width = 32 - b`` bit word; rho(w) = leading zeros + 1 =
    ``width + 1 - length(bin(w))`` — INTEGER ops only (``bin`` gives
    the minimal binary string in both engines), no float log2 whose
    last ulp could differ;
  * the indicator sum ``sum(2^-M)`` is computed as a SCALED-INTEGER
    sum — ``S = sum(2^(width+1-M))`` over present registers plus
    ``2^(width+1)`` per absent register — which is exact BIGINT
    arithmetic (S <= m * 2^(width+1) = 2^33), so it is
    order-independent under any partitioning (the
    ``embedding_moments`` recipe); the only floating-point steps are
    one exact power-of-two division and the final estimator ops,
    identical-operand IEEE on both engines.

Estimator: alpha_m * m^2 / sum(2^-M), with the canonical small-range
(linear-counting) correction ``m * ln(m / V)`` when the raw estimate
is under 2.5m and V (empty registers) > 0. ``ln`` is the one op whose
last ulp is libm-dependent; the 6-dp output rounding absorbs it (same
risk class as the corr/log2 twins). Large-range correction is
omitted — it only matters within 2^32 of the hash space ceiling,
far beyond any fixture.

Accuracy: the standard error is ~1.04/sqrt(m) (b=6 -> ~13%, b=10 ->
~3%). The ORACLE does not compare against the exact count — it
recomputes the identical sketch, so the gate checks the distributed
implementation, not the sketch's error; ``tests/test_sketches.py``
separately asserts the estimate lands within theory bounds of truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.dedup import portable_base_hash

#: canonical alpha constants for small m (HLL paper, fig. 3);
#: m >= 128 uses the closed form.
_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_alpha(m: int) -> float:
    return _ALPHA.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_registers(df: DataFrame, key: Column, group_cols: list[str],
                  b: int = 6) -> DataFrame:
    """(group..., bucket, M): the max-rho register table — the
    mergeable sketch state (union of corpora = max over this frame,
    which is how an incremental/streaming variant would checkpoint).
    NULL keys are dropped (COUNT DISTINCT semantics)."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    m, width = 1 << b, 32 - b
    h = portable_base_hash(key.cast("string"))
    w = F.expr(f"_h DIV {m}")
    rho = (F.when(F.col("_w") > 0,
                  F.lit(width + 1) - F.length(F.bin(F.col("_w"))))
            .otherwise(F.lit(width + 1)))
    return (df.filter(key.isNotNull())
              .select(*group_cols, h.alias("_h"))
              .withColumn("_w", w)
              .select(*group_cols,
                      F.pmod(F.col("_h"), F.lit(m)).alias("bucket"),
                      rho.alias("rho"))
              .groupBy(*group_cols, "bucket")
              .agg(F.max("rho").alias("M")))


def hll_distinct(df: DataFrame, key_col: str, group_cols: list[str],
                 b: int = 6) -> DataFrame:
    """(group..., n_buckets, est_mode, n_distinct_est): per-group
    HyperLogLog distinct estimate of ``key_col``.

    ``est_mode`` makes the correction branch visible ('linear' below
    2.5m with empty registers, else 'raw').
    """
    m, width = 1 << b, 32 - b
    scale = 1 << (width + 1)
    alpha = hll_alpha(m)
    regs = hll_registers(df, F.col(key_col), group_cols, b)
    per_group = (regs.groupBy(*group_cols)
                     .agg(F.count("*").alias("n_buckets"),
                          F.sum(F.expr(f"CAST({scale} AS BIGINT) "
                                       f"DIV CAST(POW(2, M) AS BIGINT)"))
                           .alias("_s_present")))
    s_int = (F.col("_s_present")
             + (F.lit(m) - F.col("n_buckets")) * F.lit(scale))
    sum2 = s_int.cast("double") / F.lit(float(scale))
    e_raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) / sum2
    v = (F.lit(m) - F.col("n_buckets")).cast("double")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    use_linear = (e_raw <= F.lit(2.5 * m)) & (v > 0)
    return (per_group
            .withColumn("_e", F.when(use_linear, linear).otherwise(e_raw))
            .select(*group_cols, "n_buckets",
                    F.when(use_linear, F.lit("linear"))
                     .otherwise(F.lit("raw")).alias("est_mode"),
                    (F.round(F.col("_e"), 6) + F.lit(0.0))
                     .alias("n_distinct_est")))
