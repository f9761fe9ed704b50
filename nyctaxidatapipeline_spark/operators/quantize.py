"""Scalar (int8) embedding quantization — the ANN memory-compression
step (FAISS SQ8): store each dimension as an unsigned byte code against
per-dimension [min, max] bounds, cutting vector storage 4-8x so a
100 TB embedding table's index fits that much more corpus per executor.

Dataflow: per-dimension bounds are ONE posexplode + groupBy(pos)
aggregate (dim rows — bounded, broadcast back as literals), then
encode/decode are pure projections over array lambdas. Codes round
half-away-from-zero (Spark/DuckDB ROUND), and every arithmetic step is
a correctly-rounded IEEE op on identical doubles — so the codes are
bit-reproducible cross-engine and the registered query value-hashes a
per-vector digest of the full code array.

Error contract: |x - dequantize(quantize(x))| <= (hi-lo)/255/2 per
dimension (half a quantization step) — pinned by unit test. Degenerate
dimensions (hi == lo) encode 0 and decode exactly lo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.similarity import as_double
from nyctaxidatapipeline_spark.plans.util import fan_out

LEVELS = 255  # unsigned byte code space 0..255


def dim_bounds(df: DataFrame, vec_col: str = "embedding"
               ) -> tuple[list[float], list[float]]:
    """Per-dimension (lo, hi) over the corpus — one explode + aggregate,
    ``dim`` rows collected (never the data)."""
    rows = (df.select(F.posexplode(as_double(vec_col))
                      .alias("pos", "x"))
              .groupBy("pos")
              .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
              .orderBy("pos")
              .collect())
    return ([float(r["lo"]) for r in rows],
            [float(r["hi"]) for r in rows])


def quantize(df: DataFrame, lo: list[float], hi: list[float],
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """(id, codes array<int>): per-dim byte codes against the bounds.
    ``code = round((x - lo) / (hi - lo) * 255)`` clamped to [0, 255];
    degenerate dims (hi == lo) code 0."""
    z = F.zip_with(
        as_double(vec_col),
        F.arrays_zip(F.lit(lo), F.lit(hi)),
        lambda x, b: F.when(
            b["1"] == b["0"], F.lit(0)
        ).otherwise(
            F.least(F.lit(LEVELS), F.greatest(F.lit(0),
                    F.round((x - b["0"]) / (b["1"] - b["0"]) * LEVELS, 0)
                     .cast("int")))))
    return fan_out(df, id_col).select(F.col(id_col), z.alias("codes"))


def dequantize_expr(codes, lo: list[float], hi: list[float]):
    """Reconstruction expression: ``lo + code/255 * (hi - lo)``."""
    return F.zip_with(
        codes,
        F.arrays_zip(F.lit(lo), F.lit(hi)),
        lambda c, b: b["0"]
        + c.cast("double") / LEVELS * (b["1"] - b["0"]))
