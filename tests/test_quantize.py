"""Scalar quantization: error bound, degenerate dims, roundtrip."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.quantize import (
    dequantize_expr,
    dim_bounds,
    quantize,
)
from nyctaxidatapipeline_spark.sources import load_table


def test_quantize_error_bound_and_range(spark):
    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    lo, hi = dim_bounds(emb)
    q = quantize(emb, lo, hi)
    joined = q.join(emb, "vec_id")
    err = joined.select(F.array_max(F.zip_with(
        dequantize_expr(F.col("codes"), lo, hi),
        F.transform("embedding", lambda x: x.cast("double")),
        lambda a, b: F.abs(a - b))).alias("e")).agg(F.max("e")).first()[0]
    half_step = max((h - l) / 255 for l, h in zip(lo, hi)) / 2
    assert err <= half_step + 1e-12
    rng = q.select(F.min(F.array_min("codes")).alias("lo"),
                   F.max(F.array_max("codes")).alias("hi")).first()
    assert rng["lo"] >= 0 and rng["hi"] <= 255
    # bounds rows are extreme by construction: some code hits 0 and 255
    assert rng["lo"] == 0 and rng["hi"] == 255


def test_quantize_degenerate_dim(spark):
    df = spark.createDataFrame([
        Row(vec_id=1, embedding=[5.0, 1.0]),
        Row(vec_id=2, embedding=[5.0, 3.0])])
    lo, hi = dim_bounds(df)
    assert lo[0] == hi[0] == 5.0
    got = {r["vec_id"]: list(r["codes"])
           for r in quantize(df, lo, hi).collect()}
    assert got == {1: [0, 0], 2: [0, 255]}
    # degenerate dim decodes exactly lo
    dec = (quantize(df, lo, hi)
           .select(dequantize_expr(F.col("codes"), lo, hi).alias("v"))
           .collect())
    assert all(r["v"][0] == 5.0 for r in dec)
