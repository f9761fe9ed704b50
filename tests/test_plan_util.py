"""fan_out's scan-width probe: the estimate must be a LOWER bound of the
actual scan task count (so the >= target skip is safe), and the helper
must still widen genuinely narrow scans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.plans.util import (
    _estimated_scan_partitions,
    fan_out,
)


def test_estimate_is_lower_bound_many_tiny_files(spark, tmp_path):
    # 100 tiny files: Spark's openCost packing merges them (admission
    # tests raw length, so bins overfill by up to one openCost) — the
    # raw file count (100) would wildly overestimate here.
    path = str(tmp_path / "tiny")
    spark.range(1000).repartition(100).write.parquet(path)
    df = spark.read.parquet(path)
    est = _estimated_scan_partitions(df, spark.sparkContext.defaultParallelism)
    actual = df.rdd.getNumPartitions()
    assert est is not None
    assert est <= actual, (est, actual)
    # and not uselessly loose: within 2x of the real packing
    assert est >= actual / 2, (est, actual)


def test_estimate_is_lower_bound_one_wide_file(spark, tmp_path):
    # One multi-split file: the raw file count (1) would force a
    # pointless repartition; the size-based estimate sees the splits.
    path = str(tmp_path / "big")
    spark.range(2_000_000).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    est = _estimated_scan_partitions(df, spark.sparkContext.defaultParallelism)
    actual = df.rdd.getNumPartitions()
    assert est is not None
    assert 1 <= est <= actual, (est, actual)


def test_estimate_none_for_memory_plans(spark):
    assert _estimated_scan_partitions(spark.range(10), 8) is None


def test_fan_out_widens_narrow_scan(spark, tmp_path):
    path = str(tmp_path / "narrow")
    spark.range(100).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    assert fan_out(df, "id").rdd.getNumPartitions() == target


def test_fan_out_noop_for_wide_memory_frame(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(10_000).repartition(target, "id")
    # already at target width -> the exact same plan object comes back
    assert fan_out(df, "id") is df


def test_mix_sources_rejects_nonpositive_proportion(spark):
    from nyctaxidatapipeline_spark.operators.sampling import mix_sources

    df = spark.createDataFrame([(1, "a")], "id long, src string")
    with pytest.raises(ValueError, match="> 0"):
        mix_sources(df, "src", "id", {"a": 1.0, "b": 0.0})


def test_mix_sources_exact_decimal_boundary(spark):
    # 3 rows at p=0.3 + 7 rows at p=0.7: budget = min(3/0.3, 7/0.7) = 10
    # exactly in decimal arithmetic; IEEE doubles give 10.000000000000002
    # for 3/0.3, which must NOT leak an extra row into the quotas.
    from nyctaxidatapipeline_spark.operators.sampling import mix_sources

    rows = [(i, "a") for i in range(3)] + [(100 + i, "b") for i in range(7)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = mix_sources(df, "src", "id", {"a": 0.3, "b": 0.7})
    got = {r["src"]: 0 for r in out.collect()}
    for r in out.collect():
        got[r["src"]] += 1
    assert got == {"a": 3, "b": 7}


def test_zorder_bits_autoscale_and_reject(spark):
    from nyctaxidatapipeline_spark.sinks import zorder_key

    # 5 cols x default 16 bits would shift past bit 63; auto-scales to
    # 12 bits/col (60 bits total) instead of silently colliding.
    cols = [f"c{i}" for i in range(5)]
    df = spark.createDataFrame([tuple(float(i) for i in range(5))],
                               ", ".join(f"{c} double" for c in cols))
    bounded = df.select(
        "*", *[F.lit(0.0).alias(f"_zlo{i}") for i in range(5)],
        *[F.lit(10.0).alias(f"_zhi{i}") for i in range(5)])
    key = bounded.select(zorder_key(df, cols).alias("k")).collect()[0]["k"]
    assert key >= 0  # never lands in the sign bit
    with pytest.raises(ValueError, match="Z-order"):
        zorder_key(df, [f"c{i}" for i in range(64)])
