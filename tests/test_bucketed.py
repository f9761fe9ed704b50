"""Bucketed-table layout: the write-once-shuffle-never join path.

Pins the physical property that justifies the sink: a sort-merge join of
two tables bucketed+sorted on the join key plans with NO Exchange and NO
Sort — the shuffle was paid at write time.
"""

import pytest
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.plans import explain_str
from nyctaxidatapipeline_spark.sinks import write_bucketed_table


@pytest.fixture()
def no_broadcast(spark):
    # Force sort-merge joins so the assertion targets the Exchange, not a
    # BroadcastExchange that would hide it at toy scale. Sort-order
    # propagation from sorted buckets is off by default since Spark 3.0
    # (SPARK-28503) — the legacy conf re-enables it; it only applies when
    # every bucket is one file, which write_bucketed_table guarantees.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
                   "true")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering",
                   "false")


def test_bucketed_join_is_exchange_and_sort_free(spark, tmp_path,
                                                 no_broadcast):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b"))
    write_bucketed_table(left, "bkt_left", ["k"], 4, sort_cols=["k"],
                         path=str(tmp_path / "l"))
    write_bucketed_table(right, "bkt_right", ["k"], 4, sort_cols=["k"],
                         path=str(tmp_path / "r"))
    try:
        joined = spark.table("bkt_left").join(spark.table("bkt_right"),
                                              "k")
        plan = explain_str(joined, "simple")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert "Sort" not in plan.replace("SortMergeJoin", "")
        rows = {(r.k, r.a, r.b) for r in joined.collect()}
        assert rows == {(k, 2 * k, k + 7) for k in range(0, 1000, 3)}
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_groupby_needs_no_exchange(spark, tmp_path):
    df = spark.range(0, 500).select((F.col("id") % 50).alias("k"),
                                    F.col("id").alias("v"))
    write_bucketed_table(df, "bkt_agg", ["k"], 4,
                         path=str(tmp_path / "g"))
    try:
        agg = (spark.table("bkt_agg").groupBy("k")
               .agg(F.sum("v").alias("s")))
        plan = explain_str(agg, "simple")
        assert "Exchange" not in plan
        got = {(r.k, r.s) for r in agg.collect()}
        want = {(k, sum(v for v in range(500) if v % 50 == k))
                for k in range(50)}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_agg")
