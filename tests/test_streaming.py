"""Structured Streaming tests: fixture replay -> windowed agg and dedup,
drained synchronously into a memory sink; results cross-checked against the
equivalent batch plan."""

from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.sources import load_table
from nyctaxidatapipeline_spark.streaming.jobs import (
    dedup_within_watermark,
    hourly_event_counts,
    run_to_memory,
    stream_table,
)

SF = "/root/testdata/sf0.001"


def test_hourly_counts_match_batch(spark):
    stream = stream_table(spark, SF, "events")
    assert stream.isStreaming
    q = run_to_memory(hourly_event_counts(stream), "hourly_test")
    try:
        got = spark.sql("SELECT * FROM hourly_test")
        batch = (load_table(spark, SF, "events")
                 .groupBy(F.date_trunc("hour", F.col("ts")).alias("ws"),
                          "event_type")
                 .agg(F.count("*").alias("n"), F.sum("value").alias("s")))
        s = {(r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
             for r in got.collect()}
        b = {(r.ws, r.event_type): (r.n, round(r.s, 6))
             for r in batch.collect()}
        # append mode emits only watermark-closed windows; every emitted
        # window must match batch, and most windows must have been emitted.
        assert s, "stream produced no output"
        assert all(s[k] == b[k] for k in s)
        assert len(s) >= len(b) - len({k[1] for k in b})  # ≤1 open window/type
    finally:
        q.stop()


def test_dedup_within_watermark(spark):
    stream = stream_table(spark, SF, "events")
    q = run_to_memory(
        dedup_within_watermark(stream, ["event_id"]), "dedup_test")
    try:
        n_stream = spark.sql("SELECT count(*) c FROM dedup_test").collect()[0].c
        n_batch = load_table(spark, SF, "events").count()
        # fixture has unique event_ids: dedup must be lossless
        assert n_stream == n_batch
    finally:
        q.stop()
