"""Structured Streaming — the streaming surface the reference lacks
(SURVEY.md §2.9): its hour-of-day heatmap is a batch proxy for a windowed
count; here it's a real ``readStream`` pipeline with event-time windows,
watermarked late-data handling, and within-watermark dedup.

Local tests replay the ``events`` fixture parquet as a stream
(``maxFilesPerTrigger``) into a memory sink via ``processAllAvailable`` —
the same plans run unchanged against Kafka/files at scale (swap the source;
state-store sizing = |open windows| x |keys|, bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.sources.tables import _nanos_timestamp_cols

import os


def stream_table(spark: SparkSession, sf_dir: str, name: str,
                 max_files_per_trigger: int = 1) -> DataFrame:
    """Replay a fixture table as a file stream (schema from the batch
    reader, including the nanos→micros timestamp normalization)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    # The file-stream source only accepts directories: stream the sf dir
    # with a glob filter selecting this table's file(s).
    stream = (spark.readStream
              .format("parquet")
              .schema(raw_schema)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .option("pathGlobFilter", f"{name}.parquet")
              .load(sf_dir))
    for c in _nanos_timestamp_cols(path):
        # TIMESTAMP (not NTZ): watermarks only accept event time on
        # TimestampType; session TZ is pinned UTC so wall times match the
        # batch reader's NTZ values.
        stream = stream.withColumn(
            c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return stream


def hourly_event_counts(stream: DataFrame, ts_col: str = "ts",
                        watermark: str = "2 hours",
                        window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts + value sums with a watermark —
    the streaming twin of the batch ``hourly_window`` query (same numbers
    once the stream drains)."""
    return (stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window).alias("win"),
                     F.col("event_type"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("win.start").alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def dedup_within_watermark(stream: DataFrame, keys: list[str],
                           ts_col: str = "ts",
                           watermark: str = "2 hours") -> DataFrame:
    """Drop duplicate events by key within the watermark horizon — bounded
    state (vs unbounded ``dropDuplicates`` on an infinite stream)."""
    return (stream
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(keys))


def run_to_memory(stream: DataFrame, query_name: str,
                  output_mode: str = "append"):
    """Drive a streaming plan to completion against the replayed fixture:
    memory sink + processAllAvailable (synchronous drain for tests)."""
    q = (stream.writeStream
         .outputMode(output_mode)
         .format("memory")
         .queryName(query_name)
         .start())
    q.processAllAvailable()
    return q
