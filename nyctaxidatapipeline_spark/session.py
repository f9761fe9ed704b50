"""SparkSession bootstrap.

Reference equivalent: ``yellow_taxi_etl.py:57-61`` (bare ``builder.appName``).
Ours pins the configs that matter for correctness (UTC timestamps for oracle
parity) and for scale (AQE, skew-join handling, sane shuffle parallelism).

On a real cluster the same builder is used — only ``master`` and the memory /
shuffle-partition numbers come from the environment. Local defaults target
the test harness (local[32], 128 GiB host).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# One knob for local parallelism; the driver exports SPARK_GRAFT_CPUS.
_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "nyctaxidatapipeline_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or reuse) the session.

    ``shuffle_partitions`` defaults to the local core count: at 100 TB this is
    instead sized so that ``input_bytes / partitions`` stays in the 100-500 MB
    band per task, and AQE coalescing trims the small tail.

    ``extra_conf`` entries are applied at BUILD time — the hook for
    create-time-only confs (e.g. ``spark.ui.retainedStages`` for the
    streaming movement census); they have no effect when an existing
    session is reused (getOrCreate).
    """
    n_shuffle = shuffle_partitions or int(_CPUS)
    # Pin BLAS to one thread per task BEFORE the JVM (and thus the forked
    # Python workers) launches: with local[32], each worker spawning a full
    # OpenBLAS pool oversubscribes the host ~1000x and a post-fork pool can
    # spin-wait (an observed 11 s for a 10 ms matmul in mapInPandas). One
    # BLAS thread per task is also the right shape on a real cluster.
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS",
                "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    builder = (
        SparkSession.builder
        .master(master or f"local[{_CPUS}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # InferWindowGroupLimit only rewrites rank-filters whose limit
        # is <= this threshold (default 1000). The bottom-k sketches
        # use k=16384 (ungrouped) / 4096 (grouped) — below the default
        # their row_number trims get NO map-side WindowGroupLimit
        # (Partial) and the level-0 exchange would ship the whole
        # input. 2^20 covers any sane sketch size; the rank-like
        # partial is a streaming counter over sorted input (O(1)
        # memory), so there is no cost to raising it.
        .config("spark.sql.optimizer.windowGroupLimitThreshold",
                str(1 << 20))
        # Fixture parquet stores TIMESTAMP(NANOS) which the Spark reader
        # rejects; read as long and let sources.tables restore timestamps
        # (truncated to micros, matching DuckDB's nanos handling).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # Whole-stage codegen emits a unique class per query; a long-lived
        # session running many distinct queries can fill HotSpot's default
        # code cache, silently disabling the JIT (~20x slowdowns late in a
        # benchmark run). Reserve enough for the full query sweep.
        # 1g: a 44-query suite of distinct codegen'd plans emits enough
        # JIT-compiled classes to exhaust 512m near the end of a run, at
        # which point HotSpot silently stops compiling and the last
        # queries run interpreted (observed 12x on the final query).
        .config("spark.driver.extraJavaOptions",
                "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
