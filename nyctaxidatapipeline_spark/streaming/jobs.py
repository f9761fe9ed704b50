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
    for field in stream.schema.fields:
        # Watermarks reject TIMESTAMP_NTZ event time; session TZ is pinned
        # UTC so the NTZ->LTZ cast preserves wall-clock values.
        if field.dataType.typeName() == "timestamp_ntz":
            stream = stream.withColumn(
                field.name, F.col(field.name).cast("timestamp"))
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


def sliding_event_counts(stream: DataFrame, ts_col: str = "ts",
                         watermark: str = "2 hours",
                         window: str = "1 hour",
                         slide: str = "30 minutes") -> DataFrame:
    """Sliding event-time windows (each event lands in window/slide
    overlapping windows). State grows by the overlap factor — size the
    watermark accordingly."""
    return (stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.window(F.col(ts_col), window, slide).alias("win"),
                     F.col("event_type"))
            .agg(F.count("*").alias("n_events"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    "event_type", "n_events"))


def session_window_counts(stream: DataFrame, key: str = "user_id",
                          ts_col: str = "ts", gap: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Event-time session windows (dynamic length, closed by gap) — the
    streaming twin of ``operators.temporal.sessionize``."""
    return (stream
            .withWatermark(ts_col, watermark)
            .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"),
                     F.col(key))
            .agg(F.count("*").alias("n_events"))
            .select(F.col(key),
                    F.col("sess.start").alias("session_start"),
                    F.col("sess.end").alias("session_end"),
                    "n_events"))


def stateful_running_totals(stream: DataFrame, key: str = "user_id",
                            value_col: str = "value") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-key event count + value sum maintained across micro-batches.

    The state store holds one (count, sum) pair per key — the pattern for
    operators Structured Streaming lacks natively (decayed counters,
    custom sessionization, online sketches). Output mode: update.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = f"{key} long, n_events long, total double"
    state_schema = "n long, total double"

    def update(keys, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame({key: [keys[0]], "n_events": [n],
                            "total": [total]})

    return (stream.groupBy(key)
            .applyInPandasWithState(update, out_schema, state_schema,
                                    "update",
                                    GroupStateTimeout.NoTimeout))


def enrich_with_static(stream: DataFrame, dim: DataFrame,
                       on: str, broadcast_dim: bool = False) -> DataFrame:
    """Stream-static join: enrich each event with a dimension table.

    The static side is re-planned per micro-batch (picking up dimension
    updates between batches) — the standard lookup-enrichment topology;
    no state store is involved, so this composes freely with downstream
    windows/aggregations. Broadcast is OPT-IN (``broadcast_dim=True``,
    for dimensions the caller knows are small): by default the planner
    decides via ``autoBroadcastJoinThreshold``/AQE, so a large dimension
    falls back to a shuffle join instead of OOMing the driver on every
    micro-batch with a forced broadcast.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(right, on, "left")


def purchase_error_correlation(events_a: DataFrame, events_b: DataFrame,
                               key: str = "user_id", ts_col: str = "ts",
                               watermark: str = "2 hours",
                               within: str = "1 hour") -> DataFrame:
    """Stream-stream inner join: pair each row of ``events_a`` with rows
    of ``events_b`` for the same key within ``within`` of each other.

    Both sides are watermarked so the join state store is bounded: a
    buffered row can be evicted once the other side's watermark passes
    its timestamp + ``within`` (the time-interval condition is what
    makes eviction possible — an unconstrained stream-stream join would
    buffer forever).
    """
    a = (events_a.withWatermark(ts_col, watermark)
         .select(F.col(key).alias("a_key"),
                 F.col(ts_col).alias("a_ts"),
                 F.col("event_type").alias("a_type")))
    b = (events_b.withWatermark(ts_col, watermark)
         .select(F.col(key).alias("b_key"),
                 F.col(ts_col).alias("b_ts"),
                 F.col("event_type").alias("b_type")))
    return a.join(
        b,
        F.expr(f"""
            a_key = b_key AND
            b_ts BETWEEN a_ts - INTERVAL {within}
                     AND a_ts + INTERVAL {within}
        """))


def run_foreach_batch_parquet(stream: DataFrame, out_dir: str):
    """foreachBatch sink: land each micro-batch as parquet (the idempotent
    exactly-once-per-epoch pattern — a real deployment keys the write on
    ``epoch_id`` for replay safety)."""
    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (batch_df.withColumn("_epoch", F.lit(epoch_id))
                 .write.mode("append").parquet(out_dir))

    q = (stream.writeStream
         .outputMode("append")
         .foreachBatch(write_batch)
         .start())
    q.processAllAvailable()
    return q


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


_EPOCH_MARKER = "_APPLIED_EPOCH"


def _recover_state_dir(state_dir: str) -> None:
    """Heal a crash inside :func:`_swap_state_dir`: the live dir
    missing with ``<dir>.bak`` present means the crash hit between the
    two renames — restore the backup (the pre-epoch state plus its
    epoch marker; the interrupted epoch replays and re-merges on
    restart, so nothing is lost)."""
    sd = state_dir.rstrip("/")
    bak = sd + ".bak"
    if not os.path.exists(sd) and os.path.isdir(bak):
        os.rename(bak, sd)


def _swap_state_dir(tmp: str, state_dir: str) -> None:
    """Crash-safe whole-state swap (ADVICE r11): keep the old state as
    ``<dir>.bak`` across the commit rename so no crash point loses
    BOTH the standing state and its ``_APPLIED_EPOCH`` marker. The old
    rmtree-then-rename had a window that, for the quantile monitors,
    silently rebuilt the sketch from the replay window only — a
    degraded threshold with no signal. Now any crash leaves either the
    old state live, the bak restorable (:func:`_recover_state_dir`,
    run by :func:`applied_epoch` so every merge and read path heals
    first), or the new state committed with at worst a stale bak that
    the next swap clears."""
    import shutil

    sd = state_dir.rstrip("/")
    bak = sd + ".bak"
    shutil.rmtree(bak, ignore_errors=True)
    if os.path.exists(sd):
        os.rename(sd, bak)
    os.rename(tmp, sd)
    shutil.rmtree(bak, ignore_errors=True)


def applied_epoch(state_dir: str) -> int:
    """The epoch id committed WITH the current state (-1 if none). The
    marker file is written into the tmp directory before the atomic
    rename, so state and epoch can never disagree. Also heals a swap
    interrupted between its two renames (see
    :func:`_recover_state_dir`) — every merge fn calls this first."""
    _recover_state_dir(state_dir)
    try:
        with open(os.path.join(state_dir, _EPOCH_MARKER)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def rollup_merge_fn(state_dir: str, keys: list[str], value_col: str):
    """The ``foreachBatch`` function for ``run_incremental_rollup``,
    exposed so tests can invoke it directly with a replayed
    ``(batch_df, epoch_id)`` — exactly what Structured Streaming does
    after a failure between sink commit and offset-log commit."""
    import shutil

    from nyctaxidatapipeline_spark.operators.incremental import (
        merge_partials,
        partial_agg,
    )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # Exactly-once under replays: foreachBatch is at-least-once, so
        # a crash after the state swap but before the streaming offset
        # commit re-delivers the SAME epoch on restart. The epoch id is
        # committed atomically with the state (marker file inside the
        # renamed directory); a replayed epoch is a no-op instead of a
        # double count — the standard batch-id-keyed idempotent sink.
        if epoch_id <= applied_epoch(state_dir):
            return
        spark = batch_df.sparkSession
        new = partial_agg(batch_df, keys, value_col)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            cur = spark.read.parquet(state_dir)
            merged = merge_partials([cur, new], keys)
        else:
            merged = new
        tmp = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, _EPOCH_MARKER), "w") as f:
            f.write(str(epoch_id))
        _swap_state_dir(tmp, state_dir)

    return merge_batch


def run_incremental_rollup(stream: DataFrame, state_dir: str,
                           keys: list[str], value_col: str,
                           checkpoint_dir: str | None = None):
    """foreachBatch maintenance of a mergeable partial-state rollup:
    every micro-batch reduces to its (count/sum/min/max) partial state
    (``operators.incremental.partial_agg``) and merges into the parquet
    state table — per-batch cost scales with the batch plus the state's
    key cardinality, never with stream history, and the merged state is
    provably equal to the one-shot batch aggregate (the merge-identity
    gate on ``incremental_rollup``).

    State swap is write-tmp-then-rename with the epoch id committed in
    the same rename (single-writer assumption — foreachBatch epochs are
    serialized per query), and replayed epochs are skipped — see
    ``rollup_merge_fn``. Pass ``checkpoint_dir`` to make restarts
    resume from the committed offsets (production always should; tests
    replaying a finite fixture may omit it).
    """
    w = (stream.writeStream
         .outputMode("update")
         .foreachBatch(rollup_merge_fn(state_dir, keys, value_col)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def quantile_sketch_merge_fn(state_dir: str, value_col: str,
                             rank_cols: list[str], k: int = 16384):
    """``foreachBatch`` for :func:`run_streaming_quantile_sketch` —
    a LIVE quantile monitor as maintained state (r11, composing the
    hash-sample bottom-k sketch with the rollup state skeleton): each
    micro-batch reduces to ITS bottom-k by the fixed md5 row-rank
    (``sketches.hash_sample_bottom_k`` — O(k) rows, one
    TakeOrderedAndProject), merges with the standing k-row state, and
    re-truncates at k. The sketch's pinned mergeability —
    bottom_k(A ∪ B) == bottom_k(bottom_k(A) ∪ bottom_k(B)) — makes the
    drained state EXACTLY the sketch of the whole stream (and, the
    rank being deterministic, byte-equal to the batch operator on the
    same rows), so a deployment reads a p99 threshold off a k-row
    parquet at any moment at ±sqrt(q(1-q)/k) rank accuracy. Per-batch
    cost: one linear scan of the batch + an O(k) merge — never stream
    history. Same epoch-marker swap + replay no-op as
    ``rollup_merge_fn``."""
    import shutil

    from nyctaxidatapipeline_spark.operators.sketches import (
        hash_sample_bottom_k,
    )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= applied_epoch(state_dir):
            return                       # replayed epoch — committed
        spark = batch_df.sparkSession
        # salt_buckets=None: a micro-batch is one epoch's rows — the
        # naive single-merge TakeOrderedAndProject is the cheap shape
        # here; the batch operator's default tree merge is for
        # unbounded-task-count corpus scans
        new = hash_sample_bottom_k(batch_df, rank_cols, [value_col], k,
                                   salt_buckets=None)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            cur = spark.read.parquet(state_dir).select(new.columns)
            merged = (cur.unionByName(new)
                      .orderBy("_rk", value_col).limit(int(k)))
        else:
            merged = new
        tmp = state_dir + ".tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, _EPOCH_MARKER), "w") as f:
            f.write(str(epoch_id))
        _swap_state_dir(tmp, state_dir)

    return merge_batch


def run_streaming_quantile_sketch(stream: DataFrame, state_dir: str,
                                  value_col: str,
                                  rank_cols: list[str],
                                  k: int = 16384,
                                  checkpoint_dir: str | None = None):
    """foreachBatch maintenance of the deterministic bottom-k quantile
    sketch (see :func:`quantile_sketch_merge_fn`): k rows of state,
    O(batch + k) per epoch, drained state == the batch sketch of the
    whole stream. Read thresholds off the state with
    :func:`read_quantile_threshold`."""
    w = (stream.writeStream
         .outputMode("update")
         .foreachBatch(quantile_sketch_merge_fn(state_dir, value_col,
                                                rank_cols, k)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def grouped_quantile_sketch_merge_fn(state_dir: str,
                                     group_cols: list[str],
                                     value_col: str,
                                     rank_cols: list[str],
                                     k: int = 4096,
                                     salt_buckets: int = 32):
    """``foreachBatch`` for :func:`run_streaming_grouped_quantile_sketch`
    — the per-group sibling of :func:`quantile_sketch_merge_fn`: each
    micro-batch reduces to its per-group bottom-k
    (``sketches.grouped_hash_sample_bottom_k`` — the salted two-phase
    shape, so no task ever sorts a whole group even inside one batch),
    merges with the standing state and re-truncates per group. The
    merge window's input is bounded at 2·k rows per group regardless
    of stream history; state is ≤ k rows per live group. Same
    epoch-marker swap / replay no-op as the siblings."""
    import shutil

    from pyspark.sql import Window

    from nyctaxidatapipeline_spark.operators.sketches import (
        grouped_hash_sample_bottom_k,
    )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= applied_epoch(state_dir):
            return                       # replayed epoch — committed
        spark = batch_df.sparkSession
        new = grouped_hash_sample_bottom_k(batch_df, group_cols,
                                           value_col, rank_cols, k,
                                           salt_buckets)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            cur = spark.read.parquet(state_dir).select(new.columns)
            # bounded merge: ≤ 2k rows per group enter this window
            w = Window.partitionBy(*group_cols).orderBy("_rk", "_v")
            merged = (cur.unionByName(new)
                      .withColumn("_rn", F.row_number().over(w))
                      .filter(F.col("_rn") <= int(k)).drop("_rn"))
        else:
            merged = new
        tmp = state_dir + ".tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, _EPOCH_MARKER), "w") as f:
            f.write(str(epoch_id))
        _swap_state_dir(tmp, state_dir)

    return merge_batch


def run_streaming_grouped_quantile_sketch(
        stream: DataFrame, state_dir: str, group_cols: list[str],
        value_col: str, rank_cols: list[str], k: int = 4096,
        salt_buckets: int = 32, checkpoint_dir: str | None = None):
    """foreachBatch maintenance of PER-GROUP bottom-k quantile
    sketches (see :func:`grouped_quantile_sketch_merge_fn`); read
    per-group percentiles off the state with
    :func:`read_grouped_percentiles`."""
    w = (stream.writeStream
         .outputMode("update")
         .foreachBatch(grouped_quantile_sketch_merge_fn(
             state_dir, group_cols, value_col, rank_cols, k,
             salt_buckets)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def read_grouped_percentiles(spark: SparkSession, state_dir: str,
                             group_cols: list[str],
                             percentiles=(0.5, 0.95)):
    """Per-group discrete percentiles off a
    :func:`run_streaming_grouped_quantile_sketch` state — the same
    sorted-array index arithmetic (and ``p50``-style output contract)
    as the batch ``grouped_hash_sample_percentiles``, over ≤ k rows
    per group."""
    from nyctaxidatapipeline_spark.operators.sketches import (
        sample_quantile,
    )

    _recover_state_dir(state_dir)
    s = spark.read.parquet(state_dir)
    agg = s.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_v")).alias("_arr"))
    cols = [*group_cols] + [
        (F.round(sample_quantile(F.col("_arr"), p), 6)
          + F.lit(0.0)).alias(f"p{int(p * 100)}")
        for p in percentiles]
    return agg.select(*cols)


def read_quantile_threshold(spark: SparkSession, state_dir: str,
                            value_col: str, q: float = 0.99):
    """The discrete q-quantile of a
    :func:`run_streaming_quantile_sketch` state — the same
    ceil(q·n)-index arithmetic as the batch
    ``hash_sample_quantile_threshold``, off a k-row parquet (a
    monitoring read, not a stream-history scan). Returns a 1-row
    DataFrame (``threshold``) for the broadcast two-phase anomaly
    shape."""
    from nyctaxidatapipeline_spark.operators.sketches import (
        sample_quantile,
    )

    _recover_state_dir(state_dir)
    s = spark.read.parquet(state_dir)
    arr = F.sort_array(F.collect_list(value_col))
    return (s.agg(arr.alias("_arr"))
             .select(sample_quantile(F.col("_arr"), q)
                      .alias("threshold")))


def dedup_admit_fn(corpus_dir: str, text_col: str, id_col: str):
    """The ``foreachBatch`` function for ``run_incremental_dedup``:
    admit only batch documents that are not fingerprint-duplicates of
    the already-admitted corpus (nor of each other — min-id wins), and
    APPEND the admitted rows as a new epoch partition.

    Exactly-once under replays, the append-shaped variant of
    ``rollup_merge_fn``'s swap: each epoch's admissions land in their
    own ``epoch=N`` directory via write-tmp-then-rename, so the rename
    IS the commit — a crash between sink commit and offset commit
    re-delivers the same epoch, which is a no-op because its directory
    already exists. Unlike the rollup (whole-state swap), nothing ever
    rewrites: per-batch cost is the batch anti-join against the corpus
    fingerprint set (via the Bloom pre-pass, so only filter-positive
    rows shuffle), plus the admitted rows' write.
    """
    from nyctaxidatapipeline_spark.operators.dedup import (
        incremental_fingerprint_dedup_bloom,
    )

    return _admit_commit_fn(
        corpus_dir, text_col, id_col,
        lambda batch, corpus: incremental_fingerprint_dedup_bloom(
            batch, corpus, text_col, id_col))


def _admit_commit_fn(corpus_dir: str, text_col: str, id_col: str,
                     admitter):
    """Shared epoch-directory admission commit (the skeleton
    ``dedup_admit_fn``'s docstring describes): read the admitted
    corpus, run ``admitter(batch, corpus) -> admitted subset``, land
    the admissions in ``epoch=N`` via write-tmp-then-rename — the
    rename IS the exactly-once commit, replayed epochs no-op on the
    existing directory."""
    return _admit_commit_cols_fn(corpus_dir, [id_col, text_col],
                                 admitter)


#: epoch-store compaction watermark — epochs ≤ this id were merged
#: into one partition by :func:`compact_epoch_store`; their dirs are
#: gone but they ARE committed (replays must no-op on the marker)
_COMPACTED_MARKER = "_compacted_through"


def _compacted_through(root: str) -> int:
    """Highest epoch id folded into the store by
    :func:`compact_epoch_store` (-1 when never compacted)."""
    try:
        with open(os.path.join(root, _COMPACTED_MARKER)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def _epoch_committed(root: str, epoch_id: int) -> bool:
    """True when this epoch's output is already in the store — either
    its own ``epoch=`` dir exists, or compaction folded it away (the
    watermark is the proof of commit). Also heals a
    :func:`compact_epoch_store` swap interrupted between its two
    renames (root absent, ``._compact_bak`` intact) — every door
    checks this before touching the store, so the manual-restore
    window the r11 docstring acknowledged is now self-healing."""
    _recover_compacted_store(root)
    return (epoch_id <= _compacted_through(root)
            or os.path.exists(os.path.join(root, f"epoch={epoch_id}")))


def _recover_compacted_store(root: str) -> None:
    """Restore ``<root>._compact_bak`` when the store itself is absent
    — the crash window between :func:`compact_epoch_store`'s two
    renames (ADVICE r11). The bak is the full pre-compaction store, so
    restoring it loses nothing; the next compaction simply redoes the
    fold."""
    root = root.rstrip("/")
    bak = root + "._compact_bak"
    if not os.path.exists(root) and os.path.isdir(bak):
        os.rename(bak, root)


def _stage_path(store_dir: str, epoch_id: int) -> str:
    """Door-unique staging dir for an epoch commit, placed BESIDE the
    store (same parent → the final rename stays same-filesystem). The
    store's basename is part of the name (ADVICE r11): two doors whose
    corpus dirs share a parent and process the same epoch id can never
    clobber each other's staging or rename one door's admissions into
    the other's corpus."""
    root = store_dir.rstrip("/")
    return os.path.join(
        os.path.dirname(root) or ".",
        f".tmp-{os.path.basename(root)}-epoch-{epoch_id}")


def compact_epoch_store(spark: SparkSession, store_dir: str,
                        n_files: int = 1) -> dict:
    """Small-files maintenance for the epoch-append stores (admission
    corpora and their maintained indexes): fold EVERY ``epoch=`` dir
    into one, committed by a whole-store directory swap — the
    streaming sibling of ``sinks.compact_parquet``. Each epoch appends
    one file, so a long-running door accumulates thousands of tiny
    files; after compaction the store holds one merged
    ``epoch=<max>`` partition plus the ``_compacted_through`` marker,
    which keeps the exactly-once contract intact: replayed epochs
    ≤ the watermark no-op on the marker instead of the (now absent)
    epoch dirs. Non-epoch sidecars (``_centroids.json``) are carried
    over verbatim.

    SINGLE-WRITER: run between triggers (the same serialization the
    epoch commits themselves assume) — the swap is atomic for new
    readers, but a door mid-batch could hold pre-swap file handles.
    Crash recovery is AUTOMATIC (r12, ADVICE r11): a crash between the
    two renames leaves the store absent with ``<root>._compact_bak``
    intact, and both this function and every door's
    ``_epoch_committed`` check restore the bak before proceeding
    (:func:`_recover_compacted_store`) — no manual window remains.
    Returns before/after file counts."""
    import shutil

    root = store_dir.rstrip("/")
    _recover_compacted_store(root)
    eps = sorted(int(e.split("=", 1)[1]) for e in os.listdir(root)
                 if e.startswith("epoch="))
    if not eps:
        return {"epochs": 0, "files_before": 0, "files_after": 0}
    through = max(max(eps), _compacted_through(root))
    files_before = sum(len([f for f in fs if f.endswith(".parquet")])
                       for _, _, fs in os.walk(root))
    merged = (spark.read.option("basePath", root).parquet(root)
              .drop("epoch"))
    tmp = root + "._compact_tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (merged.coalesce(max(1, int(n_files)))
           .write.mode("overwrite")
           .parquet(os.path.join(tmp, f"epoch={through}")))
    for entry in os.listdir(root):
        src = os.path.join(root, entry)
        if (not entry.startswith("epoch=")
                and entry != _COMPACTED_MARKER
                and os.path.isfile(src)):
            shutil.copy2(src, os.path.join(tmp, entry))
    with open(os.path.join(tmp, _COMPACTED_MARKER), "w") as f:
        f.write(str(through))
    bak = root + "._compact_bak"
    shutil.rmtree(bak, ignore_errors=True)
    os.rename(root, bak)
    os.rename(tmp, root)
    shutil.rmtree(bak, ignore_errors=True)
    files_after = sum(len([f for f in fs if f.endswith(".parquet")])
                      for _, _, fs in os.walk(root))
    return {"epochs": len(eps), "compacted_through": through,
            "files_before": files_before, "files_after": files_after}


def _admit_commit_cols_fn(corpus_dir: str, cols: list[str], admitter):
    """``_admit_commit_fn`` generalized to an arbitrary payload
    column list (id first) — the cross-signal admitter carries BOTH a
    text and an embedding column through the same epoch-directory
    exactly-once commit."""
    import shutil

    def admit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        edir = os.path.join(corpus_dir, f"epoch={epoch_id}")
        if _epoch_committed(corpus_dir, epoch_id):
            return                       # replayed epoch — committed
        spark = batch_df.sparkSession
        batch = batch_df.select(*cols)
        if os.path.isdir(corpus_dir) and any(
                e.startswith("epoch=") for e in os.listdir(corpus_dir)):
            corpus = (spark.read
                      .option("basePath", corpus_dir)
                      .parquet(corpus_dir)
                      .select(*cols))
        else:
            corpus = spark.createDataFrame([], batch.schema)
        admitted = admitter(batch, corpus)
        tmp = _stage_path(corpus_dir, epoch_id)
        shutil.rmtree(tmp, ignore_errors=True)
        admitted.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(corpus_dir, exist_ok=True)
        os.rename(tmp, edir)

    return admit_batch


def near_dup_admit_fn(corpus_dir: str, text_col: str, id_col: str,
                      threshold: float = 0.5,
                      max_bucket: int | None = 32):
    """``foreachBatch`` for :func:`run_streaming_near_dup`: the
    NEAR-dup sibling of ``dedup_admit_fn`` — each micro-batch is gated
    by ``incremental_minhash_admission`` (banded LSH vs the admitted
    corpus + greedy in-batch, exact-Jaccard verified) instead of exact
    fingerprints, landing through the same epoch-directory
    exactly-once commit. Per-batch cost scales with the batch and its
    bucket overlap against the corpus, never |corpus|²; the
    ``max_bucket`` corpus-bucket cap (on by default here — a streaming
    admitter must survive boilerplate storms unattended) bounds the
    verification fan-out of any hot bucket."""
    from nyctaxidatapipeline_spark.operators.dedup import (
        incremental_minhash_admission,
    )

    return _admit_commit_fn(
        corpus_dir, text_col, id_col,
        lambda batch, corpus: incremental_minhash_admission(
            batch, corpus, text_col, id_col,
            threshold=threshold, max_bucket=max_bucket))


def near_dup_admit_indexed_fn(corpus_dir: str, index_dir: str,
                              text_col: str, id_col: str,
                              threshold: float = 0.5,
                              max_bucket: int | None = 32,
                              n: int = 3, num_hashes: int = 32,
                              bands: int = 8, portable: bool = False):
    """``foreachBatch`` for :func:`run_streaming_near_dup_indexed` —
    the MAINTAINED-INDEX streaming shape of lexical near-dup admission
    (r11, the lexical sibling of :func:`semantic_admit_indexed_fn`):
    the corpus's LSH band-bucket table lives as epoch-append parquet
    under ``index_dir``; each epoch probes the read-back index via
    ``corpus_index=`` (skipping the corpus SIGNATURE pass — 80%+ of a
    cold admission's wall at sf10, PLANS.md #20) and appends only its
    own admissions' bucket rows (``build_minhash_index`` of the
    admitted subset; the pure-union closure ``append_to_minhash_index``
    unit-pins). Corpus TEXT is still read from ``corpus_dir`` for the
    exact-Jaccard verification of touched candidates — that read is
    candidate-filtered, never corpus-wide.

    Exactly-once: index epoch commits BEFORE the corpus epoch; a crash
    between the two re-delivers the epoch with its own bucket rows
    already indexed, so the probe anti-joins the batch's ids out of
    the read-back index first (rows only the batch itself could have
    contributed can never block it) and the recomputed admission
    matches the committed index epoch. Parameter identity is validated
    against the index's stamp on every probe."""
    import shutil

    from nyctaxidatapipeline_spark.operators.dedup import (
        _minhash_params,
        build_minhash_index,
        incremental_minhash_admission,
    )
    from nyctaxidatapipeline_spark.operators.indexmeta import (
        check_index_params,
    )

    def admit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # heal a crashed index-store compaction before the has_idx
        # read (corpus_dir heals via _epoch_committed just after)
        _recover_compacted_store(index_dir)
        edir = os.path.join(corpus_dir, f"epoch={epoch_id}")
        if _epoch_committed(corpus_dir, epoch_id):
            return                       # replayed epoch — committed
        spark = batch_df.sparkSession
        batch = (batch_df.select(id_col, text_col)
                 .localCheckpoint())
        if os.path.isdir(corpus_dir) and any(
                e.startswith("epoch=") for e in os.listdir(corpus_dir)):
            corpus = (spark.read.option("basePath", corpus_dir)
                      .parquet(corpus_dir).select(id_col, text_col))
        else:
            corpus = spark.createDataFrame([], batch.schema)
        has_idx = os.path.isdir(index_dir) and any(
            e.startswith("epoch=") for e in os.listdir(index_dir))
        if has_idx:
            idx = (spark.read.option("basePath", index_dir)
                   .parquet(index_dir)
                   .select(id_col, "band", "bucket")
                   # crash-healing: a half-committed replay's own
                   # bucket rows (batch ids) must never block it
                   .join(batch.select(id_col), id_col, "left_anti"))
            # the framework wrote this index itself — a missing stamp
            # here means validation silently degraded (warn once)
            check_index_params(
                idx, _minhash_params(n, num_hashes, bands, portable),
                "run_streaming_near_dup_indexed (index read-back)",
                expect_stamp=True)
        else:
            # no standing index yet: build from the (possibly empty)
            # corpus once — from epoch 1 on, the probe never re-signs
            idx = build_minhash_index(corpus, text_col, id_col, n,
                                      num_hashes, bands, portable)
        admitted = incremental_minhash_admission(
            batch, corpus, text_col, id_col, n=n,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
            portable=portable, max_bucket=max_bucket,
            corpus_index=idx).localCheckpoint()
        idx_edir = os.path.join(index_dir, f"epoch={epoch_id}")
        if not _epoch_committed(index_dir, epoch_id):
            tmp = os.path.join(index_dir, f".tmp-epoch-{epoch_id}")
            shutil.rmtree(tmp, ignore_errors=True)
            (build_minhash_index(admitted, text_col, id_col, n,
                                 num_hashes, bands, portable)
             .coalesce(1).write.mode("overwrite").parquet(tmp))
            os.makedirs(index_dir, exist_ok=True)
            os.rename(tmp, idx_edir)
        tmp = _stage_path(corpus_dir, epoch_id)
        shutil.rmtree(tmp, ignore_errors=True)
        admitted.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(corpus_dir, exist_ok=True)
        os.rename(tmp, edir)

    return admit_batch


def run_streaming_near_dup_indexed(
        stream: DataFrame, corpus_dir: str, index_dir: str,
        text_col: str = "text", id_col: str = "doc_id",
        threshold: float = 0.5, max_bucket: int | None = 32,
        portable: bool = False,
        checkpoint_dir: str | None = None):
    """foreachBatch streaming near-dup admission over a MAINTAINED
    persisted LSH index (see :func:`near_dup_admit_indexed_fn`):
    per-epoch cost never re-signs the corpus — the streaming
    deployment shape of ``incremental_minhash_indexed``."""
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(near_dup_admit_indexed_fn(
             corpus_dir, index_dir, text_col, id_col, threshold,
             max_bucket, portable=portable)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def run_streaming_near_dup(stream: DataFrame, corpus_dir: str,
                           text_col: str = "text",
                           id_col: str = "doc_id",
                           threshold: float = 0.5,
                           max_bucket: int | None = 32,
                           checkpoint_dir: str | None = None):
    """foreachBatch streaming corpus admission with NEAR-dup gating:
    documents arriving on the stream are admitted into ``corpus_dir``
    only if no LSH≥threshold match exists in the admitted corpus or
    earlier in their own micro-batch (see ``near_dup_admit_fn``).
    Drained result equals applying ``incremental_minhash_admission``
    batch-by-batch — gated e2e in ``tests/test_streaming_ext``."""
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(near_dup_admit_fn(corpus_dir, text_col, id_col,
                                         threshold, max_bucket)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def semantic_admit_fn(corpus_dir: str, vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      threshold: float = 0.85,
                      n_centroids: int = 16, nprobe: int = 4):
    """``foreachBatch`` for :func:`run_streaming_semantic_admission`:
    the EMBEDDING-side sibling of ``near_dup_admit_fn`` — each
    micro-batch is gated by
    ``similarity.incremental_semantic_admission`` (IVF-probed cosine
    vs the admitted corpus + greedy in-batch) through the same
    epoch-directory exactly-once commit. Centroids are seeded from
    the CURRENT admitted corpus each epoch (deterministic given the
    corpus; from the batch itself on the first epoch); a batch with
    no non-zero vectors admits wholesale — there is nothing to
    compare.

    SCALE: this door re-seeds and RE-ROUTES the admitted corpus every
    epoch — per-epoch cost is corpus-proportional by construction.
    On the BLAS kernel path (r12) that re-route is one matmul, so the
    measured curve is FLAT at fixture scale (1.7-2.3 s/epoch across
    12 sf1 epochs — the r11 9.9→58.5 s climb was the expression
    path's cost, retracted in BENCH_STREAMING ``notes.crossover_r12``);
    the corpus-proportional term only starts to matter at large
    corpus × dim. :func:`semantic_admit_indexed_fn` (frozen centroids
    + maintained persisted routed index) GUARANTEES a flat per-epoch
    cost independent of corpus size and carries the exactly-once
    index machinery — it costs more at fixture scale (7-9 s/epoch,
    epoch-append + healing overhead) and pays off in the
    large-corpus regime the batch-side sf10 pricing shows.

    r12 (VERDICT r11 task 4): the gate runs the Arrow/BLAS kernel path
    (``incremental_semantic_admission_auto`` with this door's per-epoch
    seeded centroids — verdict-identical to the expression path, both
    round cosines/routing dots 6 dp before compare), so the
    indexed-vs-re-route comparison is KERNEL-CONTROLLED: the doors
    differ only in route maintenance, not compute path."""
    from nyctaxidatapipeline_spark.operators.similarity import (
        incremental_semantic_admission_auto,
        ivf_seed_centroids,
    )

    def admitter(batch: DataFrame, corpus: DataFrame) -> DataFrame:
        seed_src = corpus if not corpus.isEmpty() else batch
        cents = ivf_seed_centroids(seed_src, n_centroids, id_col,
                                   vec_col)
        if not cents:
            return batch
        return incremental_semantic_admission_auto(
            batch, corpus, id_col=id_col, vec_col=vec_col,
            threshold=threshold, nprobe=nprobe, centroids=cents)

    return _admit_commit_fn(corpus_dir, vec_col, id_col, admitter)


def semantic_admit_indexed_fn(corpus_dir: str, index_dir: str,
                              vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              threshold: float = 0.85,
                              n_centroids: int = 16, nprobe: int = 4):
    """``foreachBatch`` for :func:`run_streaming_semantic_admission_indexed`
    — the MAINTAINED-INDEX streaming shape of semantic admission
    (r11, composing the batch pieces): instead of re-seeding centroids
    and re-routing the whole admitted corpus every epoch
    (``semantic_admit_fn``), the centroid matrix is FROZEN at the
    first non-degenerate epoch (persisted as ``_centroids.json`` in
    ``index_dir``, atomic-rename committed) and the ROUTED corpus is
    maintained as epoch-append parquet under ``index_dir`` — each
    epoch probes the read-back index via ``corpus_routed=`` and
    appends only its own admissions' routed rows
    (``build_semantic_routing_index`` of the admitted subset; the
    pure-per-row closure ``append_to_semantic_routing_index``
    unit-pins). Per-epoch cost is batch routing + probed lists'
    kernels — the corpus is NEVER re-routed, the cost the in-query
    streaming twin pays every epoch.

    Exactly-once: the INDEX epoch commits before the CORPUS epoch
    (both write-tmp-then-rename). A replayed epoch whose corpus dir
    exists no-ops; a crash between the two commits re-delivers the
    epoch with its own routed rows already in the index, so the probe
    anti-joins the read-back index on the batch's ids first — rows a
    batch could only have contributed itself can never block it, and
    the recomputed admission (deterministic) matches the committed
    index epoch. The frozen matrix trades per-list balance as the
    corpus grows for never re-routing; re-centering is a deployment
    decision (start a new index_dir), and the stamp makes a stale
    probe loud."""
    import json
    import shutil

    from nyctaxidatapipeline_spark.operators.indexmeta import (
        check_index_params,
    )
    from nyctaxidatapipeline_spark.operators.similarity import (
        _semantic_routing_params,
        build_semantic_routing_index,
        incremental_semantic_admission_auto,
        ivf_seed_centroids,
    )

    def admit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # heal a crashed index-store compaction BEFORE anything reads
        # or recreates index_dir — the centroid-sidecar write below
        # would otherwise resurrect the dir and orphan the bak (the
        # corpus_dir heal rides _epoch_committed just after)
        _recover_compacted_store(index_dir)
        edir = os.path.join(corpus_dir, f"epoch={epoch_id}")
        if _epoch_committed(corpus_dir, epoch_id):
            return                       # replayed epoch — committed
        spark = batch_df.sparkSession
        batch = (batch_df.select(id_col, vec_col)
                 .localCheckpoint())     # probed + routed + committed
        # underscore prefix: Spark's file index ignores _-prefixed
        # files, so the sidecar cannot break the parquet read
        cents_path = os.path.join(index_dir, "_centroids.json")
        if os.path.exists(cents_path):
            with open(cents_path) as f:
                cents = json.load(f)
        else:
            cents = [list(map(float, c)) for c in
                     ivf_seed_centroids(batch, n_centroids, id_col,
                                        vec_col)]
            if cents:
                os.makedirs(index_dir, exist_ok=True)
                tmp_c = f"{cents_path}.tmp-{os.getpid()}-{epoch_id}"
                with open(tmp_c, "w") as f:
                    json.dump(cents, f)
                try:
                    os.rename(tmp_c, cents_path)
                except OSError:
                    os.unlink(tmp_c)
                with open(cents_path) as f:   # read the race winner
                    cents = json.load(f)
        if not cents:
            # all-zero/empty first batch: nothing to route or compare —
            # admit wholesale, seed again next epoch (sibling
            # convention: zero-norm vectors never block)
            admitted = batch
        else:
            has_idx = os.path.isdir(index_dir) and any(
                e.startswith("epoch=") for e in os.listdir(index_dir))
            if has_idx:
                routed = (spark.read.option("basePath", index_dir)
                          .parquet(index_dir)
                          .select("list_id", "_id", "_vec")
                          # crash-healing: a half-committed replay's own
                          # routed rows (batch ids) must never block it
                          .join(batch.select(F.col(id_col).alias("_id")),
                                "_id", "left_anti"))
                # framework-built index: a missing stamp means the
                # frozen-centroid guard silently degraded (warn once)
                check_index_params(
                    routed, _semantic_routing_params(cents),
                    "run_streaming_semantic_admission_indexed "
                    "(index read-back)", col="_id", expect_stamp=True)
            else:
                routed = spark.createDataFrame(
                    [], "list_id int, _id long, _vec array<double>")
            admitted = incremental_semantic_admission_auto(
                batch, None, id_col=id_col, vec_col=vec_col,
                threshold=threshold, nprobe=nprobe, centroids=cents,
                corpus_routed=routed)
        admitted = admitted.localCheckpoint()
        # index epoch FIRST (a missing index epoch would silently
        # under-reject forever; a missing corpus epoch is healed above)
        if cents:
            idx_edir = os.path.join(index_dir, f"epoch={epoch_id}")
            if not _epoch_committed(index_dir, epoch_id):
                tmp = os.path.join(index_dir, f".tmp-epoch-{epoch_id}")
                shutil.rmtree(tmp, ignore_errors=True)
                (build_semantic_routing_index(admitted, cents, id_col,
                                              vec_col)
                 .coalesce(1).write.mode("overwrite").parquet(tmp))
                os.rename(tmp, idx_edir)
        tmp = _stage_path(corpus_dir, epoch_id)
        shutil.rmtree(tmp, ignore_errors=True)
        admitted.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(corpus_dir, exist_ok=True)
        os.rename(tmp, edir)

    return admit_batch


def run_streaming_semantic_admission_indexed(
        stream: DataFrame, corpus_dir: str, index_dir: str,
        vec_col: str = "embedding", id_col: str = "vec_id",
        threshold: float = 0.85, n_centroids: int = 16,
        nprobe: int = 4, checkpoint_dir: str | None = None):
    """foreachBatch streaming semantic admission over a MAINTAINED
    persisted routed-corpus index (see
    :func:`semantic_admit_indexed_fn`): frozen centroids, epoch-append
    index, per-epoch cost that never re-routes the corpus — the
    streaming deployment shape of
    ``incremental_semantic_auto_indexed``."""
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(semantic_admit_indexed_fn(
             corpus_dir, index_dir, vec_col, id_col, threshold,
             n_centroids, nprobe)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def run_streaming_semantic_admission(stream: DataFrame, corpus_dir: str,
                                     vec_col: str = "embedding",
                                     id_col: str = "vec_id",
                                     threshold: float = 0.85,
                                     n_centroids: int = 16,
                                     nprobe: int = 4,
                                     checkpoint_dir: str | None = None):
    """foreachBatch streaming corpus admission with SEMANTIC gating:
    vectors arriving on the stream are admitted into ``corpus_dir``
    only if no IVF-probed cosine≥threshold neighbor exists in the
    admitted corpus or earlier in their own micro-batch (see
    ``semantic_admit_fn``). Completes the admission-front-door
    family: exact fingerprints (``run_incremental_dedup``), MinHash
    near-dup (``run_streaming_near_dup``), and embeddings — one
    epoch-commit skeleton under all three."""
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(semantic_admit_fn(corpus_dir, vec_col, id_col,
                                         threshold, n_centroids,
                                         nprobe)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def cross_signal_admit_fn(corpus_dir: str, text_col: str = "text",
                          id_col: str = "doc_id",
                          vec_col: str = "embedding",
                          jaccard_threshold: float = 0.5,
                          cosine_threshold: float = 0.85,
                          max_bucket: int | None = 32,
                          n_centroids: int = 16, nprobe: int = 4):
    """``foreachBatch`` for :func:`run_streaming_cross_signal_admission`:
    the streaming twin of ``dedup.cross_signal_dedup`` — each
    micro-batch row (carrying BOTH its text and its embedding) is
    admitted only if NEITHER signal links it to the admitted corpus or
    to a smaller-id row of its own batch: the lexical gate is
    ``incremental_minhash_admission`` (banded LSH, capped, exact-
    Jaccard verified), the semantic gate
    ``incremental_semantic_admission`` (IVF-probed cosine, corpus-
    seeded centroids like ``semantic_admit_fn``).

    Running the two gates independently and INTERSECTING their
    admitted sets IS the union-graph greedy admission: a row is
    rejected by the union graph iff some eligible partner sits within
    the lexical OR the cosine threshold, i.e. iff at least one gate
    rejects it — exactly the complement of the intersection (both
    gates use the same eligible-partner convention: corpus, or
    smaller id in the same batch). Same epoch-directory exactly-once
    commit as the single-signal front doors; per-batch cost is the
    sum of the two gates' batch-proportional costs, never
    |corpus|²."""
    from nyctaxidatapipeline_spark.operators.dedup import (
        incremental_minhash_admission,
    )
    from nyctaxidatapipeline_spark.operators.similarity import (
        incremental_semantic_admission,
        ivf_seed_centroids,
    )

    def admitter(batch: DataFrame, corpus: DataFrame) -> DataFrame:
        lex = incremental_minhash_admission(
            batch.select(id_col, text_col),
            corpus.select(id_col, text_col), text_col, id_col,
            threshold=jaccard_threshold, max_bucket=max_bucket)
        seed_src = corpus if not corpus.isEmpty() else batch
        cents = ivf_seed_centroids(seed_src, n_centroids, id_col,
                                   vec_col)
        if cents:
            sem = incremental_semantic_admission(
                batch.select(id_col, vec_col),
                corpus.select(id_col, vec_col), id_col=id_col,
                vec_col=vec_col, threshold=cosine_threshold,
                nprobe=nprobe, centroids=cents)
        else:   # no non-degenerate vectors anywhere: nothing to gate
            sem = batch
        return (batch.join(lex.select(id_col), id_col, "left_semi")
                     .join(sem.select(id_col), id_col, "left_semi"))

    return _admit_commit_cols_fn(corpus_dir, [id_col, text_col, vec_col],
                                 admitter)


def cross_signal_admit_indexed_fn(corpus_dir: str, index_dir: str,
                                  text_col: str = "text",
                                  id_col: str = "doc_id",
                                  vec_col: str = "embedding",
                                  jaccard_threshold: float = 0.5,
                                  cosine_threshold: float = 0.85,
                                  max_bucket: int | None = 32,
                                  n_centroids: int = 16,
                                  nprobe: int = 4,
                                  n: int = 3, num_hashes: int = 32,
                                  bands: int = 8,
                                  portable: bool = False):
    """``foreachBatch`` for
    :func:`run_streaming_cross_signal_admission_indexed` — the
    MAINTAINED-INDEX cross-signal door (r11, completing the family):
    BOTH standing indexes live as epoch-append parquet under
    ``index_dir`` — the lexical band-bucket table (``lex/``) and the
    routed corpus (``sem/``, with the centroid matrix frozen at the
    first non-degenerate epoch in a ``_centroids.json`` sidecar) —
    and each epoch's row is admitted iff NEITHER gate links it to the
    corpus or a smaller-id batch row, with both gates probing their
    read-back index (no corpus re-sign, no corpus re-route; the
    intersection-equals-union-graph argument of
    ``cross_signal_admit_fn`` is unchanged — only the physical probe
    source moved).

    NOTE the semantic gate here runs at the FROZEN-centroid auto
    operating point (the indexable shape), where the plain door
    re-seeds per epoch at fixed 16 lists: admissions can differ from
    the plain door at the IVF recall margin, exactly as the batch
    indexed twins document — the gate-level contract (reject iff an
    eligible partner is probed at ≥ threshold) is identical.

    Exactly-once across THREE stores: both index epochs commit before
    the corpus epoch; replays with any half-committed prefix heal
    because each gate anti-joins the batch's own ids out of its
    read-back index (rows only this batch could have contributed can
    never block it), and the recomputed admission is deterministic."""
    import json
    import shutil

    from nyctaxidatapipeline_spark.operators.dedup import (
        _minhash_params,
        build_minhash_index,
        incremental_minhash_admission,
    )
    from nyctaxidatapipeline_spark.operators.indexmeta import (
        check_index_params,
    )
    from nyctaxidatapipeline_spark.operators.similarity import (
        _semantic_routing_params,
        build_semantic_routing_index,
        incremental_semantic_admission_auto,
        ivf_seed_centroids,
    )

    lex_dir = os.path.join(index_dir, "lex")
    sem_dir = os.path.join(index_dir, "sem")

    def _epoch_append(build_df, root: str, epoch_id: int) -> None:
        edir = os.path.join(root, f"epoch={epoch_id}")
        if _epoch_committed(root, epoch_id):
            return
        tmp = os.path.join(root, f".tmp-epoch-{epoch_id}")
        shutil.rmtree(tmp, ignore_errors=True)
        build_df.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(root, exist_ok=True)
        os.rename(tmp, edir)

    def _read_index(spark, root: str, cols, batch_ids):
        has = os.path.isdir(root) and any(
            e.startswith("epoch=") for e in os.listdir(root))
        if not has:
            return None
        return (spark.read.option("basePath", root).parquet(root)
                .select(*cols)
                .join(batch_ids, cols[0], "left_anti"))

    def admit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # heal crashed index-store compactions BEFORE anything reads
        # or recreates them — the sem centroid-sidecar write below
        # would otherwise resurrect sem_dir and orphan its bak
        # (corpus_dir heals via _epoch_committed just after)
        _recover_compacted_store(lex_dir)
        _recover_compacted_store(sem_dir)
        edir = os.path.join(corpus_dir, f"epoch={epoch_id}")
        if _epoch_committed(corpus_dir, epoch_id):
            return                       # replayed epoch — committed
        spark = batch_df.sparkSession
        batch = (batch_df.select(id_col, text_col, vec_col)
                 .localCheckpoint())
        bids = batch.select(id_col)
        if os.path.isdir(corpus_dir) and any(
                e.startswith("epoch=") for e in os.listdir(corpus_dir)):
            corpus = (spark.read.option("basePath", corpus_dir)
                      .parquet(corpus_dir)
                      .select(id_col, text_col, vec_col))
        else:
            corpus = spark.createDataFrame([], batch.schema)
        # --- lexical gate over the maintained band-bucket index ---
        lex_idx = _read_index(spark, lex_dir,
                              [id_col, "band", "bucket"], bids)
        if lex_idx is None:
            lex_idx = build_minhash_index(
                corpus.select(id_col, text_col), text_col, id_col,
                n, num_hashes, bands, portable)
        else:
            check_index_params(
                lex_idx, _minhash_params(n, num_hashes, bands,
                                         portable),
                "run_streaming_cross_signal_admission_indexed "
                "(lex index read-back)", expect_stamp=True)
        lex = incremental_minhash_admission(
            batch.select(id_col, text_col),
            corpus.select(id_col, text_col), text_col, id_col,
            n=n, num_hashes=num_hashes, bands=bands,
            threshold=jaccard_threshold, portable=portable,
            max_bucket=max_bucket, corpus_index=lex_idx)
        # --- semantic gate over the maintained routed corpus ---
        cents_path = os.path.join(sem_dir, "_centroids.json")
        if os.path.exists(cents_path):
            with open(cents_path) as f:
                cents = json.load(f)
        else:
            cents = [list(map(float, c)) for c in
                     ivf_seed_centroids(batch, n_centroids, id_col,
                                        vec_col)]
            if cents:
                os.makedirs(sem_dir, exist_ok=True)
                tmp_c = f"{cents_path}.tmp-{os.getpid()}-{epoch_id}"
                with open(tmp_c, "w") as f:
                    json.dump(cents, f)
                try:
                    os.rename(tmp_c, cents_path)
                except OSError:
                    os.unlink(tmp_c)
                with open(cents_path) as f:
                    cents = json.load(f)
        if not cents:
            sem = batch                 # nothing non-degenerate to gate
        else:
            routed = _read_index(spark, sem_dir,
                                 ["_id", "list_id", "_vec"],
                                 bids.select(F.col(id_col)
                                             .alias("_id")))
            if routed is None:
                routed = spark.createDataFrame(
                    [], "_id long, list_id int, _vec array<double>")
            else:
                check_index_params(
                    routed, _semantic_routing_params(cents),
                    "run_streaming_cross_signal_admission_indexed "
                    "(sem index read-back)", col="_id",
                    expect_stamp=True)
            sem = incremental_semantic_admission_auto(
                batch.select(id_col, vec_col), None, id_col=id_col,
                vec_col=vec_col, threshold=cosine_threshold,
                nprobe=nprobe, centroids=cents,
                corpus_routed=routed.select("list_id", "_id", "_vec"))
        admitted = (batch.join(lex.select(id_col), id_col, "left_semi")
                         .join(sem.select(id_col), id_col, "left_semi")
                         .localCheckpoint())
        # both index epochs commit BEFORE the corpus epoch
        _epoch_append(build_minhash_index(
            admitted.select(id_col, text_col), text_col, id_col,
            n, num_hashes, bands, portable),
            lex_dir, epoch_id)
        if cents:
            _epoch_append(build_semantic_routing_index(
                admitted.select(id_col, vec_col), cents, id_col,
                vec_col), sem_dir, epoch_id)
        tmp = _stage_path(corpus_dir, epoch_id)
        shutil.rmtree(tmp, ignore_errors=True)
        admitted.coalesce(1).write.mode("overwrite").parquet(tmp)
        os.makedirs(corpus_dir, exist_ok=True)
        os.rename(tmp, edir)

    return admit_batch


def run_streaming_cross_signal_admission_indexed(
        stream: DataFrame, corpus_dir: str, index_dir: str,
        text_col: str = "text", id_col: str = "doc_id",
        vec_col: str = "embedding",
        jaccard_threshold: float = 0.5,
        cosine_threshold: float = 0.85,
        max_bucket: int | None = 32,
        n_centroids: int = 16, nprobe: int = 4,
        checkpoint_dir: str | None = None):
    """foreachBatch cross-signal admission over MAINTAINED persisted
    indexes for both signals (see
    :func:`cross_signal_admit_indexed_fn`) — the streaming deployment
    shape of ``cross_signal_dedup_indexed``."""
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(cross_signal_admit_indexed_fn(
             corpus_dir, index_dir, text_col, id_col, vec_col,
             jaccard_threshold, cosine_threshold, max_bucket,
             n_centroids, nprobe)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def run_streaming_cross_signal_admission(
        stream: DataFrame, corpus_dir: str,
        text_col: str = "text", id_col: str = "doc_id",
        vec_col: str = "embedding",
        jaccard_threshold: float = 0.5,
        cosine_threshold: float = 0.85,
        max_bucket: int | None = 32,
        n_centroids: int = 16, nprobe: int = 4,
        checkpoint_dir: str | None = None):
    """foreachBatch streaming corpus admission gated by BOTH signals:
    a row enters ``corpus_dir`` only if it has no lexical near-dup AND
    no semantic near-dup among the admitted corpus or earlier rows of
    its own micro-batch (see ``cross_signal_admit_fn``) — the
    streaming twin of the registered ``cross_signal_dedup`` batch
    composition, on the same epoch-commit skeleton as the exact /
    MinHash / semantic front doors."""
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(cross_signal_admit_fn(
             corpus_dir, text_col, id_col, vec_col, jaccard_threshold,
             cosine_threshold, max_bucket, n_centroids, nprobe)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def run_incremental_dedup(stream: DataFrame, corpus_dir: str,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          checkpoint_dir: str | None = None):
    """foreachBatch streaming corpus admission: documents arriving on
    the stream are admitted into ``corpus_dir`` only if new (see
    ``dedup_admit_fn``). The admitted corpus after draining a finite
    stream equals the batch ``incremental_fingerprint_dedup`` result
    applied batch-by-batch — gated e2e in ``tests/test_streaming_ext``.
    """
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(dedup_admit_fn(corpus_dir, text_col, id_col)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def versioned_append_fn(table_path: str):
    """The ``foreachBatch`` function for ``run_versioned_append`` —
    exposed as a factory (like ``dedup_admit_fn``/``rollup_merge_fn``)
    so the CAS-loss retry contract is directly unit-testable.

    Losing the manifest CAS does NOT mean this epoch was committed (the
    winner may be an unrelated ``write_version`` caller, or a driver on
    a different epoch), so on ``ConcurrentWriteError`` the sink
    re-scans the applied-epoch set and retries until THIS epoch is
    confirmed committed — returning early would advance the checkpoint
    past an uncommitted batch and silently drop it. The applied-epoch
    set is cached in the closure and extended incrementally (only
    manifests newer than the last scan are read), so per-batch commit
    cost stays O(new versions), not O(all versions)."""
    from nyctaxidatapipeline_spark.versioned import (
        ConcurrentWriteError,
        _load_manifest,
        table_versions,
        write_version,
    )

    applied: set[int] = set()
    scanned = 0  # highest version whose manifest we have read

    def _refresh_applied() -> None:
        nonlocal scanned
        for v in table_versions(table_path):
            if v <= scanned:
                continue
            e = _load_manifest(table_path, v).get("epoch")
            if e is not None:
                applied.add(int(e))
            scanned = max(scanned, v)

    def commit_batch(batch_df: DataFrame, epoch_id: int) -> None:
        _refresh_applied()
        while int(epoch_id) not in applied:
            try:
                write_version(batch_df, table_path, mode="append",
                              extra={"epoch": int(epoch_id)})
                applied.add(int(epoch_id))
                return
            except ConcurrentWriteError:
                # Someone else won that version number — maybe with this
                # very epoch (concurrent replayer), maybe not (unrelated
                # writer). Re-scan and retry until this epoch is in.
                _refresh_applied()

    return commit_batch


def run_versioned_append(stream: DataFrame, table_path: str):
    """foreachBatch sink committing each micro-batch as a VERSION of a
    ``versioned`` table — streaming ingestion with snapshot isolation:
    readers time-travel to any committed epoch, and a replayed epoch
    (restart after crash, before checkpoint advance) is a NO-OP instead
    of a duplicate append, because the epoch id is stored in the
    manifest at commit time and checked before writing.

    Composition note: the epoch id travels INSIDE the manifest
    (``write_version(extra={"epoch": ...})``), so it commits in the
    same hard-link CAS as the file list — a crash can never leave a
    committed version without its epoch. CAS-loss handling and the
    epoch cache live in ``versioned_append_fn``.
    """
    q = (stream.writeStream
         .outputMode("append")
         .foreachBatch(versioned_append_fn(table_path))
         .start())
    q.processAllAvailable()
    return q


#: binaryFile's fixed source schema — streaming file sources require an
#: explicit schema; this is the one the batch binaryFile reader infers.
_BINARY_FILE_SCHEMA = ("path string, modificationTime timestamp, "
                       "length long, content binary")


def stream_warc_dir(spark: SparkSession, warc_dir: str,
                    max_files_per_trigger: int = 1) -> DataFrame:
    """Stream a landing directory of ``.warc``/``.warc.gz`` segments as
    they arrive — the continuous-crawl front door. One file per
    micro-batch by default (each Common-Crawl-sized segment is ~1 GB;
    at scale raise the trigger or swap the directory for the real
    queue)."""
    return (spark.readStream
            .format("binaryFile")
            .schema(_BINARY_FILE_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load(warc_dir))


def shard_admit_fn(corpus_dir: str):
    """``foreachBatch`` for :func:`run_shard_ingestion`: decompress +
    line-split each micro-batch's JSONL shards (``read_text_shards`` —
    the same codec-sniffing parser the batch path uses: gz/bz2/xz/
    snappy/zstd), parse the JSON JVM-side, and hand the documents to
    the EXISTING admission commit (``dedup_admit_fn``). Composition
    over new machinery, exactly like the WARC front door — the only
    shard-specific lines are the decompress + ``from_json``."""
    admit = dedup_admit_fn(corpus_dir, "text", "doc_id")

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        from nyctaxidatapipeline_spark.sources.compressed import (
            read_text_shards,
        )

        lines = read_text_shards(
            batch_df.select(F.col("path").alias("shard_id"), "content"))
        docs = (lines
                .select(F.from_json(
                    "line", "id long, text string").alias("j"))
                .filter(F.col("j.id").isNotNull())
                .select(F.col("j.id").alias("doc_id"),
                        F.col("j.text").alias("text")))
        admit(docs, epoch_id)

    return fn


def run_shard_ingestion(spark: SparkSession, shard_dir: str,
                        corpus_dir: str,
                        checkpoint_dir: str | None = None,
                        max_files_per_trigger: int = 1):
    """Streaming compressed-corpus ingestion (the Dolma layout): JSONL
    shards landing in ``shard_dir`` — any mix of the five codecs — are
    decompressed, parsed, and admitted into ``corpus_dir`` with
    on-arrival dedup (exactly-once per epoch; replays are no-ops).
    Drained result equals the batch parse + batch incremental dedup
    shard-by-shard — gated e2e."""
    stream = (spark.readStream
              .format("binaryFile")
              .schema(_BINARY_FILE_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .load(shard_dir))
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(shard_admit_fn(corpus_dir)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def warc_admit_fn(corpus_dir: str):
    """``foreachBatch`` for :func:`run_warc_ingestion`: untar each
    micro-batch's WARC segments into documents (``read_warc`` — the
    same Arrow-batched parser the batch path uses), then hand them to
    the EXISTING admission commit (``dedup_admit_fn``): Bloom-pre-passed
    fingerprint dedup against the admitted corpus, epoch-directory
    rename as the exactly-once commit. Composition over new machinery —
    the only WARC-specific lines are the parse + column mapping."""
    admit = dedup_admit_fn(corpus_dir, "text", "doc_id")

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        from nyctaxidatapipeline_spark.sources.warc import read_warc

        docs = (read_warc(batch_df.select(
                    F.col("path").alias("file_id"), "content"))
                .filter(F.col("http_status") == 200)
                .select(F.regexp_extract("target_uri", r"(\d+)$", 1)
                         .cast("long").alias("doc_id"),
                        F.col("payload").cast("string").alias("text")))
        admit(docs, epoch_id)

    return fn


def run_warc_ingestion(spark: SparkSession, warc_dir: str,
                       corpus_dir: str,
                       checkpoint_dir: str | None = None,
                       max_files_per_trigger: int = 1):
    """Streaming crawl ingestion: WARC segments landing in ``warc_dir``
    are parsed and their documents admitted into ``corpus_dir`` with
    on-arrival dedup (exactly-once per epoch; replays are no-ops).
    The drained result equals running the batch WARC parse + the batch
    incremental dedup segment-by-segment — gated e2e."""
    stream = stream_warc_dir(spark, warc_dir, max_files_per_trigger)
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(warc_admit_fn(corpus_dir)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def tfrecord_admit_fn(corpus_dir: str):
    """``foreachBatch`` for :func:`run_tfrecord_ingestion`: unframe +
    proto-decode each micro-batch's TFRecord shards (the
    ``sources/tfrecord.py`` readers — per-frame CRC verification, typed
    decode), then hand the documents to the EXISTING admission commit
    (``dedup_admit_fn``). Composition over new machinery, exactly like
    the WARC / compressed-JSONL front doors — the only TFRecord-
    specific lines are the unframe + decode."""
    admit = dedup_admit_fn(corpus_dir, "text", "doc_id")

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        from nyctaxidatapipeline_spark.sources.tfrecord import (
            decode_examples,
            read_tfrecord_shards,
        )

        recs = read_tfrecord_shards(
            batch_df.select(F.col("path").alias("shard_id"), "content"))
        docs = (decode_examples(recs, {"doc_id": "long",
                                       "text": "string"})
                .filter(F.col("doc_id").isNotNull())
                .select("doc_id", "text"))
        admit(docs, epoch_id)

    return fn


def run_tfrecord_ingestion(spark: SparkSession, shard_dir: str,
                           corpus_dir: str,
                           checkpoint_dir: str | None = None,
                           max_files_per_trigger: int = 1):
    """Streaming TFRecord ingestion: ``.tfrecord`` shards landing in
    ``shard_dir`` are unframed (checksums verified), proto-decoded, and
    admitted into ``corpus_dir`` with on-arrival dedup (exactly-once
    per epoch; replays are no-ops) — the third streaming front door
    next to WARC and compressed JSONL. Drained result equals the batch
    decode + batch incremental dedup shard-by-shard — gated e2e."""
    stream = (spark.readStream
              .format("binaryFile")
              .schema(_BINARY_FILE_SCHEMA)
              .option("maxFilesPerTrigger", str(max_files_per_trigger))
              .load(shard_dir))
    w = (stream.writeStream
         .outputMode("append")
         .foreachBatch(tfrecord_admit_fn(corpus_dir)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q


def hll_merge_fn(state_dir: str, group_col: str, key_col: str,
                 b: int = 6):
    """``foreachBatch`` function for :func:`run_streaming_hll` — the
    sketch twin of ``rollup_merge_fn``: each micro-batch reduces to its
    HLL register frame (``sketches.hll_registers``) and max-merges into
    the parquet state. Register max-merge is idempotent AND exact — the
    drained state is bit-identical to the one-shot batch sketch over
    the union (the merge-identity gate HLL gets for free that a
    sum-rollup has to earn), and per-batch cost is the batch plus
    O(groups x 2^b) state, never stream history. Same atomic
    tmp-rename + epoch-marker exactly-once discipline; replayed epochs
    are no-ops (and would be harmless anyway — max is idempotent)."""
    import shutil

    from nyctaxidatapipeline_spark.operators.sketches import hll_registers

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= applied_epoch(state_dir):
            return
        spark = batch_df.sparkSession
        new = hll_registers(batch_df, F.col(key_col), [group_col], b)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            cur = spark.read.parquet(state_dir)
            merged = (cur.unionByName(new)
                         .groupBy(group_col, "bucket")
                         .agg(F.max("M").alias("M")))
        else:
            merged = new
        tmp = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, _EPOCH_MARKER), "w") as f:
            f.write(str(epoch_id))
        _swap_state_dir(tmp, state_dir)

    return merge_batch


def cms_merge_fn(state_dir: str, key_col: str, w: int = 1024,
                 d: int = 4):
    """``foreachBatch`` for :func:`run_streaming_cms`: each micro-batch
    reduces to its Count-Min counter frame (``sketches.cms_counters``)
    and SUM-merges into the parquet state — the frequency twin of
    ``hll_merge_fn`` (registers max-merge, counters sum-merge). Unlike
    max, sum is NOT idempotent, so the epoch-marker replay guard is
    load-bearing here, exactly as in ``rollup_merge_fn``. State stays
    O(w x d) forever."""
    import shutil

    from nyctaxidatapipeline_spark.operators.sketches import cms_counters

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if epoch_id <= applied_epoch(state_dir):
            return
        spark = batch_df.sparkSession
        new = cms_counters(batch_df, F.col(key_col), w, d)
        if os.path.exists(os.path.join(state_dir, "_SUCCESS")):
            cur = spark.read.parquet(state_dir)
            merged = (cur.unionByName(new)
                         .groupBy("r", "c")
                         .agg(F.sum("cnt").alias("cnt")))
        else:
            merged = new
        tmp = state_dir + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        with open(os.path.join(tmp, _EPOCH_MARKER), "w") as f:
            f.write(str(epoch_id))
        _swap_state_dir(tmp, state_dir)

    return merge_batch


def run_streaming_cms(stream: DataFrame, state_dir: str, key_col: str,
                      w: int = 1024, d: int = 4,
                      checkpoint_dir: str | None = None):
    """Streaming frequency sketch: maintain a Count-Min counter table
    over an unbounded stream in O(w x d) state; point-query it any time
    with ``sketches.cms_lookup`` over the state parquet. Drained state
    equals the one-shot batch sketch exactly (counter sums distribute
    over any batch split) — gated e2e."""
    q = (stream.writeStream
         .outputMode("update")
         .foreachBatch(cms_merge_fn(state_dir, key_col, w, d)))
    if checkpoint_dir is not None:
        q = q.option("checkpointLocation", checkpoint_dir)
    q = q.start()
    q.processAllAvailable()
    return q


def run_streaming_hll(stream: DataFrame, state_dir: str,
                      group_col: str, key_col: str, b: int = 6,
                      checkpoint_dir: str | None = None):
    """Streaming distinct-count sketch: maintain per-group HyperLogLog
    registers over an unbounded stream in O(groups x 2^b) state — the
    live "distinct users so far" dashboard that an exact streaming
    distinct would need unbounded state for. Read the estimate at any
    time with ``sketches.hll_finish`` over the state parquet."""
    w = (stream.writeStream
         .outputMode("update")
         .foreachBatch(hll_merge_fn(state_dir, group_col, key_col, b)))
    if checkpoint_dir is not None:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.start()
    q.processAllAvailable()
    return q
