"""Sequence packing — distributed prefix sum + GPT-style concat-and-chunk.

Training pipelines concatenate the token streams of many documents and cut
the stream into fixed-size sequences (budget = context length). The only
non-trivial part at scale is the GLOBAL running token count: the naive
``SUM(...) OVER (ORDER BY ...)`` with no PARTITION BY collapses the whole
table into ONE window task — the classic single-reducer bottleneck that
"works on 60k rows" and dies at 100 TB.

``distributed_prefix_sum`` is the two-pass parallel scan instead:

  1. range-bucket the rows on the order column (equi-width over the
     broadcast (min, max) — one scalar aggregate, no driver action);
  2. running sum WITHIN each bucket (window partitioned by bucket —
     ``n_buckets``-way parallel);
  3. per-bucket totals (tiny: ``n_buckets`` rows) → exclusive running
     offset per bucket (a window over ``n_buckets`` rows — bounded, the
     same "small side" class as a broadcast dim);
  4. broadcast-join the offsets back: prefix = within-bucket running sum
     + bucket offset.

Shuffle cost: one bucket-partitioned sort + one ``n_buckets``-row
aggregate + one broadcast join — every stage bounded per-task regardless
of total rows. Exactness does not depend on the bucket boundaries (any
monotone bucketing of the order column yields the same prefix sums), so
equi-width skew only affects balance, never values; raise ``n_buckets``
for heavier skew.

The reference has no packing operator; this extends the training-data
surface (BASELINE.json north star) the same way dedup/sampling do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.functions.text import token_count, tokens

__all__ = ["distributed_prefix_sum", "pack_sequences", "packed_doc_spans",
           "chunk_documents", "vocab_ids", "pretokenized_sequences"]


def distributed_prefix_sum(df: DataFrame, value_col: str | Column,
                           order_col: str, n_buckets: int = 64,
                           alias: str = "prefix_sum",
                           tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Adds ``alias`` = inclusive running sum of ``value_col`` in
    ``order_col`` order, computed as a two-pass parallel scan (module
    docstring). ``(order_col, *tiebreak_cols)`` must be a total order
    (unique) — with ties the running sum within a tie group is not well
    defined. Ties on ``order_col`` alone are safe WITH tiebreaks:
    bucket assignment is a pure function of ``order_col``, so a tie
    group can never straddle a bucket boundary, and the within-bucket
    window resolves it.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    rng = df.agg(F.min(order_col).alias("_lo"),
                 F.max(order_col).alias("_hi"))
    width = (F.col("_hi") - F.col("_lo") + 1) / F.lit(n_buckets)
    bucket = F.coalesce(
        F.least(F.floor((F.col(order_col) - F.col("_lo")) / width),
                F.lit(n_buckets - 1)).cast("int"),
        F.lit(0))
    b = (df.crossJoin(F.broadcast(rng))
           .withColumn("_bk", bucket).drop("_lo", "_hi"))
    w_in = (Window.partitionBy("_bk")
            .orderBy(order_col, *tiebreak_cols)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    b = b.withColumn("_run", F.sum(v).over(w_in))
    totals = b.groupBy("_bk").agg(F.sum(v).alias("_tot"))
    # This unpartitioned window triggers Spark's "No Partition Defined"
    # warning at runtime — DELIBERATE and bounded: its input is the
    # per-bucket totals frame, exactly n_buckets (<= 64) rows, never the
    # corpus. The corpus-sized window above (w_in) is bucket-partitioned.
    w_off = (Window.orderBy("_bk")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (totals
               .withColumn("_off", F.coalesce(F.sum("_tot").over(w_off),
                                              F.lit(0)))
               .drop("_tot"))
    return (b.join(F.broadcast(offsets), "_bk")
             .withColumn(alias, (F.col("_run") + F.col("_off"))
                         .cast("long"))
             .drop("_bk", "_run", "_off"))


def pack_sequences(df: DataFrame, token_col: str, order_col: str,
                   budget: int, n_buckets: int = 64) -> DataFrame:
    """Concat-and-chunk packing: lay documents end-to-end in ``order_col``
    order and cut every ``budget`` tokens. Adds

      * ``start_global`` — the document's first-token offset in the
        concatenated stream (exclusive prefix sum of ``token_col``);
      * ``seq_id``       — the training sequence its first token lands in
        (``start_global // budget``; a long document may spill into
        following sequences — ``packed_doc_spans`` enumerates them);
      * ``seq_offset``   — position within that sequence.

    Pure function of (corpus, order) — stable across reruns and
    repartitions, like ``sampling.with_split``.
    """
    p = distributed_prefix_sum(df, token_col, order_col,
                               n_buckets=n_buckets, alias="_incl")
    start = F.col("_incl") - F.col(token_col)
    # Integer `div`, not floor(double /): a 100 T-token stream overflows
    # the 53-bit double mantissa, and start_global is always >= 0 so
    # `div`/`%` are exact floor semantics here.
    return (p.withColumn("start_global", start.cast("long"))
             .withColumn("seq_id",
                         F.expr(f"start_global div {int(budget)}"))
             .withColumn("seq_offset",
                         F.expr(f"start_global % {int(budget)}"))
             .drop("_incl"))


def packed_doc_spans(df: DataFrame, token_col: str, order_col: str,
                     budget: int, n_buckets: int = 64) -> DataFrame:
    """One row per (document, training sequence) span the document
    occupies: a document starting at ``start_global`` with n tokens
    covers sequences ``start // budget .. (start + n - 1) // budget``.
    Emits ``seq_id``, ``span_start``/``span_len`` (token slice of the
    document inside that sequence). Zero-token documents emit no span.
    Explode width per row = ceil(n / budget) + 1 — bounded by document
    length, not corpus size.
    """
    packed = pack_sequences(df, token_col, order_col, budget,
                            n_buckets=n_buckets)
    n = F.col(token_col).cast("long")
    first = F.col("seq_id")
    last = F.expr(
        f"(start_global + cast({token_col} as bigint) - 1)"
        f" div {int(budget)}")
    spans = (packed.filter(n > 0)
             .withColumn("seq_id", F.explode(F.sequence(first, last))))
    span_start = F.greatest(
        F.lit(0), F.col("seq_id") * budget - F.col("start_global"))
    span_end = F.least(
        n, (F.col("seq_id") + 1) * budget - F.col("start_global"))
    return (spans
            .withColumn("span_start", span_start.cast("long"))
            .withColumn("span_len", (span_end - span_start).cast("long"))
            .drop("seq_offset"))


def with_token_count(df: DataFrame, text_col: str,
                     alias: str = "n_tokens") -> DataFrame:
    """Convenience: whitespace token count (``functions.text.tokens``
    contract) as an int column, the usual ``token_col`` input above."""
    return df.withColumn(alias, token_count(text_col))


def chunk_documents(df: DataFrame, text_col: str, id_col: str,
                    chunk_tokens: int = 64,
                    overlap: int = 16) -> DataFrame:
    """Overlapping fixed-token windows per document — the RAG/embedding
    chunking primitive (every retrieval pipeline cuts documents into
    ~N-token pieces with a small overlap before embedding them).

    Windows start every ``chunk_tokens - overlap`` tokens and cover
    ``tokens[start : start + chunk_tokens]``; the last window is short
    rather than padded. Output: (id, chunk_id, n_tokens, chunk_text)
    with ``chunk_id`` 0-based in document order. Zero-token documents
    emit no chunks. Tokenization is the engine-wide ``functions.text
    .tokens`` contract (lowercase, whitespace runs, empties dropped).

    Scale shape: pure per-row Catalyst — tokenize once, generate the
    start offsets with ``sequence`` and ``posexplode`` them, slice the
    token array per chunk. No shuffle at all (explode is map-side);
    output rows ≈ corpus tokens / stride, bounded per input row by
    document length. A downstream embedding stage sees chunk rows
    already co-partitioned with their documents.
    """
    if overlap >= chunk_tokens:
        raise ValueError(
            f"overlap ({overlap}) must be < chunk_tokens ({chunk_tokens})")
    stride = chunk_tokens - overlap
    tk = tokens(F.col(text_col))
    starts = F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
    return (df.select(F.col(id_col), tk.alias("_tk"),
                      F.size(tk).alias("_n"))
              .filter(F.col("_n") > 0)
              .select(id_col, "_tk", "_n",
                      F.posexplode(starts).alias("chunk_id", "_start"))
              .select(id_col,
                      F.col("chunk_id").cast("int").alias("chunk_id"),
                      F.least(F.lit(chunk_tokens),
                              F.col("_n") - F.col("_start"))
                       .cast("int").alias("n_tokens"),
                      F.array_join(
                          F.slice("_tk", F.col("_start") + 1,
                                  F.lit(chunk_tokens)),
                          " ").alias("chunk_text")))


def length_bucketed_batches(df: DataFrame, text_col: str, id_col: str,
                            batch_size: int = 16) -> DataFrame:
    """Dynamic (length-bucketed) batching: fixed-size training batches
    of length-sorted documents, so same-batch sequences have similar
    token counts and padding-to-max waste is minimized — the standard
    alternative to ``pack_sequences`` when examples must stay intact.

    Order is (n_tokens DESC, id ASC), encoded as the single numeric key
    ``id - n_tokens * 10^12`` so the global row number comes from
    ``distributed_prefix_sum`` (two-pass parallel scan — no
    single-task global window). Requires ``id_col`` integral, unique,
    non-negative and < 10^12 (same order-key contract as
    ``pack_sequences``).

    Output per batch: (batch_id, n_docs, max_tokens, sum_tokens,
    padding_tokens, pad_ratio) — padding = n_docs * max - sum, the
    tokens a pad-to-longest collator would burn.
    """
    t = (with_token_count(df, text_col, "_n")
         .select(F.col(id_col).cast("bigint").alias("_id"),
                 F.col("_n"))
         .withColumn("_ord", F.col("_id")
                     - F.col("_n").cast("bigint") * F.lit(10**12)))
    r = distributed_prefix_sum(t, F.lit(1), "_ord", alias="_rn")
    out = (r.withColumn("batch_id",
                        F.floor((F.col("_rn") - 1) / batch_size)
                        .cast("int"))
           .groupBy("batch_id")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.max("_n").alias("max_tokens"),
                F.sum("_n").cast("bigint").alias("sum_tokens")))
    waste = (F.col("n_docs") * F.col("max_tokens")
             - F.col("sum_tokens")).cast("bigint")
    ratio = F.round(F.lit(1.0) - F.col("sum_tokens")
                    / (F.col("n_docs") * F.col("max_tokens")), 6)
    return (out.withColumn("padding_tokens", waste)
               .withColumn("pad_ratio", ratio))


def vocab_ids(df: DataFrame, text_col: str,
              id_col: str | None = None) -> DataFrame:
    """(tok, n, tid) — the corpus vocabulary with DETERMINISTIC integer
    ids: tid = 0-based rank in (count DESC, token) order, the
    frequency-sorted id assignment every tokenizer ships.

    The rank is NOT a global ``row_number`` window (one task over the
    whole vocabulary — 10⁸ rows at web scale): it reuses
    :func:`distributed_prefix_sum` ordered by the NEGATED count with
    the token as tiebreak — bucket assignment is a pure function of
    the count, ties resolve inside buckets, and the result equals the
    single-task ranking exactly (the same two-pass scan
    ``pack_sequences`` runs over documents)."""
    from nyctaxidatapipeline_spark.plans.util import fan_out

    src = fan_out(df, id_col) if id_col is not None else df
    counts = (src.select(F.explode(tokens(text_col)).alias("tok"))
                 .groupBy("tok").agg(F.count("*").alias("n"))
                 .withColumn("_negn", -F.col("n")))
    ranked = distributed_prefix_sum(counts, F.lit(1), "_negn",
                                    alias="_rank",
                                    tiebreak_cols=("tok",))
    return (ranked.withColumn("tid", (F.col("_rank") - 1).cast("int"))
                  .select("tok", "n", "tid"))


def pretokenized_sequences(df: DataFrame, text_col: str, id_col: str,
                           budget: int = 256,
                           n_buckets: int = 64,
                           payload: str = "digest") -> DataFrame:
    """The TRAINING-INPUT artifact, end to end: corpus tokenized,
    tokens mapped to the deterministic :func:`vocab_ids` vocabulary,
    the id stream laid end-to-end in ``id_col`` order and cut every
    ``budget`` ids — one row per training sequence:

      (seq_id, n_ids, ids_md5)

    with ``ids_md5`` = md5 of the comma-joined ids in stream order
    (the value-hash surface; the registered query's mode).
    ``payload='ids'`` returns the raw ``array<int>`` column instead —
    the frame a real export feeds straight into the TFRecord /
    sharded sinks (e2e-gated: sequences → ``tfrecord_shards`` →
    unframe+decode round-trips the exact ids). The final partial
    sequence is kept.

    Scale shape: both global orderings ride the two-pass
    ``distributed_prefix_sum`` (document offsets over ``id_col``,
    vocabulary ranks over counts) — no single-task window anywhere;
    the token→id join shuffles on the token (Zipf-hot keys → AQE skew
    split, same as every vocabulary join here); the per-sequence
    digest aggregate holds ≤ ``budget`` elements per group."""
    from nyctaxidatapipeline_spark.plans.util import fan_out

    if payload not in ("digest", "ids"):
        raise ValueError(f"payload must be 'digest' or 'ids', "
                         f"got {payload!r}")
    toks = (fan_out(df, id_col)
            .select(id_col, F.posexplode(tokens(text_col))
                    .alias("_pos", "_tok")))
    vids = vocab_ids(df, text_col).select(
        F.col("tok").alias("_tok"), "tid")
    offsets = pack_sequences(
        with_token_count(df.select(id_col, text_col), text_col),
        "n_tokens", id_col, budget=budget, n_buckets=n_buckets
    ).select(id_col, "start_global")
    g = (toks.join(vids, "_tok")
             .join(offsets, id_col)
             .select((F.col("start_global") + F.col("_pos"))
                     .alias("_gpos"), "tid"))
    seq = F.expr(f"_gpos div {int(budget)}")
    ids_in_order = F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col("_gpos"), F.col("tid")))),
        lambda s: s["tid"])
    out_val = (ids_in_order.alias("ids") if payload == "ids"
               else F.md5(F.concat_ws(",", F.transform(
                   ids_in_order, lambda t: t.cast("string"))))
                     .alias("ids_md5"))
    return (g.groupBy(seq.alias("seq_id"))
             .agg(F.count("*").cast("long").alias("n_ids"), out_val))
