"""CLI for the end-to-end TRAINING-DATA curation pipeline — the
extension-surface sibling of ``run_taxi_pipeline.py``: one invocation
takes a raw document parquet to curated text, duplication/savings
reports, and (optionally) pretokenized TFRecord shards — the full
corpus-to-training-input loop every operator family in this repo
exists to serve:

    python tools/run_curation_pipeline.py \
        --documents /root/testdata/sf0.01/documents.parquet \
        --out /tmp/curated_run \
        [--budget 256] [--export-tfrecord] [--docs-per-shard 10000] \
        [--min-tokens 30] [--min-quality 0.3] [--jaccard 0.5]

Stages (each a registered, oracle-gated operator — the CLI only
composes):

  1. ``curation.curate_corpus``      -> {out}/curated/      (id, text)
  2. ``dedup.near_dup_production``   +
     ``dedup.dedup_group_stats``     -> {out}/dup_histogram/
     + the tokens-saved-by-dedup report -> {out}/savings/
  3. ``packing.pretokenized_sequences(payload='ids')``
                                     -> {out}/sequences/    (or TFRecord
     shards under {out}/tfrecord/ with ``--export-tfrecord``)

Scale notes: every stage is the capped/auto production path (exact
collapse before LSH, window-count bucket caps, two-pass prefix scans —
no single-task windows); outputs land as parquet via the normal
committer, except TFRecord shards which need a shared filesystem (see
``write_tfrecord_shards``).
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from nyctaxidatapipeline_spark import get_spark
from nyctaxidatapipeline_spark.sources import read_parquet


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Corpus curation -> dedup reports -> pretokenized "
                    "training sequences")
    ap.add_argument("--documents", required=True,
                    help="document parquet (file/dir/glob) with "
                         "(doc_id, text[, source])")
    ap.add_argument("--out", required=True, help="output base dir")
    ap.add_argument("--min-tokens", type=int, default=30)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--max-bucket", type=int, default=32,
                    help="LSH bucket cap (0 disables pairing; "
                         "-1 = uncapped exhaustive)")
    ap.add_argument("--budget", type=int, default=256,
                    help="training sequence length in tokens")
    ap.add_argument("--export-tfrecord", action="store_true",
                    help="also write pretokenized TFRecord shards")
    ap.add_argument("--docs-per-shard", type=int, default=10_000)
    args = ap.parse_args(argv)

    from nyctaxidatapipeline_spark.functions.text import token_count
    from nyctaxidatapipeline_spark.operators.curation import curate_corpus
    from nyctaxidatapipeline_spark.operators.dedup import (
        dedup_group_stats,
        near_dup_production,
    )
    from nyctaxidatapipeline_spark.operators.packing import (
        pretokenized_sequences,
    )

    import time

    spark = get_spark("curation_pipeline")
    docs = read_parquet(spark, args.documents)
    mb = None if args.max_bucket < 0 else args.max_bucket
    n_in = docs.count()
    stage_sec: dict[str, float] = {}
    t0 = time.perf_counter()

    # 1. curation (quality/PII/line/exact/near-dup recipe)
    curated = curate_corpus(docs, "text", "doc_id",
                            min_tokens=args.min_tokens,
                            min_quality=args.min_quality,
                            jaccard_threshold=args.jaccard,
                            max_bucket=mb)
    curated.write.mode("overwrite").parquet(f"{args.out}/curated")
    curated = read_parquet(spark, f"{args.out}/curated")
    n_curated = curated.count()
    stage_sec["curate"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()

    # 2. duplication histogram + savings, priced in tokens
    mapping = near_dup_production(curated, "text", "doc_id",
                                  threshold=args.jaccard, max_bucket=mb)
    dedup_group_stats(mapping).write.mode("overwrite").parquet(
        f"{args.out}/dup_histogram")
    kept = F.when(F.col("group_id") == F.col("doc_id"), 1).otherwise(0)
    joined = (curated.select("doc_id",
                             token_count("text").alias("_n"))
                     .join(mapping, "doc_id"))
    savings = joined.agg(
        F.count("*").alias("n_docs"),
        F.sum(kept).cast("long").alias("n_docs_kept"),
        F.sum("_n").cast("long").alias("ws_tokens"),
        F.sum(F.col("_n") * kept).cast("long").alias("ws_tokens_kept"))
    savings.write.mode("overwrite").parquet(f"{args.out}/savings")
    srow = read_parquet(spark, f"{args.out}/savings").collect()[0]
    stage_sec["dedup_reports"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()

    # 3. pretokenized training sequences (raw id arrays)
    seqs = pretokenized_sequences(curated, "text", "doc_id",
                                  budget=args.budget, payload="ids")
    if args.export_tfrecord:
        from nyctaxidatapipeline_spark.sources.tfrecord import (
            write_tfrecord_shards,
        )

        write_tfrecord_shards(seqs, f"{args.out}/tfrecord", "seq_id",
                              ["ids"],
                              docs_per_shard=args.docs_per_shard)
        n_seqs = seqs.count()
    else:
        seqs.write.mode("overwrite").parquet(f"{args.out}/sequences")
        n_seqs = read_parquet(spark, f"{args.out}/sequences").count()

    stage_sec["pretokenize_export"] = round(time.perf_counter() - t0, 3)
    print(json.dumps({
        "n_input_docs": n_in,
        "n_curated_docs": n_curated,
        "n_docs_kept_after_near_dup": srow["n_docs_kept"],
        "ws_tokens": srow["ws_tokens"],
        "ws_tokens_kept": srow["ws_tokens_kept"],
        "n_sequences": n_seqs,
        "budget": args.budget,
        "stage_sec": stage_sec,
        "total_sec": round(sum(stage_sec.values()), 3),
        "out": args.out,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
