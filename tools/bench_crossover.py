"""Kernel-controlled semantic-door crossover + epoch-store compaction
pricing (VERDICT r11 tasks 3 & 4).

r11's ``sf1_crossover_12_epochs`` compared the re-routing semantic
door (then on the 16-list EXPRESSION path) against the maintained-index
door (BLAS kernels) — the artifact itself flagged the comparison as
kernel-confounded. r12 moved the re-routing door onto the same
Arrow/BLAS kernels (``semantic_admit_fn`` now gates via
``incremental_semantic_admission_auto`` with its per-epoch seeded
centroids), so this tool re-runs the 12-epoch sf1 curve with the doors
differing ONLY in route maintenance, and re-quotes the crossover epoch.

It then prices ``compact_epoch_store`` on the indexed arm's stores at
exactly the state the mechanism exists for — a 12-epoch epoch-append
store full of one-file epochs:

* state read-back wall (corpus + index full scan) BEFORE compaction,
* one more indexed-door epoch BEFORE compaction (per-epoch cost at
  12-epoch fragmentation),
* the compaction wall itself + file counts,
* the same two reads AFTER compaction.

Merges results into BENCH_STREAMING.json under
``runs["sf1_crossover_12_epochs"]`` (replacing the kernel-confounded
r11 block) and ``runs["compaction_sf1_12_epochs"]``.

Usage: python tools/bench_crossover.py [sf_dir] [n_epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nyctaxidatapipeline_spark import get_spark  # noqa: E402
from nyctaxidatapipeline_spark.sources import load_table  # noqa: E402
from nyctaxidatapipeline_spark.streaming.jobs import (  # noqa: E402
    compact_epoch_store,
    semantic_admit_fn,
    semantic_admit_indexed_fn,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
N_EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 12


def _timed_count(spark, path: str) -> tuple[float, int]:
    t = time.perf_counter()
    n = spark.read.option("basePath", path).parquet(path).count()
    return round(time.perf_counter() - t, 3), n


def _parquet_files(path: str) -> int:
    return sum(len([f for f in fs if f.endswith(".parquet")])
               for _, _, fs in os.walk(path))


def main() -> None:
    spark = get_spark("bench_crossover")
    emb = (load_table(spark, SF_DIR, "embeddings")
           .select(F.col("vec_id").alias("doc_id"), "embedding"))
    # N curve epochs + 2 probe epochs (pre-/post-compaction pricing)
    n_parts = N_EPOCHS + 2
    batches = [
        emb.filter(F.col("doc_id") % n_parts == i).localCheckpoint()
        for i in range(n_parts)
    ]
    batch_rows = [b.count() for b in batches]
    scratch = f"/tmp/bench_crossover_{os.getpid()}"
    out: dict[str, dict] = {}

    # --- arm 1: re-routing door (kernel-controlled: BLAS, r12) ---
    cdir = os.path.join(scratch, "semantic")
    os.makedirs(cdir, exist_ok=True)
    fn = semantic_admit_fn(cdir, "embedding", "doc_id",
                           threshold=0.85, n_centroids=16, nprobe=4)
    curve = []
    for i in range(N_EPOCHS):
        t = time.perf_counter()
        fn(batches[i], i)
        curve.append(round(time.perf_counter() - t, 3))
    out["semantic"] = {"epoch_sec": curve}
    spark.catalog.clearCache()
    spark._jvm.System.gc()  # noqa: SLF001

    # --- arm 2: maintained-index door ---
    cdir_i = os.path.join(scratch, "semantic_indexed")
    idir_i = cdir_i + "_index"
    os.makedirs(cdir_i, exist_ok=True)
    fni = semantic_admit_indexed_fn(cdir_i, idir_i, "embedding",
                                    "doc_id", threshold=0.85,
                                    n_centroids=16, nprobe=4)
    curve_i = []
    for i in range(N_EPOCHS):
        t = time.perf_counter()
        fni(batches[i], i)
        curve_i.append(round(time.perf_counter() - t, 3))
    out["semantic_indexed"] = {"epoch_sec": curve_i}

    # crossover epoch: first epoch from which the indexed door stays
    # cheaper for the rest of the run
    cross = next((i + 1 for i in range(N_EPOCHS)
                  if all(curve_i[j] < curve[j]
                         for j in range(i, N_EPOCHS))), None)

    # --- compaction pricing on the indexed arm's 12-epoch stores ---
    comp: dict[str, object] = {
        "corpus_files_before": _parquet_files(cdir_i),
        "index_files_before": _parquet_files(idir_i),
    }
    rb_c, _ = _timed_count(spark, cdir_i)
    rb_i, _ = _timed_count(spark, idir_i)
    comp["readback_before_sec"] = {"corpus": rb_c, "index": rb_i}
    t = time.perf_counter()
    fni(batches[N_EPOCHS], N_EPOCHS)
    comp["epoch_before_sec"] = round(time.perf_counter() - t, 3)

    t = time.perf_counter()
    stats_c = compact_epoch_store(spark, cdir_i)
    stats_i = compact_epoch_store(spark, idir_i)
    comp["compaction_sec"] = round(time.perf_counter() - t, 3)
    comp["corpus_files_after"] = stats_c["files_after"]
    comp["index_files_after"] = stats_i["files_after"]

    rb_c2, _ = _timed_count(spark, cdir_i)
    rb_i2, _ = _timed_count(spark, idir_i)
    comp["readback_after_sec"] = {"corpus": rb_c2, "index": rb_i2}
    t = time.perf_counter()
    fni(batches[N_EPOCHS + 1], N_EPOCHS + 1)
    comp["epoch_after_sec"] = round(time.perf_counter() - t, 3)

    shutil.rmtree(scratch, ignore_errors=True)

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    art = os.path.join(root, "BENCH_STREAMING.json")
    with open(art) as f:
        full = json.load(f)
    full["runs"][f"sf1_crossover_{N_EPOCHS}_epochs"] = {
        "arms": out,
        "batch_rows": f"~{batch_rows[0]} x {N_EPOCHS} "
                      f"({os.path.basename(SF_DIR)} embeddings, "
                      f"doc_id % {n_parts})",
        "crossover_epoch": cross,
        "note": "KERNEL-CONTROLLED (r12): both doors run the "
                "Arrow/BLAS kernel path; they differ only in route "
                "maintenance (per-epoch corpus re-seed+re-route vs "
                "frozen centroids + persisted epoch-append routed "
                "index). Replaces the r11 block whose re-router ran "
                "the 16-list expression path (that confound is gone).",
    }
    full["runs"][f"compaction_sf1_{N_EPOCHS}_epochs"] = {
        **comp,
        "note": "compact_epoch_store priced at the state it exists "
                "for: the indexed door's corpus+index after "
                f"{N_EPOCHS} one-file epoch appends. readback = full "
                "store scan count(); epoch_before/after = one "
                "indexed-door epoch (equal-sized disjoint probe "
                "batches) against the fragmented vs compacted store.",
    }
    with open(art, "w") as f:
        json.dump(full, f, indent=1, sort_keys=True)
    print(json.dumps({"crossover_epoch": cross, "semantic": curve,
                      "semantic_indexed": curve_i, "compaction": comp}))
    spark.stop()


if __name__ == "__main__":
    main()
