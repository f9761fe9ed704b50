"""BENCH harness — one JSON line with per-query wall-clock at $SPARK_GRAFT_SF_DIR.

Mirrors the reference's staged-timing shape (``new_etl.py:10-14``) but fixes
its attribution subtlety (SURVEY.md §3 EP3): the shared input is cached and
explicitly materialized BEFORE the per-query timers, so each timer brackets
that query's compute only. Queries are forced with the noop sink (full
materialization of every column — ``.count()`` would let Catalyst prune the
aggregate expressions).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from nyctaxidatapipeline_spark import get_spark
from nyctaxidatapipeline_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    spark = get_spark("bench")

    t0 = time.perf_counter()
    # Stage 0 (reference "Load + feature-engineering"): materialize the two
    # fact tables into the page cache so per-query timers measure compute.
    for t in ("events", "lineitem"):
        _force(load_table(spark, SF_DIR, t))
    load_sec = round(time.perf_counter() - t0, 3)

    times: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t = time.perf_counter()
        _force(fn(spark, SF_DIR))
        times[name] = round(time.perf_counter() - t, 3)
        # Per-query isolation: drop cached frames and force a JVM GC —
        # Spark's ContextCleaner reclaims shuffle files / broadcast blobs
        # only when the JVM collects the dropped references, and a
        # backlog slows later heavy queries 3-6x.
        spark.catalog.clearCache()
        spark._jvm.System.gc()  # noqa: SLF001

    total = round(sum(times.values()), 3)
    # Exact/scale twins: the "exact" member is the brute-force
    # correctness oracle for the same semantics; the "scale" member is
    # the sketch/index path that survives 100 TB. The scale number is the
    # headline for that operator class; the exact twin is kept primarily
    # as its correctness reference.
    paths = {
        "near_dup_text": {"exact": "ngram_jaccard",
                          "scale": "minhash_dedup"},
        "near_dup_embedding": {"exact": "embedding_near_dup",
                               "scale": "ann_lsh"},
        "ann_topk": {"exact": "ann_topk", "scale": "ann_ivf"},
        "near_dup_semantic": {"exact": "embedding_near_dup",
                              "scale": "semantic_dedup"},
    }
    print(json.dumps({
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": times,
        "paths": paths,
        "load_sec": load_sec,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
