"""Range (interval) joins — bucketized, never a blind cross join.

Spark has no native range join (the guide's as-of/range gap); a naive
``a.join(b, inequality)`` plans BroadcastNestedLoopJoin — O(n·m). The
bucket trick turns it into an equi-join: hash both sides into fixed-width
time buckets, explode the probe side into the (two) buckets its window can
reach, equi-join on (key, bucket), then apply the exact range predicate.
Shuffle volume O(n + m), candidate pairs bounded by bucket co-residency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_recent(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str,
                      max_gap_seconds: int) -> DataFrame:
    """Pairs (l, r) on the same key with ``r.ts`` in
    ``[l.ts - max_gap, l.ts]`` (inclusive both ends).

    Bucket width = ``max_gap_seconds`` so the window spans at most two
    buckets; the left side explodes into {b-1, b}. Column names must be
    disjoint apart from ``key`` (select/rename first).
    """
    width = max_gap_seconds
    l_ep = F.unix_timestamp(F.col(left_ts))
    r_ep = F.unix_timestamp(F.col(right_ts))
    l = left.withColumn(
        "_bucket",
        F.explode(F.array((l_ep / width).cast("long") - 1,
                          (l_ep / width).cast("long"))))
    r = right.withColumn("_bucket", (r_ep / width).cast("long"))
    joined = l.join(r, [key, "_bucket"])
    in_range = ((F.col(right_ts) <= F.col(left_ts)) &
                (F.col(right_ts) >=
                 F.col(left_ts) - F.expr(f"INTERVAL {max_gap_seconds} SECONDS")))
    return joined.filter(in_range).drop("_bucket")
