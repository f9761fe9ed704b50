"""Blocked fuzzy matching: completeness inside the block guarantee,
length-band correctness, no duplicate routes."""

from __future__ import annotations

from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.entity import fuzzy_pairs


def test_fuzzy_pairs_finds_typos_once(spark):
    df = spark.createDataFrame([
        Row(id=1, name="acme corp"),
        Row(id=2, name="acme c0rp"),     # 1 substitution
        Row(id=3, name="acme corps"),    # 1 insertion (len band edge)
        Row(id=4, name="acmex corps"),   # 2 edits from 'acme corps'
        Row(id=5, name="zzz unrelated"),
        Row(id=6, name="acme corp"),     # exact dup -> dist 0
    ])
    out = fuzzy_pairs(df, "name", "id", max_dist=2)
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in out.collect()}
    assert got[(1, 2)] == 1 and got[(1, 3)] == 1 and got[(1, 6)] == 0
    assert got[(2, 3)] == 2 and got[(3, 4)] == 1  # one insertion
    assert got[(1, 4)] == 2 and (2, 4) not in got  # 3 edits excluded
    assert all(k[0] < k[1] for k in got)
    assert not any(5 in k for k in got)
    # every surviving pair appears exactly once (bucket-route dedup)
    rows = out.collect()
    assert len(rows) == len({(r["id_a"], r["id_b"]) for r in rows})


def test_fuzzy_pairs_prefix_blocking_bound(spark):
    # documented recall bound: a typo in the first prefix_len chars
    # escapes the block
    df = spark.createDataFrame([
        Row(id=1, name="abcdef"), Row(id=2, name="xbcdef")])
    assert fuzzy_pairs(df, "name", "id", max_dist=2).count() == 0


def test_fuzzy_pairs_hot_block_cap(spark):
    df = spark.createDataFrame(
        [Row(id=i, name=f"dup {i % 2}") for i in range(40)])
    # block 'dup' holds all 40 rows -> capped out
    assert fuzzy_pairs(df, "name", "id", max_dist=1,
                       max_block=10).count() == 0


def test_fuzzy_block_audit_prices_the_cap(spark):
    """r15 (VERDICT r14 task 4, third capped family): the audit's
    stats row over the same planted hot block the cap test drops —
    every arm hand-computable. 40 rows, two distinct values in one
    prefix block ('dup'): each id lands in its own length bucket and
    the one below (len 5 -> lb 2, bands 2 and 3), so the blocking
    table holds two 40-wide (band, bucket) blocks. Cap 10 drops
    both: 2×C(40,2) = 1,560 skipped join expansions, all 40 ids
    exposed (share 1.0)."""
    from nyctaxidatapipeline_spark.operators.entity import (
        fuzzy_block_audit,
    )

    df = spark.createDataFrame(
        [Row(id=i, name=f"dup {i % 2}") for i in range(40)])
    row = fuzzy_block_audit(df, "name", "id", max_dist=1,
                            max_block=10).collect()[0]
    assert row["multi_buckets"] == 2
    assert row["dropped_buckets"] == 2
    assert row["max_bucket_size"] == 40
    assert row["cand_pairs_dropped"] == 2 * (40 * 39 // 2)
    assert row["docs_banded"] == 40
    assert row["docs_dropped"] == 40
    assert row["doc_share_dropped"] == 1.0
    # cap above the block width -> nothing dropped, same population
    clear = fuzzy_block_audit(df, "name", "id", max_dist=1,
                              max_block=64).collect()[0]
    assert clear["dropped_buckets"] == 0
    assert clear["cand_pairs_dropped"] == 0
    assert clear["doc_share_dropped"] == 0.0
    assert clear["multi_buckets"] == 2
