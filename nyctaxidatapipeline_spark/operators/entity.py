"""Fuzzy entity matching: blocked edit-distance record linkage.

The entity-resolution companion to the document-dedup suite: find value
pairs within a small Levenshtein distance (typo'd names, OCR'd IDs,
vendor-name variants) WITHOUT the O(n²) cross join. Standard blocking
recipe (Fellegi-Sunter style pipelines, dedupe.io, Splink all share
it): candidates must agree on a cheap deterministic block key — here
the lowercased first ``prefix_len`` characters plus a ±1 length band —
then the exact ``levenshtein`` verifies only within blocks.

Block-key recall bound is explicit and documented: a pair whose FIRST
``prefix_len`` chars differ is invisible (prefix typos escape);
production stacks run 2-3 complementary blockings (prefix, suffix,
phonetic) and union candidates — the same shape, one more union.

Scale: one shuffle on the block key; per-block pair volume is Σ block²
so the cap on block width (``max_block``) is the skew guard, same role
as ``max_df`` in the shingle posting lists. Levenshtein is evaluated
only on candidate pairs, JVM-side (both Spark and DuckDB implement the
same Wagner-Fischer distance, so the whole pipeline oracle-checks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(df: DataFrame, col: str, id_col: str,
                max_dist: int = 2, prefix_len: int = 3,
                max_block: int = 200) -> DataFrame:
    """(id_a, id_b, val_a, val_b, dist) for distinct-id pairs with
    ``levenshtein <= max_dist``, blocked on (lower prefix, length band).

    The length band uses ``floor(length / (max_dist + 1))`` bucket ids
    with candidates compared in same-or-adjacent buckets via a bucket
    self-join on the two exploded bucket ids — a pair further than
    ``max_dist`` apart in length can never pass the verify (edit
    distance >= length difference), and same/adjacent buckets cover
    every pair within the band without a theta join.
    """
    lowered = F.lower(F.col(col))
    base = (df.select(F.col(id_col).alias("_id"),
                      F.col(col).alias("_val"),
                      F.substring(lowered, 1, prefix_len).alias("_pfx"),
                      F.floor(F.length(lowered) / (max_dist + 1))
                       .cast("long").alias("_lb")))
    # each row lands in its own bucket and the one below: any two rows
    # within max_dist of length share at least one joined bucket pair
    cand = base.select("_id", "_val", "_pfx", "_lb",
                       F.explode(F.array(F.col("_lb"),
                                         F.col("_lb") + 1)).alias("_jb"))
    blocks = (cand.groupBy("_pfx", "_jb")
                  .agg(F.count("*").alias("_n"))
                  .filter(F.col("_n") <= max_block)
                  .drop("_n"))
    cand = cand.join(blocks, ["_pfx", "_jb"], "left_semi")
    a = cand.select(F.col("_id").alias("id_a"),
                    F.col("_val").alias("val_a"),
                    F.col("_lb").alias("lb_a"), "_pfx", "_jb")
    b = cand.select(F.col("_id").alias("id_b"),
                    F.col("_val").alias("val_b"),
                    F.col("_lb").alias("lb_b"), "_pfx", "_jb")
    pairs = (a.join(b, ["_pfx", "_jb"])
              .filter(F.col("id_a") < F.col("id_b"))
              # dedup the two bucket routes one pair can take: keep the
              # route through min(lb_a, lb_b) only
              .filter(F.col("_jb") == F.greatest("lb_a", "lb_b"))
              .select("id_a", "id_b", "val_a", "val_b",
                      F.levenshtein("val_a", "val_b").alias("dist"))
              .filter(F.col("dist") <= max_dist))
    return pairs


def fuzzy_block_audit(df: DataFrame, col: str, id_col: str,
                      max_dist: int = 2, prefix_len: int = 3,
                      max_block: int = 200) -> DataFrame:
    """:func:`~nyctaxidatapipeline_spark.operators.dedup.bucket_cap_audit`
    over the EXACT blocking table :func:`fuzzy_pairs` reads at these
    parameters — the fuzzy sibling of ``minhash_cap_audit`` /
    ``simhash_cap_audit`` (r15, VERDICT r14 task 4): the ``max_block``
    skew guard drops over-wide blocks silently; this prices what that
    pays in ONE stats row (blocks over cap, widest block,
    Σ c·(c−1)/2 skipped join expansions, distinct-id share exposed to
    dropped links). Block key maps onto the audit's (band, bucket)
    frame as band = the exploded length bucket (each id appears in
    its own bucket and the one below, exactly as the self-join
    candidates do), bucket = the lowercased prefix. The expansion
    count is the per-block JOIN size the cap avoided — an upper bound
    on verified links lost (a same-length pair is counted on both of
    its bucket routes, and ``levenshtein`` would still have to pass).
    Costs one block-keyed shuffle; no pair is ever expanded."""
    from nyctaxidatapipeline_spark.operators.dedup import (
        bucket_cap_audit,
    )

    lowered = F.lower(F.col(col))
    base = (df.select(F.col(id_col).alias("_id"),
                      F.substring(lowered, 1, prefix_len).alias("_pfx"),
                      F.floor(F.length(lowered) / (max_dist + 1))
                       .cast("long").alias("_lb")))
    buckets = (base.select(
        F.col("_id").alias(id_col),
        F.explode(F.array(F.col("_lb"),
                          F.col("_lb") + 1)).alias("band"),
        F.col("_pfx").alias("bucket")))
    return bucket_cap_audit(buckets, id_col, max_block)
