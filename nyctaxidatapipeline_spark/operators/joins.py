"""Joins — the reference's single biggest capability gap (SURVEY.md §2.5:
zero joins anywhere in the reference; the driver's star schema requires
them). All built-in Spark join strategies, with explicit broadcast policy
where the 100 TB plan needs it.

Strategy notes at scale:
  * Dimension tables (region 5 rows, nation 25, supplier ~10k/SF) are
    broadcast — no shuffle of the 100 TB fact side at all.
  * customer grows with SF (~150k/SF); below
    ``spark.sql.autoBroadcastJoinThreshold`` it broadcasts, beyond it AQE
    falls back to sort-merge with skew splitting. We hint broadcast only
    for the dims that are structurally tiny.
  * fact-to-fact (lineitem ⋈ orders) is a shuffle join on the order key —
    co-partitioned bucketing (``sinks.write_parquet`` + bucketBy) removes
    that shuffle for repeated workloads.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dim_join(fact: DataFrame, dim: DataFrame,
             on: Column | str | Sequence[str], how: str = "inner",
             broadcast_dim: bool = True) -> DataFrame:
    """Fact-to-dimension equi-join; broadcasts the dim side by default so
    the fact side never shuffles."""
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def semi_join(df: DataFrame, other: DataFrame,
              on: Column | str | Sequence[str]) -> DataFrame:
    """EXISTS — rows of ``df`` with a match in ``other`` (no columns from
    ``other``, no row duplication)."""
    return df.join(other, on=on, how="left_semi")


def anti_join(df: DataFrame, other: DataFrame,
              on: Column | str | Sequence[str]) -> DataFrame:
    """NOT EXISTS — rows of ``df`` with no match in ``other``."""
    return df.join(other, on=on, how="left_anti")


#: join types for which exploding the right side over every salt value
#: cannot change the result (each right row only ever matches, or is probed
#: by, left rows carrying exactly one salt). For right/full outer joins the
#: explode would emit every unmatched right row ``salt_buckets`` times.
_SALT_SAFE_HOW = frozenset(
    {"inner", "left", "leftouter", "left_outer",
     "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"})


def salted_join(left: DataFrame, right: DataFrame, key: str,
                salt_buckets: int = 16, how: str = "inner") -> DataFrame:
    """Skew-mitigated equi-join: the left (large, skewed) side gets a
    deterministic salt derived from its other columns; the right side is
    exploded into every salt value. The hot key's rows spread over
    ``salt_buckets`` tasks instead of one straggler.

    For ``how`` in inner/left/left_semi/left_anti the result is identical
    to ``left.join(right, key, how)`` — salting only changes the physical
    distribution. right/full outer joins are rejected: the exploded right
    side would duplicate every unmatched right row once per salt value.
    AQE's skew-join handles most cases automatically; explicit salting
    remains for extreme keys (one key > executor memory) and for
    sort/window ops AQE can't split.
    """
    if how.lower() not in _SALT_SAFE_HOW:
        raise ValueError(
            f"salted_join does not support how={how!r}: unmatched right "
            "rows would be duplicated per salt bucket; use "
            "inner/left/left_semi/left_anti or an unsalted join")
    l_salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]),
                    F.lit(salt_buckets))
    l = left.withColumn("_salt", l_salt)
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i)
                                     for i in range(salt_buckets)])))
    return l.join(r, [key, "_salt"], how).drop("_salt")


def star_join(fact: DataFrame,
              dims: Sequence[tuple[DataFrame, Column | str | Sequence[str]]],
              broadcast_dims: bool = True) -> DataFrame:
    """Chain of fact→dim joins (snowflake/star). Catalyst reorders and
    plans each as broadcast-hash when hinted/small."""
    out = fact
    for dim, on in dims:
        out = dim_join(out, dim, on, broadcast_dim=broadcast_dims)
    return out
