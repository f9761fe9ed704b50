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


def star_join(fact: DataFrame,
              dims: Sequence[tuple[DataFrame, Column | str | Sequence[str]]],
              broadcast_dims: bool = True) -> DataFrame:
    """Chain of fact→dim joins (snowflake/star). Catalyst reorders and
    plans each as broadcast-hash when hinted/small."""
    out = fact
    for dim, on in dims:
        out = dim_join(out, dim, on, broadcast_dim=broadcast_dims)
    return out
