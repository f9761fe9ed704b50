"""Incremental aggregate maintenance via mergeable partial states.

The append-only production pattern: a 100 TB fact table grows by daily
batches, and recomputing a grouped rollup over all history per day is a
full re-scan. Instead keep a PARTIAL-STATE table — per key, the
mergeable components (count, sum, min, max) — and each increment is
``merge_partials(state, partial_agg(new_batch))``: cost scales with the
batch plus the state's key cardinality, never with history. The
derived metrics (avg, …) are computed only at read time by
``finalize``, because they are NOT mergeable (avg of avgs is wrong —
the classic bug this module's shape prevents).

This is the same algebra Spark's own partial aggregation uses inside
one job (map-side combine), lifted across jobs/days. All components
here are algebraic (bounded state); sketch states (HLL for distinct,
KLL for quantiles) slot into the same merge shape.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def partial_agg(df: DataFrame, keys: Sequence[str],
                value_col: str) -> DataFrame:
    """Mergeable per-key state: (keys..., n, sum_v, min_v, max_v).
    ``n`` counts non-NULL values (so avg finalizes correctly)."""
    v = F.col(value_col)
    return (df.groupBy(*keys)
              .agg(F.count(v).alias("n"),
                   F.sum(v).alias("sum_v"),
                   F.min(v).alias("min_v"),
                   F.max(v).alias("max_v")))


def merge_partials(states: Sequence[DataFrame],
                   keys: Sequence[str]) -> DataFrame:
    """Merge any number of partial states — union + one re-aggregate
    with each component's own merge function (counts add, sums add,
    mins min, maxes max). Associative and commutative: batch order and
    grouping cannot change the result."""
    if not states:
        raise ValueError("merge_partials needs at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return (out.groupBy(*keys)
               .agg(F.sum("n").alias("n"),
                    F.sum("sum_v").alias("sum_v"),
                    F.min("min_v").alias("min_v"),
                    F.max("max_v").alias("max_v")))


def finalize(state: DataFrame) -> DataFrame:
    """Read-time derivation of the non-mergeable metrics."""
    return state.select(
        *[c for c in state.columns if c not in ("sum_v",)],
        F.round(F.col("sum_v"), 6).alias("sum_v"),
        F.when(F.col("n") > 0,
               F.round(F.col("sum_v") / F.col("n"), 6)).alias("avg_v"))
