"""Data profiling — per-column statistics as a long table.

The pre-flight step of any large pipeline (null rates, cardinalities,
ranges drive cleaning rules and partition choices). One aggregate per
column unioned into a long frame: Catalyst executes the union of
single-row aggregates as parallel jobs over the same scan.

Scale: exact ``countDistinct`` per column is a distinct-shuffle each —
switch ``approx=True`` (HLL) for wide tables at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, cols: Sequence[str],
                    approx: bool = False) -> DataFrame:
    """(column, n, n_nulls, n_distinct, min, max, mean) per numeric col."""
    parts = []
    for c in cols:
        distinct = (F.approx_count_distinct(c) if approx
                    else F.countDistinct(c))
        # Mean via exact decimal sum: double summation is order-dependent
        # across engines/partitionings; a decimal sum is associative, so
        # the result is reproducible run-to-run (and oracle-comparable).
        dec_sum = F.sum(F.col(c).cast("decimal(38,10)")).cast("double")
        parts.append(df.agg(
            F.lit(c).alias("column"),
            F.count("*").alias("n"),
            F.sum(F.col(c).isNull().cast("long")).alias("n_nulls"),
            distinct.alias("n_distinct"),
            F.round(F.min(c).cast("double"), 6).alias("min_value"),
            F.round(F.max(c).cast("double"), 6).alias("max_value"),
            F.round(dec_sum / F.count(F.col(c)), 6).alias("mean_value")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
