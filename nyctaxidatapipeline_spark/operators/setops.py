"""Set operations — absent from the reference as explicit ops (SURVEY.md
§2.8; its glob scan is an implicit multi-file union). All built-in; narrow
(union) or one shuffle (distinct set semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*dfs: DataFrame) -> DataFrame:
    """UNION ALL by column name (safe against column-order drift)."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def union_distinct(*dfs: DataFrame) -> DataFrame:
    return union_all(*dfs).distinct()


def except_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """SQL EXCEPT (distinct semantics)."""
    return left.subtract(right)


def intersect_distinct(left: DataFrame, right: DataFrame) -> DataFrame:
    """SQL INTERSECT (distinct semantics)."""
    return left.intersect(right)
