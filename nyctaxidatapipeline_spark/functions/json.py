"""JSON extraction over string columns (extension surface — the reference
has none, SURVEY.md §2.3 note; the ``events.props`` fixture motivates it).

Built-in Catalyst expressions only: ``get_json_object`` for path extraction
and ``from_json`` for fully-typed parsing; both are JVM-side (Jackson), no
Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def json_field(col: str | Column, path: str,
               cast: str | None = None) -> Column:
    """Extract ``$.path`` as string, optionally cast (``get_json_object``
    returns NULL for missing paths / malformed JSON — no errors)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.get_json_object(c, f"$.{path}")
    return out.cast(cast) if cast else out


def parse_json(df: DataFrame, col: str, schema: T.StructType | str,
               alias: str = "parsed") -> DataFrame:
    """Typed parse of a JSON string column into a struct column."""
    return df.withColumn(alias, F.from_json(F.col(col), schema))
