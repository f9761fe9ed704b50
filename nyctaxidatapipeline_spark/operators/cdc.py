"""CDC / slowly-changing-dimension operators (SCD2 emulation).

The pyspark guide's "MERGE INTO needs Delta" case — this v1 image has no
lake-format jars, so SCD2 is composed from built-ins (anti-join + union +
window), which is also exactly what MERGE compiles to underneath.

  * **scd2_versions** — replay a change-event stream into versioned rows:
    valid_from = event ts, valid_to = next change for the key (lead), open
    row = NULL valid_to. One window shuffle.
  * **scd2_merge** — apply an update batch to a current SCD2 table:
    close touched open rows, append the new versions. Two narrow joins +
    union; at 100 TB partition the dimension by key-hash so the join
    shuffles only the (small) update side when bucketing is in place.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_versions(changes: DataFrame, key_cols: Sequence[str], ts_col: str,
                  attr_cols: Sequence[str],
                  tiebreak_cols: Sequence[str] = ()) -> DataFrame:
    """Versioned dimension from a change stream: one row per change with
    [valid_from, valid_to) validity and an is_current flag.

    ``tiebreak_cols``: unique columns appended to the window order so
    simultaneous changes (same key, same ts) version deterministically.
    """
    order = [F.col("valid_from"),
             *[F.col(c) for c in tiebreak_cols]]
    return (changes.select(*key_cols, *attr_cols,
                           F.col(ts_col).alias("valid_from"))
            .withColumn("valid_to", F.lead("valid_from").over(
                Window.partitionBy(*key_cols).orderBy(*order)))
            .withColumn("is_current", F.col("valid_to").isNull()))


def scd2_merge(current: DataFrame, updates: DataFrame,
               key_cols: Sequence[str], ts_col: str,
               attr_cols: Sequence[str]) -> DataFrame:
    """Merge an update batch (one row per key, new attribute values at
    ``ts_col``) into an SCD2 table produced by ``scd2_versions``.

    Open rows of touched keys get ``valid_to`` = update ts; every update
    becomes the new open version. Untouched rows pass through.
    """
    upd_keys = updates.select(*key_cols).distinct()
    upd_ts = updates.select(*key_cols, F.col(ts_col).alias("_new_ts"))

    untouched = current.join(upd_keys, list(key_cols), "left_anti")
    touched = current.join(upd_ts, list(key_cols), "inner")
    closed = (touched.withColumn(
                  "valid_to",
                  F.when(F.col("is_current"), F.col("_new_ts"))
                   .otherwise(F.col("valid_to")))
              .withColumn("is_current", F.lit(False))
              .drop("_new_ts"))
    new_rows = updates.select(
        *key_cols, *attr_cols,
        F.col(ts_col).alias("valid_from"),
        F.lit(None).cast(current.schema["valid_to"].dataType)
         .alias("valid_to"),
        F.lit(True).alias("is_current"))
    return untouched.unionByName(closed).unionByName(new_rows)
