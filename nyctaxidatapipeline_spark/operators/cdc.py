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

from pyspark.sql import Column, DataFrame, Window
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


def diff_tables(before: DataFrame, after: DataFrame,
                key_cols: Sequence[str],
                compare_cols: Sequence[str]) -> DataFrame:
    """Snapshot reconciliation: classify every key as added / removed /
    changed / unchanged between two table versions — the audit surface
    behind every CDC backfill ("did the migration change anything it
    shouldn't?").

    One full outer join on the key; change detection compares an
    md5-of-concatenated-values digest per side (one expression per row,
    no per-column join predicates — column count does not change the
    join shape). NULLs encode as the empty string with a NULL-bitmap
    marker column folded into the digest, so NULL → '' transitions are
    detected. At 100 TB: both sides shuffle by key once; with bucketed
    snapshots the exchange disappears.

    Output: (key_cols..., change) with change in
    {'added','removed','changed'} — unchanged keys are dropped (they
    are the overwhelming majority at scale; count them as
    |before ∩ after| − |changed| if needed).
    """
    def digest(df: DataFrame) -> Column:
        parts = []
        for c in compare_cols:
            col = F.col(c)
            parts.append(F.coalesce(col.cast("string"), F.lit("")))
            parts.append(F.when(col.isNull(), "1").otherwise("0"))
        return F.md5(F.concat_ws("\x1f", *parts))

    b = before.select(*key_cols, digest(before).alias("_hb"))
    a = after.select(*key_cols, digest(after).alias("_ha"))
    joined = b.join(a, list(key_cols), "full_outer")
    change = (F.when(F.col("_hb").isNull(), "added")
               .when(F.col("_ha").isNull(), "removed")
               .when(F.col("_hb") != F.col("_ha"), "changed"))
    return (joined.withColumn("change", change)
                  .filter(F.col("change").isNotNull())
                  .select(*key_cols, "change"))


def merge_upsert(target: DataFrame, source: DataFrame,
                 key_cols: Sequence[str],
                 update_condition: str | None = None,
                 delete_condition: str | None = None,
                 insert_condition: str | None = None) -> DataFrame:
    """MERGE INTO semantics over plain DataFrames — what Delta/Iceberg
    MERGE compiles to underneath (this image ships no lake-format
    jars, the same constraint as ``scd2_merge``):

      WHEN MATCHED [AND delete_condition] THEN DELETE
      WHEN MATCHED [AND update_condition] THEN UPDATE SET * (source
        values win; a matched row failing both conditions keeps the
        TARGET values)
      WHEN NOT MATCHED [AND insert_condition] THEN INSERT *

    Clause order follows Delta: DELETE is evaluated before UPDATE for
    matched rows. Conditions are SQL strings over the joined pair with
    aliases ``t`` (target) and ``s`` (source) — e.g. ``"s.balance <
    t.balance"``. ``source`` must be unique per key (the MERGE
    cardinality rule; violations make the matched arm multiply rows
    exactly as Delta would error on).

    Output columns = target columns. Scale shape: ONE shuffle join of
    target⋈source on the key for the matched arm plus an anti-join per
    unmatched side — with both tables bucketed by key all three are
    exchange-free. The whole result is a pure function of the two
    inputs (no ordering sensitivity), so it replays identically on any
    layout.
    """
    keys = list(key_cols)
    cols = target.columns
    t, s = target.alias("t"), source.alias("s")
    j = t.join(s, keys, "inner")
    arm_del = F.expr(delete_condition) if delete_condition \
        else F.lit(False)
    arm_upd = F.expr(update_condition) if update_condition \
        else F.lit(True)
    matched = (j.filter(~arm_del)
                .select(*keys,
                        *[F.when(arm_upd, F.col(f"s.{c}"))
                           .otherwise(F.col(f"t.{c}")).alias(c)
                          for c in cols if c not in keys])
                .select(*cols))
    unmatched_tgt = t.join(s.select(*keys).distinct(), keys, "left_anti")
    inserts = s.join(t.select(*keys).distinct(), keys, "left_anti")
    if insert_condition:
        inserts = inserts.alias("s").filter(F.expr(insert_condition))
    return (unmatched_tgt.select(*cols)
            .unionByName(matched)
            .unionByName(inserts.select(*cols)))
