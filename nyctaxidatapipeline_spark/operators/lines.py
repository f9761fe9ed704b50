"""Corpus-level line deduplication (C4 / Dolma-style).

Web-scale corpora repeat boilerplate LINES across documents (nav bars,
cookie banners, license footers) that document-level dedup never sees.
The standard cure (C4; Dolma's dedupe pass) keeps only the FIRST
occurrence of each duplicated line corpus-wide and drops the rest,
leaving short lines (below ``min_dedup_len`` chars) untouched — blank
lines and bullets are structure, not boilerplate.

Spark-first plan, two bounded shuffles:

  1. explode documents into (doc_id, pos, line) — ``posexplode`` over
     ``split(text, '\\n')`` (Java split keeps trailing empties, matching
     DuckDB ``string_split``);
  2. first-occurrence decision: ``row_number()`` over a window
     partitioned by ``md5(line)`` ordered by (doc_id, pos) — the shuffle
     key is a fixed-width digest, so sort comparisons never touch long
     line bodies; eligibility is a pure function of the line text, so
     partitions are homogeneous and short lines can't shift ranks of
     deduped ones;
  3. reassemble: groupBy doc_id, sort the collected (pos, line, keep)
     structs, concat the kept lines with '\\n'. Per-task state is one
     document's lines — bounded by document size, not corpus size.

Every document survives (a fully-boilerplate document becomes text '');
``n_lines``/``n_lines_removed`` make the filter auditable. Fully
oracle-expressible: DuckDB reproduces the md5-keyed first-occurrence
choice and ordered string_agg bit-for-bit (``line_dedup`` query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["explode_lines", "dedup_lines"]


def explode_lines(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, pos, line) — one row per line, 0-based position."""
    return df.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))


def dedup_lines(df: DataFrame, text_col: str, id_col: str,
                min_dedup_len: int = 10) -> DataFrame:
    """Corpus-wide first-occurrence line dedup (module docstring).

    Returns (id_col, text, n_lines, n_lines_removed) with ``text``
    rebuilt from the kept lines in original order.
    """
    lines = explode_lines(df, text_col, id_col)
    eligible = F.length("line") >= min_dedup_len
    w = Window.partitionBy("_k").orderBy(id_col, "pos")
    flagged = (lines
               .withColumn("_k", F.md5(F.col("line")))
               .withColumn("_keep",
                           ~eligible | (F.row_number().over(w) == 1)))
    collected = (flagged.groupBy(id_col)
                 .agg(F.array_sort(
                     F.collect_list(F.struct("pos", "line", "_keep")))
                     .alias("_ls")))
    kept = F.filter(F.col("_ls"), lambda x: x["_keep"])
    return collected.select(
        id_col,
        F.concat_ws("\n", F.transform(kept, lambda x: x["line"]))
         .alias("text"),
        F.size("_ls").alias("n_lines"),
        (F.size("_ls") - F.size(kept)).alias("n_lines_removed"))
