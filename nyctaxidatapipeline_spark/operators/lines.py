"""Corpus-level line deduplication (C4 / Dolma-style) and
repeated-substring span removal (Lee et al. 2022) — see
``substring_dedup`` for the span-level operator.

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

__all__ = ["explode_lines", "dedup_lines", "substring_dedup",
           "c4_line_filter"]


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


def substring_dedup(df: DataFrame, text_col: str, id_col: str,
                    min_gram: int = 8) -> DataFrame:
    """Repeated-SUBSTRING span removal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better") — the span-level
    sibling of ``dedup_lines``: any run of ``min_gram`` whitespace
    tokens that occurs more than once ANYWHERE in the corpus is excised
    from every occurrence except the globally first (ordered by
    (id, pos)), with overlapping flagged spans merged before removal.
    Catches cross-document boilerplate that line dedup misses because
    it doesn't align on line boundaries (templated sentences, licence
    sentences flowed into paragraphs).

    Spark-first plan, all relational:

      1. tokenize once per doc (whitespace split, original case kept —
         the output must rebuild the surviving text verbatim);
      2. gram table from ONE array-lambda projection (no per-gram
         explode of token text): position p -> md5 of the
         space-joined L-token slice — rows out = tokens, not
         tokens x L, and the shuffle key is a fixed-width digest;
      3. duplicate decision: one window over ``md5(gram)`` gives each
         occurrence its corpus-wide count and (id, pos)-ordered rank —
         occurrences with count >= 2 and rank >= 2 become removal
         spans [pos, pos+L). Like ``dedup_lines``, skew on a hot gram
         is bounded: work is linear in that gram's occurrence list;
      4. per-doc interval merge: classic running-max island detection
         in one doc-keyed window (merged spans <= spans, doc-local);
      5. removal: tokens LEFT ANTI range-join merged spans
         (doc-equi key + pos-in-span residual — doc-local, never a
         corpus cross product) — then per-doc ordered reassembly.

    Whitespace is canonicalized to single spaces in the output (the
    tokenizer's inverse). Every document survives; ``n_tokens`` /
    ``n_tokens_removed`` make the excision auditable. Fully
    oracle-expressible (``substring_dedup`` query twin).

    Returns (id_col, text, n_tokens, n_tokens_removed).
    """
    toks = df.select(
        id_col,
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                 lambda t: t != "").alias("_tk"))
    tok = toks.select(id_col,
                      F.posexplode("_tk").alias("pos", "_tok"))
    # sequence(0, size-L) counts DOWN for size < L (the shingles
    # gotcha) — guard short docs to an empty gram list explicitly.
    n = F.size("_tk")
    positions = F.when(n >= min_gram,
                       F.sequence(F.lit(0), n - min_gram)) \
                 .otherwise(F.expr("array()").cast("array<int>"))
    gram = F.transform(
        positions,
        lambda p: F.md5(F.array_join(
            F.slice(F.col("_tk"), p + F.lit(1), F.lit(min_gram)), " ")))
    grams = toks.select(id_col, F.posexplode(gram).alias("pos", "_h"))
    wh = Window.partitionBy("_h")
    occ = grams.select(
        id_col, "pos",
        F.count("*").over(wh).alias("_c"),
        F.row_number().over(wh.orderBy(id_col, "pos")).alias("_rn"))
    spans = (occ.filter((F.col("_c") >= 2) & (F.col("_rn") >= 2))
                .select(id_col, F.col("pos").alias("_s"),
                        (F.col("pos") + min_gram).alias("_e")))
    wd = Window.partitionBy(id_col).orderBy("_s", "_e")
    prev_max = F.max("_e").over(
        wd.rowsBetween(Window.unboundedPreceding, -1))
    merged = (spans
              .withColumn("_ni", (prev_max.isNull()
                                  | (F.col("_s") > prev_max)).cast("int"))
              .withColumn("_isl", F.sum("_ni").over(
                  wd.rowsBetween(Window.unboundedPreceding, 0)))
              .groupBy(id_col, "_isl")
              .agg(F.min("_s").alias("_s"), F.max("_e").alias("_e"))
              .drop("_isl"))
    kept = tok.join(
        merged,
        on=[tok[id_col] == merged[id_col],
            tok["pos"] >= merged["_s"], tok["pos"] < merged["_e"]],
        how="left_anti")
    rebuilt = (kept.groupBy(id_col)
               .agg(F.array_sort(
                        F.collect_list(F.struct("pos", "_tok")))
                    .alias("_ts"))
               .select(id_col,
                       F.concat_ws(" ", F.transform(
                           F.col("_ts"), lambda x: x["_tok"]))
                        .alias("text"),
                       F.size("_ts").alias("_n_kept")))
    base = toks.select(id_col, n.alias("n_tokens"))
    return (base.join(rebuilt, id_col, "left")
                .select(id_col,
                        F.coalesce("text", F.lit("")).alias("text"),
                        "n_tokens",
                        (F.col("n_tokens")
                         - F.coalesce("_n_kept", F.lit(0)))
                        .alias("n_tokens_removed")))


def c4_line_filter(df: DataFrame, text_col: str, id_col: str,
                   min_words: int = 5, min_lines: int = 3,
                   require_terminal_punct: bool = True) -> DataFrame:
    """The C4 line-level cleaning recipe (Raffel et al. 2020 §2.2),
    as one shuffle-free row-local projection — no Python anywhere:

      * keep a line only if it ends in terminal punctuation
        (``. ! ? "``, toggled by ``require_terminal_punct``), has at
        least ``min_words`` space-separated words, and does not
        mention ``javascript`` (case-folded);
      * drop the whole page if it contains ``{`` or the phrase
        ``lorem ipsum`` (case-folded), or fewer than ``min_lines``
        lines survive.

    Emits every document with its rebuilt text and audit counts:
    ``(id, clean_text, n_kept, n_total, kept)`` — filterable but
    auditable (the same convention as ``curation_flags``). All
    predicates are Catalyst expressions (split / filter / array_join),
    so the whole pass stays inside WholeStageCodegen and scans at
    column-pruned parquet speed — the cheap-rules-first stage a 100 TB
    curation run puts BEFORE any shuffling dedup.
    """
    lines = F.split(F.col(text_col), "\n")
    nw = lambda ln: F.size(F.filter(F.split(ln, " "),
                                    lambda w: w != ""))
    punct_ok = (lambda ln: (
        ln.endswith(".") | ln.endswith("!") | ln.endswith("?")
        | ln.endswith('"'))) if require_terminal_punct \
        else (lambda ln: F.lit(True))
    keep_line = lambda ln: (punct_ok(ln)
                            & (nw(ln) >= min_words)
                            & ~F.lower(ln).contains("javascript"))
    kept = F.filter(lines, keep_line)
    page_ok = (~F.col(text_col).contains("{")
               & ~F.lower(F.col(text_col)).contains("lorem ipsum")
               & (F.size(kept) >= min_lines))
    return df.select(
        F.col(id_col).alias("id"),
        F.when(page_ok, F.array_join(kept, "\n"))
         .otherwise(F.lit("")).alias("clean_text"),
        F.size(kept).cast("int").alias("n_kept"),
        F.size(lines).cast("int").alias("n_total"),
        page_ok.alias("kept"))
