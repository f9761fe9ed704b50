"""BPE vocabulary training (Sennrich et al. 2016) on the word-count table.

The standard tokenizer-training dataflow: reduce the corpus to (word,
count) ONCE — the only pass that touches 100 TB — then run the merge
loop against the word table, whose size is the corpus VOCABULARY (tens
of millions of rows at web scale, not tokens). Each merge round is:

  1. one pair-count aggregate (explode adjacent symbol pairs weighted
     by word count; map-side combined),
  2. one TakeOrdered collect of exactly ONE row (the argmax pair —
     bounded driver traffic by construction),
  3. one projection folding the winning pair into every word's symbol
     array (interpreted ``aggregate`` lambda — the array is per-word
     symbols, length = word length, so the fold is cheap and never
     touches the corpus).

Iterative-lineage discipline: the symbol table is ``localCheckpoint``ed
every round (same rule as PageRank/Lloyd — without it round n replays
rounds 1..n-1's folds per reference).

Determinism: ties on pair count break lexicographically, so the merge
sequence is a pure function of the word counts. Not SQL-expressible as
one query (data-dependent iteration), so this operator is unit-gated
(classic-example fixtures) rather than oracle-gated — see COVERAGE.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.functions.text import tokens

#: end-of-word marker (Sennrich's </w>): distinguishes "est"-as-suffix
#: from "est"-mid-word, and lets merged tokens encode word boundaries.
END = "</w>"


def word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) corpus word frequencies — the one full-corpus pass."""
    return (df.select(F.explode(tokens(text_col)).alias("word"))
              .groupBy("word").agg(F.count("*").alias("n")))


def _init_symbols(words: DataFrame) -> DataFrame:
    """(symbols array<string>, n): each word split into characters with
    the end-of-word marker appended to the last one."""
    chars = F.split(F.col("word"), "")
    sym = F.concat(F.slice(chars, 1, F.size(chars) - 1),
                   F.array(F.concat(F.element_at(chars, -1), F.lit(END))))
    # single-char words: slice(…, 0) is empty, element_at(-1) still works
    sym = F.when(F.size(chars) == 1,
                 F.array(F.concat(F.element_at(chars, 1), F.lit(END)))) \
           .otherwise(sym)
    return words.select(sym.alias("symbols"), F.col("n"))


def _merge_pair(symbols: F.Column, a: str, b: str) -> F.Column:
    """Fold the adjacent pair (a, b) into the single symbol a+b inside
    one symbol array (left-to-right, non-overlapping — the BPE rule)."""
    merged = F.lit(a + b)
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a)) & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged))
        ).otherwise(F.concat(acc, F.array(x))))


def bpe_train(df: DataFrame, text_col: str, n_merges: int = 10,
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    sequence (most-frequent first). Stops early when no pair reaches
    ``min_pair_count``."""
    sym = _init_symbols(word_counts(df, text_col)) \
        .localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (sym.select(
                    F.explode(F.arrays_zip(
                        F.slice("symbols", 1, F.size("symbols") - 1),
                        F.slice("symbols", 2, F.size("symbols") - 1))
                    ).alias("p"), "n")
                 .select(F.col("p")["0"].alias("a"),
                         F.col("p")["1"].alias("b"), "n")
                 .groupBy("a", "b").agg(F.sum("n").alias("c")))
        best = (pairs.orderBy(F.col("c").desc(), "a", "b").limit(1)
                     .collect())
        if not best or best[0]["c"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        sym = (sym.select(_merge_pair(F.col("symbols"), a, b)
                          .alias("symbols"), "n")
                  .localCheckpoint(eager=False))
    return merges


def bpe_segment(df: DataFrame, text_col: str, id_col: str,
                merges: list[tuple[str, str]]) -> DataFrame:
    """Apply a learned merge sequence to segment documents: (id, token
    array-of-BPE-symbols). Merges apply in learned order — the BPE
    inference rule. One projection chain, no shuffle."""
    out = (df.select(F.col(id_col), F.explode(tokens(text_col))
                     .alias("word")))
    chars = F.split(F.col("word"), "")
    sym = F.when(F.size(chars) == 1,
                 F.array(F.concat(F.element_at(chars, 1), F.lit(END)))) \
           .otherwise(F.concat(
               F.slice(chars, 1, F.size(chars) - 1),
               F.array(F.concat(F.element_at(chars, -1), F.lit(END)))))
    seg = out.select(id_col, sym.alias("symbols"))
    for a, b in merges:
        seg = seg.select(id_col,
                         _merge_pair(F.col("symbols"), a, b)
                         .alias("symbols"))
    return seg
