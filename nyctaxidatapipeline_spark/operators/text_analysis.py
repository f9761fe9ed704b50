"""Text analysis — language ID, quality scoring, token stats, fingerprinting.

North-star operators for a training-data pipeline (BASELINE.json). All pure
Catalyst expressions (regexp/array lambdas, JVM-side) — no Python UDFs in
any path, so these run at scan speed and the oracle can mirror the exact
rules in SQL.

Design notes:
  * ``language_id`` is a marker-stopword heuristic + CJK codepoint check —
    the classic cheap pre-filter before a real model (fastText et al. are
    not in this container, and a model call would be a Pandas-UDF slot-in
    at the same place).
  * ``quality_score`` mirrors common LLM-data heuristics: length,
    punctuation density, stopword density (Gopher/C4-style rules).
  * ``fingerprint`` is the md5 of the *normalized* token stream —
    whitespace/case-insensitive exact-dup detection (cheaper and stricter
    than shingle Jaccard; the dedup suite covers the fuzzy end).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.functions.text import token_count, tokens
from nyctaxidatapipeline_spark.plans.util import fan_out

#: Marker stopwords per language (tiny, deliberately disjoint-ish sets).
MARKERS = {
    "en": ["the", "a", "is", "and", "of", "to", "in", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu",
           "den"],
    "es": ["el", "los", "que", "y", "un", "es", "por", "una", "con", "para"],
    "fr": ["le", "les", "et", "est", "une", "dans", "pour", "vous", "nous",
           "sur"],
}

_CJK_PATTERN = "[一-鿿]"
_PUNCT_PATTERN = "[.,;:!?]"


def _marker_hits(tokens_col: Column, lang: str) -> Column:
    markers = MARKERS[lang]
    return F.size(F.filter(tokens_col,
                           lambda t: t.isin(*markers)))


def _marker_regexp(lang: str) -> str:
    return r"\b(?:" + "|".join(MARKERS[lang]) + r")\b"


def _marker_hits_re(text_col: str, lang: str) -> Column:
    """Marker occurrences via one codegen'd regexp pass over the text —
    ~5x faster than filtering the token array with an interpreted lambda
    per language. Word-boundary semantics (``\\b``) instead of exact-token
    equality: 'the,' counts here but not in the token filter — fine for a
    scoring heuristic, and the oracle mirrors the same regexp."""
    return F.regexp_count(F.lower(F.col(text_col)), F.lit(_marker_regexp(lang)))


def language_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Adds ``cjk_chars`` and per-language marker-hit counts.

    One regexp pass per language (codegen'd) — no token materialization."""
    out = df.withColumn("cjk_chars",
                        F.regexp_count(F.col(text_col),
                                       F.lit(_CJK_PATTERN)))
    for lang in MARKERS:
        out = out.withColumn(f"score_{lang}",
                             _marker_hits_re(text_col, lang))
    return out


def language_id(df: DataFrame, text_col: str,
                alias: str = "pred_lang") -> DataFrame:
    """Predicted language: 'zh' on any CJK codepoint, else argmax of
    marker hits (tie order en > de > es > fr), 'und' when no markers hit.
    Deterministic — the DuckDB oracle mirrors the same CASE ladder."""
    scored = language_scores(df, text_col)
    en, de, es, fr = (F.col(f"score_{lang}") for lang in MARKERS)
    pred = (
        F.when(F.col("cjk_chars") > 0, "zh")
         .when((en == 0) & (de == 0) & (es == 0) & (fr == 0), "und")
         .when((en >= de) & (en >= es) & (en >= fr), "en")
         .when((de >= es) & (de >= fr), "de")
         .when(es >= fr, "es")
         .otherwise("fr"))
    return scored.withColumn(alias, pred).drop(
        "cjk_chars", *[f"score_{lang}" for lang in MARKERS])


def language_confusion(df: DataFrame, text_col: str,
                       label_col: str) -> DataFrame:
    """Confusion counts (label x prediction) — compact accuracy surface."""
    return (language_id(df, text_col)
            .groupBy(label_col, "pred_lang")
            .agg(F.count("*").alias("n_docs")))


def token_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-doc token statistics: count, char length, mean token length."""
    tk = F.col("_tk")
    total_len = F.aggregate(
        F.transform(tk, lambda t: F.length(t)),
        F.lit(0), lambda acc, x: acc + x)
    n = F.size(tk)
    return (df.withColumn("_tk", tokens(text_col))  # tokenize once
              .select(
        id_col,
        n.alias("n_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.when(n > 0, F.round(total_len.cast("double") / n, 6))
         .alias("avg_token_len")))


def _quality_exprs(text_col: str) -> dict[str, Column]:
    """The quality-heuristic expressions, over an in-scope ``_tk`` token
    array — shared by ``quality_score`` and the single-projection
    ``curation_flags`` (same Columns, so the composed pipeline cannot
    drift from the standalone operator)."""
    tk = F.col("_tk")
    n = F.size(tk)
    chars = F.length(F.col(text_col))
    stop_hits = _marker_hits(tk, "en")
    punct = F.regexp_count(F.col(text_col), F.lit(_PUNCT_PATTERN))
    length_score = F.least(n.cast("double") / 100.0, F.lit(1.0))
    stop_ratio = F.when(n > 0, stop_hits.cast("double") / n)
    punct_ratio = F.when(chars > 0, punct.cast("double") / chars)
    score = (0.5 * length_score
             + 0.3 * F.least(F.coalesce(stop_ratio, F.lit(0.0)) * 5.0,
                             F.lit(1.0))
             + 0.2 * F.least(F.coalesce(punct_ratio, F.lit(0.0)) * 20.0,
                             F.lit(1.0)))
    return {
        "n_tokens": n,
        "length_score": F.round(length_score, 6),
        "stopword_ratio": F.round(stop_ratio, 6),
        "punct_ratio": F.round(punct_ratio, 6),
        "quality_score": F.round(score, 6),
    }


def quality_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher/C4-style quality heuristics + one combined score.

    Components (all NULL-guarded for empty text):
      length_score   = min(n_tokens / 100, 1)        — reward substance
      stopword_ratio = en-marker tokens / tokens      — prose-likeness
      punct_ratio    = punct chars / chars            — structure signal
      score = 0.5·length + 0.3·min(stop·5, 1) + 0.2·min(punct·20, 1)
    """
    q = _quality_exprs(text_col)
    return (df.withColumn("_tk", tokens(text_col))  # tokenize once
              .select(id_col,
                      *[c.alias(name) for name, c in q.items()]))


def blocklist_stats(df: DataFrame, words: list[str], text_col: str,
                    id_col: str, max_ratio: float = 0.0) -> DataFrame:
    """C4-style wordlist filter: per-doc count/ratio of tokens that
    match a blocklist (case-insensitive exact token match), plus the
    keep verdict. C4 drops any page containing a listed word
    (``max_ratio=0.0`` — one hit kills); milder policies raise
    ``max_ratio`` to tolerate incidental mentions.

    The list rides as a literal array in the plan, so the scan is a
    shuffle-free row-local projection (O(|list|) comparisons per token
    under codegen — fine for the few-hundred-word lists these filters
    actually use; a 100k-term list should instead broadcast-join a
    words table against exploded tokens). Output:
    (id, n_tokens, n_blocked, blocked_ratio, keep) — blocked_ratio is
    NULL for empty docs (which are kept: nothing objectionable in
    nothing).
    """
    if not words:
        raise ValueError("blocklist must contain at least one word")
    lst = F.array(*[F.lit(w.lower()) for w in sorted(set(words))])
    tk = F.col("_tk")
    n = F.size(tk)
    hits = F.size(F.filter(tk, lambda t: F.array_contains(lst, t)))
    ratio = F.when(n > 0, hits.cast("double") / n)
    return (df.withColumn("_tk", tokens(text_col))
              .select(id_col,
                      n.alias("n_tokens"),
                      hits.alias("n_blocked"),
                      F.round(ratio, 6).alias("blocked_ratio"),
                      F.coalesce(ratio <= max_ratio, F.lit(True))
                       .alias("keep")))


def blocklist_filter(df: DataFrame, words: list[str], text_col: str,
                     id_col: str, max_ratio: float = 0.0) -> DataFrame:
    """Rows of ``df`` surviving ``blocklist_stats``'s keep verdict."""
    kept = (blocklist_stats(df, words, text_col, id_col, max_ratio)
            .filter("keep").select(id_col))
    return df.join(kept, id_col, "left_semi")


def fingerprint(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """md5 fingerprint of the normalized token stream (case/whitespace
    insensitive content identity)."""
    return df.select(
        id_col,
        F.md5(F.concat_ws(" ", tokens(text_col))).alias("fingerprint"))


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Normalized exact dedup: representative min-id per fingerprint."""
    return (fingerprint(df, text_col, id_col)
            .groupBy("fingerprint")
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").alias("n_copies")))


#: PII surface patterns, written so RE2 (DuckDB) and java.util.regex
#: (Spark) find the IDENTICAL match set: single character classes, fixed
#: quantifier ranges, ASCII \b boundaries — no alternation or constructs
#: where leftmost-first (Java) and leftmost-longest (RE2) semantics could
#: diverge. Heuristic surface detectors, not validators (e.g. ipv4 accepts
#: octets > 255) — the standard cheap pre-filter before human review.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "ssn": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
}


def _pii_alternation() -> str:
    """All PII patterns as one non-capturing alternation — a string
    matches it iff it matches at least one pattern, so ``rlike`` on it
    equals ``sum(regexp_count) > 0`` while scanning the text ONCE and
    short-circuiting on the first hit (measured 2.3x faster than the
    four-count formulation at sf0.1; equivalence is unit-pinned)."""
    return "|".join(f"(?:{p})" for p in PII_PATTERNS.values())


def _pii_flag(text_col: str) -> Column:
    """Boolean any-PII expression (the ``has_pii`` column of
    ``pii_stats``) — shared with the single-projection
    ``curation_flags``."""
    return F.col(text_col).rlike(_pii_alternation())


def pii_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document PII surface counts + flag.

    One codegen'd ``regexp_count`` pass per pattern — scan-speed, no
    Python. Output: (id, n_email, n_phone, n_ipv4, n_ssn, has_pii).
    """
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).alias(f"n_{k}")
        for k, p in PII_PATTERNS.items()]
    out = df.select(id_col, *counts)
    total = None
    for k in PII_PATTERNS:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def _pii_redact_expr(text_col: str) -> Column:
    """The redaction Column: every PII match replaced with its typed
    placeholder, applied in ``PII_PATTERNS`` order. The chain is
    guarded by one short-circuiting any-PII ``rlike``: clean documents
    (the overwhelming majority of a real corpus) pay a single scan
    instead of four full replace passes — identical output (a replace
    on a non-matching text is the identity; unit-pinned). Shared by
    ``pii_redact`` and the fused ``curate_corpus`` projection."""
    out = F.col(text_col)
    for k, p in PII_PATTERNS.items():
        out = F.regexp_replace(out, p, f"[{k.upper()}]")
    return (F.when(F.col(text_col).rlike(_pii_alternation()), out)
             .otherwise(F.col(text_col)))


def pii_redact(df: DataFrame, text_col: str,
               redacted_col: str = "redacted") -> DataFrame:
    """Replace every PII match with a typed placeholder (``[EMAIL]``,
    ``[PHONE]``, ...). Patterns apply in ``PII_PATTERNS`` order; matches
    never overlap across patterns for realistic inputs, and the order is
    deterministic either way (the oracle mirrors it)."""
    return df.withColumn(redacted_col, _pii_redact_expr(text_col))


#: Unicode-normalization rule chain (pattern, replacement), applied in
#: order — the C4/Gopher-style cleanup every crawl pipeline runs before
#: fingerprinting (curly quotes / dashes / ellipsis to ASCII, NBSP to
#: space, control chars stripped, whitespace canonicalized). Every
#: pattern is RE2-compatible (no backrefs/lookaround) so the DuckDB
#: twin runs the byte-identical chain; order is load-bearing (the
#: whitespace collapses run AFTER the character folds so a folded NBSP
#: participates in the collapse).
NORMALIZE_RULES: list[tuple[str, str]] = [
    ("[‘’‚‛]", "'"),      # curly single quotes
    ("[“”„‟]", '"'),      # curly double quotes
    ("[–—―]", "-"),            # en/em/horizontal dashes
    ("…", "..."),                        # ellipsis
    (" ", " "),                          # NBSP
    ("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]", ""),  # control chars
    ("[ \\t]+", " "),                         # space/tab runs
    (" ?\\n ?", "\n"),                        # strip spaces around \n
    ("\\n{3,}", "\n\n"),                      # cap blank-line runs
]


def normalize_text_expr(col: str | Column) -> Column:
    """The normalization Column: :data:`NORMALIZE_RULES` applied in
    order, then a whitespace-class trim — one chain of codegen'd
    ``regexp_replace``, scan-speed, no Python."""
    out = F.col(col) if isinstance(col, str) else col
    for pat, rep in NORMALIZE_RULES:
        out = F.regexp_replace(out, pat, rep)
    return F.regexp_replace(out, r"^\s+|\s+$", "")


def normalize_text(df: DataFrame, text_col: str,
                   id_col: str) -> DataFrame:
    """(id, text_norm, n_chars, n_chars_norm, changed) — the
    normalization pass as an auditable operator: the cleaned text plus
    the before/after char counts and whether anything changed (the
    usual pre-fingerprint step; dedup keyed on ``text_norm`` catches
    the smart-quote/NBSP variants of otherwise-identical boilerplate
    that byte-exact dedup misses)."""
    norm = normalize_text_expr(text_col)
    return df.select(
        id_col,
        norm.alias("text_norm"),
        F.length(text_col).cast("int").alias("n_chars"),
        F.length(norm).cast("int").alias("n_chars_norm"),
        (norm != F.col(text_col)).alias("changed"))


def _repetition_exprs() -> dict[str, Column]:
    """Row-local repetition signals over an in-scope ``_sh`` shingle
    array (callers guard empty arrays) — the ``dup_ngram_frac`` rule
    surface for the single-projection ``curation_flags``. The
    standalone ``repetition_stats`` (which also needs the top-n-gram
    count) uses the codegen'd aggregate shape instead — see its
    docstring for the measured tradeoff."""
    n_ngrams = F.size("_sh").cast("bigint")
    n_distinct = F.size(F.array_distinct("_sh")).cast("bigint")
    return {
        "n_ngrams": n_ngrams,
        "n_distinct": n_distinct,
        "dup_ngram_frac": F.round(1.0 - n_distinct / n_ngrams, 6),
    }


def repetition_stats(df: DataFrame, text_col: str, id_col: str,
                     n: int = 2) -> DataFrame:
    """Gopher-style repetition signals per document.

    Repetitive documents (boilerplate, template spam, degenerate
    generations) are a standard drop class for training corpora. Output:

      n_ngrams       total word n-grams (with repeats)
      n_distinct     distinct word n-grams
      dup_ngram_frac 1 - distinct/total — mass in repeated n-grams
      top_ngram_frac occurrences of the single most frequent n-gram /
                     total (ties resolved by the count, not the n-gram,
                     so the value is deterministic)

    Shape: one explode + one hash-aggregate by (id, ngram) + one by id —
    the same two-shuffle profile as the dedup shingle paths; counts are
    per-document so no key is hotter than the longest single document.
    Documents with fewer than ``n`` tokens produce no n-grams and are
    absent.

    A fully row-local variant (sorted run-length fold per document, no
    shuffle at all) was measured 6x SLOWER at bench scale: Spark's
    higher-order-function lambdas run interpreted with no
    common-subexpression reuse, while this shape stays inside
    whole-stage-codegen'd hash aggregates whose shuffle volume is the
    map-side-combined per-document distinct mass. ``_repetition_exprs``
    keeps the row-local ``dup_ngram_frac`` for ``curation_flags``,
    which needs only that one signal.
    """
    from nyctaxidatapipeline_spark.functions.text import shingles

    sh = (df.select(id_col, tokens(text_col).alias("_tk"))
            .select(id_col, F.explode(shingles(F.col("_tk"), n))
                             .alias("ngram")))
    per_ngram = (sh.groupBy(id_col, "ngram")
                   .agg(F.count("*").alias("cnt")))
    return (per_ngram.groupBy(id_col)
            .agg(F.sum("cnt").alias("n_ngrams"),
                 F.count("*").alias("n_distinct"),
                 F.max("cnt").alias("_top"))
            .select(id_col, "n_ngrams", "n_distinct",
                    F.round(1.0 - F.col("n_distinct")
                            / F.col("n_ngrams"), 6)
                     .alias("dup_ngram_frac"),
                    F.round(F.col("_top") / F.col("n_ngrams"), 6)
                     .alias("top_ngram_frac")))


def ngram_novelty(df: DataFrame, text_col: str, id_col: str,
                  n: int = 3, min_df: int = 2) -> DataFrame:
    """Per-document n-gram novelty — the memorization-risk /
    boilerplate signal: what fraction of a document's DISTINCT word
    n-grams also appear in at least ``min_df`` documents corpus-wide
    (a doc whose n-grams are all common is template/boilerplate; a doc
    whose n-grams are mostly unique is novel content — and for an eval
    set, HIGH commonness against the training corpus flags leakage,
    the same quantity ``contamination_check`` thresholds pairwise).

    Output: (id, n_distinct_ngrams, n_common, novelty) with
    novelty = 1 - n_common / n_distinct_ngrams; documents too short
    for any n-gram keep NULL stats.

    Shape: the shared ``doc_shingles`` distinct (id, gram) table, one
    count-by-gram aggregate (map-side combined — the gram-frequency
    table is corpus-vocabulary-sized, not corpus-sized), one join back
    on the gram, one per-doc aggregate. All shuffle keys are grams or
    ids; a hot gram costs its posting-list length, never a cross
    product."""
    from nyctaxidatapipeline_spark.operators.dedup import doc_shingles

    sh = doc_shingles(df, text_col, id_col, n)
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("_df"))
    per = (sh.join(dfreq, "shingle")
             .groupBy(id_col)
             .agg(F.count("*").alias("n_distinct_ngrams"),
                  F.sum(F.when(F.col("_df") >= min_df, 1)
                         .otherwise(0)).alias("n_common")))
    novelty = (F.round(F.lit(1.0) - F.col("n_common")
                       / F.col("n_distinct_ngrams"), 6) + F.lit(0.0))
    return (df.select(id_col).join(per, id_col, "left")
              .select(id_col, "n_distinct_ngrams", "n_common",
                      novelty.alias("novelty")))


def term_frequencies(df: DataFrame, text_col: str, id_col: str,
                     min_count: int = 1) -> DataFrame:
    """Corpus vocabulary: (token, freq, doc_freq) for every whitespace
    token occurring at least ``min_count`` times — the counting pass
    behind vocabulary building, IDF weighting, and stopword mining.

    Shape: explode + one hash-aggregate keyed by (token, id) + one by
    token. ``doc_freq`` counts documents exactly via the two-level
    aggregate (distinct is folded into the first groupBy, so no
    count-distinct expansion of the hot token keys); both aggregates
    combine map-side. Natural-language token frequencies are Zipfian —
    the head token ('the') concentrates ~5% of corpus mass on one key —
    but the first aggregate's (token, doc) key spreads that mass across
    documents before the second sees it, so the hot key carries
    doc_freq-many partial rows, not corpus-many.
    """
    per_doc = (df.select(id_col, F.explode(tokens(text_col))
                          .alias("token"))
                 .groupBy("token", id_col)
                 .agg(F.count("*").alias("_n")))
    return (per_doc.groupBy("token")
            .agg(F.sum("_n").alias("freq"),
                 F.count("*").alias("doc_freq"))
            .filter(F.col("freq") >= min_count))


def token_budget(df: DataFrame, text_col: str,
                 group_col: str) -> DataFrame:
    """(group, n_docs, ws_tokens, bpe_tokens, n_chars) — the
    training-run sizing report: how many tokens each slice of the
    corpus contributes, counted both ways the repo counts them
    (whitespace ``tokens`` for document stats, the BPE-ish
    ``bpe_tokens`` regex for what a subword tokenizer will actually
    see — the number a compute budget is priced in). One projection +
    one map-side-combined aggregate; no shuffle carries text."""
    from nyctaxidatapipeline_spark.functions.text import (
        bpe_token_count,
        token_count,
    )

    return (df.select(group_col,
                      token_count(text_col).alias("_ws"),
                      bpe_token_count(text_col).alias("_bpe"),
                      F.length(text_col).alias("_ch"))
              .groupBy(group_col)
              .agg(F.count("*").alias("n_docs"),
                   F.sum("_ws").alias("ws_tokens"),
                   F.sum("_bpe").alias("bpe_tokens"),
                   F.sum("_ch").alias("n_chars")))


def corpus_report(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One-row corpus composition summary — the numbers a data curator
    checks before and after every pipeline stage: document/token
    volume, length distribution (exact percentiles here; swap
    ``percentile_approx`` at 100 TB — noted so the oracle stays exact),
    and surface composition (ASCII ratio, mean stopword density).

    One tokenize pass, one global aggregate (partial+final); no joins.
    Output: (n_docs, n_tokens, avg_tokens, p50_tokens, p95_tokens,
    ascii_ratio, avg_stopword_ratio).
    """
    tk = F.col("_tk")
    n = F.size(tk)
    stop_ratio = F.when(
        n > 0, _marker_hits(tk, "en").cast("double") / n)
    ascii_chars = F.length(
        F.regexp_replace(F.col(text_col), r"[^\x20-\x7E]", ""))
    chars = F.length(F.col(text_col))
    return (df.withColumn("_tk", tokens(text_col))
            .select(n.alias("_n"),
                    stop_ratio.alias("_sr"),
                    ascii_chars.alias("_ac"),
                    chars.alias("_c"))
            .agg(F.count("*").alias("n_docs"),
                 F.sum("_n").alias("n_tokens"),
                 F.round(F.avg("_n"), 6).alias("avg_tokens"),
                 F.expr("percentile(_n, 0.5)").alias("p50_tokens"),
                 F.expr("percentile(_n, 0.95)").alias("p95_tokens"),
                 F.round(F.sum("_ac") / F.sum("_c"), 6)
                  .alias("ascii_ratio"),
                 F.round(F.avg("_sr"), 6).alias("avg_stopword_ratio")))


def winnow_fingerprints(df: DataFrame, text_col: str, id_col: str,
                        k: int = 7, window: int = 16,
                        portable: bool = True) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al. 2003, the MOSS
    local fingerprinting scheme): hash every character ``k``-gram of the
    lowercased text, then keep the MINIMUM hash of each sliding window
    of ``window`` consecutive gram hashes. The selected set is position-
    independent evidence of shared substrings — the rolling-hash
    fingerprint mode of document dedup (guarantees any shared substring
    of length ``k + window - 1`` contributes a common fingerprint).

    Pure Catalyst: one projection builds the gram-hash array with array
    lambdas, one explode emits the distinct winnowed minima — no joins,
    no shuffle before the explode, ~2/(window+1) of gram hashes
    survive. ``portable=True`` hashes grams with the md5-prefix integer
    (bit-reproducible in DuckDB — the oracle surface); ``False`` uses
    xxhash64 (JVM-only, fastest). Docs shorter than ``k`` chars emit
    nothing; docs with fewer than ``window`` grams emit their single
    global minimum (the scheme's short-document convention).

    Output: (id, fp long) distinct per document.
    """
    s = F.lower(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(1), F.length(s) - (k - 1)),
        lambda p: F.substring(s, p, k))
    gram_hash = ((lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10)
                  .cast("long")) if portable
                 else (lambda g: F.xxhash64(g)))
    hs = F.transform(grams, gram_hash)
    m = F.size(F.col("_hs")) - (window - 1)
    fps = (F.when(F.size(F.col("_hs")) == 0, F.array().cast("array<long>"))
            .when(m <= 1, F.array(F.array_min(F.col("_hs"))))
            .otherwise(F.array_distinct(F.transform(
                F.sequence(F.lit(1), m),
                lambda j: F.array_min(F.slice(F.col("_hs"), j, window))))))
    return (fan_out(df, id_col)
            .filter(F.length(s) >= k)
            .select(F.col(id_col), hs.alias("_hs"))
            .select(id_col, F.explode(fps).alias("fp"))
            .distinct())


def winnow_dedup_pairs(df: DataFrame, text_col: str, id_col: str,
                       k: int = 7, window: int = 16,
                       min_shared: int = 8, max_df: int = 50,
                       portable: bool = True) -> DataFrame:
    """Document pairs sharing >= ``min_shared`` winnowed fingerprints —
    substring-level near-dup candidates (catches copied passages that
    token-shingle Jaccard dilutes away on long documents).

    Shuffle shape mirrors the MinHash-LSH pipeline: group by
    fingerprint, drop stop-fingerprints appearing in > ``max_df`` docs
    (a Zipf-hot k-gram would otherwise pair everything with
    everything — same O(df^2) guard as the shingle posting lists), and
    pair-expand the sorted posting list, so shuffle volume is
    O(docs x fingerprints), never all-pairs.

    Output: (id_a, id_b, n_shared) with id_a < id_b.
    """
    fps = winnow_fingerprints(df, text_col, id_col, k, window, portable)
    plists = (fps.groupBy("fp")
                 .agg(F.sort_array(F.collect_set(id_col)).alias("ids"))
                 .filter((F.size("ids") >= 2) & (F.size("ids") <= max_df)))
    ids = F.col("ids")
    pair_structs = F.flatten(F.transform(
        ids,
        lambda x, i: F.transform(
            F.slice(ids, i + F.lit(2), F.size(ids)),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    return (plists.select(F.explode(pair_structs).alias("p"))
                  .groupBy("p.id_a", "p.id_b")
                  .agg(F.count("*").alias("n_shared"))
                  .filter(F.col("n_shared") >= min_shared))


def char_entropy(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document Shannon entropy of the character distribution —
    the information-density quality signal (low entropy flags
    boilerplate, repeated padding, and character-spam documents; the
    cheap cousin of the compression-ratio filter used by CCNet/
    RefinedWeb-style curation, see ``compression_ratio`` for the
    zlib-backed variant).

    SHUFFLE-FREE BY SORTED RUNS: the naive plan (explode chars ->
    groupBy(doc, char)) shuffles one row per corpus CHARACTER — at
    100 TB that is the corpus itself. Instead the whole computation is
    a per-row Catalyst projection: sort the char array, find run
    boundaries with an index lambda, and fold the integer run lengths
    through ``H = log2(n) - sum(r*log2(r))/n`` (algebraically equal to
    ``-sum(p*log2 p)`` but every log argument is an exact integer, so
    both engines evaluate identical log calls; the fold order is the
    deterministic run order). Embarrassingly parallel, scales with
    partition count, zero shuffle.

    Entropy is rounded to 6 dp and signed-zero-normalized (``+ 0.0``):
    a single-character document yields exactly ``-(1*log2(1)) = -0.0``
    on BOTH engines — the r5/r6 ``embedding_covariance`` class, handled
    up front here.

    Unicode note: Spark's ``split(text, '')`` and DuckDB's
    ``string_split(text, '')`` both split at codepoint boundaries for
    BMP text (the fixture is ASCII); supplementary-plane parity is
    untested territory documented here rather than silently assumed.

    Output: (id, n_chars, n_unique_chars, entropy).
    """
    cs = F.expr(
        f"array_sort(filter(split(coalesce({text_col}, ''), ''), "
        f"c -> c != ''))")
    n = F.size(F.col("_cs"))
    # ANSI guards: every element_at index stays in [1, n] — the i-1
    # arm is dead at i=1 (Or short-circuits), and the whole branch is
    # dead at n=0 (CaseWhen evaluates lazily per row).
    bounds = F.expr(
        "CASE WHEN size(_cs) > 0 THEN "
        "concat(filter(sequence(1, size(_cs)), i -> i = 1 OR "
        "element_at(_cs, i) != element_at(_cs, i - 1)), "
        "array(size(_cs) + 1)) END")
    runs = F.expr(
        "CASE WHEN _b IS NOT NULL THEN "
        "transform(sequence(1, size(_b) - 1), "
        "j -> CAST(element_at(_b, j + 1) - element_at(_b, j) "
        "AS DOUBLE)) END")
    ent = F.expr(
        "log2(size(_cs)) - aggregate(_r, CAST(0.0 AS DOUBLE), "
        "(acc, r) -> acc + r * log2(r)) / size(_cs)")
    return (df.select(F.col(id_col), cs.alias("_cs"))
              .withColumn("_b", bounds)
              .withColumn("_r", runs)
              .select(id_col,
                      n.alias("n_chars"),
                      F.coalesce(F.size("_b") - 1, F.lit(0))
                       .alias("n_unique_chars"),
                      F.when(n > 0, F.round(ent, 6) + F.lit(0.0))
                       .alias("entropy")))


def compression_ratio(df: DataFrame, text_col: str, id_col: str,
                      level: int = 6) -> DataFrame:
    """Per-document zlib compression ratio — the RefinedWeb/CCNet-style
    redundancy signal (ratio near 1 = high-entropy prose; tiny ratio =
    templated boilerplate worth dropping before training).

    Arrow-batched ``mapInPandas`` (zlib is C-speed; the Python layer
    only loops the batch) — an acceptable non-codegen path because no
    Catalyst expression can run DEFLATE. Deterministic for a fixed
    zlib/level, but NOT oracle-twinnable (DuckDB has no zlib surface),
    so this operator is unit-gated (`tests/test_text_analysis.py`)
    rather than driver-gated — same convention as the data-dependent
    tokenizer trainers (COVERAGE.md). Use ``char_entropy`` when an
    oracle-checkable signal is required.

    Output: (id, raw_bytes, zlib_bytes, ratio) — ratio NULL for empty
    text.
    """
    import zlib
    from collections.abc import Iterator

    import pandas as pd

    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_t"))
    id_type = src.schema["id"].dataType.simpleString()

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raw, comp = [], []
            for t in pdf["_t"]:
                b = (t or "").encode("utf-8")
                raw.append(len(b))
                comp.append(len(zlib.compress(b, level)))
            yield pd.DataFrame({"id": pdf["id"], "raw_bytes": raw,
                                "zlib_bytes": comp})

    out = src.mapInPandas(
        kern, f"id {id_type}, raw_bytes long, zlib_bytes long")
    return out.select(
        "id", "raw_bytes", "zlib_bytes",
        F.when(F.col("raw_bytes") > 0,
               F.round(F.col("zlib_bytes") / F.col("raw_bytes"), 6))
         .alias("ratio"))
