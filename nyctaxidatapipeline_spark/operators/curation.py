"""End-to-end corpus curation: the C4/Dolma-style pipeline as one
composition of this engine's operators.

A training-data user runs a fixed recipe over raw documents: rule
filters (length / quality / repetition), PII redaction, line-level
dedup, exact dedup, fuzzy dedup — in that order (cheap row-local rules
first so the expensive shuffling stages see the smallest corpus).
``curation_flags`` is the decision surface (every rule's verdict per
document, differential-oracle-checkable); ``curate_corpus`` applies the
whole recipe and returns the surviving, redacted, line-deduped corpus.

Stage order and costs (100 TB lens):
  1. flags        — row-local projections + two per-doc aggregates
                    (quality is pure projection; repetition is the
                    two-shuffle per-doc n-gram profile); keep-rate
                    typically halves the corpus before anything heavy.
  2. pii_redact   — row-local regexp_replace, no shuffle.
  3. line dedup   — corpus-wide first-occurrence window on md5(line).
  4. exact dedup  — normalized fingerprint groupBy (min-id winner).
  5. fuzzy dedup  — MinHash LSH pairs → connected components →
                    drop non-representatives. Bucketed, never all-pairs.
All stages are deterministic pure functions of the input set, so the
composite itself replays byte-identically on any cluster layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.dedup import (
    dedup_keep_representatives,
    minhash_lsh_pairs,
)
from nyctaxidatapipeline_spark.operators.lines import dedup_lines
from nyctaxidatapipeline_spark.operators.text_analysis import (
    fingerprint_dedup,
    pii_redact,
)


def curation_flags(df: DataFrame, text_col: str, id_col: str,
                   min_tokens: int = 30,
                   min_quality: float = 0.3,
                   max_dup_frac: float = 0.08,
                   carry: dict[str, "F.Column"] | None = None) -> DataFrame:
    """Per-document rule verdicts + the combined keep decision.

    Output: (id, n_tokens, quality_score, dup_ngram_frac, has_pii,
    ok_length, ok_quality, ok_repetition, keep). Documents too short to
    have n-grams pass ``ok_repetition`` vacuously (the length rule is
    the one that judges them). ``has_pii`` is informational — the
    pipeline REDACTS rather than drops (the Dolma convention).

    ONE row-local projection, zero shuffles: every rule surface
    (quality, repetition, PII) is a per-document expression, built from
    the same ``_quality_exprs``/``_repetition_exprs``/``_pii_flag``
    Columns the standalone operators use — the previous shape joined
    three separate scans of the corpus on the id (two shuffle joins +
    the old repetition explode-aggregate pair) to compute what one
    projection can.

    ``carry`` appends extra computed columns (name -> Column over the
    input row) to the output — the fusion hook ``curate_corpus`` uses
    to materialize the redacted text in the SAME pass as the verdicts,
    so the pipeline never rescans the raw corpus.
    """
    from nyctaxidatapipeline_spark.functions.text import shingles, tokens
    from nyctaxidatapipeline_spark.operators.text_analysis import (
        _pii_flag,
        _quality_exprs,
        _repetition_exprs,
    )

    q = _quality_exprs(text_col)
    r = _repetition_exprs()
    dup = F.when(F.size("_sh") > 0, r["dup_ngram_frac"])
    ok_length = q["n_tokens"] >= min_tokens
    ok_quality = q["quality_score"] >= min_quality
    ok_repetition = F.coalesce(dup <= max_dup_frac, F.lit(True))
    extra = [c.alias(name) for name, c in (carry or {}).items()]
    return (df.withColumn("_tk", tokens(text_col))
              .withColumn("_sh", shingles(F.col("_tk"), 2))
              .select(id_col,
                      q["n_tokens"].alias("n_tokens"),
                      q["quality_score"].alias("quality_score"),
                      dup.alias("dup_ngram_frac"),
                      _pii_flag(text_col).alias("has_pii"),
                      ok_length.alias("ok_length"),
                      ok_quality.alias("ok_quality"),
                      ok_repetition.alias("ok_repetition"),
                      (ok_length & ok_quality & ok_repetition)
                      .alias("keep"),
                      *extra))


def curate_corpus(df: DataFrame, text_col: str, id_col: str,
                  min_tokens: int = 30,
                  min_quality: float = 0.3,
                  max_dup_frac: float = 0.08,
                  min_dedup_line_len: int = 10,
                  jaccard_threshold: float = 0.5,
                  max_bucket: int | None = 32) -> DataFrame:
    """Run the full curation recipe; returns (id, text) survivors.

    Filters by ``curation_flags``, redacts PII, line-dedups across the
    kept corpus, then drops exact (normalized-fingerprint) and fuzzy
    (MinHash-LSH, portable hash family) duplicates, keeping the min-id
    representative of every duplicate group.

    ``max_bucket`` (default 32) is the LSH overfull-bucket backstop —
    PART of this pipeline's semantics, mirrored in its oracle twin:
    the exact (fingerprint) stage collapses byte-identical copies, but
    NEAR-duplicate hot classes (boilerplate differing by a counter
    token) survive it and expand quadratically in uncapped LSH buckets
    — measured 213 s at sf10 (100-near-copy classes) where every other
    stage of this pipeline is linear. Band buckets above the cap emit
    no candidate pairs (their members are kept rather than deduped — a
    recall decision, deliberately conservative). ``None`` restores the
    uncapped pairing.
    """
    from nyctaxidatapipeline_spark.operators.text_analysis import (
        _pii_redact_expr,
    )

    # The checkpoint below is a PUSHDOWN BARRIER, not (only) a reuse
    # cache: filtering the flags projection directly lets Catalyst push
    # the `keep` predicate beneath the _tk/_sh projections, inlining
    # the full rule expression (with its interpreted array lambdas,
    # which get no common-subexpression reuse) into a non-codegen
    # Filter — measured 8x slower than just materializing the flags
    # and filtering the result. The REDACTED text rides along in the
    # same pass (the `carry` hook): stages 1+2 fuse into one corpus
    # scan, removing the raw-corpus rescan and the kept-ids semi-join
    # the previous shape paid. Redacting a to-be-dropped doc costs one
    # short-circuiting rlike (the guard in _pii_redact_expr), far less
    # than a second scan of everything.
    flags = (curation_flags(df, text_col, id_col, min_tokens,
                            min_quality, max_dup_frac,
                            carry={"_red": _pii_redact_expr(text_col)})
             .localCheckpoint(eager=False))
    redacted = (flags.filter("keep")
                .select(id_col, F.col("_red").alias(text_col)))
    # Materialize the stage boundaries that downstream consumers read
    # twice (fingerprinting + uniq both read `lined`; the LSH pairs and
    # the final keep-reps anti-join both read `uniq`) — without the
    # checkpoint, lazy evaluation replays the whole upstream
    # flags→redact→line-dedup chain per consumer.
    lined = (dedup_lines(redacted, text_col, id_col,
                         min_dedup_len=min_dedup_line_len)
             .select(id_col, text_col)
             .localCheckpoint(eager=False))
    exact_reps = (fingerprint_dedup(lined, text_col, id_col)
                  .select(id_col))
    uniq = (lined.join(exact_reps, id_col, "left_semi")
                 .localCheckpoint(eager=False))
    # reuse_shingles: the LSH signature and verification paths share
    # one materialized (id, shingle) frame instead of each re-running
    # tokenize+explode+distinct over `uniq` — a SMALL-corpus win
    # (~0.5 s of the 4.6 s sf0.1 wall) that inverts at scale (the
    # checkpoint write grows linearly with a bigger constant than the
    # codegen recompute; see near_dup_production's measured 43.6 vs
    # 29.1 s at sf10), so it gates on the input scan's stat-able size.
    from nyctaxidatapipeline_spark.plans.util import input_scan_bytes

    nbytes = input_scan_bytes(df)
    pairs = minhash_lsh_pairs(uniq, text_col, id_col, n=3,
                              threshold=jaccard_threshold, portable=True,
                              reuse_shingles=(nbytes is not None
                                              and nbytes < 32 << 20),
                              max_bucket=max_bucket)
    return dedup_keep_representatives(uniq, pairs, id_col)
