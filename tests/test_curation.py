"""End-to-end corpus curation — every stage of the composite recipe
exercised by a crafted corpus (flag rules are additionally pinned by the
`curation_flags` differential oracle)."""

from __future__ import annotations

from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.curation import (
    curate_corpus,
    curation_flags,
)

GOOD = ("the quick brown fox jumps over the lazy dog and it runs far "
        "away to the old barn, where it sleeps for a while; later it "
        "wakes up and eats some food. then the fox walks to the river "
        "and drinks a lot of water for the long day ahead of it now.")
PII = ("a short story of the market: it opened early and the traders "
       "came in for the morning rush, and a clerk wrote every trade in "
       "the big ledger. for questions the desk said to contact "
       "me@example.com during the day, and that was it for the week.")
# 40 distinct gibberish tokens: long enough, zero stopwords/punct ->
# fails ONLY the quality rule (dup_ngram_frac is 0)
GIBBERISH = " ".join(f"zq{i}wv" for i in range(40))


def _corpus(spark):
    rows = [
        Row(doc_id=0, text=GOOD),                          # keeper
        Row(doc_id=1, text="too short"),                   # length drop
        Row(doc_id=2, text="spam " * 60),                  # repetition drop
        Row(doc_id=3, text=PII),                           # keeper, PII
        Row(doc_id=4, text=GOOD.upper()),                  # exact dup of 0
                                                           # (normalized)
        Row(doc_id=5, text=GOOD.replace("fox", "cat")),    # fuzzy dup of 0
        Row(doc_id=6, text=GIBBERISH),                     # quality drop
    ]
    return spark.createDataFrame(rows)


def test_flags_per_rule(spark):
    flags = {r["doc_id"]: r for r in
             curation_flags(_corpus(spark), "text", "doc_id").collect()}
    assert flags[0]["keep"] and flags[3]["keep"]
    assert not flags[1]["ok_length"]
    assert not flags[2]["ok_repetition"]
    assert not flags[6]["ok_quality"]
    assert flags[3]["has_pii"] and not flags[0]["has_pii"]
    # short doc: repetition is vacuous, length judges it
    assert flags[1]["ok_repetition"] and flags[1]["dup_ngram_frac"] is not None


def test_curate_corpus_end_to_end(spark):
    out = {r["doc_id"]: r["text"]
           for r in curate_corpus(_corpus(spark), "text",
                                  "doc_id").collect()}
    # rule drops: 1 (short), 2 (repetitive), 6 (quality)
    # dup drops: 4 (exact dup of 0 after normalization), 5 (fuzzy dup,
    #            min-id representative 0 survives)
    assert set(out) == {0, 3}
    # PII was redacted, not dropped
    assert "[EMAIL]" in out[3] and "me@example.com" not in out[3]
    # survivor text intact
    assert out[0] == GOOD


def test_curate_deterministic_under_repartition(spark):
    df = _corpus(spark)
    a = sorted(curate_corpus(df, "text", "doc_id").collect())
    b = sorted(curate_corpus(df.repartition(7), "text",
                             "doc_id").collect())
    assert a == b
