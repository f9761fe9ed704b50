"""Sequence packing (distributed prefix sum) + corpus line dedup +
vocabulary counting."""

import pytest

from nyctaxidatapipeline_spark.operators.lines import dedup_lines
from nyctaxidatapipeline_spark.operators.packing import (
    distributed_prefix_sum,
    pack_sequences,
    packed_doc_spans,
    with_token_count,
)
from nyctaxidatapipeline_spark.operators.text_analysis import (
    term_frequencies,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- packing

def test_prefix_sum_matches_naive(spark):
    vals = [(i, (7 * i + 3) % 11) for i in range(200)]
    df = spark.createDataFrame(vals, "id long, v long")
    got = {r.id: r.prefix_sum
           for r in distributed_prefix_sum(df, "v", "id").collect()}
    acc = 0
    for i, v in vals:
        acc += v
        assert got[i] == acc


@pytest.mark.parametrize("n_buckets", [1, 3, 64, 1000])
def test_prefix_sum_invariant_to_bucket_count(spark, n_buckets):
    # Exactness must not depend on the bucketing (any monotone bucketing
    # of the order column yields the same prefix sums) — including more
    # buckets than rows and a single bucket.
    df = spark.createDataFrame([(i, i % 5) for i in range(50)],
                               "id long, v long")
    base = {(r.id, r.prefix_sum)
            for r in distributed_prefix_sum(df, "v", "id").collect()}
    got = {(r.id, r.prefix_sum)
           for r in distributed_prefix_sum(
               df.repartition(7), "v", "id", n_buckets=n_buckets)
           .collect()}
    assert got == base


def test_prefix_sum_sparse_nonuniform_order_keys(spark):
    # Equi-width bucketing over a skewed id space (clustered + outlier)
    # must still be exact — skew affects balance, never values.
    vals = [(1, 1), (2, 1), (3, 1), (4, 1), (1_000_000, 1)]
    df = spark.createDataFrame(vals, "id long, v long")
    got = {r.id: r.prefix_sum
           for r in distributed_prefix_sum(df, "v", "id", n_buckets=4)
           .collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 1_000_000: 5}


def test_pack_sequences_concat_and_chunk(spark):
    # docs of 3/4/5 tokens, budget 4: offsets 0,3,7 -> seqs 0,0,1.
    df = _docs(spark, [(1, "a b c"), (2, "a b c d"), (3, "a b c d e")])
    out = {r.doc_id: r for r in
           pack_sequences(with_token_count(df, "text"), "n_tokens",
                          "doc_id", budget=4).collect()}
    assert (out[1].start_global, out[1].seq_id, out[1].seq_offset) == (0, 0, 0)
    assert (out[2].start_global, out[2].seq_id, out[2].seq_offset) == (3, 0, 3)
    assert (out[3].start_global, out[3].seq_id, out[3].seq_offset) == (7, 1, 3)


def test_doc_spans_partition_documents_exactly(spark):
    # Spans of each doc must tile its token range: contiguous, within
    # budget, summing to n_tokens; a 10-token doc at offset 3 with
    # budget 4 spans seqs 0..3.
    df = _docs(spark, [(1, "a b c"), (2, " ".join(["x"] * 10))])
    spans = (packed_doc_spans(with_token_count(df, "text"), "n_tokens",
                              "doc_id", budget=4)
             .orderBy("doc_id", "seq_id").collect())
    doc2 = [r for r in spans if r.doc_id == 2]
    assert [r.seq_id for r in doc2] == [0, 1, 2, 3]
    assert sum(r.span_len for r in doc2) == 10
    assert doc2[0].span_start == 0
    for a, b in zip(doc2, doc2[1:]):
        assert b.span_start == a.span_start + a.span_len
    assert all(1 <= r.span_len <= 4 for r in spans)


def test_doc_spans_empty_doc_emits_nothing(spark):
    df = _docs(spark, [(1, ""), (2, "a b")])
    spans = packed_doc_spans(with_token_count(df, "text"), "n_tokens",
                             "doc_id", budget=4).collect()
    assert {r.doc_id for r in spans} == {2}


# ------------------------------------------------------------- line dedup

def test_dedup_lines_keeps_first_occurrence_only(spark):
    boiler = "subscribe to our newsletter"
    df = _docs(spark, [
        (1, f"unique alpha line\n{boiler}"),
        (2, f"{boiler}\nunique beta line"),
        (3, boiler),
    ])
    out = {r.doc_id: r for r in
           dedup_lines(df, "text", "doc_id", min_dedup_len=10).collect()}
    assert out[1].text == f"unique alpha line\n{boiler}"
    assert out[2].text == "unique beta line"
    assert out[3].text == ""          # fully boilerplate doc survives, empty
    assert (out[3].n_lines, out[3].n_lines_removed) == (1, 1)
    assert (out[2].n_lines, out[2].n_lines_removed) == (2, 1)


def test_dedup_lines_short_lines_exempt(spark):
    df = _docs(spark, [(1, "ok\nfine"), (2, "ok\nfine")])
    out = {r.doc_id: r.text for r in
           dedup_lines(df, "text", "doc_id", min_dedup_len=10).collect()}
    assert out == {1: "ok\nfine", 2: "ok\nfine"}


def test_dedup_lines_no_dups_round_trips_text(spark):
    # split('\n') + ordered reassembly must be byte-exact when nothing is
    # removed — including empty interior and trailing lines.
    texts = ["a single doc line\n\nwith a blank and trailing\n",
             "another doc entirely different here"]
    df = _docs(spark, list(enumerate(texts)))
    out = {r.doc_id: r.text for r in
           dedup_lines(df, "text", "doc_id").collect()}
    assert out == dict(enumerate(texts))


# ------------------------------------------------------------------ vocab

def test_term_frequencies_counts_and_min_count(spark):
    df = _docs(spark, [(1, "the cat the hat"), (2, "the dog"),
                       (3, "cat")])
    out = {r.token: (r.freq, r.doc_freq) for r in
           term_frequencies(df, "text", "doc_id").collect()}
    assert out["the"] == (3, 2)
    assert out["cat"] == (2, 2)
    assert out["hat"] == (1, 1)
    filtered = {r.token for r in
                term_frequencies(df, "text", "doc_id", min_count=2)
                .collect()}
    assert filtered == {"the", "cat"}


# --- document chunking (RAG windows) -------------------------------------

def test_chunk_documents_windows(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.packing import (
        chunk_documents,
    )
    df = spark.createDataFrame([
        Row(doc_id=1, text=" ".join(f"w{i}" for i in range(10))),
        Row(doc_id=2, text="a b"),        # shorter than one chunk
        Row(doc_id=3, text="   "),        # zero tokens -> no chunks
    ])
    got = sorted(
        chunk_documents(df, "text", "doc_id",
                        chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r.doc_id, r.chunk_id))
    assert [(r.doc_id, r.chunk_id, r.n_tokens, r.chunk_text)
            for r in got] == [
        (1, 0, 4, "w0 w1 w2 w3"),
        (1, 1, 4, "w3 w4 w5 w6"),   # stride 3: starts 0,3,6,9
        (1, 2, 4, "w6 w7 w8 w9"),
        (1, 3, 1, "w9"),            # short tail, not padded
        (2, 0, 2, "a b"),
    ]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.packing import (
        chunk_documents,
    )
    df = spark.createDataFrame([Row(doc_id=1, text="a b")])
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, "text", "doc_id", chunk_tokens=4, overlap=4)


def _sd(spark, rows, min_gram=4):
    from nyctaxidatapipeline_spark.operators.lines import substring_dedup

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r
            for r in substring_dedup(df, "text", "doc_id",
                                     min_gram=min_gram).collect()}


def test_substring_dedup_removes_second_occurrence(spark):
    boiler = "all rights reserved by the site"   # 6 tokens
    got = _sd(spark, [(1, f"alpha beta {boiler} gamma"),
                      (2, f"delta {boiler} epsilon zeta"),
                      (3, "totally unrelated text here")], min_gram=6)
    # first occurrence (doc 1) keeps the run; doc 2 loses exactly it
    assert got[1]["text"] == f"alpha beta {boiler} gamma"
    assert got[1]["n_tokens_removed"] == 0
    assert got[2]["text"] == "delta epsilon zeta"
    assert got[2]["n_tokens_removed"] == 6
    assert got[3]["n_tokens_removed"] == 0


def test_substring_dedup_merges_overlapping_spans(spark):
    # a 6-token duplicated run with min_gram=4 flags 3 overlapping
    # 4-gram spans in doc 2 -> ONE merged span of 6 tokens (distinct
    # pre/post context so no gram straddles the run boundary)
    run = "one two three four five six"
    got = _sd(spark, [(1, f"p1 q1 r1 s1 {run} t1 u1 v1 w1"),
                      (2, f"p2 q2 r2 s2 {run} t2 u2 v2 w2")], min_gram=4)
    assert got[2]["text"] == "p2 q2 r2 s2 t2 u2 v2 w2"
    assert got[2]["n_tokens_removed"] == 6
    assert got[1]["n_tokens_removed"] == 0


def test_substring_dedup_short_docs_survive(spark):
    got = _sd(spark, [(1, "tiny doc"), (2, "tiny doc"), (3, "")],
              min_gram=4)
    # below min_gram: no grams, nothing removed, text canonicalized
    assert got[1]["text"] == "tiny doc" and got[2]["text"] == "tiny doc"
    assert got[3]["text"] == "" and got[3]["n_tokens"] == 0


def test_substring_dedup_within_doc_repetition(spark):
    run = "la la la la"  # NOT self-overlapping ambiguity: distinct run
    got = _sd(spark, [(1, "start a b c d end again a b c d close")],
              min_gram=4)
    assert got[1]["text"] == "start a b c d end again close"
    assert got[1]["n_tokens_removed"] == 4


def test_substring_dedup_repartition_invariant(spark):
    from nyctaxidatapipeline_spark.operators.lines import substring_dedup
    from nyctaxidatapipeline_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    a = sorted(map(tuple,
                   substring_dedup(docs, "text", "doc_id", 8).collect()))
    b = sorted(map(tuple,
                   substring_dedup(docs.repartition(13), "text",
                                   "doc_id", 8).collect()))
    assert a == b


def test_c4_line_filter_rules(spark):
    from nyctaxidatapipeline_spark.operators.lines import c4_line_filter

    docs = [
        # 0: two good lines + one unpunctuated + one short -> kept
        (0, "this line has plenty of words here.\n"
            "no terminal punctuation so it drops\n"
            "too short.\n"
            'quoted line with exactly five words"'),
        # 1: JavaScript mention kills the line, page falls below min
        (1, "please enable JavaScript to view this.\n"
            "another good line with enough words."),
        # 2: brace kills the whole page even with good lines
        (2, "a perfectly fine line with words. { }"),
        # 3: lorem ipsum kills the page, case-folded
        (3, "Lorem Ipsum dolor sit amet consectetur."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.id: r for r in
           c4_line_filter(df, "text", "doc_id", min_words=5,
                          min_lines=2).collect()}
    assert out[0].kept and out[0].n_kept == 2 and out[0].n_total == 4
    assert out[0].clean_text == (
        "this line has plenty of words here.\n"
        'quoted line with exactly five words"')
    assert not out[1].kept and out[1].n_kept == 1  # js line dropped
    assert not out[2].kept and out[2].clean_text == ""
    assert not out[3].kept

    # punct requirement toggles off: doc 0's unpunctuated line now kept
    loose = {r.id: r for r in
             c4_line_filter(df, "text", "doc_id", min_words=5,
                            min_lines=2,
                            require_terminal_punct=False).collect()}
    assert loose[0].n_kept == 3


def test_c4_line_filter_plan_is_python_free(spark):
    from nyctaxidatapipeline_spark.operators.lines import c4_line_filter
    from nyctaxidatapipeline_spark.plans import explain_str

    df = spark.createDataFrame([(1, "x.")], "doc_id long, text string")
    plan = explain_str(c4_line_filter(df, "text", "doc_id"), "simple")
    assert "Python" not in plan and "Exchange" not in plan


def test_pretokenized_sequences_hand_computed(spark):
    """Tiny corpus, every value hand-derived: vocab ids by (count DESC,
    token) — a=0, b=1, c=2 — stream [0,1,0 | 2,0,1], budget 4 →
    seq0 = [0,1,0,2], seq1 = [0,1] (final partial kept)."""
    import hashlib

    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.packing import (
        pretokenized_sequences,
        vocab_ids,
    )

    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b a"),
        Row(doc_id=1, text="c a b")])
    vids = {r.tok: (r.n, r.tid) for r in
            vocab_ids(docs, "text", "doc_id").collect()}
    assert vids == {"a": (3, 0), "b": (2, 1), "c": (1, 2)}
    got = {r.seq_id: (r.n_ids, r.ids_md5) for r in
           pretokenized_sequences(docs, "text", "doc_id",
                                  budget=4).collect()}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert got == {0: (4, md5("0,1,0,2")), 1: (2, md5("0,1"))}
    # repartition-invariant (pure function of the data + order)
    again = {r.seq_id: (r.n_ids, r.ids_md5) for r in
             pretokenized_sequences(docs.repartition(7), "text",
                                    "doc_id", budget=4).collect()}
    assert again == got


def test_pretokenized_export_tfrecord_roundtrip(spark):
    """The FULL export loop: pretokenized id sequences (payload='ids')
    packed into TFRecord shards, unframed and proto-decoded back — the
    exact ids of every sequence survive the wire format."""
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.functions.tfrecord import (
        decode_example,
        unframe_records,
    )
    from nyctaxidatapipeline_spark.operators.packing import (
        pretokenized_sequences,
    )
    from nyctaxidatapipeline_spark.sources.tfrecord import tfrecord_shards

    docs = spark.createDataFrame([
        Row(doc_id=0, text="a b a c d"),
        Row(doc_id=1, text="c a b b e f")])
    seqs = pretokenized_sequences(docs, "text", "doc_id", budget=4,
                                  payload="ids")
    want = {r.seq_id: list(r.ids) for r in seqs.collect()}
    assert sorted(want) == [0, 1, 2]
    assert sum(len(v) for v in want.values()) == 11
    shards = tfrecord_shards(seqs, "seq_id", ["ids"],
                             docs_per_shard=2).collect()
    got = {}
    for r in shards:
        for rec in unframe_records(bytes(r.content)):
            ex = decode_example(rec)
            got[ex["seq_id"][0]] = ex["ids"]
    assert got == want
