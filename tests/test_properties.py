"""Property-based checks (hypothesis) — SURVEY.md §5.3: cleaning
invariants, bucket edges, guarded-ratio NULL arms, tokenizer parity with
Python semantics, fingerprint parity with hashlib.

Few examples per property (each example is a Spark round-trip); the
generators bias toward the edges that matter (nulls, zeros, bucket
boundaries, empty/whitespace strings).
"""

import bisect
import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.functions import bucketize, guarded_ratio
from nyctaxidatapipeline_spark.functions.text import token_count, tokens
from nyctaxidatapipeline_spark.operators.cleaning import drop_null_rows

_EDGES = [1.0, 3.0, 5.0, 10.0]
_LABELS = ["a", "b", "c", "d"]

maybe_float = st.one_of(
    st.none(),
    st.floats(min_value=-100, max_value=100, allow_nan=False),
    st.sampled_from([0.0, 1.0, 3.0, 5.0, 10.0]))   # bucket boundaries


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(maybe_float, maybe_float), min_size=1, max_size=20))
def test_dropna_invariants(spark, rows):
    df = spark.createDataFrame(
        [Row(a=a, b=b) for a, b in rows], schema="a double, b double")
    cleaned = drop_null_rows(df)
    expected = [r for r in rows if r[0] is not None and r[1] is not None]
    got = cleaned.collect()
    assert len(got) == len(expected)           # count matches oracle
    assert len(got) <= len(rows)               # monotone non-increasing
    assert all(r.a is not None and r.b is not None for r in got)


@settings(max_examples=5, deadline=None)
@given(st.lists(st.floats(min_value=-5, max_value=50, allow_nan=False)
                 .map(lambda x: round(x, 3)), min_size=1, max_size=20))
def test_bucketize_matches_bisect(spark, values):
    df = spark.createDataFrame([Row(v=float(v)) for v in values])
    got = [r[0] for r in df.select(
        bucketize("v", _EDGES, _LABELS, "z")).collect()]
    # strict < upper edges == bisect_right index semantics
    expected = [(_LABELS + ["z"])[bisect.bisect_right(_EDGES, v)]
                for v in values]
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(
    st.floats(min_value=-10, max_value=10, allow_nan=False),
    st.floats(min_value=-10, max_value=10, allow_nan=False)),
    min_size=1, max_size=20))
def test_guarded_ratio_null_iff_nonpositive_denominator(spark, pairs):
    df = spark.createDataFrame(
        [Row(n=n, d=d) for n, d in pairs], schema="n double, d double")
    got = [r[0] for r in df.select(guarded_ratio("n", "d")).collect()]
    for (n, d), g in zip(pairs, got):
        if d > 0:
            # equality arm covers inf (subnormal denominators overflow to
            # inf identically in Spark and Python; inf - inf is nan)
            assert g is not None and (g == n / d or abs(g - n / d) < 1e-9)
        else:
            assert g is None


text_strategy = st.text(
    alphabet=st.sampled_from("ab XY \t\n.!é"), max_size=40)


@settings(max_examples=5, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=15))
def test_token_count_matches_python_split(spark, texts):
    df = spark.createDataFrame([Row(t=t) for t in texts],
                               schema="t string")
    got = [r[0] for r in df.select(token_count("t")).collect()]
    # python str.split() == whitespace-split-drop-empties == our contract
    assert got == [len(t.lower().split()) for t in texts]


@settings(max_examples=5, deadline=None)
@given(st.lists(text_strategy, min_size=1, max_size=10))
def test_md5_fingerprint_matches_hashlib(spark, texts):
    df = spark.createDataFrame([Row(t=t) for t in texts],
                               schema="t string")
    got = [r[0] for r in df.select(
        F.md5(F.concat_ws(" ", tokens("t"))).alias("f")).collect()]
    expected = [hashlib.md5(" ".join(t.lower().split()).encode()).hexdigest()
                for t in texts]
    assert got == expected


@settings(max_examples=5, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["a", "b", "c"]),
                          st.integers(min_value=0, max_value=500)),
                min_size=1, max_size=3, unique_by=lambda t: t[0]))
def test_temperature_mix_quota_invariants(spark, sizes):
    """For ANY source-size profile: each source contributes at most its
    population; quotas never exceed the flattened proportions' budget;
    alpha=1 keeps (almost) everything."""
    from nyctaxidatapipeline_spark.operators.sampling import (
        temperature_mix,
    )

    rows, nid = [], 0
    for s, n in sizes:
        for _ in range(n):
            rows.append(Row(doc_id=nid, src=s))
            nid += 1
    if not rows:
        return
    df = spark.createDataFrame(rows)
    out = temperature_mix(df, "src", "doc_id", alpha=0.5)
    got = {r[0]: r[1] for r in out.groupBy("src").count().collect()}
    pop = {s: n for s, n in sizes if n > 0}
    assert set(got) <= set(pop)
    for s, k in got.items():
        assert k <= pop[s]
    # without-replacement: picked ids are unique and from the input
    picked = [r.doc_id for r in out.collect()]
    assert len(picked) == len(set(picked)) <= nid
    nat = temperature_mix(df, "src", "doc_id", alpha=1.0).count()
    assert nat >= sum(pop.values()) - len(pop)  # floor loses < 1/source
