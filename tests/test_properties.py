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
def test_tokens_codegen_equals_python_split(spark, texts):
    """The codegen tokens() (whitespace-class-trim + plain split — no
    interpreted HOF filter) equals Python's str.split() contract on
    arbitrary whitespace-heavy text, including tab/newline-only and
    whitespace-bounded strings (the class the first cut got wrong)."""
    df = spark.createDataFrame([Row(t=t) for t in texts],
                               schema="t string")
    got = [r[0] for r in df.select(tokens("t")).collect()]
    assert got == [t.lower().split() for t in texts]


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


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(min_codepoint=32,
                                               max_codepoint=0x2603),
                        max_size=60),
                min_size=1, max_size=8))
def test_char_entropy_bounds_and_reference(spark, texts):
    """0 <= H <= log2(n_unique); exact match with a direct
    -sum(p log2 p) Python reference on arbitrary BMP strings."""
    import math
    from collections import Counter

    from nyctaxidatapipeline_spark.operators.text_analysis import (
        char_entropy,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = {r.doc_id: r for r in char_entropy(df, "text", "doc_id").collect()}
    for i, t in enumerate(texts):
        r = got[i]
        assert r.n_chars == len(t)
        assert r.n_unique_chars == len(set(t))
        if not t:
            assert r.entropy is None
            continue
        n = len(t)
        ref = -sum((c / n) * math.log2(c / n)
                   for c in Counter(t).values())
        assert r.entropy == round(ref, 6) + 0.0
        # 6-dp output rounding can land up to 5e-7 above the true bound
        assert 0.0 <= r.entropy <= math.log2(max(len(set(t)), 1)) + 5e-7


@settings(max_examples=5, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=500),
                min_size=1, max_size=60))
def test_hll_registers_reference_parity(spark, keys):
    """Arbitrary key multisets: distributed registers == the Python
    reference sketch (duplicates collapse, order irrelevant)."""
    import hashlib as _hl

    from nyctaxidatapipeline_spark.operators.sketches import hll_registers

    df = spark.createDataFrame([Row(g="p", k=k) for k in keys])
    got = {r.bucket: r.M
           for r in hll_registers(df, F.col("k"), ["g"], b=6).collect()}
    want = {}
    for k in set(keys):
        h = int(_hl.md5(str(k).encode()).hexdigest()[:8], 16)
        b_, w = h % 64, h // 64
        rho = (27 - w.bit_length()) if w > 0 else 27
        want[b_] = max(want.get(b_, 0), rho)
    assert got == want


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                min_size=1, max_size=50))
def test_cms_dominance_property(spark, keys):
    """For every key in the corpus: CMS estimate >= exact count."""
    from collections import Counter

    from nyctaxidatapipeline_spark.operators.sketches import (
        cms_counters,
        cms_lookup,
    )

    df = spark.createDataFrame([Row(k=k) for k in keys])
    counters = cms_counters(df, F.col("k"), w=16, d=3)
    exact = Counter(keys)
    got = {r.key: r.est_count
           for r in cms_lookup(spark, counters, sorted(exact),
                               w=16, d=3).collect()}
    assert all(got[k] >= c for k, c in exact.items())
