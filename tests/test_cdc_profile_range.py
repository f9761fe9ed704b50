"""Unit tests: CDC/SCD2, range join, salted join, numeric profiling."""

import datetime

from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.cdc import scd2_merge, scd2_versions
from nyctaxidatapipeline_spark.operators.joins import salted_join
from nyctaxidatapipeline_spark.operators.profile import profile_numeric
from nyctaxidatapipeline_spark.operators.rangejoin import range_join_recent


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_scd2_versions_chain(spark):
    changes = spark.createDataFrame([
        Row(k=1, ts=_ts("2024-01-01T00:00:00"), v="a"),
        Row(k=1, ts=_ts("2024-02-01T00:00:00"), v="b"),
        Row(k=2, ts=_ts("2024-01-15T00:00:00"), v="x"),
    ])
    out = scd2_versions(changes, ["k"], "ts", ["v"]).collect()
    by = {(r.k, r.v): r for r in out}
    assert by[(1, "a")].valid_to == _ts("2024-02-01T00:00:00")
    assert not by[(1, "a")].is_current
    assert by[(1, "b")].valid_to is None and by[(1, "b")].is_current
    assert by[(2, "x")].is_current


def test_scd2_versions_tiebreak_same_ts(spark):
    t = _ts("2024-01-01T00:00:00")
    changes = spark.createDataFrame([
        Row(k=1, ts=t, seq=2, v="late"),
        Row(k=1, ts=t, seq=1, v="early"),
    ])
    out = scd2_versions(changes, ["k"], "ts", ["seq", "v"],
                        tiebreak_cols=["seq"]).collect()
    by = {r.v: r for r in out}
    assert not by["early"].is_current and by["late"].is_current


def test_scd2_merge_closes_and_appends(spark):
    changes = spark.createDataFrame([
        Row(k=1, ts=_ts("2024-01-01T00:00:00"), v="a"),
        Row(k=2, ts=_ts("2024-01-01T00:00:00"), v="x"),
    ])
    current = scd2_versions(changes, ["k"], "ts", ["v"])
    updates = spark.createDataFrame([
        Row(k=1, ts=_ts("2024-03-01T00:00:00"), v="a2"),
    ])
    merged = scd2_merge(current, updates, ["k"], "ts", ["v"])
    rows = merged.collect()
    assert len(rows) == 3
    by = {(r.k, r.v): r for r in rows}
    closed = by[(1, "a")]
    assert closed.valid_to == _ts("2024-03-01T00:00:00")
    assert not closed.is_current
    assert by[(1, "a2")].is_current and by[(1, "a2")].valid_to is None
    assert by[(2, "x")].is_current  # untouched key passes through


def test_range_join_recent_window_edges(spark):
    base = _ts("2024-01-01T12:00:00")

    def off(sec):
        return base + datetime.timedelta(seconds=sec)

    left = spark.createDataFrame([Row(u=1, lid=1, lts=base)])
    right = spark.createDataFrame([
        Row(u=1, rid=10, rts=off(0)),      # same instant: in
        Row(u=1, rid=11, rts=off(-600)),   # exactly max_gap before: in
        Row(u=1, rid=12, rts=off(-601)),   # just outside: out
        Row(u=1, rid=13, rts=off(1)),      # after: out
        Row(u=2, rid=14, rts=off(-5)),     # wrong key: out
    ])
    out = range_join_recent(left, right, "u", "lts", "rts", 600)
    assert sorted(r.rid for r in out.collect()) == [10, 11]


def test_range_join_no_duplicate_pairs(spark):
    # probe side explodes into 2 buckets — each true pair must appear once
    base = _ts("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        [Row(u=1, lid=i, lts=base + datetime.timedelta(seconds=37 * i))
         for i in range(20)])
    right = spark.createDataFrame(
        [Row(u=1, rid=i, rts=base + datetime.timedelta(seconds=53 * i))
         for i in range(20)])
    out = range_join_recent(left, right, "u", "lts", "rts", 120)
    pairs = [(r.lid, r.rid) for r in out.collect()]
    assert len(pairs) == len(set(pairs))
    # cross-check against the naive definition
    lrows = {r.lid: r.lts for r in left.collect()}
    rrows = {r.rid: r.rts for r in right.collect()}
    expect = {(li, ri) for li, lt in lrows.items()
              for ri, rt in rrows.items()
              if lt - datetime.timedelta(seconds=120) <= rt <= lt}
    assert set(pairs) == expect


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [Row(k=i % 3, payload=i) for i in range(50)])
    right = spark.createDataFrame(
        [Row(k=0, name="zero"), Row(k=1, name="one"), Row(k=2, name="two")])
    salted = salted_join(left, right, "k", salt_buckets=4)
    plain = left.join(right, "k")
    assert salted.count() == plain.count() == 50
    assert (sorted(map(tuple, salted.collect()))
            == sorted(map(tuple, plain.collect())))
    assert set(salted.columns) == set(plain.columns)


def test_profile_numeric_nulls_and_stats(spark):
    df = spark.createDataFrame([
        Row(a=1.0, b=None), Row(a=2.0, b=10.0), Row(a=2.0, b=30.0)])
    out = {r["column"]: r for r in
           profile_numeric(df, ["a", "b"]).collect()}
    assert out["a"].n == 3 and out["a"].n_nulls == 0
    assert out["a"].n_distinct == 2
    assert out["a"].min_value == 1.0 and out["a"].max_value == 2.0
    assert abs(out["a"].mean_value - 5.0 / 3) < 1e-6
    assert out["b"].n_nulls == 1
    assert out["b"].mean_value == 20.0  # null-skipping mean


def test_profile_numeric_approx_mode(spark):
    df = spark.createDataFrame([Row(a=float(i)) for i in range(100)])
    row = profile_numeric(df, ["a"], approx=True).collect()[0]
    assert 80 <= row.n_distinct <= 120  # HLL estimate


def test_profile_numeric_portable_hll_mode(spark):
    """approx="hll": portable estimator replaces n_distinct with
    (est_mode, n_distinct_est), keeps the exact stats columns, and the
    estimate tracks truth at fixture cardinalities (b=12 → linear
    counting regime, near-exact). NULLs are excluded from the sketch
    (COUNT DISTINCT semantics) but counted in n_nulls."""
    df = spark.createDataFrame(
        [Row(a=float(i % 37), b=None if i % 5 == 0 else float(i))
         for i in range(200)])
    out = {r["column"]: r for r in
           profile_numeric(df, ["a", "b"], approx="hll").collect()}
    assert "n_distinct" not in out["a"].asDict()
    assert abs(out["a"].n_distinct_est - 37) <= 2
    assert out["a"].est_mode in ("linear", "raw")
    assert out["a"].n == 200 and out["a"].n_nulls == 0
    assert out["a"].min_value == 0.0 and out["a"].max_value == 36.0
    assert out["b"].n_nulls == 40
    assert abs(out["b"].n_distinct_est - 160) <= 8


def test_profile_numeric_hll_keeps_all_null_column(spark):
    """An all-NULL column has no register rows (NULL keys are dropped,
    COUNT DISTINCT semantics) — the profile row must still appear, with
    the empty sketch's principled linear-counting estimate of 0
    distinct, matching the exact mode's n_distinct=0 and the DuckDB
    twin's COALESCE'd arithmetic (est_mode='linear', 0.0)."""
    df = spark.createDataFrame(
        [Row(a=float(i), dead=None) for i in range(50)],
        "a double, dead double")
    out = {r["column"]: r for r in
           profile_numeric(df, ["a", "dead"], approx="hll").collect()}
    assert set(out) == {"a", "dead"}
    assert out["dead"].n == 50 and out["dead"].n_nulls == 50
    assert out["dead"].est_mode == "linear"
    assert out["dead"].n_distinct_est == 0.0
    assert out["dead"].min_value is None
    assert out["dead"].mean_value is None


def test_diff_tables_classification(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.cdc import diff_tables

    before = spark.createDataFrame([
        Row(k=1, v="x", w=1.0), Row(k=2, v="y", w=2.0),
        Row(k=3, v=None, w=3.0), Row(k=4, v="", w=4.0),
        Row(k=5, v="same", w=5.0)])
    after = spark.createDataFrame([
        Row(k=1, v="x2", w=1.0),          # changed value
        Row(k=3, v="", w=3.0),            # NULL -> '' must be 'changed'
        Row(k=4, v="", w=4.0),            # unchanged -> dropped
        Row(k=5, v="same", w=5.0),        # unchanged -> dropped
        Row(k=6, v="new", w=6.0)])        # added
    got = {r["k"]: r["change"]
           for r in diff_tables(before, after, ["k"], ["v", "w"]).collect()}
    assert got == {1: "changed", 2: "removed", 3: "changed", 6: "added"}


# --- MERGE INTO semantics -------------------------------------------------

def test_merge_upsert_all_clauses(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame([
        Row(k=1, v="a", n=10),    # matched, update fires
        Row(k=2, v="b", n=20),    # matched, delete fires
        Row(k=3, v="c", n=30),    # matched, neither -> keep target
        Row(k=4, v="d", n=40),    # unmatched target -> pass through
    ])
    source = spark.createDataFrame([
        Row(k=1, v="A", n=11),
        Row(k=2, v="B", n=-1),
        Row(k=3, v="C", n=30),
        Row(k=5, v="E", n=50),    # not matched -> insert
        Row(k=6, v="F", n=-6),    # not matched, insert_condition false
    ])
    out = merge_upsert(target, source, ["k"],
                       update_condition="s.n > t.n",
                       delete_condition="s.n < 0",
                       insert_condition="s.n > 0")
    got = {r.k: (r.v, r.n) for r in out.collect()}
    assert got == {1: ("A", 11),   # updated
                   3: ("c", 30),   # kept target (s.n == t.n)
                   4: ("d", 40),   # untouched
                   5: ("E", 50)}   # inserted; 2 deleted, 6 filtered


def test_merge_upsert_default_is_plain_upsert(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame([Row(k=1, v="old"), Row(k=2, v="keep")])
    source = spark.createDataFrame([Row(k=1, v="new"), Row(k=3, v="ins")])
    got = {r.k: r.v for r in
           merge_upsert(target, source, ["k"]).collect()}
    assert got == {1: "new", 2: "keep", 3: "ins"}


def test_mad_outliers_hand_computed(spark):
    # group a: values 1..9 plus a wild 1000. median of the 10 values is
    # 5.5, adevs are {4.5,3.5,2.5,1.5,.5,.5,1.5,2.5,3.5,994.5} with
    # median 2.5 -> z(1000) = .6745*994.5/2.5 = 268.3161; z(9) = .944
    # so ONLY the planted point flags at k=3.5. group b has MAD 0
    # (constant) and must flag nothing even with one deviant row far
    # from the median... (b is 5 constants + 1 deviant: median sits on
    # the constant, MAD = 0 -> skipped). NULLs are ignored, not flagged.
    from nyctaxidatapipeline_spark.operators.profile import mad_outliers

    rows = [Row(g="a", i=i, v=float(x))
            for i, x in enumerate([1, 2, 3, 4, 5, 6, 7, 8, 9, 1000])]
    rows += [Row(g="b", i=100 + i, v=5.0) for i in range(5)]
    rows += [Row(g="b", i=199, v=9999.0), Row(g="a", i=200, v=None)]
    df = spark.createDataFrame(rows)
    out = mad_outliers(df, ["g"], "v", k=3.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.g, r.i, r.v) == ("a", 9, 1000.0)
    assert r.median == 5.5 and r.mad == 2.5
    assert abs(r.robust_z - round(0.6745 * 994.5 / 2.5, 6)) < 1e-9
