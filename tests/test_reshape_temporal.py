"""Unit tests: pivot/melt/cube/percentiles/distinct + sessionize/as-of."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.reshape import (
    cube_agg,
    distinct_counts,
    grouped_percentiles,
    melt,
    pivot_agg,
)
from nyctaxidatapipeline_spark.operators.temporal import (
    asof_join,
    session_stats,
    sessionize,
)


def _sales(spark):
    return spark.createDataFrame([
        Row(flag="A", status="O", qty=1.0, key=10),
        Row(flag="A", status="F", qty=2.0, key=11),
        Row(flag="A", status="O", qty=3.0, key=10),
        Row(flag="B", status="F", qty=4.0, key=12)])


def test_pivot_agg(spark):
    got = {r.flag: (r.qty_O, r.qty_F) for r in pivot_agg(
        _sales(spark), "flag", "status", ["O", "F"], "qty",
        prefix="qty_").collect()}
    assert got == {"A": (4.0, 2.0), "B": (None, 4.0)}


def test_melt_roundtrip(spark):
    wide = spark.createDataFrame([Row(flag="A", qty=4.0, price=7.0)])
    rows = {(r.flag, r.measure): r.val
            for r in melt(wide, ["flag"], ["qty", "price"]).collect()}
    assert rows == {("A", "qty"): 4.0, ("A", "price"): 7.0}


def test_cube_granularities(spark):
    out = cube_agg(_sales(spark), ["flag", "status"],
                   [F.count("*").alias("n")])
    rows = {(r.flag, r.status): r.n for r in out.collect()}
    assert rows[(None, None)] == 4          # grand total
    assert rows[("A", None)] == 3           # per-flag roll
    assert rows[(None, "O")] == 2           # per-status roll
    assert rows[("A", "O")] == 2            # leaf


def test_grouped_percentiles_interpolation(spark):
    df = spark.createDataFrame([Row(g="x", v=float(i)) for i in range(1, 5)])
    row = grouped_percentiles(df, ["g"], "v", (0.5,), mode="exact").collect()[0]
    assert row.p50 == 2.5
    approx = grouped_percentiles(df, ["g"], "v", (0.5,),
                                 mode="approx").collect()[0]
    assert 1.0 <= approx.p50 <= 4.0


def test_distinct_counts_modes(spark):
    df = _sales(spark)
    exact = distinct_counts(df, ["flag"], "key", mode="exact").collect()
    assert {r.flag: r.n_distinct_key for r in exact} == {"A": 2, "B": 1}
    approx = distinct_counts(df, ["flag"], "key", mode="approx").collect()
    assert all(r.n_distinct_key >= 1 for r in approx)


def _ts(minute):
    return dt.datetime(2024, 1, 1, 0, 0) + dt.timedelta(minutes=minute)


def test_sessionize_gap(spark):
    df = spark.createDataFrame([
        Row(u=1, ts=_ts(0)), Row(u=1, ts=_ts(10)),   # session 1
        Row(u=1, ts=_ts(60)),                         # gap 50min > 30min
        Row(u=2, ts=_ts(5))])
    got = {(r.u, r.ts): r.session_id
           for r in sessionize(df, ["u"], "ts", 1800).collect()}
    assert got == {(1, _ts(0)): 1, (1, _ts(10)): 1, (1, _ts(60)): 2,
                   (2, _ts(5)): 1}
    stats = {(r.u, r.session_id): r.n_events
             for r in session_stats(df, ["u"], "ts", 1800).collect()}
    assert stats == {(1, 1): 2, (1, 2): 1, (2, 1): 1}


def test_sessionize_boundary_exact_gap_continues(spark):
    # gap EXACTLY equal to gap_seconds does not start a new session (>).
    df = spark.createDataFrame([Row(u=1, ts=_ts(0)), Row(u=1, ts=_ts(30))])
    got = [r.session_id for r in sessionize(df, ["u"], "ts", 1800).collect()]
    assert got == [1, 1]


def test_asof_join_backward_inclusive(spark):
    left = spark.createDataFrame([
        Row(id=1, u=1, ts=_ts(10), x=1.0),
        Row(id=2, u=1, ts=_ts(5), x=2.0),    # exactly at right ts
        Row(id=3, u=1, ts=_ts(1), x=3.0),    # before any right row
        Row(id=4, u=2, ts=_ts(50), x=4.0)])  # user with no right rows
    right = spark.createDataFrame([
        Row(u=1, ts=_ts(5), v=100.0), Row(u=1, ts=_ts(8), v=200.0)])
    out = {r.id: (r.asof_ts, r.asof_v) for r in asof_join(
        left, right, ["u"], "ts", "ts", ["v"]).collect()}
    assert out[1] == (_ts(8), 200.0)   # latest right <= ts
    assert out[2] == (_ts(5), 100.0)   # inclusive at equality
    assert out[3] == (None, None)      # nothing before
    assert out[4] == (None, None)      # key absent on right


def test_resample_fills_gaps_and_ffill(spark):
    from datetime import datetime

    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.temporal import (
        forward_fill,
        resample,
    )

    rows = [
        Row(k="a", ts=datetime(2024, 1, 1, 0, 30), v=1.0),
        Row(k="a", ts=datetime(2024, 1, 1, 3, 10), v=2.0),   # 2h gap
        Row(k="b", ts=datetime(2024, 1, 1, 1, 0), v=5.0),
    ]
    df = spark.createDataFrame(rows)
    out = forward_fill(resample(df, "ts", "k", "hour", "v"),
                       ["k"], "bucket", ["sum_v"])
    got = {(r["k"], r["bucket"].hour): (r["n_events"], r["sum_v"],
                                        r["sum_v_ffill"])
           for r in out.collect()}
    # grid spans hours 0..3 for BOTH keys (shared corpus span)
    assert len(got) == 8
    assert got[("a", 1)] == (0, None, 1.0)     # gap: zero count, ffill
    assert got[("a", 2)] == (0, None, 1.0)
    assert got[("a", 3)] == (1, 2.0, 2.0)
    assert got[("b", 0)] == (0, None, None)    # before first value
    assert got[("b", 1)] == (1, 5.0, 5.0)
    assert got[("b", 3)] == (0, None, 5.0)


def test_resample_rejects_unknown_unit(spark):
    import pytest
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.temporal import resample

    from datetime import datetime

    df = spark.createDataFrame(
        [Row(k="a", ts=datetime(2024, 1, 1), v=1.0)])
    with pytest.raises(ValueError, match="unsupported unit"):
        resample(df, "ts", "k", "fortnight")


def test_heavy_hitters_approx_superset_of_exact(spark):
    from nyctaxidatapipeline_spark.operators.reshape import heavy_hitters
    from nyctaxidatapipeline_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    exact = {r["value"]
             for r in heavy_hitters(ev, "event_type", 0.05).collect()}
    approx = {r["value"] for r in
              heavy_hitters(ev, "event_type", 0.05,
                            mode="approx").collect()}
    assert exact, "fixture should have >=1 heavy event_type"
    # KPS sketch guarantee: no false negatives at the support threshold
    assert exact <= approx
    # exact shares really are shares
    rows = heavy_hitters(ev, "event_type", 0.05).collect()
    assert all(r["share"] >= 0.05 for r in rows)


def test_heavy_hitters_approx_empty_and_typed(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.reshape import heavy_hitters

    # empty input: freqItems returns no candidates and the result must
    # be an EMPTY typed frame, not a schema-inference crash.
    df = spark.createDataFrame([Row(x=1)]).filter("x < 0")
    out = heavy_hitters(df, "x", min_share=0.5, mode="approx")
    assert out.count() == 0
    assert out.schema["value"].dataType == df.schema["x"].dataType


def test_correlations_pairs_and_guard(spark):
    import pytest
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.profile import correlations

    df = spark.createDataFrame(
        [Row(a=float(i), b=2.0 * i, c=float(-i)) for i in range(10)])
    out = {(r["col_a"], r["col_b"]): r["corr"]
           for r in correlations(df, ["a", "b", "c"]).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")] == 1.0 and out[("a", "c")] == -1.0
    with pytest.raises(ValueError, match="at least 2"):
        correlations(df, ["a"])


def test_funnel_requires_strict_order(spark):
    import datetime as dt

    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.temporal import funnel_counts

    t0 = dt.datetime(2024, 1, 1)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # u1 completes the whole funnel in order
        Row(u=1, e="view", ts=ts(0)), Row(u=1, e="click", ts=ts(1)),
        Row(u=1, e="buy", ts=ts(2)),
        # u2 clicked BEFORE viewing -> stops at step 1
        Row(u=2, e="click", ts=ts(0)), Row(u=2, e="view", ts=ts(1)),
        # u3 views only
        Row(u=3, e="view", ts=ts(0)),
        # u4 never views -> not even step 1
        Row(u=4, e="buy", ts=ts(0)),
        # u5 out-of-order first click but a LATER click qualifies
        Row(u=5, e="click", ts=ts(0)), Row(u=5, e="view", ts=ts(1)),
        Row(u=5, e="click", ts=ts(2)),
    ]
    out = {r["step"]: r["n_users"]
           for r in funnel_counts(spark.createDataFrame(rows), "u", "e",
                                  "ts", ["view", "click", "buy"]).collect()}
    assert out == {"view": 4, "click": 2, "buy": 1}


def test_histogram_modes(spark):
    from nyctaxidatapipeline_spark.operators.reshape import histogram

    df = spark.createDataFrame([Row(x=float(i)) for i in range(100)])
    ew = {r["bin"]: r for r in histogram(df, "x", bins=10).collect()}
    assert sum(r["n"] for r in ew.values()) == 100
    assert len(ew) == 10 and ew[0]["lo"] == 0.0 and ew[9]["hi"] == 99.0
    assert ew[9]["n"] == 10  # max value closed into last bin
    ed = {r["bin"]: r for r in
          histogram(df, "x", bins=4, mode="equidepth").collect()}
    assert [ed[b]["n"] for b in sorted(ed)] == [25, 25, 25, 25]
    assert ed[1]["lo"] == 0.0 and ed[2]["lo"] == 25.0  # NTILE: 1-indexed
    assert ed[4]["hi"] == 99.0
    # deterministic under repartition
    ed2 = {r["bin"]: (r["lo"], r["hi"], r["n"]) for r in
           histogram(df.repartition(7), "x", bins=4,
                     mode="equidepth").collect()}
    assert ed2 == {b: (r["lo"], r["hi"], r["n"]) for b, r in ed.items()}
    # degenerate: constant column collapses into bin 0
    const = spark.createDataFrame([Row(x=5.0)] * 8)
    rows = histogram(const, "x", bins=10).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 8
    import pytest

    with pytest.raises(ValueError, match="unknown mode"):
        histogram(df, "x", mode="bogus")


def test_equidepth_histogram_sketch(spark):
    """VERDICT r13 task 8: the registered equidepth shape carries NO
    window operator at all (the NTILE mode's whole-corpus
    single-partition sort stays interactive/test-oracle only) — edges
    come from the bounded hash sample, binning is a broadcast HOF
    projection, counts one small aggregate."""
    import pytest

    from nyctaxidatapipeline_spark.operators.reshape import (
        equidepth_histogram_sketch,
        histogram,
    )
    from nyctaxidatapipeline_spark.plans import explain_str

    df = (spark.read
               .parquet("/root/testdata/sf0.001/lineitem.parquet")
               .select("l_orderkey", "l_linenumber", "l_partkey",
                       "l_extendedprice"))
    rank = ["l_orderkey", "l_linenumber", "l_partkey"]
    out = equidepth_histogram_sketch(df, "l_extendedprice", rank,
                                     bins=4)
    plan = explain_str(out)
    assert "Window" not in plan, plan          # no window op anywhere
    assert "ntile" not in plan.lower(), plan
    rows = {r["bin"]: r for r in out.collect()}
    total = df.count()
    assert sum(r["n"] for r in rows.values()) == total
    assert sorted(rows) == [1, 2, 3, 4]
    # bins are equal-count up to edge sampling error; at sf0.001 the
    # sample IS the whole column (n < k), so edges are the exact
    # quantiles and each bin is within one tie-group of total/4
    for r in rows.values():
        assert abs(r["n"] - total / 4) < total * 0.05, rows
    # bin bounds tile the observed range in order
    assert rows[1]["lo"] == df.agg(F.min("l_extendedprice")).first()[0]
    assert rows[4]["hi"] == df.agg(F.max("l_extendedprice")).first()[0]
    for b in (1, 2, 3):
        assert rows[b]["hi"] < rows[b + 1]["lo"]
    # n < k: sampled edges equal the exact NTILE mode's bucket maxima
    exact = {r["bin"]: r for r in
             histogram(df, "l_extendedprice", bins=4,
                       mode="equidepth").collect()}
    assert [exact[b]["n"] for b in sorted(exact)] == \
        [rows[b]["n"] for b in sorted(rows)]
    with pytest.raises(ValueError, match="bins"):
        equidepth_histogram_sketch(df, "l_extendedprice", rank, bins=1)


def test_cohort_retention_triangle(spark):
    import pytest

    from nyctaxidatapipeline_spark.operators.temporal import (
        cohort_retention,
    )

    d0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        Row(u=1, ts=d0), Row(u=1, ts=d0 + dt.timedelta(days=1)),
        Row(u=1, ts=d0 + dt.timedelta(days=1, hours=3)),  # same period
        Row(u=2, ts=d0), Row(u=2, ts=d0 + dt.timedelta(days=2)),
        Row(u=3, ts=d0 + dt.timedelta(days=1)),            # later cohort
    ]
    out = {(r["cohort"].day, r["period_offset"]): r["n_active"]
           for r in cohort_retention(spark.createDataFrame(rows),
                                     "u", "ts", unit="day").collect()}
    # day-1 cohort: 2 users at offset 0; u1 returns day2, u2 day3
    assert out[(1, 0)] == 2 and out[(1, 1)] == 1 and out[(1, 2)] == 1
    # day-2 cohort: u3 only
    assert out[(2, 0)] == 1
    assert len(out) == 4
    with pytest.raises(ValueError, match="unsupported unit"):
        cohort_retention(spark.createDataFrame(rows), "u", "ts", "decade")


class TestTimeRangeAgg:
    """windows.time_range_agg — trailing time-based RANGE frame."""

    def test_window_population(self, spark):
        import datetime as dt

        from nyctaxidatapipeline_spark.operators.windows import (
            time_range_agg,
        )
        base = dt.datetime(2024, 1, 1)
        rows = [("u", base + dt.timedelta(seconds=s), float(v))
                for s, v in [(0, 1), (1800, 2), (3600, 3), (7201, 4)]]
        df = spark.createDataFrame(rows, "u string, ts timestamp, v double")
        got = {r["ts"].second + r["ts"].minute * 60 + r["ts"].hour * 3600:
               (r["v_3600s_n"], r["v_3600s_avg"])
               for r in time_range_agg(df, ["u"], "ts", "v").collect()}
        assert got[0] == (1, 1.0)
        assert got[1800] == (2, 1.5)
        assert got[3600] == (3, 2.0)      # [0, 3600] inclusive
        assert got[7201] == (1, 4.0)      # 3600 fell out of [3601, 7201]

    def test_same_second_peers_symmetric(self, spark):
        import datetime as dt

        from nyctaxidatapipeline_spark.operators.windows import (
            time_range_agg,
        )
        t = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [("u", t, 10.0), ("u", t, 20.0)],
            "u string, ts timestamp, v double")
        got = [(r["v_3600s_n"], r["v_3600s_avg"])
               for r in time_range_agg(df, ["u"], "ts", "v").collect()]
        assert got == [(2, 15.0), (2, 15.0)]


def test_ewma_head_renormalization_and_decay(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.temporal import ewma

    df = spark.createDataFrame(
        [Row(k="a", t=1, v=10.0), Row(k="a", t=2, v=20.0),
         Row(k="a", t=3, v=None), Row(k="a", t=4, v=40.0),
         Row(k="b", t=1, v=5.0)])
    got = {(r.k, r.t): r.ewma
           for r in ewma(df, "v", "t", ["k"], window=3).collect()}
    assert got[("a", 1)] == 10.0                        # head = own value
    assert got[("a", 2)] == round((20 + 10 * 0.5) / 1.5, 6)
    # t=3: current NULL -> renormalize over lags 1,2
    assert got[("a", 3)] == round((20 * 0.5 + 10 * 0.25) / 0.75, 6)
    assert got[("a", 4)] == round((40 + 20 * 0.25) / 1.25, 6)
    assert got[("b", 1)] == 5.0                         # keys independent
    import pytest
    with pytest.raises(ValueError):
        ewma(df, "v", "t", ["k"], window=0)
