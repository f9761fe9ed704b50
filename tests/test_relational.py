"""Unit tests: joins, windows, set ops (SURVEY.md §2.5-2.8 gap operators)."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.joins import (
    anti_join,
    dim_join,
    salted_join,
    semi_join,
    star_join,
)
from nyctaxidatapipeline_spark.operators.setops import (
    except_distinct,
    intersect_distinct,
    union_all,
    union_distinct,
)
from nyctaxidatapipeline_spark.operators.windows import (
    running_sum,
    top_k_global,
    top_k_per_group,
    with_lag,
)


def _facts(spark):
    return spark.createDataFrame([
        Row(k=1, v=10.0), Row(k=1, v=20.0), Row(k=2, v=5.0), Row(k=3, v=1.0)])


def _dim(spark):
    return spark.createDataFrame([Row(k=1, name="a"), Row(k=2, name="b")])


def test_dim_join_broadcast_in_plan(spark):
    out = dim_join(_facts(spark), _dim(spark), "k")
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
    assert out.count() == 3  # k=3 has no dim row


def test_salted_join_matches_plain_join(spark):
    facts, dim = _facts(spark), _dim(spark)
    for how in ("inner", "left"):
        plain = sorted(map(tuple, facts.join(dim, "k", how).collect()))
        salted = sorted(map(tuple,
                            salted_join(facts, dim, "k", salt_buckets=4,
                                        how=how).collect()))
        assert salted == plain


def test_salted_join_rejects_right_and_full(spark):
    import pytest

    # right/full would duplicate unmatched right rows once per salt value
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join does not support"):
            salted_join(_facts(spark), _dim(spark), "k", how=how)


def test_semi_and_anti(spark):
    f, d = _facts(spark), _dim(spark)
    assert semi_join(f, d, "k").count() == 3
    assert [r.k for r in anti_join(f, d, "k").collect()] == [3]
    # semi never duplicates: dim with repeated keys
    d2 = union_all(d, d)
    assert semi_join(f, d2, "k").count() == 3


def test_star_join_chain(spark):
    f = spark.createDataFrame([Row(a=1, b=10), Row(a=2, b=20)])
    d1 = spark.createDataFrame([Row(a=1, x="p"), Row(a=2, x="q")])
    d2 = spark.createDataFrame([Row(b=10, y="r")])
    out = star_join(f, [(d1, "a"), (d2, "b")])
    rows = out.collect()
    assert len(rows) == 1 and rows[0].x == "p" and rows[0].y == "r"


def test_top_k_per_group_ties_deterministic(spark):
    df = spark.createDataFrame([
        Row(g=1, v=5.0, id=1), Row(g=1, v=5.0, id=2), Row(g=1, v=3.0, id=3),
        Row(g=2, v=9.0, id=4)])
    out = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id").asc()],
                          k=2, desc=False)
    got = {(r.g, r.id): r.rn for r in out.collect()}
    assert got == {(1, 1): 1, (1, 2): 2, (2, 4): 1}


def test_top_k_global_take_ordered(spark):
    out = top_k_global(_facts(spark), ["v"], k=2)
    assert [r.v for r in out.collect()] == [20.0, 10.0]
    assert "TakeOrderedAndProject" in \
        out._jdf.queryExecution().executedPlan().toString()


def test_lag_and_running_sum(spark):
    df = spark.createDataFrame([
        Row(g="a", t=1, v=1.0), Row(g="a", t=2, v=2.0), Row(g="a", t=3, v=4.0)])
    lag = {r.t: r.v_lag for r in with_lag(df, ["g"], "t", "v").collect()}
    assert lag == {1: None, 2: 1.0, 3: 2.0}
    run = {r.t: r.v_running for r in running_sum(df, ["g"], "t", "v").collect()}
    assert run == {1: 1.0, 2: 3.0, 3: 7.0}


def test_set_ops(spark):
    a = spark.createDataFrame([Row(x=1), Row(x=1), Row(x=2)])
    b = spark.createDataFrame([Row(x=2), Row(x=3)])
    assert union_all(a, b).count() == 5
    assert sorted(r.x for r in union_distinct(a, b).collect()) == [1, 2, 3]
    assert sorted(r.x for r in except_distinct(a, b).collect()) == [1]
    assert sorted(r.x for r in intersect_distinct(a, b).collect()) == [2]
