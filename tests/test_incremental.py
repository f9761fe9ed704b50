"""Incremental aggregate maintenance: merge identity + avg-of-avgs trap."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nyctaxidatapipeline_spark.operators.incremental import (
    finalize,
    merge_partials,
    partial_agg,
)


def _rows(spark):
    return spark.createDataFrame([
        Row(k="a", v=1.0), Row(k="a", v=2.0), Row(k="a", v=30.0),
        Row(k="b", v=5.0), Row(k="b", v=None),
    ])


def test_merge_identity_any_split(spark):
    df = _rows(spark)
    direct = {tuple(r) for r in finalize(
        partial_agg(df, ["k"], "v")).collect()}
    # unequal split (the avg-of-avgs killer: batch sizes 1 and 4)
    b0, b1 = df.limit(1), df.subtract(df.limit(1))
    merged = {tuple(r) for r in finalize(merge_partials(
        [partial_agg(b0, ["k"], "v"), partial_agg(b1, ["k"], "v")],
        ["k"])).collect()}
    assert merged == direct
    # associativity: merging a merged state with a third empty state
    empty = partial_agg(df.filter("v < -999"), ["k"], "v")
    merged2 = {tuple(r) for r in finalize(merge_partials(
        [merge_partials([partial_agg(b0, ["k"], "v")], ["k"]),
         partial_agg(b1, ["k"], "v"), empty], ["k"])).collect()}
    assert merged2 == direct


def test_finalize_null_group(spark):
    df = spark.createDataFrame([Row(k="z", v=None)],
                               schema="k string, v double")
    out = finalize(partial_agg(df, ["k"], "v")).collect()[0]
    assert out["n"] == 0 and out["avg_v"] is None and out["sum_v"] is None


def test_merge_requires_state(spark):
    with pytest.raises(ValueError, match="at least one"):
        merge_partials([], ["k"])
