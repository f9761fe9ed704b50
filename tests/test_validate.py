"""Data-quality validation: one-pass rule evaluation + quarantine split."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.validate import enforce, validate


def _df(spark):
    return spark.createDataFrame([
        Row(x=1, y="a"), Row(x=-2, y="b"), Row(x=3, y=None),
        Row(x=None, y="d"),
    ])


def test_validate_counts_and_null_semantics(spark):
    out = {r["rule"]: r for r in validate(_df(spark), {
        "x_positive": F.col("x") > 0,          # -2 fails, NULL fails
        "y_set": F.col("y").isNotNull(),       # one NULL
        "always": F.lit(True),
    }).collect()}
    assert out["x_positive"]["n_violations"] == 2   # NULL counts as fail
    assert out["y_set"]["n_violations"] == 1
    assert out["always"]["n_violations"] == 0
    assert all(r["n_rows"] == 4 for r in out.values())
    assert out["x_positive"]["pass_rate"] == 0.5
    with pytest.raises(ValueError, match="at least one rule"):
        validate(_df(spark), {})


def test_validate_single_job(spark):
    """All rules ride ONE aggregate: exactly one Aggregate in the plan."""
    out = validate(_df(spark), {f"r{i}": F.col("x") > i for i in range(10)})
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 1


def test_enforce_quarantine(spark):
    kept = enforce(_df(spark), {
        "x_positive": F.col("x") > 0,
        "y_set": F.col("y").isNotNull(),
    }).collect()
    assert [(r["x"], r["y"]) for r in kept] == [(1, "a")]
