"""Logistic-regression quality classifier — GD parity vs a NumPy
replication of the same rounded training loop, and sanity on
separable data (score-level values are pinned corpus-wide by the
`quality_classifier` differential oracle)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.classifier import (
    ROUND_DP,
    logreg_score,
    logreg_train,
    quality_classifier,
)


def _numpy_train(x, y, iters, lr):
    w = np.zeros(x.shape[1] + 1)
    for _ in range(iters):
        z = np.round(w[0] + x @ w[1:], ROUND_DP)
        p = np.round(1.0 / (1.0 + np.exp(-z)), ROUND_DP)
        err = p - y
        g = np.round(
            np.concatenate([[err.mean()], (err[:, None] * x).mean(0)]),
            ROUND_DP)
        w = np.round(w - lr * g, ROUND_DP)
    return w


def test_train_matches_numpy_replication(spark):
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, size=(200, 2))
    y = (x[:, 0] + 0.5 * x[:, 1] > 0).astype(float)
    df = spark.createDataFrame(
        [Row(x1=float(a), x2=float(b), label=float(l))
         for (a, b), l in zip(x, y)])
    got = logreg_train(df, ["x1", "x2"], "label", iters=6, lr=1.0)
    want = _numpy_train(x, y, iters=6, lr=1.0)
    assert np.allclose(got, want, atol=1e-9), (got, want)


def test_separable_data_classified(spark):
    # cleanly separable on one feature: after a few steps the model
    # must put the two classes on the right side of 0.5
    rows = [Row(x1=1.0 + 0.1 * i, x2=0.0, label=1.0) for i in range(20)]
    rows += [Row(x1=-1.0 - 0.1 * i, x2=0.0, label=0.0)
             for i in range(20)]
    df = spark.createDataFrame(rows)
    w = logreg_train(df, ["x1", "x2"], "label", iters=10, lr=1.0)
    out = logreg_score(df, w, ["x1", "x2"]).collect()
    assert all(r.pred == int(r.label) for r in out)
    assert all((r.score > 0.5) == (r.label == 1.0) for r in out)


def test_quality_classifier_shape_and_label(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="word " * (10 + i),
             lang="en" if i % 2 == 0 else "de") for i in range(30)])
    out = quality_classifier(docs, "text", "doc_id",
                             F.col("lang").eqNullSafe(F.lit("en")),
                             iters=3).collect()
    assert len(out) == 30
    assert {r.label for r in out} == {0, 1}
    assert all(0.0 <= r.score <= 1.0 for r in out)
    assert all(r.pred in (0, 1) for r in out)
