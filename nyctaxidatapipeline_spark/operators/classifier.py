"""Model-based quality scoring: distributed logistic regression.

The curation step every production LLM data pipeline has that rule
features (text_analysis.quality_score) don't cover: a LEARNED quality
classifier (the fastText/CCNet "looks like reference text" model),
trained on the corpus itself and applied as a scoring projection.
fastText isn't in this container; what matters for the engine is the
DATAFLOW, which is identical for any linear model over row-local
features: an iterative full-batch gradient descent where each step is
ONE map-side-combined aggregate, and scoring/filtering is a pure
projection.

Scale shape (the reason this is Spark-first, not sklearn-on-driver):

  * each GD step computes the exact full-batch gradient as d+1 SUM
    aggregates in a single pass — partial aggregation on every
    executor, a (d+1)-double row to the driver, nothing else moves;
  * driver state is the weight vector only (d+1 doubles × iters),
    NEVER data — the same bounded-collect contract as
    ``pca.power_iteration`` (d² moments) and k-means (k·d centroids);
  * scoring is a shuffle-free projection usable inside any downstream
    filter/curation plan.

Cross-engine determinism (the PCA recipe, ``pca.py``): the z-score,
the sigmoid, the averaged gradient components, and the updated weights
are all re-rounded to ``ROUND_DP`` decimals EVERY step, so float drift
from engine-different summation orders (~1e-16/step) is snapped away
before it can compound across iterations; the DuckDB oracle unrolls
the same training loop as generated CTE pairs and reproduces the
weights bit-exactly at that precision.

Reference parity: the reference has no ML surface; this extends the
LLM-curation extension set (SURVEY §2 note on quality scoring).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: per-step re-rounding precision (see module docstring)
ROUND_DP = 9


def _z(weights: Sequence[float], feature_cols: Sequence[str]) -> Column:
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], feature_cols):
        z = z + F.lit(float(w)) * F.col(c)
    return F.round(z, ROUND_DP)


def _sigmoid(z: Column) -> Column:
    return F.round(1.0 / (1.0 + F.exp(-z)), ROUND_DP)


def logreg_train(df: DataFrame, feature_cols: Sequence[str],
                 label_col: str, iters: int = 8,
                 lr: float = 1.0) -> list[float]:
    """Full-batch gradient-descent logistic regression; returns
    ``[bias, w_1, ..., w_d]`` rounded to ``ROUND_DP``.

    ``label_col`` must be 0.0/1.0; features should be pre-scaled to
    O(1) magnitude (no internal standardization — keeping the feature
    map explicit is what lets the SQL oracle replay it). One pass over
    the data per iteration; at 100 TB swap in rows-sampled minibatches
    or L-BFGS for fewer passes — the per-pass dataflow is unchanged.
    """
    d = len(feature_cols)
    w = [0.0] * (d + 1)
    for _ in range(iters):
        err = _sigmoid(_z(w, feature_cols)) - F.col(label_col)
        aggs = [F.round(F.avg(err), ROUND_DP).alias("g0")]
        aggs += [F.round(F.avg(err * F.col(c)), ROUND_DP).alias(f"g{i+1}")
                 for i, c in enumerate(feature_cols)]
        g = df.agg(*aggs).collect()[0]
        w = [round(w[i] - lr * g[i], ROUND_DP) for i in range(d + 1)]
    return w


def logreg_score(df: DataFrame, weights: Sequence[float],
                 feature_cols: Sequence[str],
                 score_col: str = "score",
                 pred_col: str = "pred",
                 out_decimals: int = 6) -> DataFrame:
    """Append the model's probability (rounded ``out_decimals``) and the
    0/1 prediction at the 0.5 boundary — a pure projection."""
    p = _sigmoid(_z(weights, feature_cols))
    return df.withColumn(score_col, F.round(p, out_decimals)) \
             .withColumn(pred_col,
                         (p >= 0.5).cast("int"))


def quality_classifier(df: DataFrame, text_col: str, id_col: str,
                       label_expr: Column, iters: int = 8,
                       lr: float = 1.0) -> DataFrame:
    """Train-and-score in one call over row-local text features — the
    composed curation query: features (length and whitespace density,
    both O(1)-scaled), a caller-supplied boolean label expression
    (e.g. "is reference-domain text"), GD training, then scoring every
    row. Output: (id, label, score, pred).

    The feature map is deliberately tiny and SQL-replayable; swap in
    ``text_analysis`` rule features for a production-grade model — the
    training/scoring dataflow is feature-count-agnostic.
    """
    feats = (df.select(
        F.col(id_col),
        label_expr.cast("double").alias("label"),
        F.round(F.length(text_col) / 1000.0, ROUND_DP).alias("x_len"),
        F.round((F.length(text_col)
                 - F.length(F.replace(F.col(text_col), F.lit(" "),
                                      F.lit("")))) / 100.0,
                ROUND_DP).alias("x_ws")))
    w = logreg_train(feats, ["x_len", "x_ws"], "label", iters=iters,
                     lr=lr)
    return (logreg_score(feats, w, ["x_len", "x_ws"])
            .select(id_col, F.col("label").cast("int").alias("label"),
                    "score", "pred"))
