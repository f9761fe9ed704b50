"""Plan-level helpers: oracle-comparison normalization and plan inspection."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def round_doubles(df: DataFrame, ndigits: int = 6) -> DataFrame:
    """Round every DoubleType/FloatType column to ``ndigits``.

    Floating-point aggregation is order-sensitive; Spark sums partitions in
    shuffle order while the DuckDB oracle sums sequentially, so raw double
    aggregates can differ in the last few ulps. The differential harness
    rounds BOTH sides to the same precision (oracle SQL uses
    ``ROUND(x, n)``), making the value-hash comparison deterministic while
    still catching real errors (1e-6 ≪ any semantic difference).
    """
    cols = []
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            cols.append(F.round(F.col(f.name).cast("double"), ndigits).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def fan_out(df: DataFrame, *key_cols: str) -> DataFrame:
    """Widen a narrow scan to the cluster's parallelism before CPU-heavy
    per-row work (regex tokenize, shingle explode, per-vector math).

    A small parquet input (one row group) plans as ONE task, serializing
    e.g. tokenization on a single core while the other 31 idle. The
    shuffle this inserts moves only the raw input bytes — trivial next to
    the downstream explode/hash work — and when the scan already has
    >= defaultParallelism partitions (any real-scale input) it is an
    exact no-op, so the 100 TB plan is unchanged. Hash-partitioning on
    ``key_cols`` (when given) keeps the placement deterministic across
    retries, unlike round-robin ``repartition()``.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # Cheap width probe first: for file-backed plans (every production
    # call site — fan_out wraps freshly-scanned corpora), the file list
    # bounds scan parallelism from below, and listing it only walks the
    # logical plan. The old probe (df.rdd.getNumPartitions()) forced a
    # FULL analysis + physical-planning pass through the RDD conversion
    # path on every call — pure driver overhead, paid again at
    # execution. Non-file plans (in-memory test frames) still fall back
    # to the RDD probe to keep the no-op guarantee exact.
    files = df.inputFiles()
    n_parts = (len(files) if files
               else df.rdd.getNumPartitions())
    if n_parts >= target:
        return df
    if key_cols:
        return df.repartition(target, *[F.col(c) for c in key_cols])
    return df.repartition(target)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode)
