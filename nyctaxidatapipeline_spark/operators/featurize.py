"""Feature hashing (the "hashing trick") for categorical columns.

High-cardinality categoricals (user ids, domains, event names) can't be
one-hot encoded at 100 TB — the vocabulary itself would be a giant
shuffled dictionary that every executor must hold. The hashing trick
(Weinberger et al. 2009, and sklearn's ``FeatureHasher``) replaces the
dictionary with a pure function: ``index = hash(column_name + ':' +
value) % n_buckets``. No vocabulary build, no shuffle, no state — a
narrow projection that is append-stable and identical on every engine.

Portability: same md5 scheme as ``sampling.hash_bucket`` (first 8 hex
chars → bigint), with the column name as salt so equal values in
different columns land independently. The DuckDB twin is
``('0x' || substr(md5('col:' || value), 1, 8))::BIGINT % n``.

The reference (colinthekkinedath/nyctaxidatapipeline) has no
featurization surface; this extends the training-data toolkit the same
way ``sampling``/``packing`` do.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.operators.sampling import hash_bucket


def hashed_feature(col_name: str, n_buckets: int = 1024,
                   value: Column | None = None) -> Column:
    """Bucket index for one categorical column (NULL value → NULL)."""
    v = F.col(col_name) if value is None else value
    salted = F.concat(F.lit(col_name + ":"), v.cast("string"))
    return F.when(v.isNotNull(), hash_bucket(salted, n_buckets))


def feature_hash(df: DataFrame, cols: Sequence[str],
                 n_buckets: int = 1024,
                 out_col: str = "features") -> DataFrame:
    """Adds ``out_col`` = array<int> of hashed indices, one per input
    column (in ``cols`` order) — the row's sparse feature vector.
    Shuffle-free narrow map."""
    return df.withColumn(
        out_col, F.array(*[hashed_feature(c, n_buckets) for c in cols]))


def bucket_collision_profile(df: DataFrame, cols: Sequence[str],
                             n_buckets: int = 1024) -> DataFrame:
    """(bucket, n_rows, n_values): occupancy and collision census of
    the hashed feature space — n_values > 1 means distinct raw
    (column, value) pairs share the bucket, i.e. genuine hashing-trick
    collisions.

    One explode of k structs per row + one aggregate (map-side
    combined; at most ``n_buckets`` groups reach the shuffle).
    Rows with NULL in a column contribute nothing for that column.
    """
    entries = F.array(*[
        F.struct(hashed_feature(c, n_buckets).alias("bucket"),
                 F.concat(F.lit(c + ":"),
                          F.col(c).cast("string")).alias("val"))
        for c in cols])
    return (df
            .select(F.explode(entries).alias("e"))
            .filter(F.col("e.bucket").isNotNull())
            .groupBy(F.col("e.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.countDistinct("e.val").alias("n_values")))
