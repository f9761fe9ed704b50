"""TFRecord shard ingestion/export — the TensorFlow/JAX input format.

Completes the training-export triangle next to compressed JSONL
(``sources/compressed.py``) and WebDataset tars
(``sources/webdataset.py``): pack rows into framed
``tf.train.Example`` shard blobs and stream them back out, both
directions running on the pure-stdlib codec in
``functions/tfrecord.py`` (record framing with masked-CRC32C
verification; deterministic sorted-key proto encoding).

Scale shape (the same story as the sibling sources):
  * The SHARD is the unit of parallelism — TFRecord files are not
    splittable mid-stream (records are length-prefixed, but an
    arbitrary byte offset is not a record boundary), so corpora ship
    many-sharded and file-level parallelism carries the read.
  * Packing/unpacking runs in Arrow-batched ``applyInPandas`` /
    ``mapInPandas``; anything typed (hashing, filtering, projections)
    happens JVM-side on the decoded columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.functions.tfrecord import (
    decode_example,
    encode_example,
    frame_records,
    unframe_records,
)

__all__ = ["tfrecord_shards", "read_tfrecord_shards",
           "decode_examples", "write_tfrecord_shards"]


def _py(v):
    """numpy/pandas value -> plain Python value for the proto writer.
    Arrays/lists become Python lists (multi-valued features — e.g. a
    pretokenized sequence's ``array<int>`` ids column encodes as a
    packed Int64List); scalars unwrap via ``.item()``."""
    if isinstance(v, (list, tuple)):
        return [_py(x) for x in v]
    if hasattr(v, "tolist"):  # numpy array OR numpy scalar
        return v.tolist()
    if hasattr(v, "item"):
        return v.item()
    return v


def tfrecord_shards(df: DataFrame, id_col: str,
                    feature_cols: list[str],
                    docs_per_shard: int = 10_000) -> DataFrame:
    """Pack rows into deterministic TFRecord shard blobs — (shard_id,
    content, n_records, n_bytes). One ``tf.train.Example`` per row
    holding ``id_col`` plus ``feature_cols`` (ints → Int64List,
    strings/bytes → BytesList, floats → FloatList); rows sort by id
    inside the shard and sharding is ``id DIV docs_per_shard`` —
    order-independent, range-contiguous, shard bytes a pure function
    of the data (sorted-key proto + deterministic framing)."""
    if docs_per_shard < 1:
        raise ValueError("docs_per_shard must be >= 1")
    cols = [id_col] + [c for c in feature_cols if c != id_col]
    shard_key = F.expr(f"CAST({id_col} AS BIGINT) DIV {docs_per_shard}")
    # Explicit-width repartition on the shard key (PLANS.md #20): the
    # groupBy reuses the partitioning and — because a user-specified
    # width is exempt from AQE coalescing — the Python proto/framing
    # stage runs at cluster parallelism even when the shuffled bytes
    # are small enough that AQE would serialize them onto one task.
    target = df.sparkSession.sparkContext.defaultParallelism
    src = (df.repartition(target, shard_key)
             .select(shard_key.alias("_shard"), *cols))

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, ignore_index=True)
        recs = [encode_example({c: _py(row[c]) for c in cols})
                for _, row in pdf.iterrows()]
        blob = frame_records(recs)
        return pd.DataFrame({"shard_id": [int(pdf["_shard"].iloc[0])],
                             "content": [blob],
                             "n_records": [len(recs)],
                             "n_bytes": [len(blob)]})

    return src.groupBy("_shard").applyInPandas(
        build,
        "shard_id long, content binary, n_records long, n_bytes long")


def read_tfrecord_shards(shards: DataFrame,
                         content_col: str = "content",
                         shard_col: str = "shard_id") -> DataFrame:
    """Explode TFRecord shard blobs into one row per record —
    (shard_id, rec_no, example binary) with both frame checksums
    verified per record. Decode the proto with
    ``functions.tfrecord.decode_example`` in a downstream typed stage
    (or any TFRecord consumer — the bytes are the standard format)."""
    src = shards.select(shard_col, content_col)
    stype = src.schema[shard_col].dataType.simpleString()

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf[shard_col], pdf[content_col]):
                if blob is None:
                    continue
                for i, rec in enumerate(unframe_records(bytes(blob))):
                    rows.append({"shard_id": sid, "rec_no": i,
                                 "example": rec})
            yield pd.DataFrame(rows,
                               columns=["shard_id", "rec_no", "example"])

    return src.mapInPandas(
        gen, f"shard_id {stype}, rec_no int, example binary")


def decode_examples(records: DataFrame, schema: dict[str, str],
                    example_col: str = "example") -> DataFrame:
    """Decode an ``example`` binary column to typed columns.
    ``schema`` maps feature name -> 'long' | 'string' | 'binary' |
    'double' (single-valued features; multi-valued lists stay a
    downstream concern). Carries every other input column through."""
    carry = [c for c in records.columns if c != example_col]
    out_fields = ", ".join([f"{c} {records.schema[c].dataType.simpleString()}"
                            for c in carry]
                           + [f"{k} {t}" for k, t in schema.items()])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                feats = decode_example(bytes(row[example_col]))
                rec = {c: row[c] for c in carry}
                for k, t in schema.items():
                    vals = feats.get(k, [])
                    v = vals[0] if vals else None
                    if v is not None and t == "string":
                        v = v.decode("utf-8")
                    elif v is not None and t == "double":
                        v = float(v)
                    rec[k] = v
                rows.append(rec)
            yield pd.DataFrame(rows, columns=list(carry) + list(schema))

    return records.mapInPandas(gen, out_fields)


def write_tfrecord_shards(df: DataFrame, path: str, id_col: str,
                          feature_cols: list[str],
                          docs_per_shard: int = 10_000) -> None:
    """Materialize :func:`tfrecord_shards` as
    ``{path}/shard-NNNNNN.tfrecord`` files — executors write their
    shards directly, no driver collect; standard TFRecord files any
    TensorFlow/JAX loader consumes.

    ``path`` must be a SHARED filesystem (NFS/FUSE mount or single
    node): shards are written with plain ``open()`` inside
    ``foreachPartition``, so on a multi-node cluster without a shared
    mount each executor writes only its own shards locally and the
    directory is complete on no single node (``os.makedirs`` runs on
    the driver only — same contract as the sibling JSONL/WebDataset
    writers). For object stores, collect the ``tfrecord_shards``
    frame's blobs through a distributed committer instead."""
    import os

    os.makedirs(path, exist_ok=True)
    shards = tfrecord_shards(df, id_col, feature_cols, docs_per_shard)

    def dump(rows) -> None:
        for r in rows:
            name = f"shard-{r['shard_id']:06d}.tfrecord"
            with open(os.path.join(path, name), "wb") as f:
                f.write(bytes(r["content"]))

    shards.foreachPartition(dump)
