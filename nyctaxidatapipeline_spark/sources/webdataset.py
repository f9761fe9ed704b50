"""WebDataset tar-shard ingestion — the multimodal training-data layout.

Large image/text training corpora ship as numbered ``.tar`` shards
whose members pair up by basename: ``000123.jpg`` + ``000123.txt`` +
``000123.json`` form ONE sample (the WebDataset convention used by
LAION-scale pipelines). The shard — not the sample — is the unit of
storage and of parallelism: a 100 TB corpus is ~100k x ~1 GB tars, so
a distributed read is ~100k independent tasks with zero shuffle until
samples are regrouped.

Implementation is stdlib-only (``tarfile`` over an in-memory buffer —
same discipline as ``wave`` for WAV and ``zlib`` for the WARC gzip
members). Synthesis pins mtime/uid/gid to zero in USTAR format so
shard bytes are deterministic (replayable fixtures for the
differential oracle).

Emitted frame is LONG (one row per member): ``shard_id, sample_key,
ext, member_index, payload``. Sample regrouping (key-join of a
sample's members) happens JVM-side downstream — a groupBy on
``sample_key`` — so the Python stage stays a pure streaming untar.
"""

from __future__ import annotations

import io
import tarfile
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "synth_shard",
    "parse_shard",
    "read_webdataset",
    "webdataset_shards",
    "write_webdataset",
    "WEBDATASET_SCHEMA",
]

#: Schema of the member frame emitted by :func:`read_webdataset`
#: (``shard_id`` inherits the input column's type).
WEBDATASET_SCHEMA = (
    "shard_id {shard_id_type}, sample_key string, ext string, "
    "member_index int, payload binary"
)


def synth_shard(samples: Sequence[tuple[str, dict[str, bytes]]]) -> bytes:
    """Build one deterministic WebDataset tar shard: for each
    ``(key, {ext: payload})`` sample, one member per extension named
    ``{key}.{ext}`` (sample members adjacent, exts in sorted order —
    the convention real writers follow so a streaming reader can group
    without buffering the shard)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w",
                      format=tarfile.USTAR_FORMAT) as tar:
        for key, members in samples:
            for ext in sorted(members):
                payload = members[ext]
                info = tarfile.TarInfo(name=f"{key}.{ext}")
                info.size = len(payload)
                info.mtime = 0
                info.uid = info.gid = 0
                info.uname = info.gname = ""
                tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def parse_shard(data: bytes) -> list[tuple[str, str, bytes]]:
    """Stream one shard's members as ``(sample_key, ext, payload)``.
    The key/ext split is the WebDataset rule: key = name up to the
    FIRST dot, ext = everything after it (so ``x.seg.png`` pairs with
    ``x.txt`` under key ``x``). Directories and non-file members are
    skipped; a member with no dot gets ext ''."""
    out = []
    with tarfile.open(fileobj=io.BytesIO(data)) as tar:
        for info in tar:
            if not info.isfile():
                continue
            name = info.name.rsplit("/", 1)[-1]
            key, _, ext = name.partition(".")
            fh = tar.extractfile(info)
            out.append((key, ext, fh.read() if fh else b""))
    return out


def read_webdataset(shards: DataFrame, content_col: str = "content",
                    shard_col: str = "shard_id") -> DataFrame:
    """Explode ``(shard_id, content)`` tar blobs into one row per
    member (:data:`WEBDATASET_SCHEMA`). Arrow-batched ``mapInPandas``,
    parallelism = shards, no shuffle; payloads stay binary so column
    pruning drops them when a consumer only reads metadata."""
    src = shards.select(shard_col, content_col)
    schema = WEBDATASET_SCHEMA.format(
        shard_id_type=src.schema[shard_col].dataType.simpleString())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf[shard_col], pdf[content_col]):
                if blob is None:
                    continue
                for i, (key, ext, payload) in enumerate(
                        parse_shard(bytes(blob))):
                    rows.append({"shard_id": sid, "sample_key": key,
                                 "ext": ext, "member_index": i,
                                 "payload": payload})
            yield pd.DataFrame(
                rows, columns=["shard_id", "sample_key", "ext",
                               "member_index", "payload"])

    return src.mapInPandas(gen, schema)


def webdataset_shards(df: DataFrame, key_col: str,
                      members: dict[str, str],
                      n_shards: int = 32) -> DataFrame:
    """EXPORT side of the WebDataset layout: pack samples into
    deterministic tar-shard blobs — ``(shard_id, content, n_samples,
    n_bytes)``, the inverse of :func:`read_webdataset` (roundtrip is
    test-pinned).

    ``members`` maps dataframe columns to member extensions
    (``{"text": "txt", "meta": "json"}``); string columns are UTF-8
    encoded, binary columns pass through, NULL members are skipped
    (WebDataset samples may omit an extension).

    Scale shape: shard assignment is ``pmod(xxhash64(key), n_shards)``
    — deterministic (no range-sampler nondeterminism) and
    hash-balanced, so ONE shuffle distributes a 100 TB corpus into
    ~corpus/1 GB tars; each shard is built by one task from its sorted
    sample group (``applyInPandas``). Pick ``n_shards`` so a shard
    fits executor memory — the same ~1 GB-per-tar sizing real
    WebDataset writers use. Within a shard, samples are sorted by key
    and exts emitted in sorted order (:func:`synth_shard`), so shard
    BYTES are a pure function of the data — replayable, diffable
    exports.
    """
    from pyspark.sql import functions as F

    if not members:
        raise ValueError("members mapping must be non-empty")
    cols = [F.col(key_col).cast("string").alias("_key")]
    for c, ext in members.items():
        if not ext or "/" in ext:
            raise ValueError(f"bad member extension {ext!r}")
        cols.append(F.col(c).alias(f"_m_{ext}"))
    src = (df.select(*cols)
             .withColumn("_shard",
                         F.pmod(F.xxhash64("_key"), F.lit(n_shards))
                          .cast("int")))
    exts = sorted(members.values())

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_key", ignore_index=True)
        samples = []
        for _, row in pdf.iterrows():
            payload = {}
            for ext in exts:
                v = row[f"_m_{ext}"]
                if v is None:
                    continue
                payload[ext] = (v.encode("utf-8")
                                if isinstance(v, str) else bytes(v))
            samples.append((row["_key"], payload))
        blob = synth_shard(samples)
        return pd.DataFrame({"shard_id": [int(pdf["_shard"].iloc[0])],
                             "content": [blob],
                             "n_samples": [len(samples)],
                             "n_bytes": [len(blob)]})

    return src.groupBy("_shard").applyInPandas(
        build, "shard_id int, content binary, n_samples long, "
               "n_bytes long")


def write_webdataset(df: DataFrame, path: str, key_col: str,
                     members: dict[str, str],
                     n_shards: int = 32) -> None:
    """Materialize :func:`webdataset_shards` as ``{path}/shard-NNNNNN.tar``
    files — executors write their shards directly (one file per task,
    no driver collect), the standard layout a WebDataset loader
    consumes."""
    import os

    os.makedirs(path, exist_ok=True)
    shards = webdataset_shards(df, key_col, members, n_shards)

    def dump(rows) -> None:
        for r in rows:
            with open(os.path.join(path, f"shard-{r['shard_id']:06d}.tar"),
                      "wb") as f:
                f.write(bytes(r["content"]))

    shards.foreachPartition(dump)
