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
