"""WARC ingestion — Common-Crawl-style web-archive files as a source.

A real 100 TB training-data pipeline starts from crawl archives:
``.warc.gz`` files of WARC/1.0 records, each record one HTTP capture,
each record compressed as its OWN gzip member (the Common Crawl
convention — member boundaries make the file record-splittable, so a
distributed reader can seek into the middle of a 1 GB shard and resync
on the next gzip magic instead of decompressing from byte 0).

Everything here is REAL and pure-stdlib: gzip member framing via
``zlib`` (wbits=31), WARC header-block parsing, the embedded HTTP/1.1
response parse (status line, headers, body by Content-Length). No
warcio/requests needed.

Scale design (local[32] -> 1000 executors):
  * The unit of parallelism is the FILE (one ``(file_id, content)``
    row per .warc.gz blob, e.g. from ``spark.read.format("binaryFile")``)
    — exactly the Common Crawl layout (~100k x ~1 GB segments), so a
    100 TB crawl is ~100k independent tasks with zero shuffle before
    the first record-level filter.
  * Record extraction runs in ``mapInPandas`` (Arrow-batched, the
    sanctioned decode zone — same discipline as the media codecs):
    bytes never leave the executor, and the emitted frame is already
    row-per-record so every downstream filter/projection is JVM-side.
  * Payloads stay ``binary`` until a consumer asks for text — column
    pruning drops them at the scan when only metadata is needed.

Reference scope note: the reference pipeline (yellow_taxi_etl.py)
reads parquet only; WARC ingestion is part of the mandated
training-data extension surface, following the multimodal codec
precedent (functions/png.py etc.).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator, Sequence
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "synth_warc_record",
    "synth_warc_gz",
    "gzip_member",
    "split_gzip_members",
    "parse_warc",
    "read_warc",
    "read_warc_files",
    "WARC_RECORDS_SCHEMA",
]

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

#: Schema of the record frame emitted by :func:`read_warc` (the
#: ``file_id`` field inherits the input column's type — a long for
#: synthetic fixtures, a string path for ``binaryFile`` reads).
WARC_RECORDS_SCHEMA = (
    "file_id {file_id_type}, record_index int, warc_type string, "
    "record_id string, warc_date string, target_uri string, "
    "http_status int, http_content_type string, payload binary"
)


# ---------------------------------------------------------------------------
# synthesis (fixtures + tests; also a functional writer)
# ---------------------------------------------------------------------------

def warc_date_for(seq: int) -> str:
    """Deterministic WARC-Date for fixtures: 2024-01-01T00:00:00Z plus
    ``seq % 86400`` seconds (no wall clock anywhere — synthesis must be
    replayable for the differential oracle)."""
    t = datetime(2024, 1, 1) + timedelta(seconds=int(seq) % 86400)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def synth_warc_record(target_uri: str, payload: bytes,
                      record_id: str, date: str,
                      http_status: int = 200,
                      http_reason: str = "OK",
                      content_type: str = "text/plain; charset=utf-8",
                      ) -> bytes:
    """One WARC/1.0 ``response`` record: WARC header block, then the
    captured HTTP/1.1 response (status line + headers + body), then the
    two-CRLF record separator mandated by the spec."""
    http = (f"HTTP/1.1 {http_status} {http_reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode("ascii") + payload
    header = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{record_id}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {target_uri}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode("ascii")
    return header + http + _CRLF + _CRLF


def gzip_member(data: bytes) -> bytes:
    """One deterministic gzip member (zlib's default gzip header:
    mtime 0, no name — byte-stable across runs, unlike the ``gzip``
    module which stamps wall-clock mtime)."""
    co = zlib.compressobj(6, zlib.DEFLATED, 16 + 15)
    return co.compress(data) + co.flush()


def synth_warc_gz(records: Sequence[bytes]) -> bytes:
    """Concatenated per-record gzip members — the Common Crawl framing
    (record-splittable: each member is independently decompressible)."""
    return b"".join(gzip_member(r) for r in records)


# ---------------------------------------------------------------------------
# parsing
# ---------------------------------------------------------------------------

def split_gzip_members(data: bytes) -> list[bytes]:
    """Decompress a concatenation of gzip members into the per-member
    payloads, walking member boundaries via ``Decompress.unused_data``
    (the stdlib-blessed way to find where one member ends)."""
    out = []
    while data:
        dob = zlib.decompressobj(16 + 15)
        out.append(dob.decompress(data))
        if not dob.eof:
            raise ValueError("truncated gzip member in WARC stream")
        data = dob.unused_data
    return out


def _parse_header_block(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("ascii")] = \
                v.strip().decode("ascii", "replace")
    return headers


def _parse_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Parse the captured HTTP/1.1 response: (status, content-type,
    body). Returns (None, None, block) when the block isn't HTTP."""
    sep = block.find(_CRLF + _CRLF)
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(_CRLF)
    parts = lines[0].split(b" ", 2)
    try:
        status = int(parts[1])
    except (IndexError, ValueError):
        return None, None, block
    headers = _parse_header_block(_CRLF.join(lines[1:]))
    n = headers.get("content-length")
    if n is not None:
        body = body[:int(n)]
    return status, headers.get("content-type"), body


def parse_warc(data: bytes) -> list[dict]:
    """Parse one WARC file (gzipped members or plain concatenation)
    into a list of record dicts: ``warc_type, record_id, warc_date,
    target_uri, http_status, http_content_type, payload``.

    For ``application/http`` response records the payload is the HTTP
    BODY (the captured document); for any other record type it is the
    raw WARC content block.
    """
    if data[:2] == _GZIP_MAGIC:
        chunks = split_gzip_members(data)
    else:
        chunks = [data]
    records = []
    for chunk in chunks:
        pos = 0
        while pos < len(chunk):
            # tolerate inter-record padding CRLFs
            while chunk[pos:pos + 2] == _CRLF:
                pos += 2
            if pos >= len(chunk):
                break
            if not chunk.startswith(b"WARC/", pos):
                raise ValueError(
                    f"expected WARC/ record header at offset {pos}")
            sep = chunk.find(_CRLF + _CRLF, pos)
            if sep < 0:
                raise ValueError("unterminated WARC header block")
            headers = _parse_header_block(chunk[pos:sep])
            try:
                n = int(headers["content-length"])
            except (KeyError, ValueError):
                raise ValueError("WARC record missing Content-Length")
            body_start = sep + 4
            block = chunk[body_start:body_start + n]
            if len(block) < n:
                raise ValueError("truncated WARC record body")
            status, ctype, payload = (None, None, block)
            if "application/http" in headers.get("content-type", ""):
                status, ctype, payload = _parse_http(block)
            rid = headers.get("warc-record-id", "")
            records.append({
                "warc_type": headers.get("warc-type", ""),
                "record_id": rid.strip("<>"),
                "warc_date": headers.get("warc-date", ""),
                "target_uri": headers.get("warc-target-uri", ""),
                "http_status": status,
                "http_content_type": ctype,
                "payload": payload,
            })
            pos = body_start + n
    return records


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

def read_warc(files: DataFrame, content_col: str = "content",
              file_col: str = "file_id") -> DataFrame:
    """Explode a DataFrame of ``(file_id, content)`` WARC blobs into one
    row per record (:data:`WARC_RECORDS_SCHEMA`).

    Arrow-batched ``mapInPandas`` — the one sanctioned Python stage, at
    the same boundary the multimodal codecs use. Emits ``record_index``
    (position within its file) so downstream ordering never depends on
    task scheduling. Parallelism = input files; no shuffle.
    """
    src = files.select(file_col, content_col)
    schema = WARC_RECORDS_SCHEMA.format(
        file_id_type=src.schema[file_col].dataType.simpleString())

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fid, blob in zip(pdf[file_col], pdf[content_col]):
                if blob is None:
                    continue
                for i, rec in enumerate(parse_warc(bytes(blob))):
                    rows.append({"file_id": fid, "record_index": i,
                                 **rec})
            yield pd.DataFrame(
                rows, columns=["file_id", "record_index", "warc_type",
                               "record_id", "warc_date", "target_uri",
                               "http_status", "http_content_type",
                               "payload"])

    return src.mapInPandas(gen, schema)


def read_warc_files(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory/glob of ``.warc`` / ``.warc.gz`` files into the
    record frame. ``binaryFile`` gives one row per file (path, bytes) —
    at crawl scale each ~1 GB segment is one task, ~100k tasks per
    crawl, embarrassing parallelism with zero shuffle."""
    from pyspark.sql import functions as F

    files = (spark.read.format("binaryFile").load(path)
             .select(F.col("path").alias("file_id"), "content"))
    return read_warc(files, file_col="file_id")
