"""WARC ingestion — gzip-member framing, record parse, Spark reader."""

import hashlib
import zlib

import pytest

from nyctaxidatapipeline_spark.sources.warc import (
    gzip_member,
    parse_warc,
    read_warc,
    read_warc_files,
    split_gzip_members,
    synth_warc_gz,
    synth_warc_record,
    warc_date_for,
)


def _record(i: int, payload: bytes | None = None) -> bytes:
    payload = payload if payload is not None else f"doc {i} body".encode()
    return synth_warc_record(
        f"http://corpus.example/{i}", payload,
        record_id=hashlib.md5(str(i).encode()).hexdigest(),
        date=warc_date_for(i))


# ---------------------------------------------------------------- framing

def test_gzip_member_deterministic_and_decompressible():
    m1, m2 = gzip_member(b"abc" * 100), gzip_member(b"abc" * 100)
    assert m1 == m2  # mtime-free header — byte-stable synthesis
    assert zlib.decompress(m1, 16 + 15) == b"abc" * 100


def test_split_gzip_members_boundaries():
    parts = [b"first", b"second" * 50, b""]
    data = b"".join(gzip_member(p) for p in parts)
    assert split_gzip_members(data) == parts


def test_split_gzip_members_truncated_raises():
    data = gzip_member(b"x" * 1000)[:-3]
    with pytest.raises(ValueError, match="truncated"):
        split_gzip_members(data)


# ------------------------------------------------------------------ parse

def test_parse_roundtrip_gz_and_plain():
    recs = [_record(i) for i in range(3)]
    for blob in (synth_warc_gz(recs), b"".join(recs)):
        out = parse_warc(blob)
        assert len(out) == 3
        for i, r in enumerate(out):
            assert r["warc_type"] == "response"
            assert r["target_uri"] == f"http://corpus.example/{i}"
            assert r["warc_date"] == warc_date_for(i)
            assert r["http_status"] == 200
            assert r["http_content_type"] == "text/plain; charset=utf-8"
            assert r["payload"] == f"doc {i} body".encode()
            assert r["record_id"].startswith("urn:uuid:")


def test_parse_binary_payload_with_crlf_bytes():
    # Content-Length framing, not delimiter scanning: a payload that
    # CONTAINS the record separator must come back intact.
    payload = b"a\r\n\r\nb" * 10
    out = parse_warc(_record(7, payload))
    assert out[0]["payload"] == payload


def test_parse_non_http_record_keeps_raw_block():
    raw = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
           b"Content-Type: application/warc-fields\r\n"
           b"Content-Length: 9\r\n\r\nkey: val\n\r\n\r\n")
    out = parse_warc(raw)
    assert out[0]["warc_type"] == "warcinfo"
    assert out[0]["http_status"] is None
    assert out[0]["payload"] == b"key: val\n"


def test_parse_garbage_raises():
    with pytest.raises(ValueError, match="WARC"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort")


# ------------------------------------------------------------------ spark

def test_read_warc_explodes_files(spark):
    files = [(0, synth_warc_gz([_record(0), _record(1)])),
             (1, synth_warc_gz([_record(2)])),
             (2, None)]
    df = spark.createDataFrame(files, "file_id long, content binary")
    rows = read_warc(df).orderBy("file_id", "record_index").collect()
    assert [(r.file_id, r.record_index, r.target_uri, r.http_status)
            for r in rows] == [
        (0, 0, "http://corpus.example/0", 200),
        (0, 1, "http://corpus.example/1", 200),
        (1, 0, "http://corpus.example/2", 200)]
    assert bytes(rows[2].payload) == b"doc 2 body"


def test_read_warc_files_binary_source(spark, tmp_path):
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "seg-0.warc.gz").write_bytes(synth_warc_gz([_record(1),
                                                     _record(2)]))
    (d / "seg-1.warc.gz").write_bytes(synth_warc_gz([_record(3)]))
    out = read_warc_files(spark, str(d)).orderBy("target_uri").collect()
    assert len(out) == 3
    assert out[0].file_id.endswith("seg-0.warc.gz")
    assert [r.target_uri for r in out] == [
        f"http://corpus.example/{i}" for i in (1, 2, 3)]
