"""WebDataset tar-shard ingestion — framing, key/ext split, Spark read."""

import io
import tarfile

from nyctaxidatapipeline_spark.sources.webdataset import (
    parse_shard,
    read_webdataset,
    synth_shard,
)


def _samples(n, start=0):
    return [(f"{i:06d}", {"txt": f"doc {i}".encode(),
                          "cls": str(i % 10).encode()})
            for i in range(start, start + n)]


def test_synth_shard_deterministic():
    s = _samples(3)
    assert synth_shard(s) == synth_shard(s)  # mtime/uid pinned


def test_parse_roundtrip_and_member_order():
    blob = synth_shard(_samples(2))
    out = parse_shard(blob)
    assert out == [
        ("000000", "cls", b"0"), ("000000", "txt", b"doc 0"),
        ("000001", "cls", b"1"), ("000001", "txt", b"doc 1")]


def test_key_ext_split_first_dot_and_dirs():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        d = tarfile.TarInfo("samples/")
        d.type = tarfile.DIRTYPE
        tar.addfile(d)
        for name, payload in [("samples/a.seg.png", b"px"),
                              ("samples/a.txt", b"t"),
                              ("noext", b"raw")]:
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            tar.addfile(info, io.BytesIO(payload))
    out = parse_shard(buf.getvalue())
    assert out == [("a", "seg.png", b"px"), ("a", "txt", b"t"),
                   ("noext", "", b"raw")]


def test_read_webdataset_explodes_shards(spark):
    files = [(0, synth_shard(_samples(2))),
             (1, synth_shard(_samples(1, start=2))),
             (2, None)]
    df = spark.createDataFrame(files, "shard_id long, content binary")
    rows = (read_webdataset(df)
            .orderBy("shard_id", "member_index").collect())
    assert [(r.shard_id, r.member_index, r.sample_key, r.ext)
            for r in rows] == [
        (0, 0, "000000", "cls"), (0, 1, "000000", "txt"),
        (0, 2, "000001", "cls"), (0, 3, "000001", "txt"),
        (1, 0, "000002", "cls"), (1, 1, "000002", "txt")]
    assert bytes(rows[1].payload) == b"doc 0"
