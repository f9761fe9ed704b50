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


def test_webdataset_shards_roundtrip(spark):
    """Writer -> reader roundtrip: every (key, ext, payload) survives,
    shard bytes are deterministic under repartition, and NULL members
    are omitted from the sample."""
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.sources.webdataset import (
        webdataset_shards,
    )

    rows = [Row(doc_id=i, text=f"document number {i}",
                meta=(None if i == 3 else ('{"id": %d}' % i)))
            for i in range(20)]
    df = spark.createDataFrame(rows)
    shards = webdataset_shards(df, "doc_id",
                               {"text": "txt", "meta": "json"},
                               n_shards=4).cache()
    got = shards.collect()
    assert sum(r.n_samples for r in got) == 20
    assert all(r.n_bytes == len(bytes(r.content)) for r in got)
    back = {(r.sample_key, r.ext): bytes(r.payload)
            for r in read_webdataset(shards).collect()}
    assert back[("7", "txt")] == b"document number 7"
    assert back[("5", "json")] == b'{"id": 5}'
    assert ("3", "json") not in back and ("3", "txt") in back
    assert len(back) == 2 * 20 - 1
    # determinism: same shard bytes regardless of input partitioning
    blobs = {r.shard_id: bytes(r.content) for r in got}
    blobs2 = {r.shard_id: bytes(r.content) for r in
              webdataset_shards(df.repartition(7), "doc_id",
                                {"text": "txt", "meta": "json"},
                                n_shards=4).collect()}
    assert blobs == blobs2
    shards.unpersist()


def test_write_webdataset_files(spark, tmp_path):
    import os

    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.sources.webdataset import (
        write_webdataset,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(10)])
    out = str(tmp_path / "wds")
    write_webdataset(df, out, "doc_id", {"text": "txt"}, n_shards=3)
    files = sorted(os.listdir(out))
    assert files and all(f.startswith("shard-") and f.endswith(".tar")
                         for f in files)
    keys = set()
    for f in files:
        with open(os.path.join(out, f), "rb") as fh:
            keys |= {k for k, _, _ in parse_shard(fh.read())}
    assert keys == {str(i) for i in range(10)}


def test_webdataset_shards_validates_members(spark):
    import pytest
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.sources.webdataset import (
        webdataset_shards,
    )

    df = spark.createDataFrame([Row(doc_id=1, text="x")])
    with pytest.raises(ValueError):
        webdataset_shards(df, "doc_id", {})
    with pytest.raises(ValueError):
        webdataset_shards(df, "doc_id", {"text": "a/b"})
