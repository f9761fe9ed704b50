"""TFRecord container + tf.train.Example codec and Spark roundtrip."""

import struct

import pytest
from pyspark.sql import Row

from nyctaxidatapipeline_spark.functions.tfrecord import (
    decode_example,
    encode_example,
    frame_records,
    unframe_records,
)


def test_example_roundtrip_all_types():
    feats = {"id": 42, "neg": -7, "txt": "héllo", "raw": b"\x00\xff",
             "ints": [1, 2, 3], "floats": [0.5, -2.0]}
    got = decode_example(encode_example(feats))
    assert got["id"] == [42] and got["neg"] == [-7]
    assert got["txt"] == ["héllo".encode("utf-8")]
    assert got["raw"] == [b"\x00\xff"]
    assert got["ints"] == [1, 2, 3]
    assert got["floats"] == [0.5, -2.0]   # exact in float32


def test_example_bytes_deterministic_and_sorted():
    a = encode_example({"b": 1, "a": "x"})
    b = encode_example({"a": "x", "b": 1})
    assert a == b                          # sorted-key promise
    with pytest.raises(ValueError, match="no values"):
        encode_example({"empty": []})
    with pytest.raises(ValueError, match="bools"):
        encode_example({"flag": True})


def test_example_known_wire_bytes():
    """Pin the exact wire bytes of a minimal Example against the proto
    spec (hand-derived): Example{features{feature{key:'a'
    int64_list{value:[5]}}}}."""
    want = bytes([
        0x0A, 0x0C,              # Example.features, len 12
        0x0A, 0x0A,              # map entry, len 10
        0x0A, 0x01, ord("a"),    # key 'a'
        0x12, 0x05,              # Feature value, len 5
        0x1A, 0x03,              # int64_list (field 3), len 3
        0x0A, 0x01, 0x05,        # packed values [5]
    ])
    assert encode_example({"a": 5}) == want


def test_decode_accepts_unpacked_repeated_scalars():
    """Proto3 parsers must accept BOTH packed and unpacked encodings of
    repeated scalars (ADVICE r8): TFRecords from non-TF writers emit
    Int64List values as repeated wire-type-0 varints and FloatList
    values as repeated wire-type-5 fixed32s. Hand-built wire bytes —
    no encoder in this repo produces the unpacked form."""
    def example(feat_body: bytes, key: bytes = b"a") -> bytes:
        feat = bytes([0x12, len(feat_body)]) + feat_body
        entry = bytes([0x0A, len(key)]) + key + feat
        mapent = bytes([0x0A, len(entry)]) + entry
        return bytes([0x0A, len(mapent)]) + mapent

    # Int64List{value: [5, -1]} unpacked: int64_list(field 3) wraps
    # repeated `value` (field 1, wire 0) varints
    neg = (-1) & 0xFFFFFFFFFFFFFFFF
    negv = b""
    n = neg
    while n > 0x7F:
        negv += bytes([(n & 0x7F) | 0x80])
        n >>= 7
    negv += bytes([n])
    i64_body = bytes([0x08, 0x05]) + b"\x08" + negv
    got = decode_example(example(
        bytes([0x1A, len(i64_body)]) + i64_body))
    assert got["a"] == [5, -1]

    # FloatList{value: [0.5, -2.0]} unpacked: float_list(field 2)
    # wraps repeated `value` (field 1, wire 5) fixed32s
    f_body = (b"\x0D" + struct.pack("<f", 0.5)
              + b"\x0D" + struct.pack("<f", -2.0))
    got = decode_example(example(bytes([0x12, len(f_body)]) + f_body))
    assert got["a"] == [0.5, -2.0]

    # merge rule: two occurrences of the same list field concatenate
    two = bytes([0x1A, 0x02, 0x08, 0x01]) + bytes([0x1A, 0x02, 0x08, 0x02])
    assert decode_example(example(two))["a"] == [1, 2]


def test_framing_roundtrip_and_crc_detection():
    recs = [b"", b"alpha", bytes(range(200))]
    blob = frame_records(recs)
    assert unframe_records(blob) == recs
    # a flipped payload bit must fail the data crc
    corrupt = bytearray(blob)
    corrupt[12 + 8 + 12 + 2] ^= 0x01       # inside record 2's payload
    with pytest.raises(ValueError, match="crc mismatch"):
        unframe_records(bytes(corrupt))
    with pytest.raises(ValueError, match="truncated"):
        unframe_records(blob[:-2])


def test_frame_layout_is_spec_exact():
    """Length header is uint64 LE and both masked crcs match the
    TensorFlow masking formula (shared with the snappy codec)."""
    from nyctaxidatapipeline_spark.functions.snappy import _masked_crc

    rec = b"payload"
    blob = frame_records([rec])
    assert struct.unpack("<Q", blob[:8])[0] == len(rec)
    assert struct.unpack("<I", blob[8:12])[0] == _masked_crc(blob[:8])
    assert blob[12:19] == rec
    assert struct.unpack("<I", blob[19:23])[0] == _masked_crc(rec)


def test_spark_shard_roundtrip(spark):
    from nyctaxidatapipeline_spark.sources.tfrecord import (
        decode_examples,
        read_tfrecord_shards,
        tfrecord_shards,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"document number {i}") for i in range(10)])
    shards = tfrecord_shards(df, "doc_id", ["text"], docs_per_shard=4)
    srows = {r.shard_id: r for r in shards.collect()}
    assert set(srows) == {0, 1, 2}
    assert [srows[s].n_records for s in (0, 1, 2)] == [4, 4, 2]
    typed = decode_examples(
        read_tfrecord_shards(shards), {"doc_id": "long", "text": "string"})
    got = {r.doc_id: (r.shard_id, r.rec_no, r.text)
           for r in typed.collect()}
    assert got == {i: (i // 4, i % 4, f"document number {i}")
                   for i in range(10)}
    # shard bytes are repartition-invariant (pure function of the data)
    again = {r.shard_id: bytes(r.content)
             for r in tfrecord_shards(df.repartition(7), "doc_id",
                                      ["text"], 4).collect()}
    assert again == {s: bytes(r.content) for s, r in srows.items()}


def test_write_tfrecord_shards_layout(spark, tmp_path):
    from nyctaxidatapipeline_spark.sources.tfrecord import (
        write_tfrecord_shards,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(6)])
    out = str(tmp_path / "tfr")
    write_tfrecord_shards(df, out, "doc_id", ["text"], docs_per_shard=4)
    import os
    names = sorted(os.listdir(out))
    assert names == ["shard-000000.tfrecord", "shard-000001.tfrecord"]
    recs = unframe_records(open(f"{out}/shard-000000.tfrecord", "rb").read())
    assert len(recs) == 4
    assert decode_example(recs[0])["doc_id"] == [0]
