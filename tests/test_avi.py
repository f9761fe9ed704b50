"""Pure-stdlib AVI container codec (functions/avi.py): round-trip,
index/scan agreement, corruption rejection, and the real-container
frame_sample path."""

from __future__ import annotations

import struct

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nyctaxidatapipeline_spark.functions.avi import encode_avi, parse_avi
from nyctaxidatapipeline_spark.operators.multimodal import frame_sample


def _strip_idx1(data: bytes) -> bytes:
    body = data[:data.rindex(b"idx1")]
    return b"RIFF" + struct.pack("<I", len(body) - 8) + body[8:]


def test_roundtrip_header_and_payloads():
    frames = [bytes([k] * 768) for k in range(5)]
    data = encode_avi(16, 16, frames, fps=30)
    meta = parse_avi(data)
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["n_frames"] == 5 and meta["fps"] == 30
    for k, (off, sz) in enumerate(meta["frames"]):
        assert data[off:off + sz] == frames[k]


def test_idx1_and_movi_scan_agree():
    data = encode_avi(16, 16, [bytes(768)] * 4)
    assert parse_avi(_strip_idx1(data))["frames"] == \
        parse_avi(data)["frames"]


def test_rejections():
    with pytest.raises(ValueError, match="RIFF"):
        parse_avi(b"not a container")
    data = encode_avi(16, 16, [bytes(768)] * 3)
    with pytest.raises(ValueError, match="truncated"):
        parse_avi(data[:len(data) // 2])
    with pytest.raises(ValueError, match="frame 0"):
        encode_avi(16, 16, [bytes(99)])
    # declared-vs-actual frame count mismatch: drop the last movi chunk
    # but keep avih's dwTotalFrames
    short = _strip_idx1(data)
    short = short[:-776]
    short = b"RIFF" + struct.pack("<I", len(short) - 8) + short[8:]
    # also shrink the movi LIST size so the walk ends cleanly
    movi_hdr = short.index(b"movi") - 8
    movi_size = struct.unpack("<I", short[movi_hdr + 4:movi_hdr + 8])[0]
    short = (short[:movi_hdr + 4]
             + struct.pack("<I", movi_size - 776)
             + short[movi_hdr + 8:])
    with pytest.raises(ValueError, match="declares"):
        parse_avi(short)
    # compressed frames are the documented ffmpeg slot-in
    dc = encode_avi(16, 16, [bytes(768)]).replace(b"00db", b"00dc")
    with pytest.raises(ValueError, match="00dc"):
        parse_avi(dc)


def test_frame_sample_avi_codec(spark):
    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "asset_id": pdf["id"],
                "media": [encode_avi(16, 16,
                                     [bytes(768)] * (int(i) % 3 + 2))
                          for i in pdf["id"]]})

    assets = spark.range(6).mapInPandas(gen, "asset_id long, media binary")
    out = frame_sample(assets, every_n=2, codec="avi")
    rows = {(r["asset_id"], r["frame_index"], r["frame_offset"])
            for r in out.collect()}
    want = set()
    for aid in range(6):
        n = aid % 3 + 2
        for idx, f_i in enumerate(range(0, n, 2)):
            want.add((aid, idx, 232 + f_i * 776))
    assert rows == want
    # unparseable media contributes no rows, matching the fake codec
    bad = spark.createDataFrame([(99, bytearray(b"junk"))],
                                "asset_id long, media binary")
    assert frame_sample(bad, every_n=2, codec="avi").count() == 0
