"""H.264 Annex-B NAL/SPS parser (``functions.h264``) — completes the
container-level codec family: every multimodal format now has REAL
structure parsing, with only the pixel/PCM decode left to the
documented library slots."""

from __future__ import annotations

import pytest

from nyctaxidatapipeline_spark.functions.h264 import (
    parse_h264,
    parse_sps,
    synth_h264_stream,
)


@pytest.mark.parametrize("w,h", [
    (64, 48), (1920, 1080), (320, 240), (16, 16),
    (354, 290),            # not multiples of 16 -> frame cropping
    (1280, 720),
])
def test_sps_dimensions(w, h):
    m = parse_h264(synth_h264_stream(w, h, 3))
    assert (m["width"], m["height"]) == (w, h)
    assert m["profile_idc"] == 66 and m["level_idc"] == 30
    assert m["chroma_format_idc"] == 1 and m["frame_mbs_only"] == 1


def test_nal_inventory_and_idr_cadence():
    m = parse_h264(synth_h264_stream(64, 48, 10, idr_interval=4))
    assert m["n_nals"] == 12               # SPS + PPS + 10 slices
    assert m["n_slices"] == 10
    assert m["n_idr"] == 3                 # frames 0, 4, 8
    assert [s[2] for s in m["slices"]] == \
        [f % 4 == 0 for f in range(10)]
    # deterministic geometry: payload offsets stride by 3 + slice_bytes
    offs = [s[0] for s in m["slices"]]
    assert offs[0] == 23 and all(b - a == 67 for a, b in
                                 zip(offs, offs[1:]))


def test_high_profile_sps_fields():
    """profile_idc 100 adds chroma/bit-depth/scaling-list fields before
    the dimension syntax — the parser must skip them correctly."""
    m = parse_h264(synth_h264_stream(128, 96, 2, profile_idc=66))
    base = (m["width"], m["height"])
    # synth only writes baseline SPS; build a high-profile variant by
    # hand: profile 100 + chroma_format_idc(1) + bit depths + no
    # scaling matrix, spliced ahead of the same dimension fields.
    stream = synth_h264_stream(128, 96, 2)
    # parse the baseline SPS bits and re-emit via parse check instead:
    # simplest equivalence — a crafted high-profile SPS RBSP.
    bits = []

    def u(v, n):
        for b in range(n - 1, -1, -1):
            bits.append((v >> b) & 1)

    def ue(v):
        k = v + 1
        nb = k.bit_length()
        u(0, nb - 1)
        u(k, nb)

    u(100, 8); u(0, 8); u(30, 8)
    ue(0)                       # sps id
    ue(1)                       # chroma_format_idc = 4:2:0
    ue(0); ue(0)                # bit depths
    u(0, 1)                     # qpprime
    u(0, 1)                     # no scaling matrix
    ue(4); ue(0); ue(4)         # frame_num, poc type 0, poc lsb
    ue(1); u(0, 1)              # ref frames, gaps
    ue(128 // 16 - 1); ue(96 // 16 - 1)
    u(1, 1); u(1, 1)            # frame_mbs_only, direct_8x8
    u(0, 1); u(0, 1)            # no crop, no vui
    u(1, 1)                     # stop bit
    while len(bits) % 8:
        bits.append(0)
    rbsp = bytes(int("".join(map(str, bits[i:i + 8])), 2)
                 for i in range(0, len(bits), 8))
    sps = parse_sps(rbsp)
    assert (sps["width"], sps["height"]) == base == (128, 96)
    assert sps["profile_idc"] == 100
    assert stream  # crafted alongside the synth stream for parity


def test_rejects_malformed():
    good = synth_h264_stream(64, 48, 3)
    for bad in (b"", b"\x00\x00\x01", b"no start code here",
                b"\x00\x00\x01\x80\x00",        # forbidden bit
                b"\x00\x00\x01\x41\xFF",        # slice but no SPS
                good[:20],                      # truncated SPS
                b"junk" + good):                # leading garbage
        with pytest.raises(ValueError):
            parse_h264(bad)


def test_bitflip_fuzz_valueerror_only():
    import numpy as np

    rng = np.random.default_rng(23)
    base = bytearray(synth_h264_stream(64, 48, 4))
    for _ in range(300):
        mutated = bytearray(base)
        i = int(rng.integers(0, len(mutated)))
        mutated[i] ^= int(rng.integers(1, 256))
        try:
            parse_h264(bytes(mutated))
        except ValueError:
            pass


def test_frame_sample_h264_codec(spark):
    """End-to-end through mapInPandas: slice-NAL offsets sampled every
    2nd frame; unparseable media yields no rows."""
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.multimodal import (
        frame_sample,
    )

    rows = [Row(asset_id=1, media=bytearray(
                synth_h264_stream(64, 48, 5))),
            Row(asset_id=2, media=bytearray(b"not h264"))]
    out = frame_sample(spark.createDataFrame(rows), every_n=2,
                       codec="h264").collect()
    got = sorted((r["asset_id"], r["frame_index"], r["frame_offset"])
                 for r in out)
    assert got == [(1, 0, 23), (1, 1, 23 + 2 * 67), (1, 2, 23 + 4 * 67)]
