"""Progressive (SOF2) JPEG codec — the r6 VERDICT's top multimodal gap.

The decisive property: every progressive scan script in these tests
transmits FULL coefficient precision by its last refinement pass, so
``decode_jpeg(encode_jpeg_progressive(img))`` must be BYTE-IDENTICAL to
``decode_jpeg(encode_jpeg(img))`` — both paths share the quantizer, so
any defect in spectral-selection bookkeeping, successive-approximation
bit order, EOB runs, correction-bit buffering, or restart handling
surfaces as a byte diff. The encoder and decoder are independent
implementations of T.81 G.1/G.2 (encode follows the spec flow charts,
decode the G.2 reconstruction), so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np
import pytest

from nyctaxidatapipeline_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _img(rng, w, h, ch):
    shape = (h, w, ch) if ch == 3 else (h, w)
    return rng.integers(0, 256, size=shape, dtype=np.uint8).tobytes()


@pytest.mark.parametrize("w,h,ch,sub", [
    (32, 16, 1, "444"),
    (8, 8, 1, "444"),
    (17, 13, 1, "444"),        # non-multiple-of-8 edges
    (32, 16, 3, "444"),
    (17, 13, 3, "420"),        # odd dims + chroma subsampling
    (64, 48, 3, "420"),
])
def test_progressive_matches_baseline(w, h, ch, sub):
    rng = np.random.default_rng(w * 1000 + h * 10 + ch)
    px = _img(rng, w, h, ch)
    assert decode_jpeg(encode_jpeg_progressive(w, h, px, ch, sub)) == \
        decode_jpeg(encode_jpeg(w, h, px, ch, sub))


@pytest.mark.parametrize("interval", [1, 2, 3, 7])
def test_progressive_restart_markers(interval):
    rng = np.random.default_rng(interval)
    px = _img(rng, 40, 24, 1)
    prog = encode_jpeg_progressive(40, 24, px, 1,
                                   restart_interval=interval)
    assert b"\xFF\xDD" in prog          # DRI present
    assert decode_jpeg(prog) == decode_jpeg(encode_jpeg(40, 24, px, 1))


def test_progressive_restart_color_420():
    rng = np.random.default_rng(99)
    px = _img(rng, 33, 17, 3)
    prog = encode_jpeg_progressive(33, 17, px, 3, "420",
                                   restart_interval=3)
    assert decode_jpeg(prog) == \
        decode_jpeg(encode_jpeg(33, 17, px, 3, "420"))


@pytest.mark.parametrize("scans", [
    # deep successive approximation on DC and AC
    [([0], 0, 0, 0, 3), ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1),
     ([0], 0, 0, 1, 0),
     ([0], 1, 2, 0, 1), ([0], 3, 63, 0, 1), ([0], 1, 63, 1, 0)],
    # spectral selection only, no successive approximation
    [([0], 0, 0, 0, 0)] + [([0], a, b, 0, 0) for a, b in
                           [(1, 1), (2, 3), (4, 8), (9, 20),
                            (21, 45), (46, 63)]],
])
def test_progressive_custom_scan_scripts(scans):
    rng = np.random.default_rng(5)
    px = _img(rng, 32, 24, 1)
    assert decode_jpeg(encode_jpeg_progressive(32, 24, px, 1,
                                               scans=scans)) == \
        decode_jpeg(encode_jpeg(32, 24, px, 1))


def test_progressive_eob_runs_across_blocks():
    """A smooth image quantizes to long runs of all-zero AC bands —
    the multi-block EOBRUN + buffered-correction-bit path."""
    px = np.fromfunction(lambda y, x: (x // 16) * 8 + 64,
                         (64, 64)).astype(np.uint8).tobytes()
    assert decode_jpeg(encode_jpeg_progressive(64, 64, px, 1)) == \
        decode_jpeg(encode_jpeg(64, 64, px, 1))


def test_progressive_constant_dc_exact():
    """Constant image: the DC-only exactness contract extends to
    progressive — decoded value = clamp(2*floor((c-128)/2+0.5)+128)
    (Q00=16, DC=8*(c-128), q=floor((c-128)/2+0.5), IDCT=2*q)."""
    for c in (0, 1, 77, 128, 200, 255):
        px = np.full((16, 16), c, dtype=np.uint8).tobytes()
        w, h, ch, out = decode_jpeg(
            encode_jpeg_progressive(16, 16, px, 1))
        q = int(np.floor((c - 128) / 2 + 0.5))
        expect = int(np.clip(2 * q + 128, 0, 255))
        got = np.frombuffer(out, np.uint8)
        assert (got == expect).all(), (c, expect, set(got.tolist()))


def test_progressive_truncation_raises_valueerror_only():
    """The multimodal NULL-mapping contract: malformed/truncated input
    raises ValueError, never struct/index errors that would kill the
    executor kernel."""
    rng = np.random.default_rng(3)
    full = encode_jpeg_progressive(32, 16, _img(rng, 32, 16, 1), 1)
    for cut in range(0, len(full) - 1, 5):
        with pytest.raises(ValueError):
            decode_jpeg(full[:cut])


def test_progressive_bitflip_fuzz_never_crashes():
    rng = np.random.default_rng(13)
    full = bytearray(encode_jpeg_progressive(24, 16,
                                             _img(rng, 24, 16, 1), 1))
    for _ in range(300):
        i = int(rng.integers(2, len(full)))
        mutated = bytearray(full)
        mutated[i] ^= int(rng.integers(1, 256))
        try:
            decode_jpeg(bytes(mutated))
        except ValueError:
            pass                       # the only permitted failure mode


def test_image_features_decodes_progressive(spark):
    """multimodal.image_features(codec='jpeg') transparently handles
    SOF2 media — the real-corpus majority case."""
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.multimodal import (
        image_features,
    )

    px = np.full((8, 16), 200, dtype=np.uint8)
    rows = [Row(asset_id=1, media=bytearray(
                encode_jpeg_progressive(16, 8, px.tobytes(), 1))),
            Row(asset_id=2, media=bytearray(b"garbage"))]
    out = {r["asset_id"]: r for r in
           image_features(spark.createDataFrame(rows), codec="jpeg")
           .collect()}
    assert out[1]["width"] == 16 and out[1]["height"] == 8
    # 200 -> q=floor(72/16*8/8... = floor(36+0.5)=36 -> 2*36+128=200
    assert out[1]["mean_intensity"] == 200.0
    assert out[2]["width"] is None and out[2]["mean_intensity"] is None
