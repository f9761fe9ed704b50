"""GIF codec — LZW, interlacing, container walk, Spark feature path."""

import pytest

from nyctaxidatapipeline_spark.functions.gif import (
    GRAY_PALETTE,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    frame_count,
)


def _rgb_of(indices, palette=GRAY_PALETTE):
    return b"".join(bytes(palette[i]) for i in indices)


# ------------------------------------------------------------------- LZW

def test_lzw_roundtrip_basic():
    data = bytes((i * 7 + 3) % 256 for i in range(1000))
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_lzw_roundtrip_small_code_size():
    # 2-bit alphabet exercises fast code-size growth from width 3.
    data = bytes([0, 1, 2, 3] * 200)
    enc = _lzw_encode(data, 2)
    assert _lzw_decode(enc, 2, len(data)) == data


def test_lzw_kwkwk_case():
    # 'aaaa...' forces the code == len(table) self-reference branch.
    data = b"\x05" * 50
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_lzw_dictionary_reset_at_4096():
    # Enough unique phrases to fill the 12-bit dictionary and force a
    # mid-stream clear + rebuild on both sides.
    data = bytes((i * i + i // 3) % 256 for i in range(60000))
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_lzw_truncated_raises():
    enc = _lzw_encode(b"hello world" * 20, 8)
    with pytest.raises(ValueError):
        _lzw_decode(enc[: len(enc) // 2], 8, 220)


# -------------------------------------------------------------- container

def test_gif_roundtrip_sequential_and_interlaced():
    w, h = 8, 4
    idx = bytes((i * 31 + 7) % 256 for i in range(w * h))
    for interlace in (False, True):
        blob = encode_gif(w, h, idx, interlace=interlace)
        gw, gh, ch, rgb = decode_gif(blob)
        assert (gw, gh, ch) == (w, h, 3)
        assert rgb == _rgb_of(idx)


def test_gif_interlace_tall_image_all_four_passes():
    w, h = 3, 17  # odd height > 8 exercises every pass with remainders
    idx = bytes((i * 5 + 1) % 256 for i in range(w * h))
    _, _, _, rgb = decode_gif(encode_gif(w, h, idx, interlace=True))
    assert rgb == _rgb_of(idx)


def test_gif_small_palette():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    idx = bytes([0, 1, 2, 1] * 4)
    _, _, _, rgb = decode_gif(encode_gif(4, 4, idx, palette=pal))
    assert rgb == _rgb_of(idx, pal + [(0, 0, 0)])


def test_gif_skips_extension_blocks():
    blob = bytearray(encode_gif(2, 2, bytes([1, 2, 3, 4])))
    # splice a graphic-control extension right before the descriptor
    at = blob.index(0x2C, 13 + 768)
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    patched = bytes(blob[:at]) + gce + bytes(blob[at:])
    assert decode_gif(patched)[3] == _rgb_of([1, 2, 3, 4])


def test_gif_frame_count_multiframe():
    one = encode_gif(2, 2, bytes([0, 1, 2, 3]))
    # concatenate a second image block by stripping trailer + header
    body = one[13 + 768:-1]
    multi = one[:-1] + body + b"\x3b"
    assert frame_count(one) == 1
    assert frame_count(multi) == 2
    # decode still returns the FIRST frame
    assert decode_gif(multi)[3] == _rgb_of([0, 1, 2, 3])


def test_gif_malformed_raises():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG........")
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a\x02\x00")  # truncated header
    good = encode_gif(4, 2, bytes(range(8)))
    with pytest.raises(ValueError):
        decode_gif(good[:20])  # truncated color table / no image


# ------------------------------------------------------------------ spark

def test_image_features_gif_codec(spark):
    from nyctaxidatapipeline_spark.operators.multimodal import (
        image_features,
    )

    idx0 = bytes((i * 3) % 256 for i in range(32))
    blob0 = encode_gif(8, 4, idx0)
    blob1 = encode_gif(8, 4, idx0, interlace=True)
    df = spark.createDataFrame(
        [(0, blob0), (1, blob1), (2, b"junk"), (3, None)],
        "asset_id long, media binary")
    rows = {r.asset_id: r for r in
            image_features(df, codec="gif").collect()}
    exp = sum(idx0) / 32
    assert rows[0].width == 8 and rows[0].height == 4
    assert rows[0].mean_intensity == pytest.approx(exp)
    assert rows[1].mean_intensity == pytest.approx(exp)
    assert rows[2].width is None
    assert rows[3].width is None
