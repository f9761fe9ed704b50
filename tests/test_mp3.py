"""MP3 frame-header walker (``functions.mp3``) — the r6 VERDICT's
optional stretch slot, following the AVI container-parse precedent:
REAL header/frame-geometry parsing, amplitude features honestly NULL
(PCM decode stays the documented library slot)."""

from __future__ import annotations

import pytest

from nyctaxidatapipeline_spark.functions.mp3 import (
    parse_mp3,
    synth_mp3_stream,
)


def test_parse_basic_cbr():
    data = synth_mp3_stream(5, bitrate_kbps=128, sample_rate=44100,
                            channels=2)
    m = parse_mp3(data)
    assert m["sample_rate"] == 44100
    assert m["channels"] == 2
    assert m["n_frames"] == 5
    assert m["samples_per_frame"] == 1152
    assert m["duration_sec"] == 5 * 1152 / 44100
    assert m["bitrate_kbps_avg"] == 128.0
    assert m["layer"] == 3 and m["version"] == "mpeg1"
    # frame geometry: 144 * 128000 / 44100 = 417 bytes, contiguous
    assert m["frames"] == [(i * 417, 417) for i in range(5)]


@pytest.mark.parametrize("rate,kbps,ch,layer,spf,nbytes", [
    (44100, 128, 2, 3, 1152, 417),
    (48000, 192, 1, 3, 1152, 576),
    (32000, 64, 2, 3, 1152, 288),
    (44100, 192, 2, 2, 1152, 626),     # Layer II
    (44100, 448, 2, 1, 384, 487 // 4 * 4 + 0),  # Layer I slot arithmetic
])
def test_parse_geometry_matrix(rate, kbps, ch, layer, spf, nbytes):
    data = synth_mp3_stream(3, bitrate_kbps=kbps, sample_rate=rate,
                            channels=ch, layer=layer)
    m = parse_mp3(data)
    assert m["sample_rate"] == rate
    assert m["channels"] == ch
    assert m["n_frames"] == 3
    assert m["samples_per_frame"] == spf
    if layer == 1:
        assert m["frames"][0][1] == (12 * kbps * 1000 // rate) * 4
    else:
        assert m["frames"][0][1] == spf // 8 * kbps * 1000 // rate


def test_parse_id3_tags():
    data = synth_mp3_stream(4, id3v2_bytes=100, id3v1=True)
    m = parse_mp3(data)
    assert m["n_frames"] == 4
    assert m["frames"][0][0] == 110          # after 10+100 ID3v2 bytes


def test_parse_vbr_average():
    a = synth_mp3_stream(2, bitrate_kbps=128)
    b = synth_mp3_stream(2, bitrate_kbps=192)
    m = parse_mp3(a + b)
    assert m["n_frames"] == 4
    assert m["bitrate_kbps_avg"] == (128 + 128 + 192 + 192) / 4


def test_parse_rejects_malformed():
    good = synth_mp3_stream(3)
    for bad in (b"", b"garbage", good[:10], good[:-5],
                b"ID3\x04\x00\x00\x00\x00\x00\xFF",
                b"\xFF\xFB" + bytes(2)):
        with pytest.raises(ValueError):
            parse_mp3(bad)
    # inconsistent mid-stream parameters rejected
    mixed = synth_mp3_stream(2, sample_rate=44100) + \
        synth_mp3_stream(1, sample_rate=48000)
    with pytest.raises(ValueError):
        parse_mp3(mixed)


def test_parse_bitflip_fuzz_valueerror_only():
    import numpy as np

    rng = np.random.default_rng(17)
    base = bytearray(synth_mp3_stream(3, id3v2_bytes=20))
    for _ in range(300):
        mutated = bytearray(base)
        i = int(rng.integers(0, len(mutated)))
        mutated[i] ^= int(rng.integers(1, 256))
        try:
            parse_mp3(bytes(mutated))
        except ValueError:
            pass


def test_audio_features_mp3_codec(spark):
    """End-to-end through mapInPandas: container metadata real,
    amplitude features NULL, undecodable media all-NULL."""
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.operators.multimodal import (
        audio_features,
    )

    rows = [Row(asset_id=1, media=bytearray(
                synth_mp3_stream(6, channels=1))),
            Row(asset_id=2, media=bytearray(b"not an mp3"))]
    out = {r["asset_id"]: r for r in
           audio_features(spark.createDataFrame(rows), codec="mp3")
           .collect()}
    r1 = out[1]
    assert r1["sample_rate"] == 44100 and r1["channels"] == 1
    assert r1["n_frames"] == 6
    assert abs(r1["duration_sec"] - 6 * 1152 / 44100) < 1e-12
    assert r1["mean_abs"] is None and r1["peak"] is None
    assert out[2]["sample_rate"] is None
