"""MP3 (MPEG audio) frame-header walker — pure stdlib, no ffmpeg.

Container-level parsing for the ``multimodal.audio_features`` MP3 slot,
following the AVI precedent (``avi.py``): REAL header/frame-structure
parsing — sync word, version/layer, bitrate + sample-rate tables, frame
length arithmetic, ID3v2/ID3v1 tag handling — yielding the metadata a
training-data pipeline filters and partitions on (sample rate, channel
count, frame count, duration, average bitrate) WITHOUT decoding PCM.
Full PCM decode (hybrid filterbank + IMDCT) remains the documented
library slot (``audio_features(codec='real')`` →
soundfile/ffmpeg): amplitude features are NULL for MP3 media by
design, never fabricated.

Frame geometry per ISO/IEC 11172-3 / 13818-3:

  * header: 11-bit sync, 2-bit version (MPEG1 / MPEG2 / MPEG2.5),
    2-bit layer (I/II/III), bitrate index, sample-rate index, padding
    bit, channel mode;
  * samples per frame: Layer I 384; Layer II 1152; Layer III 1152
    (MPEG1) / 576 (MPEG2 & 2.5);
  * frame bytes: floor(samples/8 · bitrate / sample_rate) + padding
    (padding is 4 bytes for Layer I — one slot — else 1).

The walk is strict: an optional ID3v2 prefix, then contiguous frames,
then an optional 128-byte ID3v1 trailer. Free-format (bitrate index 0)
and reserved field values raise ``ValueError`` — the multimodal layer
maps that to NULL features, so a malformed stream can never fabricate
metadata.
"""

from __future__ import annotations

#: bitrate tables in kbps, indexed [version_group][layer][bitrate_index];
#: version_group 0 = MPEG1, 1 = MPEG2/2.5. Index 0 (free format) and 15
#: (reserved) are invalid here.
_BITRATES = {
    (0, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352,
             384, 416, 448],
    (0, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
             320, 384],
    (0, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
             256, 320],
    (1, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
             224, 256],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
    (1, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
             160],
}

#: sample-rate tables by version: MPEG1, MPEG2, MPEG2.5.
_RATES = {
    3: [44100, 48000, 32000],      # MPEG1   (version bits 11)
    2: [22050, 24000, 16000],      # MPEG2   (version bits 10)
    0: [11025, 12000, 8000],       # MPEG2.5 (version bits 00)
}

_VERSION_NAME = {3: "mpeg1", 2: "mpeg2", 0: "mpeg2.5"}


def _parse_header(b: bytes, off: int) -> dict:
    """Parse the 4-byte frame header at ``off`` or raise ValueError."""
    if off + 4 > len(b):
        raise ValueError("mp3: truncated frame header")
    h = int.from_bytes(b[off:off + 4], "big")
    if (h >> 21) & 0x7FF != 0x7FF:
        raise ValueError("mp3: bad sync word")
    ver = (h >> 19) & 3
    if ver == 1:
        raise ValueError("mp3: reserved version")
    layer_bits = (h >> 17) & 3
    if layer_bits == 0:
        raise ValueError("mp3: reserved layer")
    layer = 4 - layer_bits            # bits 11->Layer I ... 01->Layer III
    bri = (h >> 12) & 0xF
    if bri == 0:
        raise ValueError("mp3: free-format bitrate unsupported")
    if bri == 15:
        raise ValueError("mp3: reserved bitrate index")
    sri = (h >> 10) & 3
    if sri == 3:
        raise ValueError("mp3: reserved sample-rate index")
    vgroup = 0 if ver == 3 else 1
    bitrate = _BITRATES[(vgroup, layer)][bri] * 1000
    rate = _RATES[ver][sri]
    padding = (h >> 9) & 1
    mode = (h >> 6) & 3
    channels = 1 if mode == 3 else 2
    if layer == 1:
        spf = 384
        nbytes = (12 * bitrate // rate + padding) * 4
    else:
        spf = 576 if (layer == 3 and ver != 3) else 1152
        nbytes = spf // 8 * bitrate // rate + padding
    return {"version": _VERSION_NAME[ver], "layer": layer,
            "bitrate": bitrate, "sample_rate": rate,
            "channels": channels, "samples": spf, "nbytes": nbytes}


def parse_mp3(data: bytes) -> dict:
    """Walk every frame of an MP3 stream. Returns sample_rate, channels,
    n_frames, samples_per_frame, duration_sec (n·spf/rate, exact double
    division), bitrate_kbps_avg (mean over frames — VBR-aware), layer,
    version, frames (list of (offset, nbytes)). Raises ``ValueError``
    (only) on malformed input."""
    if not isinstance(data, (bytes, bytearray)):
        raise ValueError("mp3: not a byte stream")
    data = bytes(data)
    pos = 0
    # optional ID3v2 prefix: 'ID3' + ver(2) + flags(1) + syncsafe size(4)
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise ValueError("mp3: truncated ID3v2 tag")
        if any(x & 0x80 for x in data[6:10]):
            raise ValueError("mp3: bad ID3v2 syncsafe size")
        size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
        pos = 10 + size
        if pos > len(data):
            raise ValueError("mp3: ID3v2 size beyond stream")
    frames = []
    first = None
    total_bits = 0
    total_samples = 0
    while pos < len(data):
        if data[pos:pos + 3] == b"TAG" and len(data) - pos == 128:
            break                     # ID3v1 trailer
        hdr = _parse_header(data, pos)
        if pos + hdr["nbytes"] > len(data):
            raise ValueError("mp3: truncated frame payload")
        if first is None:
            first = hdr
        elif (hdr["sample_rate"] != first["sample_rate"]
              or hdr["layer"] != first["layer"]
              or hdr["channels"] != first["channels"]):
            raise ValueError("mp3: inconsistent stream parameters")
        frames.append((pos, hdr["nbytes"]))
        total_bits += hdr["bitrate"]
        total_samples += hdr["samples"]
        pos += hdr["nbytes"]
    if first is None:
        raise ValueError("mp3: no frames")
    n = len(frames)
    return {
        "sample_rate": first["sample_rate"],
        "channels": first["channels"],
        "n_frames": n,
        "samples_per_frame": first["samples"],
        "duration_sec": float(total_samples) / first["sample_rate"],
        "bitrate_kbps_avg": total_bits / n / 1000.0,
        "layer": first["layer"],
        "version": first["version"],
        "frames": frames,
    }


def synth_mp3_stream(n_frames: int, bitrate_kbps: int = 128,
                     sample_rate: int = 44100, channels: int = 2,
                     layer: int = 3, id3v2_bytes: int = 0,
                     id3v1: bool = False,
                     fill: int = 0xAA) -> bytes:
    """Build a structurally-valid MPEG1 stream of ``n_frames`` frames
    with constant-fill payloads — the parser-side test twin (the
    payload content is opaque to header walking, exactly like the AVI
    synthesizer's dummy frame bytes). Only MPEG1 rates are accepted."""
    if sample_rate not in _RATES[3]:
        raise ValueError("synth: MPEG1 sample rates only")
    table = _BITRATES[(0, layer)]
    if bitrate_kbps not in table or bitrate_kbps == 0:
        raise ValueError("synth: bitrate not in MPEG1 table")
    bri = table.index(bitrate_kbps)
    sri = _RATES[3].index(sample_rate)
    layer_bits = 4 - layer
    mode = 3 if channels == 1 else 0
    h = (0x7FF << 21) | (3 << 19) | (layer_bits << 17) | (1 << 16) \
        | (bri << 12) | (sri << 10) | (mode << 6)
    header = h.to_bytes(4, "big")
    if layer == 1:
        nbytes = (12 * bitrate_kbps * 1000 // sample_rate) * 4
    else:
        spf = 1152
        nbytes = spf // 8 * bitrate_kbps * 1000 // sample_rate
    frame = header + bytes([fill]) * (nbytes - 4)
    out = b""
    if id3v2_bytes:
        size = id3v2_bytes
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
        out += b"ID3\x04\x00\x00" + ss + bytes(id3v2_bytes)
    out += frame * n_frames
    if id3v1:
        out += b"TAG" + bytes(125)
    return out
