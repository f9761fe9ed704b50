"""Pure-stdlib WAV (RIFF/PCM) codec — the audio twin of
``functions.png`` / ``functions.avi``: the container image has no
librosa/soundfile/pydub, but Python ships a real WAV codec in the
standard library (``wave``), so the "real audio decode" for the
multimodal operators is genuinely real here — header validation, fmt
chunk parsing, and PCM frame extraction all happen through the stdlib
reference implementation, not a fake header.

``encode_wav`` writes a canonical PCM WAV (RIFF 'WAVE' / fmt / data)
from raw int16 samples; ``parse_wav`` reads any uncompressed PCM WAV
(8/16/24/32-bit, any channel count) back into (sample_rate, channels,
sampwidth, n_frames, pcm bytes). Compressed formats (A-law/mu-law/...)
raise ``ValueError`` naming the limit — decoding those is exactly the
soundfile/ffmpeg slot-in, the same argument as the PNG/AVI codecs.

Reference behavior parity note: the reference pipeline
(yellow_taxi_etl.py, 237 lines) has no media path at all — this module
exists for the training-data-pipeline surface (multimodal corpora),
not for reference parity.
"""

from __future__ import annotations

import io
import wave


def encode_wav(sample_rate: int, channels: int,
               samples: bytes) -> bytes:
    """Build a PCM WAV from raw little-endian int16 sample bytes
    (interleaved when ``channels > 1``). ``len(samples)`` must be a
    multiple of ``2 * channels``."""
    frame_bytes = 2 * channels
    if len(samples) % frame_bytes:
        raise ValueError(
            f"sample payload ({len(samples)} bytes) is not a multiple "
            f"of the {frame_bytes}-byte frame size")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples)
    return buf.getvalue()


def parse_wav(data: bytes) -> dict:
    """Parse a PCM WAV: returns ``{sample_rate, channels, sampwidth,
    n_frames, pcm}`` with ``pcm`` the raw interleaved sample bytes.
    Raises ``ValueError`` for non-RIFF input, truncated streams, and
    compressed (non-PCM) encodings."""
    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getcomptype() != "NONE":
                raise ValueError(
                    f"compressed WAV ({w.getcomptype()}) needs a real "
                    "codec (soundfile/ffmpeg slot-in)")
            n = w.getnframes()
            pcm = w.readframes(n)
            return {"sample_rate": w.getframerate(),
                    "channels": w.getnchannels(),
                    "sampwidth": w.getsampwidth(),
                    "n_frames": n,
                    "pcm": pcm}
    except wave.Error as e:
        raise ValueError(f"not a PCM WAV stream: {e}") from e
    except EOFError as e:
        raise ValueError("truncated WAV stream") from e
