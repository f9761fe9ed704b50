"""Minimal pure-stdlib AVI (RIFF) container codec — the video twin of
``functions.png``: the container has no ffmpeg/PyAV, so the "real video
container" for the multimodal operators is this self-contained
uncompressed-AVI writer/parser. ``encode_avi`` emits a spec-shaped file
(RIFF 'AVI ' / LIST hdrl with avih + strl(strh,strf) / LIST movi with
'00db' uncompressed-frame chunks / idx1 index) that standard players
accept for raw DIB video; ``parse_avi`` walks the chunk tree for real —
fourcc validation, header field extraction, idx1-first frame location
with a movi-scan fallback — rather than assuming fixed offsets.

Scope notes (deliberate, documented limits — a ``ValueError`` names the
unsupported feature rather than mis-parsing): single video stream,
uncompressed '00db' frames only (no '00dc' codec payloads — decoding
those is exactly the ffmpeg slot-in), no OpenDML extensions, no
interleaved audio. Production swaps in PyAV for breadth; the operator
plumbing (Arrow batching, column pruning, explode-shaped output) is
identical either way — the same argument as the PNG codec.

All integers little-endian per RIFF. Sub-chunks pad to even length.
"""

from __future__ import annotations

import struct

_AVIF_HASINDEX = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi(width: int, height: int, frames: list[bytes],
               fps: int = 25) -> bytes:
    """Build an uncompressed ('DIB ', 24-bit) AVI from raw frame
    payloads. Every frame must be ``width*height*3`` bytes (rows are
    assumed pre-padded to 4-byte alignment by the caller when width*3
    isn't a multiple of 4 — the 16x16 test assets need none)."""
    fsize = width * height * 3
    for i, f in enumerate(frames):
        if len(f) != fsize:
            raise ValueError(f"frame {i} is {len(f)} bytes, "
                             f"expected {fsize}")
    n = len(frames)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        fsize * fps,               # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        _AVIF_HASINDEX,            # dwFlags
        n,                         # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        fsize,                     # dwSuggestedBufferSize
        width, height,
        0, 0, 0, 0)                # dwReserved[4]
    strh = (b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIIII",
        0, 0, 0,                   # flags, priority, language
        0,                         # initial frames
        1, fps,                    # scale, rate -> rate/scale fps
        0, n,                      # start, length
        fsize,                     # suggested buffer
        0xFFFFFFFF,                # quality (default)
        fsize,                     # sample size
        0) + struct.pack("<HH", 0, 0))  # rcFrame as 4 shorts (8 bytes)
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, 24,  # BITMAPINFOHEADER, biBitCount=24
        0,                         # BI_RGB (uncompressed)
        fsize, 0, 0, 0, 0)
    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl",
                         _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi_payload = b"".join(_chunk(b"00db", f) for f in frames)
    movi = _list(b"movi", movi_payload)
    # idx1 offsets are relative to the 'movi' fourcc position
    idx_entries = []
    off = 4
    for f in frames:
        idx_entries.append(b"00db" + struct.pack("<III", 0x10, off,
                                                 len(f)))
        off += 8 + len(f) + (len(f) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def parse_avi(data: bytes) -> dict:
    """Parse the container: returns ``{width, height, n_frames, fps,
    frames: [(abs_payload_offset, size), ...]}``. Frame locations come
    from the idx1 index when present (the O(1)-seek path a sampler
    wants) and from a movi chunk walk otherwise; both are validated
    against the actual chunk fourccs."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    riff_size = struct.unpack("<I", data[4:8])[0]
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")

    width = height = n_frames = None
    fps = None
    movi_pos = None          # offset of the 'movi' fourcc
    movi_end = None
    idx1_raw = None

    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = pos + 8
        if fourcc == b"LIST":
            ltype = data[body:body + 4]
            if ltype == b"movi":
                movi_pos, movi_end = body, body + size
            elif ltype == b"hdrl":
                hpos = body + 4
                hend = body + size
                while hpos + 8 <= hend:
                    hcc = data[hpos:hpos + 4]
                    hsz = struct.unpack("<I",
                                        data[hpos + 4:hpos + 8])[0]
                    if hcc == b"avih":
                        a = struct.unpack("<IIIIIIIIIIIIII",
                                          data[hpos + 8:hpos + 8 + 56])
                        n_frames, width, height = a[4], a[8], a[9]
                        fps = (1_000_000 // a[0]) if a[0] else None
                    if hcc == b"LIST":
                        hpos += 12  # descend into strl
                        continue
                    hpos += 8 + hsz + (hsz % 2)
        elif fourcc == b"idx1":
            idx1_raw = data[body:body + size]
        pos = body + size + (size % 2)

    if width is None or movi_pos is None:
        raise ValueError("missing avih header or movi list")

    frames: list[tuple[int, int]] = []
    if idx1_raw is not None:
        for e in range(0, len(idx1_raw) - 15, 16):
            ckid = idx1_raw[e:e + 4]
            off, sz = struct.unpack("<II", idx1_raw[e + 8:e + 16])
            if ckid[2:4] not in (b"db", b"dc"):
                continue
            if ckid[2:4] == b"dc":
                raise ValueError("compressed '00dc' frames need a real "
                                 "codec (ffmpeg/PyAV slot-in)")
            chunk_pos = movi_pos + off
            if data[chunk_pos:chunk_pos + 4] != ckid:
                raise ValueError("idx1 entry does not point at its "
                                 "chunk — corrupt index")
            frames.append((chunk_pos + 8, sz))
    else:
        p = movi_pos + 4
        while p + 8 <= movi_end:
            ckid = data[p:p + 4]
            sz = struct.unpack("<I", data[p + 4:p + 8])[0]
            if ckid[2:4] == b"dc":
                raise ValueError("compressed '00dc' frames need a real "
                                 "codec (ffmpeg/PyAV slot-in)")
            if ckid[2:4] == b"db":
                frames.append((p + 8, sz))
            p += 8 + sz + (sz % 2)

    if n_frames is not None and n_frames != len(frames):
        raise ValueError(f"avih declares {n_frames} frames but the "
                         f"container holds {len(frames)}")
    return {"width": width, "height": height,
            "n_frames": len(frames), "fps": fps, "frames": frames}
