"""Pure-stdlib GIF codec — encode + decode, LZW for real.

Completes the image-codec family (PNG baseline + Adam7 in
``functions.png``, JPEG baseline + progressive in ``functions.jpeg``):
GIF87a/89a logical screen + color table parsing, extension-block
skipping, four-pass row interlacing, and the variable-code-width GIF
LZW scheme (clear/end codes, code-size growth to 12 bits, dictionary
reset, the KwKwK self-reference case) — both directions, no PIL.

Scope: 8-bit indexed images with a global or local color table;
the first image descriptor is decoded to RGB, remaining frames are
counted structurally (``frame_count``). Transparency/disposal
(GCE handling) affects compositing of LATER frames only, which is
out of scope for per-asset feature extraction.

Used by ``operators.multimodal.image_features(codec='gif')`` inside
mapInPandas — the sanctioned Arrow-batched Python zone (see
PLANS.md; binary media never leaves the executors).
"""

from __future__ import annotations

import struct

__all__ = ["encode_gif", "decode_gif", "frame_count",
           "GRAY_PALETTE"]

#: 256-entry grayscale palette (r = g = b = index) — the fixture
#: palette: it makes mean RGB intensity equal mean index.
GRAY_PALETTE = [(i, i, i) for i in range(256)]

#: Adam4, effectively: GIF's four interlace passes (row origin, step).
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlaced_row_order(height: int) -> list[int]:
    return [r for start, step in _INTERLACE_PASSES
            for r in range(start, height, step)]


# ---------------------------------------------------------------------------
# LZW (GIF variant: little-endian bit packing, variable code width)
# ---------------------------------------------------------------------------

def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    prefix = b""
    for byte in data:
        trial = prefix + bytes([byte])
        if trial in table:
            prefix = trial
            continue
        emit(table[prefix], width)
        if next_code < 4096:
            table[trial] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]        # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("LZW stream ended early")
    return bytes(out[:n_pixels])


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

def encode_gif(width: int, height: int, indices: bytes,
               palette: list[tuple[int, int, int]] | None = None,
               interlace: bool = False) -> bytes:
    """Encode one indexed frame as a GIF89a with a global color table."""
    if len(indices) != width * height:
        raise ValueError("indices length must be width*height")
    palette = palette if palette is not None else GRAY_PALETTE
    bits = max(1, (max(len(palette) - 1, 1)).bit_length())
    size = 1 << bits
    pal = bytes(c for i in range(size)
                for c in (palette[i] if i < len(palette) else (0, 0, 0)))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | ((bits - 1) << 4) | (bits - 1), 0, 0)
    out += pal
    if interlace:
        rows = _interlaced_row_order(height)
        indices = b"".join(indices[r * width:(r + 1) * width]
                           for r in rows)
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height,
                       0x40 if interlace else 0)
    min_code = max(2, bits)
    out.append(min_code)
    stream = _lzw_encode(indices, min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)       # block terminator
    out.append(0x3B)    # trailer
    return bytes(out)


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("unterminated sub-block sequence")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos:pos + n])
        if len(chunks[-1]) < n:
            raise ValueError("truncated sub-block")
        pos += n


def decode_gif(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST frame to ``(width, height, 3, rgb_bytes)``."""
    w, h, rgb, _n = _walk(data, want_pixels=True)
    return w, h, 3, rgb


def frame_count(data: bytes) -> int:
    """Count image descriptors without decoding pixel data."""
    return _walk(data, want_pixels=False)[3]


def _walk(data: bytes, want_pixels: bool
          ) -> tuple[int, int, bytes, int]:
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    global_pal = b""
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        global_pal = data[pos:pos + 3 * n]
        if len(global_pal) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    first: tuple[int, int, bytes] | None = None
    frames = 0
    while pos < len(data):
        marker = data[pos]
        pos += 1
        if marker == 0x3B:                      # trailer
            break
        if marker == 0x21:                      # extension
            pos += 1                            # label
            _, pos = _read_subblocks(data, pos)
            continue
        if marker != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{marker:02x}")
        if pos + 9 > len(data):
            raise ValueError("truncated image descriptor")
        _l, _t, iw, ih, ipacked = struct.unpack("<HHHHB",
                                                data[pos:pos + 9])
        pos += 9
        pal = global_pal
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = data[pos:pos + 3 * n]
            if len(pal) < 3 * n:
                raise ValueError("truncated local color table")
            pos += 3 * n
        if pos >= len(data):
            raise ValueError("missing LZW minimum code size")
        min_code = data[pos]
        pos += 1
        stream, pos = _read_subblocks(data, pos)
        frames += 1
        if first is None:
            if want_pixels:
                idx = _lzw_decode(stream, min_code, iw * ih)
                if ipacked & 0x40:              # interlaced
                    rows = _interlaced_row_order(ih)
                    plain = bytearray(iw * ih)
                    for src, dst in enumerate(rows):
                        plain[dst * iw:(dst + 1) * iw] = \
                            idx[src * iw:(src + 1) * iw]
                    idx = bytes(plain)
                if not pal:
                    raise ValueError("no color table for frame")
                npal = len(pal) // 3
                if max(idx) >= npal:
                    raise ValueError("palette index out of range")
                rgb = b"".join(pal[3 * i:3 * i + 3] for i in idx)
            else:
                rgb = b""
            first = (iw, ih, rgb)
    if first is None:
        raise ValueError("GIF contains no image")
    return first[0], first[1], first[2], frames
