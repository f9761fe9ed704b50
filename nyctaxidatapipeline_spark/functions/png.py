"""Minimal pure-stdlib PNG codec (RFC 2083 baseline subset).

The container has no PIL/cv2, so the "real image codec" for the
multimodal operators is this self-contained decoder: 8-bit-depth,
non-interlaced PNGs in grayscale (color type 0), RGB (2) and RGBA (6),
with full support for all five scanline filter types (None/Sub/Up/
Average/Paeth). That covers everything the matching ``encode_png``
emits and the common output of real encoders for small assets.

Adam7 interlacing IS supported (both directions): each of the seven
passes is an independently-filtered sub-image — pass scanlines
unfilter against the pass's own previous line, then scatter into the
output grid on the pass's (origin, step) lattice; empty passes of
tiny images contribute zero bytes, per the spec.

Scope notes (deliberate, documented limits — a ``ValueError`` names the
unsupported feature rather than mis-decoding): no palette (color type
3), no 16-bit channels, ancillary chunks are skipped. Production swaps
in PIL/turbojpeg for breadth + SIMD; the operator plumbing (Arrow
batching, column pruning, schema) is identical either way — which is
the point: ``image_features(codec='png')`` runs a REAL decode
end-to-end in this container.

Decode cost is per-byte Python for Sub/Average/Paeth scanlines (the
filters have an intra-line sequential dependency); None/Up lines are
vectorized. Fine for the asset sizes tests use; the decode stage is
Arrow-batched per partition either way.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per pixel by PNG color type (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 6: 4}

#: Adam7 pass lattice: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _adam7_dims(width: int, height: int) -> list[tuple[int, int]]:
    """(pass_width, pass_height) for each Adam7 pass; (0, h)/(w, 0)
    passes are empty and carry no scanlines at all."""
    return [(-(-(width - x0) // dx) if width > x0 else 0,
             -(-(height - y0) // dy) if height > y0 else 0)
            for x0, y0, dx, dy in _ADAM7]


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF))


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _apply_filter(ftype: int, raw: bytes, prev: bytes, bpp: int) -> bytes:
    """Filter one scanline for ENCODING (recon -> filtered)."""
    out = bytearray(len(raw))
    for i, x in enumerate(raw):
        a = raw[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 0:
            out[i] = x
        elif ftype == 1:
            out[i] = (x - a) & 0xFF
        elif ftype == 2:
            out[i] = (x - b) & 0xFF
        elif ftype == 3:
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
    return bytes(out)


def _unfilter(ftype: int, line: bytearray, prev: bytes, bpp: int) -> None:
    """Reverse one scanline filter in place (filtered -> recon)."""
    if ftype == 0:
        return
    if ftype == 2:
        for i in range(len(line)):
            line[i] = (line[i] + prev[i]) & 0xFF
        return
    for i in range(len(line)):
        a = line[i - bpp] if i >= bpp else 0
        b = prev[i]
        c = prev[i - bpp] if i >= bpp else 0
        if ftype == 1:
            line[i] = (line[i] + a) & 0xFF
        elif ftype == 3:
            line[i] = (line[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            line[i] = (line[i] + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")


def encode_png(width: int, height: int, pixels: bytes,
               color_type: int = 2, filter_type: int = 0,
               interlace: bool = False) -> bytes:
    """Encode raw 8-bit pixel bytes (row-major, no padding) as a PNG.

    ``filter_type`` selects the scanline filter applied to EVERY line —
    0 for the trivial stream, 1-4 to exercise the decoder's unfilter
    paths in tests. ``interlace=True`` emits an Adam7 stream: each
    pass's sub-image is extracted and filtered independently.
    """
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise ValueError(f"unsupported color type {color_type}")
    stride = width * ch
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, "
                         f"got {len(pixels)}")
    lines = []
    if interlace:
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7,
                                              _adam7_dims(width, height)):
            if pw == 0 or ph == 0:
                continue
            prev = bytes(pw * ch)
            for py in range(ph):
                y = y0 + py * dy
                raw = b"".join(
                    pixels[(y * width + x0 + px * dx) * ch:
                           (y * width + x0 + px * dx) * ch + ch]
                    for px in range(pw))
                lines.append(bytes([filter_type])
                             + _apply_filter(filter_type, raw, prev, ch))
                prev = raw
    else:
        prev = bytes(stride)
        for y in range(height):
            raw = pixels[y * stride:(y + 1) * stride]
            lines.append(bytes([filter_type])
                         + _apply_filter(filter_type, raw, prev, ch))
            prev = raw
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0,
                       1 if interlace else 0)
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG into ``(width, height, channels, pixel_bytes)``.

    ``pixel_bytes`` is the reconstructed row-major 8-bit image
    (``width * height * channels`` bytes). Raises ``ValueError`` on
    malformed input or on features outside the supported subset.
    """
    if len(data) < len(_SIG) + 12 or data[:len(_SIG)] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_SIG)
    width = height = channels = -1
    adam7 = False
    idat = bytearray()
    seen_end = False
    while pos + 8 <= len(data):
        (length,), tag = struct.unpack(">I", data[pos:pos + 4]), \
            data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        pos += 12 + length          # length + tag + payload + crc
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace not in (0, 1):
                raise ValueError(f"unknown interlace method {interlace}")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
            channels = _CHANNELS[ctype]
            adam7 = interlace == 1
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            seen_end = True
            break
    if width < 0:
        raise ValueError("missing IHDR")
    if not seen_end:
        raise ValueError("missing IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if adam7:
        expected = sum((pw * channels + 1) * ph
                       for pw, ph in _adam7_dims(width, height)
                       if pw and ph)
        if len(raw) != expected:
            raise ValueError(f"IDAT decodes to {len(raw)} bytes, "
                             f"expected {expected} (Adam7)")
        out = bytearray(stride * height)
        pos = 0
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7,
                                              _adam7_dims(width, height)):
            if pw == 0 or ph == 0:
                continue
            pstride = pw * channels
            prev = bytes(pstride)
            for py in range(ph):
                ftype = raw[pos]
                line = bytearray(raw[pos + 1:pos + 1 + pstride])
                pos += 1 + pstride
                _unfilter(ftype, line, prev, channels)
                y = y0 + py * dy
                for px in range(pw):
                    o = (y * width + x0 + px * dx) * channels
                    out[o:o + channels] = \
                        line[px * channels:(px + 1) * channels]
                prev = bytes(line)
        return width, height, channels, bytes(out)
    if len(raw) != (stride + 1) * height:
        raise ValueError(f"IDAT decodes to {len(raw)} bytes, expected "
                         f"{(stride + 1) * height}")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        _unfilter(ftype, line, prev, channels)
        out[y * stride:(y + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)
