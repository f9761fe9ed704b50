"""Pure-Python Snappy codec — raw block format + framing format.

Completes the compressed-shard codec family next to the stdlib trio
(zlib/bz2/lzma in ``sources/compressed.py``): Snappy is the Hadoop/
Kafka-ecosystem interchange codec (SequenceFiles, Kafka message sets,
many JSONL corpus mirrors), and unlike zstd its format is small enough
to implement honestly here — LZ77 with byte-oriented tags, no entropy
coding (format: google/snappy format_description.txt; framing:
framing_format.txt — both public).

Raw format: varint uncompressed length, then tagged elements — tag low
2 bits select literal (00, 6-bit length or 1-4 extension bytes), copy
with 1-byte offset (01, len 4-11, offset < 2048), 2-byte LE offset
(10, len 1-64) or 4-byte LE offset (11). Copies may overlap forward
(length > offset) — decode is byte-by-byte from the output buffer.

Framing format: 4-byte chunk headers (type + 24-bit LE length);
stream identifier chunk (0xff, "sNaPpY"), compressed (0x00) /
uncompressed (0x01) data chunks each carrying the MASKED CRC32C of
their uncompressed payload — mask = rotate-right-15 + 0xa282ead8, the
Castagnoli polynomial (0x82F63B78 reflected), table-driven below.
Chunks cap at 65536 uncompressed bytes, so a shard decodes in bounded
memory per chunk and a corrupted chunk is localized by its checksum.

The ENCODER is a greedy reference-style LZ (4-byte hash table, 2-byte
offset copies, 64-byte match cap) — deterministic, so fixtures are
replayable; any spec-conformant snappy decoder reads its output.
"""

from __future__ import annotations

__all__ = [
    "crc32c",
    "snappy_compress",
    "snappy_decompress",
    "frame_compress",
    "frame_decompress",
    "FRAME_MAGIC",
]

#: The full stream-identifier chunk every framed stream starts with.
FRAME_MAGIC = b"\xff\x06\x00\x00sNaPpY"

_MAX_CHUNK = 65536  # max uncompressed bytes per framed chunk (spec)


def _crc32c_table() -> list[int]:
    poly = 0x82F63B78
    table = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        table.append(c)
    return table


_CRC_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    """CRC-32C (Castagnoli), the framing format's checksum."""
    crc = 0xFFFFFFFF
    for byte in data:
        crc = (crc >> 8) ^ _CRC_TABLE[(crc ^ byte) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def _varint(n: int) -> bytes:
    out = bytearray()
    while n >= 0x80:
        out.append((n & 0x7F) | 0x80)
        n >>= 7
    out.append(n)
    return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated snappy varint")
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy varint too long")


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < (1 << 24):
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += lit


def snappy_compress(data: bytes) -> bytes:
    """Raw-format compress: greedy 4-byte-hash LZ emitting 2-byte-offset
    copies (len 4-64, offset <= 65535) between literals."""
    out = bytearray(_varint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    i = lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        j = table.get(key, -1)
        table[key] = i
        if 0 <= j and 0 < i - j <= 0xFFFF:
            length = 4
            while (i + length < n and length < 64
                   and data[j + length] == data[i + length]):
                length += 1
            if lit_start < i:
                _emit_literal(out, data[lit_start:i])
            out.append(0x02 | ((length - 1) << 2))
            out += (i - j).to_bytes(2, "little")
            i += length
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:n])
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Raw-format decompress, all four tag types, bounds-checked."""
    expected, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0x00:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise ValueError("truncated literal length")
                ln = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise ValueError("truncated literal body")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 0x01:  # copy, 1-byte offset
            length = 4 + ((tag >> 2) & 0x07)
            if pos >= n:
                raise ValueError("truncated copy offset")
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 0x02:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("truncated copy offset")
            offset = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("truncated copy offset")
            offset = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy copy offset out of range")
        start = len(out) - offset
        if length <= offset:
            out += out[start:start + length]
        else:  # overlapping forward copy: byte-by-byte semantics
            for k in range(length):
                out.append(out[start + k])
    if len(out) != expected:
        raise ValueError(
            f"snappy length mismatch: got {len(out)}, header {expected}")
    return bytes(out)


def frame_compress(data: bytes) -> bytes:
    """Framing-format encode: stream identifier + <=64 KiB compressed
    chunks, each with the masked CRC32C of its uncompressed payload.
    Chunks where compression doesn't help are stored uncompressed
    (type 0x01), per the spec's recommendation."""
    out = bytearray(FRAME_MAGIC)
    for off in range(0, len(data), _MAX_CHUNK) or [0]:
        chunk = data[off:off + _MAX_CHUNK]
        crc = _masked_crc(chunk).to_bytes(4, "little")
        comp = snappy_compress(chunk)
        if len(comp) < len(chunk):
            body, ctype = crc + comp, 0x00
        else:
            body, ctype = crc + chunk, 0x01
        out.append(ctype)
        out += len(body).to_bytes(3, "little")
        out += body
    return bytes(out)


def frame_decompress(data: bytes) -> bytes:
    """Framing-format decode with checksum verification; skippable
    chunk types (0x80-0xfe, incl. padding 0xfe) are skipped, reserved
    unskippable types raise, as the spec requires."""
    if data[:len(FRAME_MAGIC)] != FRAME_MAGIC:
        raise ValueError("not a framed snappy stream (bad identifier)")
    pos = len(FRAME_MAGIC)
    out = bytearray()
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("truncated chunk header")
        ctype = data[pos]
        ln = int.from_bytes(data[pos + 1:pos + 4], "little")
        pos += 4
        if pos + ln > n:
            raise ValueError("truncated chunk body")
        body = data[pos:pos + ln]
        pos += ln
        if ctype in (0x00, 0x01):
            if ln < 4:
                raise ValueError("chunk too short for checksum")
            want = int.from_bytes(body[:4], "little")
            payload = (snappy_decompress(body[4:]) if ctype == 0x00
                       else bytes(body[4:]))
            if len(payload) > _MAX_CHUNK:
                raise ValueError("chunk exceeds 65536-byte cap")
            if _masked_crc(payload) != want:
                raise ValueError("snappy chunk checksum mismatch")
            out += payload
        elif ctype == 0xFF:
            if body != b"sNaPpY":
                raise ValueError("bad repeated stream identifier")
        elif 0x80 <= ctype <= 0xFE:
            continue  # skippable (padding etc.)
        else:
            raise ValueError(
                f"reserved unskippable snappy chunk type 0x{ctype:02x}")
    return bytes(out)
