"""TFRecord container + tf.train.Example protobuf — pure stdlib.

The third leg of the training-export family (next to compressed JSONL
and WebDataset tars): TFRecord is what TensorFlow/JAX input pipelines
consume. Both layers are public formats implemented from their specs:

* **Record framing** (TensorFlow's ``tfrecord`` format)::

      [length:       uint64 LE]
      [masked_crc32c(length bytes): uint32 LE]
      [data:         length bytes]
      [masked_crc32c(data):         uint32 LE]

  with ``masked_crc = ((crc32c >> 15 | crc32c << 17) + 0xa282ead8)`` —
  the SAME Castagnoli polynomial + masking the framed-Snappy codec
  (``functions/snappy.py``) already implements, reused here.

* **tf.train.Example** — the standard protobuf payload, encoded with a
  from-scratch writer/reader for exactly the subset the schema uses
  (proto wire format is public and tiny)::

      Example  { Features features = 1 }
      Features { map<string, Feature> feature = 1 }
      Feature  { oneof kind { BytesList bytes_list = 1;
                              FloatList float_list = 2;
                              Int64List int64_list = 3 } }
      BytesList { repeated bytes value = 1 }
      FloatList { repeated float value = 1 [packed] }
      Int64List { repeated int64 value = 1 [packed] }

  Map fields serialize as repeated key/value submessages; this writer
  emits entries in SORTED KEY ORDER so Example bytes are a pure
  function of the feature dict (proto serialization is not canonical
  in general — determinism here is a deliberate extra promise, the
  same one the shard writers make).
"""

from __future__ import annotations

import struct

from nyctaxidatapipeline_spark.functions.snappy import _masked_crc, _varint

__all__ = ["encode_example", "decode_example",
           "frame_records", "unframe_records"]


# --- protobuf wire helpers (LEN = wire type 2, VARINT = 0) -------------

def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delimited(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _varint64(n: int) -> bytes:
    """Proto int64 varint: negatives encode as 10-byte two's
    complement (the proto3 rule)."""
    return _varint(n & 0xFFFFFFFFFFFFFFFF) if n < 0 else _varint(n)


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = n = 0
    while True:
        b = buf[i]
        i += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, i
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def encode_example(features: dict) -> bytes:
    """Serialize a feature dict to tf.train.Example bytes.

    Values map by Python type: ``bytes``/``str`` → BytesList (strs as
    UTF-8), ``int`` → Int64List, ``float`` → FloatList; a list of any
    of those becomes the multi-valued list (homogeneous). Keys are
    emitted sorted — byte-deterministic output."""
    entries = []
    for key in sorted(features):
        vals = features[key]
        if not isinstance(vals, (list, tuple)):
            vals = [vals]
        if not vals:
            raise ValueError(f"feature {key!r} has no values")
        v0 = vals[0]
        if isinstance(v0, (bytes, str)):
            body = b"".join(
                _len_delimited(1, v.encode("utf-8")
                               if isinstance(v, str) else bytes(v))
                for v in vals)
            feat = _len_delimited(1, body)            # bytes_list = 1
        elif isinstance(v0, bool):
            raise ValueError(f"feature {key!r}: bools are ambiguous")
        elif isinstance(v0, int):
            packed = b"".join(_varint64(int(v)) for v in vals)
            feat = _len_delimited(3, _len_delimited(1, packed))
        elif isinstance(v0, float):
            packed = b"".join(struct.pack("<f", float(v)) for v in vals)
            feat = _len_delimited(2, _len_delimited(1, packed))
        else:
            raise ValueError(f"feature {key!r}: unsupported type "
                             f"{type(v0).__name__}")
        entry = (_len_delimited(1, key.encode("utf-8"))
                 + _len_delimited(2, feat))
        entries.append(_len_delimited(1, entry))      # map entry
    return _len_delimited(1, b"".join(entries))       # Example.features


def decode_example(data: bytes) -> dict:
    """Parse tf.train.Example bytes back to {key: list-of-values}
    (bytes / int / float lists — the inverse of
    :func:`encode_example`, also accepting any field order)."""
    def fields(buf: bytes):
        i = 0
        while i < len(buf):
            key, i = _read_varint(buf, i)
            field, wire = key >> 3, key & 7
            if wire == 2:
                ln, i = _read_varint(buf, i)
                yield field, buf[i:i + ln]
                i += ln
            elif wire == 0:
                val, i = _read_varint(buf, i)
                yield field, val
            elif wire == 5:
                yield field, buf[i:i + 4]
                i += 4
            else:
                raise ValueError(f"unsupported wire type {wire}")

    def _i64(n: int) -> int:
        n &= 0xFFFFFFFFFFFFFFFF
        return n - (1 << 64) if n >= 1 << 63 else n

    out: dict = {}
    for f_ex, features_msg in fields(data):
        if f_ex != 1:
            continue
        for f_map, entry in fields(features_msg):
            if f_map != 1:
                continue
            key = None
            vals: list = []
            for f_e, payload in fields(entry):
                if f_e == 1:
                    key = payload.decode("utf-8")
                    continue
                # Proto3 parsers must accept BOTH packed and unpacked
                # encodings of repeated scalars regardless of the
                # declared form (TFRecords from non-TF writers use
                # unpacked): wire type 0/5 entries are one value each,
                # wire type 2 is a packed run. Repeated occurrences of
                # the same list field concatenate (proto merge rule) —
                # every branch APPENDS, never assigns.
                for kind, body in fields(payload):   # Feature.oneof
                    if kind == 1:                    # BytesList
                        vals.extend(v for f_b, v in fields(body)
                                    if f_b == 1)
                    elif kind == 3:                  # Int64List
                        for f_l, packed in fields(body):
                            if f_l != 1:
                                continue
                            if isinstance(packed, int):  # unpacked varint
                                vals.append(_i64(packed))
                                continue
                            i = 0
                            while i < len(packed):
                                n, i = _read_varint(packed, i)
                                vals.append(_i64(n))
                    elif kind == 2:                  # FloatList
                        for f_l, packed in fields(body):
                            if f_l != 1:
                                continue
                            # packed run (wire 2) or one unpacked
                            # fixed32 chunk (wire 5) — both arrive as
                            # bytes in 4-byte float units
                            vals.extend(
                                struct.unpack("<f", packed[j:j + 4])[0]
                                for j in range(0, len(packed), 4))
            if key is not None:
                out[key] = vals
    return out


def frame_records(records: list[bytes]) -> bytes:
    """Concatenated TFRecord frames of the given payloads."""
    out = bytearray()
    for rec in records:
        ln = struct.pack("<Q", len(rec))
        out += ln
        out += struct.pack("<I", _masked_crc(ln))
        out += rec
        out += struct.pack("<I", _masked_crc(rec))
    return bytes(out)


def unframe_records(blob: bytes) -> list[bytes]:
    """Parse a TFRecord stream back to record payloads, verifying both
    checksums of every frame (a flipped bit fails loudly — crawl-scale
    storage DOES flip bits)."""
    out = []
    i = 0
    while i < len(blob):
        if i + 12 > len(blob):
            raise ValueError("truncated TFRecord length header")
        ln_bytes = blob[i:i + 8]
        (ln,) = struct.unpack("<Q", ln_bytes)
        (crc_l,) = struct.unpack("<I", blob[i + 8:i + 12])
        if _masked_crc(ln_bytes) != crc_l:
            raise ValueError(f"length crc mismatch at offset {i}")
        i += 12
        if i + ln + 4 > len(blob):
            raise ValueError("truncated TFRecord payload")
        rec = blob[i:i + ln]
        (crc_d,) = struct.unpack("<I", blob[i + ln:i + ln + 4])
        if _masked_crc(rec) != crc_d:
            raise ValueError(f"data crc mismatch at offset {i}")
        out.append(rec)
        i += ln + 4
    return out
