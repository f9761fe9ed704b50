"""Pure-Python zstd codec: xxh64, frame roundtrips, entropy internals."""

import random

import pytest

from nyctaxidatapipeline_spark.functions.zstd import (
    _BackBitsWriter,
    _ForeBits,
    _LL_DEFAULT,
    _ML_DEFAULT,
    _OF_DEFAULT,
    _decode_literals,
    _fse_build_dtable,
    _fse_encode_intervals,
    _fse_read_ncount,
    _fse_state_for,
    _fse_write_ncount,
    _huf_build_dtable,
    _huf_read_weights,
    xxh64,
    zstd_compress,
    zstd_decompress,
)


def test_xxh64_known_vector_and_dispersion():
    assert xxh64(b"") == 0xEF46DB3751D8E999
    # all length regimes produce distinct, stable values
    vals = {xxh64(b"a" * n) for n in (1, 3, 4, 7, 8, 31, 32, 33, 100)}
    assert len(vals) == 9


def test_frame_roundtrip_shapes():
    r = random.Random(11)
    cases = [b"", b"a", b"hello zstd " * 50, bytes(range(256)) * 40,
             b"x" * 5000, "úñïçødé ✓ text ".encode() * 800,
             bytes(r.randrange(256) for _ in range(20000)),  # incompressible
             b"the quick brown fox jumps over the lazy dog. " * 4000]
    for data in cases:
        z = zstd_compress(data)
        assert zstd_decompress(z) == data
    rep = b"structure repeats here " * 2000
    assert len(zstd_compress(rep)) < len(rep) // 20


def test_multiframe_and_skippable():
    a, b = b"first frame " * 10, b"second " * 30
    skip = (0x184D2A53).to_bytes(4, "little") + (5).to_bytes(4, "little") \
        + b"extra"
    stream = zstd_compress(a) + skip + zstd_compress(b)
    assert zstd_decompress(stream) == a + b


def test_checksum_and_reserved_block_rejected():
    z = bytearray(zstd_compress(b"payload " * 100))
    bad = bytearray(z)
    bad[-1] ^= 0x55  # checksum byte
    with pytest.raises(ValueError):
        zstd_decompress(bytes(bad))
    # reserved block type: craft raw frame and set type bits to 3
    raw = bytearray(zstd_compress(bytes(random.Random(1).randbytes(40))))
    # block header starts after magic(4)+fhd(1)+fcs(1) for len<256
    raw[6] |= 0x06
    with pytest.raises(ValueError):
        zstd_decompress(bytes(raw))


def test_ncount_roundtrip_predefined_and_random():
    for norm, acc in (_LL_DEFAULT, _OF_DEFAULT, _ML_DEFAULT):
        blob = _fse_write_ncount(norm, acc)
        back, acc2 = _fse_read_ncount(_ForeBits(blob), 255)
        assert (back, acc2) == (norm, acc)
    r = random.Random(3)
    for _ in range(60):
        acc = r.randint(5, 9)
        nsym = r.randint(2, 40)
        counts = [0] * nsym
        rem = 1 << acc
        while rem > 0:
            s = r.randrange(nsym)
            c = min(rem, r.randint(1, max(1, rem // 2)))
            counts[s] += c
            rem -= c
        norm = counts[:]
        ones = [i for i, c in enumerate(norm) if c == 1]
        for i in ones[:r.randint(0, len(ones))]:
            norm[i] = -1
        blob = _fse_write_ncount(norm, acc)
        back, acc2 = _fse_read_ncount(_ForeBits(blob), nsym)
        trim = norm[:]
        while trim and trim[-1] == 0:
            trim.pop()
        got = back[:]
        while got and got[-1] == 0:
            got.pop()
        assert got == trim and acc2 == acc


def test_fse_intervals_partition_state_space():
    """The property the inversion-based encoder relies on: per symbol,
    renorm intervals exactly tile [0, 2^acc)."""
    for norm, acc in (_LL_DEFAULT, _OF_DEFAULT, _ML_DEFAULT):
        iv = _fse_encode_intervals(_fse_build_dtable(norm, acc))
        for s, lst in iv.items():
            cover = sorted((b, b + (1 << nb)) for b, nb, _ in lst)
            assert cover[0][0] == 0 and cover[-1][1] == 1 << acc
            assert all(e1 == s2 for (_, e1), (s2, _)
                       in zip(cover, cover[1:]))


def _build_fse_weights(listed, norm, acc):
    """FSE-compressed Huffman weight description via decode-table
    inversion (two interleaved states, overflow termination)."""
    iv = _fse_encode_intervals(_fse_build_dtable(norm, acc))
    k = len(listed)
    assert k % 2 == 0 and k >= 4

    def chain(idxs, final_needs_bits):
        syms = [listed[i] for i in idxs]
        states = [None] * len(syms)
        lst = iv[syms[-1]]
        if final_needs_bits:
            cand = [st for b, nb, st in lst if nb > 0]
            states[-1] = cand[0]
        else:
            states[-1] = lst[0][2]
        bits = []
        for i in range(len(syms) - 2, -1, -1):
            st, bv, nb = _fse_state_for(iv, syms[i], states[i + 1])
            states[i] = st
            bits.insert(0, (bv, nb))
        return states, bits

    a_states, a_bits = chain(list(range(0, k, 2)), True)
    b_states, b_bits = chain(list(range(1, k, 2)), False)
    w = _BackBitsWriter()
    w.write(a_states[0], acc)
    w.write(b_states[0], acc)
    for i in range(max(len(a_bits), len(b_bits))):
        if i < len(a_bits):
            w.write(*a_bits[i])
        if i < len(b_bits):
            w.write(*b_bits[i])
    region = _fse_write_ncount(norm, acc) + w.to_bytes()
    return bytes([len(region)]) + region


def test_fse_compressed_huffman_weights_decode():
    listed = [3, 3, 3, 2, 2, 2, 1, 1, 2, 2]  # sum 2^(w-1)=24 -> rest 8
    desc = _build_fse_weights(listed, [0, 6, 16, 10], 5)
    weights, consumed = _huf_read_weights(desc)
    assert weights[:-1] == listed and weights[-1] == 4
    assert consumed == len(desc)


def _huf_stream(lits, table, max_bits):
    first_idx = {}
    for idx, (sym, ln) in enumerate(table):
        if sym not in first_idx:
            first_idx[sym] = (idx, ln)
    w = _BackBitsWriter()
    for b in lits:
        idx, ln = first_idx[b]
        w.write(idx >> (max_bits - ln), ln)
    return w.to_bytes()


def test_four_stream_and_treeless_literals():
    weights = [2, 1, 1, 1, 1, 1, 1]  # symbols 0..6, full tree (2^3)
    table, mb = _huf_build_dtable(weights)
    lits = bytes([i % 7 for i in range(101)])
    per = (len(lits) + 3) // 4
    parts = [lits[i * per:(i + 1) * per] for i in range(3)]
    parts.append(lits[3 * per:])
    streams = [_huf_stream(p, table, mb) for p in parts]
    # direct weight description: listed = all but last
    listed = weights[:-1]
    desc = bytearray([127 + len(listed)])
    for i in range(0, len(listed), 2):
        desc.append((listed[i] << 4)
                    | (listed[i + 1] if i + 1 < len(listed) else 0))
    jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
    body = bytes(desc) + jump + b"".join(streams)
    hdr = 2 | (1 << 2) | (len(lits) << 4) | (len(body) << 14)
    section = hdr.to_bytes(3, "little") + body
    got, consumed, huf = _decode_literals(section, None)
    assert got == lits and consumed == len(section)
    # treeless: same table, new literals, 1 stream
    lits2 = bytes([6 - (i % 7) for i in range(60)])
    s2 = _huf_stream(lits2, table, mb)
    hdr2 = 3 | (0 << 2) | (len(lits2) << 4) | (len(s2) << 14)
    sec2 = hdr2.to_bytes(3, "little") + s2
    got2, _, _ = _decode_literals(sec2, huf)
    assert got2 == lits2
    with pytest.raises(ValueError):
        _decode_literals(sec2, None)  # treeless without a prior table


def test_rle_literals_block():
    """Hand-built frame: one compressed block holding RLE literals and
    zero sequences."""
    rsize = 17
    lit_sec = bytes([1 | (rsize << 3), ord("q")])
    block = lit_sec + b"\x00"  # 0 sequences
    frame = bytearray(b"\x28\xb5\x2f\xfd")
    frame.append(0x20)                      # single-segment, no checksum
    frame.append(rsize)                     # FCS 1 byte
    frame += ((len(block) << 3) | (2 << 1) | 1).to_bytes(3, "little")
    frame += block
    assert zstd_decompress(bytes(frame)) == b"q" * rsize


def test_fcs_mismatch_rejected():
    z = bytearray(zstd_compress(b"12345"))
    z[5] += 1  # FCS byte (magic 4 + fhd 1)
    with pytest.raises(ValueError):
        zstd_decompress(bytes(z))


def test_dictionary_frames_rejected():
    frame = bytearray(b"\x28\xb5\x2f\xfd")
    frame.append(0x20 | 0x01)  # single-segment + 1-byte dict id
    frame.append(7)            # dict id
    frame.append(0)            # fcs
    with pytest.raises(NotImplementedError):
        zstd_decompress(bytes(frame))


def test_compressed_source_sniffs_and_reads_zst(spark):
    from pyspark.sql import Row

    from nyctaxidatapipeline_spark.sources.compressed import (
        compress,
        decompress_auto,
        read_text_shards,
        sniff_codec,
    )

    text = "\n".join(f'{{"id": {i}, "t": "doc text {i}"}}'
                     for i in range(80)).encode()
    blob = compress(text, "zst")
    assert sniff_codec(blob) == "zst"
    assert decompress_auto(blob) == text
    assert len(blob) < len(text)  # actually compresses
    df = spark.createDataFrame([Row(shard_id=0, content=bytearray(blob))],
                               "shard_id long, content binary")
    rows = read_text_shards(df).collect()
    assert len(rows) == 80
    assert rows[0].codec == "zst" and rows[9].line.startswith('{"id": 9')


def test_fuzz_mutations_never_hang():
    """300 random single-byte mutations of valid frames either decode
    (to something) or raise ValueError/NotImplementedError — never
    hang, never crash with an unexpected exception type. Wall-clock
    bounded per mutation."""
    import time

    r = random.Random(42)
    base = zstd_compress(b"the quick brown fox jumps over the lazy dog. "
                         * 200)
    t0 = time.time()
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(r.randint(1, 3)):
            buf[r.randrange(len(buf))] = r.randrange(256)
        try:
            zstd_decompress(bytes(buf))
        except (ValueError, NotImplementedError, IndexError,
                OverflowError, KeyError, MemoryError):
            pass
    assert time.time() - t0 < 60, "fuzz loop too slow — hang risk"


def test_degenerate_weight_table_rejected_not_hung():
    """Single-symbol FSE weight table: every state has nb_bits == 0, so
    the interleaved decode never consumes — must raise, not loop."""
    from nyctaxidatapipeline_spark.functions.zstd import _fse_write_ncount

    nc = _fse_write_ncount([32], 5)  # one symbol, whole table
    stream = b"\x01"  # sentinel-only backward stream
    region = nc + stream
    desc = bytes([len(region)]) + region
    with pytest.raises(ValueError):
        _huf_read_weights(desc)
