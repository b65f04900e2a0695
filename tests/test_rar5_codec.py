"""RAR5 LZ+Huffman codec (functions/rar5_codec.py) — round-trip
self-verification in the LZX-codec pattern: the from-scratch compressor
and the decoder are independent implementations of the public bit
grammar (unrar unpack50.cpp), and the slot formulas are additionally
pinned against hand-derived values from the spec recurrences."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hoover_snoop2_spark.functions.rar5_codec import (
    FILTER_ARM,
    FILTER_DELTA,
    FILTER_E8,
    FILTER_E8E9,
    Rar5Compressor,
    Rar5Error,
    _BitReader,
    _dist_slot,
    _length_slot,
    _slot_to_length,
    rar5_compress,
    rar5_decompress,
)


def _roundtrip(data: bytes) -> None:
    packed = rar5_compress(data)
    assert rar5_decompress(packed, len(data)) == data


def test_empty_and_tiny():
    for d in (b"", b"a", b"ab", b"abc", b"\x00" * 5):
        _roundtrip(d)


def test_repetitive_compresses():
    data = b"the quick brown fox jumps over the lazy dog. " * 500
    packed = rar5_compress(data)
    assert len(packed) < len(data) // 20
    assert rar5_decompress(packed, len(data)) == data


def test_incompressible():
    rng = random.Random(99)
    data = bytes(rng.randrange(256) for _ in range(20000))
    _roundtrip(data)


def test_all_distance_ranges():
    """Matches at distances straddling the 0x100/0x2000/0x40000 length
    increments and the 4-bit low-distance Huffman path (dbits >= 4)."""
    rng = random.Random(5)
    seed = bytes(rng.randrange(256) for _ in range(600000))
    chunks = [seed]
    # re-reference slices from far back so greedy LZ emits far matches
    for dist in (0x80, 0x200, 0x1000, 0x3000, 0x20000, 0x50000):
        start = len(seed) - dist
        chunks.append(seed[start:start + 64])
    data = b"".join(chunks)
    _roundtrip(data)


def test_overlapping_copy_rle():
    _roundtrip(b"\x07" * 100000)
    _roundtrip(b"abc" * 33333)


def test_rep_match_slots_and_last_length():
    c = Rar5Compressor()
    for b in b"abcdabcd":
        c.literal(b)
    c.match(8, 4)
    c.rep(0, 4)      # 258: reuse most recent distance
    c.rep_last()     # 257: repeat last length+distance
    c.match(4, 8)    # push a second distance
    c.rep(1, 6)      # 259: second LRU entry (dist 4 again)
    out = rar5_decompress(
        c.pack(), 8 + 8 + 4 + 4 + 4 + 6)
    assert out == (b"abcdabcd" + b"abcdabcd" + b"abcd" + b"abcd"
                   + b"abcd" + b"abcdab")


def test_slot_formula_inverses():
    br_zero = _BitReader(b"\x00" * 8)
    for v in list(range(0, 600)) + [1000, 4000]:
        slot, extra, bits = _length_slot(v)
        assert slot < 44
        # decoder with extra bits zeroed gives the slot base
        base = _slot_to_length(br_zero, slot) - 2
        assert base + extra == v if bits else base == v
    for u in list(range(0, 2000)) + [0x2_0000, 0x40_0000 - 1]:
        slot, extra, bits = _dist_slot(u)
        assert slot < 64
        if slot < 4:
            assert u == slot
        else:
            dbits = (slot >> 1) - 1
            assert ((2 | (slot & 1)) << dbits) + extra == u
            assert bits == dbits


def test_delta_filter_roundtrip():
    rng = random.Random(11)
    orig = bytes(rng.randrange(256) for _ in range(256))
    for channels in (1, 2, 3, 4):
        pre = bytearray()
        for ch in range(channels):
            prev = 0
            for v in orig[ch::channels]:
                pre.append((prev - v) & 0xFF)
                prev = v
        c = Rar5Compressor()
        c.filter(0, len(orig), FILTER_DELTA, channels)
        for b in bytes(pre):
            c.literal(b)
        assert rar5_decompress(c.pack(), len(orig)) == orig


def test_e8_filter_applies():
    """The x86 translation turns a file-relative address back into a
    call-relative one: forward transform as in unrar's UnpWriteBuf."""
    import struct

    block = bytearray(b"\x90" * 32)
    block[4] = 0xE8
    struct.pack_into("<I", block, 5, 0x1234)  # 0 <= addr < FileSize
    c = Rar5Compressor()
    c.filter(0, len(block), FILTER_E8)
    for b in bytes(block):
        c.literal(b)
    out = rar5_decompress(c.pack(), len(block))
    # CurPos after reading the E8 byte is 5 → addr' = addr - (5+0)
    (addr,) = struct.unpack_from("<I", out, 5)
    assert addr == (0x1234 - 5) & 0xFFFFFFFF
    # E8E9 variant also rewrites 0xE9
    block[4] = 0xE9
    c = Rar5Compressor()
    c.filter(0, len(block), FILTER_E8E9)
    for b in bytes(block):
        c.literal(b)
    out = rar5_decompress(c.pack(), len(block))
    (addr,) = struct.unpack_from("<I", out, 5)
    assert addr == (0x1234 - 5) & 0xFFFFFFFF


def test_arm_filter_applies():
    block = bytearray(16)
    block[3] = 0xEB
    block[0:3] = (0x001000).to_bytes(3, "little")
    c = Rar5Compressor()
    c.filter(0, len(block), FILTER_ARM)
    for b in bytes(block):
        c.literal(b)
    out = rar5_decompress(c.pack(), len(block))
    got = int.from_bytes(out[0:3], "little")
    assert got == (0x001000 - 0) & 0xFFFFFF  # offset 0, CurPos 0


def test_filter_block_start_is_relative_to_write_head():
    """Filter start is relative to the output position at announcement
    time (AddFilter: UnpPtr + uBlockStart)."""
    orig = bytes(range(16))
    pre = bytearray()
    prev = 0
    for v in orig:
        pre.append((prev - v) & 0xFF)
        prev = v
    c = Rar5Compressor()
    for b in b"prefix::":
        c.literal(b)
    c.filter(0, len(orig), FILTER_DELTA, 1)  # starts at len("prefix::")
    for b in bytes(pre):
        c.literal(b)
    out = rar5_decompress(c.pack(), 8 + len(orig))
    assert out == b"prefix::" + orig


def test_truncated_stream_is_typed_error():
    data = b"hello world " * 100
    packed = rar5_compress(data)
    with pytest.raises(Rar5Error):
        rar5_decompress(packed[: len(packed) // 2], len(data))
    with pytest.raises(Rar5Error):
        rar5_decompress(packed, len(data) + 1)  # short of unp_size


def test_bad_block_checksum_rejected():
    data = b"abc def abc def"
    packed = bytearray(rar5_compress(data))
    packed[1] ^= 0xFF  # header checksum byte
    with pytest.raises(Rar5Error):
        rar5_decompress(bytes(packed), len(data))


def test_table_repeat_prev_symbols_decode():
    """Pretree symbols 16/17 (repeat previous length) — the encoder
    only emits zero runs, so pin the decoder path with a handcrafted
    table stream: all 430 lengths = 9 via '9' + repeat-prev runs."""
    from hoover_snoop2_spark.functions.rar5_codec import (
        _TABLE_SIZE,
        _BitWriter,
        _make_encoder,
        _read_tables,
    )

    bw = _BitWriter()
    pre_lengths = [5] * 20
    for v in pre_lengths:
        bw.write(v, 4)
    codes = _make_encoder(pre_lengths)
    emitted = 0
    code, ln = codes[9]
    bw.write(code, ln)
    emitted += 1
    while emitted < _TABLE_SIZE:
        left = _TABLE_SIZE - emitted
        if left >= 11:
            n = min(left, 11 + 127)
            c17, l17 = codes[17]
            bw.write(c17, l17)
            bw.write(n - 11, 7)
        else:
            n = max(3, left)
            n = min(n, left)
            if n < 3:
                break
            c16, l16 = codes[16]
            bw.write(c16, l16)
            bw.write(n - 3, 3)
        emitted += n
    # pad any remainder (< 3) with direct symbols
    while emitted < _TABLE_SIZE:
        code, ln = codes[9]
        bw.write(code, ln)
        emitted += 1
    payload = bw.finish()
    ld, dd, ldd, rd = _read_tables(_BitReader(payload))
    # every alphabet fully populated at length 9
    first, by_len = ld
    assert len(by_len[9]) == 306
    first, by_len = rd
    assert len(by_len[9]) == 44


@settings(max_examples=30, deadline=None)
@given(st.binary(min_size=0, max_size=4096))
def test_property_roundtrip(data):
    _roundtrip(data)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.binary(min_size=1, max_size=64),
                  st.integers(min_value=1, max_value=40)),
        min_size=1, max_size=20,
    )
)
def test_property_repetitive_roundtrip(parts):
    data = b"".join(chunk * reps for chunk, reps in parts)
    _roundtrip(data)


def test_fuzz_random_and_mutated_streams_typed_only():
    """Random and mutated packed streams must raise Rar5Error or decode
    (container CRC gates wrong bytes) — never an uncaught exception."""
    rng = random.Random(1)
    for _ in range(200):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        try:
            rar5_decompress(blob, rng.randrange(0, 300))
        except Rar5Error:
            pass
    payload = bytes(rng.randrange(256) for _ in range(800)) + b"abc" * 300
    base = rar5_compress(payload)
    for _ in range(200):
        m = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        try:
            rar5_decompress(bytes(m), len(payload))
        except Rar5Error:
            pass
