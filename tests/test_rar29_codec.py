"""RAR29 (RAR 3.x LZSS) codec — round-trip self-verification plus the
typed refusals that keep the unsupported halves honest (PPMd blocks,
RarVM filters)."""

import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hoover_snoop2_spark.functions.rar5_codec import Rar5Error, _BitWriter
from hoover_snoop2_spark.functions.rar29_codec import (
    Rar29Compressor,
    Rar29Error,
    rar29_compress,
    rar29_decompress,
)


def _roundtrip(data: bytes) -> None:
    packed = rar29_compress(data)
    assert rar29_decompress(packed, len(data)) == data


def test_empty_and_tiny():
    for d in (b"", b"a", b"ab", b"abc", b"\x00" * 5):
        _roundtrip(d)


def test_repetitive_compresses():
    data = b"the quick brown fox jumps over the lazy dog. " * 500
    packed = rar29_compress(data)
    assert len(packed) < len(data) // 20
    assert rar29_decompress(packed, len(data)) == data


def test_incompressible():
    rng = random.Random(99)
    _roundtrip(bytes(rng.randrange(256) for _ in range(20000)))


def test_distance_ranges_incl_low_dist_huffman():
    """Distances straddling the 0x2000/0x40000 length increments and the
    slot>9 low-nibble Huffman path."""
    rng = random.Random(5)
    seed = bytes(rng.randrange(256) for _ in range(600000))
    chunks = [seed]
    for dist in (0x80, 0x200, 0x1500, 0x3000, 0x20000, 0x50000):
        start = len(seed) - dist
        chunks.append(seed[start:start + 64])
    _roundtrip(b"".join(chunks))


def test_overlap_rle():
    _roundtrip(b"\x07" * 100000)
    _roundtrip(b"abc" * 33333)


def test_rep_short_and_replast_paths():
    c = Rar29Compressor()
    for b in b"abcdabcd":
        c.literal(b)
    c.match(8, 4)
    c.rep(0, 4)
    c.rep_last()
    c.short_match(2)
    out = rar29_decompress(c.pack(), 8 + 8 + 4 + 4 + 2)
    assert out == b"abcdabcd" + b"abcdabcd" + b"abcd" + b"abcd" + b"cd"


def test_short_match_full_ladder():
    """Every SDDecode slot (dist 1..256) decodes length-2 copies."""
    rng = random.Random(3)
    base = bytes(rng.randrange(256) for _ in range(300))
    for dist in (1, 2, 4, 5, 8, 12, 16, 31, 32, 63, 64, 127, 128, 191,
                 192, 255, 256):
        c = Rar29Compressor()
        for b in base:
            c.literal(b)
        c.short_match(dist)
        out = rar29_decompress(c.pack(), len(base) + 2)
        expect = bytearray(base)
        for _ in range(2):
            expect.append(expect[-dist])
        assert out == bytes(expect), dist


def test_ppmd_block_typed():
    bw = _BitWriter()
    bw.write(1, 1)  # PPM flag
    bw.write(0, 7)
    with pytest.raises(Rar29Error) as e:
        rar29_decompress(bw.finish() + b"\x00" * 16, 10)
    assert e.value.reason == "rar_ppmd_unsupported"


def test_vm_filter_typed():
    """Symbol 257 (a RarVM filter program follows) refuses typed — a
    flat 9-bit table makes every main symbol directly encodable."""
    from hoover_snoop2_spark.functions.rar29_codec import (
        _BC,
        _TABLE_SIZE,
        _make_encoder,
    )

    bw = _BitWriter()
    bw.write(0, 1)  # not PPM
    bw.write(0, 1)  # fresh table
    pre_lengths = [5] * _BC
    for v in pre_lengths:
        bw.write(v, 4)
    pre_codes = _make_encoder(pre_lengths)
    # all 404 entries length 9 → every symbol (incl. 257) is encodable
    c9, l9 = pre_codes[9]
    for _ in range(_TABLE_SIZE):
        bw.write(c9, l9)
    # canonical 9-bit code for symbol 257 = 257 (flat table)
    bw.write(257, 9)
    with pytest.raises(Rar29Error) as e:
        rar29_decompress(bw.finish() + b"\x00" * 8, 10)
    assert e.value.reason == "rar_filter_unsupported"


def test_truncated_and_short_streams_typed():
    data = b"hello world " * 100
    packed = rar29_compress(data)
    with pytest.raises(Rar29Error):
        rar29_decompress(packed, len(data) + 1)
    with pytest.raises(Rar29Error):
        rar29_decompress(packed[:10], len(data))


def test_delta_table_transmission():
    """A mid-stream end-of-block with a NEW table (keep-old deltas) —
    decoder must re-read tables and continue."""
    from hoover_snoop2_spark.functions.rar29_codec import (
        _BC,
        _TABLE_SIZE,
        _make_encoder,
    )

    bw = _BitWriter()

    def flat_table(first_time):
        bw.write(0, 1)          # not PPM
        bw.write(0 if first_time else 1, 1)  # keep old on the re-read
        pre_lengths = [5] * _BC
        for v in pre_lengths:
            bw.write(v, 4)
        pre_codes = _make_encoder(pre_lengths)
        if first_time:
            c9, l9 = pre_codes[9]
            for _ in range(_TABLE_SIZE):
                bw.write(c9, l9)
        else:
            # deltas of 0 against the kept table → same 9-bit layout
            c0, l0 = pre_codes[0]
            for _ in range(_TABLE_SIZE):
                bw.write(c0, l0)

    flat_table(True)
    for b in b"abc":
        bw.write(b, 9)
    bw.write(256, 9)  # end of block...
    bw.write(1, 1)    # ...with a new table right here
    # the table read byte-aligns first — pad the writer to match
    pad = (8 - bw.bit_length() % 8) % 8
    if pad:
        bw.write(0, pad)
    flat_table(False)
    for b in b"def":
        bw.write(b, 9)
    bw.write(256, 9)
    bw.write(0, 2)    # end of file
    out = rar29_decompress(bw.finish(), 6)
    assert out == b"abcdef"


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
    _roundtrip(b"".join(chunk * reps for chunk, reps in parts))


def test_fuzz_random_and_mutated_streams_typed_only():
    """Same contract as the RAR5 fuzz: typed errors or a decode the
    container-level CRC will judge — no uncaught exceptions."""
    rng = random.Random(1)
    for _ in range(200):
        blob = bytes(rng.randrange(256)
                     for _ in range(rng.randrange(0, 150)))
        try:
            rar29_decompress(blob, rng.randrange(0, 300))
        except Rar5Error:  # base class: shared Huffman machinery
            pass
    payload = bytes(rng.randrange(256) for _ in range(800)) + b"abc" * 300
    base = rar29_compress(payload)
    for _ in range(200):
        m = bytearray(base)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        try:
            rar29_decompress(bytes(m), len(payload))
        except Rar5Error:
            pass
