"""LZX codec + CHM/ITSS container: round-trips over adversarial shapes,
hand-built repeated-offset streams, truncation typing, analyze fan-out."""
import random
import struct

import pytest

from hoover_snoop2_spark.functions.lzx_codec import (
    LzxError,
    _BitReader,
    _BitWriter,
    lzx_compress,
    lzx_decompress,
)
from hoover_snoop2_spark.operators.chm_extract import (
    ChmBroken,
    build_chm,
    chm_children,
    looks_like_chm,
    parse_chm,
)


def test_bitio_16le_msb_first():
    bw = _BitWriter()
    bw.write(0b1, 1)
    bw.write(0b0101, 4)
    bw.write(0xABC, 12)
    blob = bw.getvalue()
    br = _BitReader(blob)
    assert br.read(1) == 0b1
    assert br.read(4) == 0b0101
    assert br.read(12) == 0xABC
    # first 16 bits live in the FIRST little-endian word, MSB-first
    (w0,) = struct.unpack_from("<H", blob, 0)
    assert (w0 >> 15) == 1


def test_lzx_roundtrip_shapes():
    rng = random.Random(77)
    shapes = [
        b"", b"x", b"hello world " * 400, b"a" * 32768,
        bytes(rng.randrange(256) for _ in range(5000)),
        bytes(range(256)) * 30,
        b"abcabcabd" * 700,
        bytes(rng.choice(b"ab") for _ in range(20000)),
    ]
    for s in shapes:
        assert lzx_decompress(lzx_compress(s), len(s)) == s


def test_lzx_window_variants():
    data = b"windowed content " * 1000
    for bits in (15, 16, 17, 21):
        assert lzx_decompress(lzx_compress(data, bits), len(data),
                              bits) == data


def test_lzx_repeated_offset_hand_stream():
    """Hand-emit a verbatim block that uses the R0 repeated-offset slot
    — the compressor never does, so this pins the decoder's LRU path."""
    from hoover_snoop2_spark.functions.lzx_codec import (
        _build_lengths,
        _canonical_codes,
        _write_lengths,
    )

    # plan: literals 'ab', match(off=2,len=4) -> slot>=3 explicit,
    # then match R0 (slot 0) len 4 -> total "ab" + "abab" + "abab"
    out_ref = b"ab" + b"abab" + b"abab"
    nslots = 32  # window_bits 16
    main_syms = 256 + (nslots << 3)
    # offset 2 -> formatted 4 -> slot 4 (base 4, extra 1, footer 0)
    sym_explicit = 256 + ((4 << 3) | (4 - 2))
    sym_r0 = 256 + ((0 << 3) | (4 - 2))
    freq = {ord("a"): 1, ord("b"): 1, sym_explicit: 1, sym_r0: 1}
    lengths = _build_lengths(freq, main_syms)
    codes = _canonical_codes(lengths)
    bw = _BitWriter()
    bw.write(0, 1)          # no intel
    bw.write(1, 3)          # verbatim
    n = len(out_ref)
    bw.write(n >> 8, 16)
    bw.write(n & 0xFF, 8)
    prev = [0] * main_syms
    _write_lengths(bw, prev, lengths, 0, 256)
    _write_lengths(bw, prev, lengths, 256, main_syms)
    _write_lengths(bw, [0] * 249, [0] * 249, 0, 249)
    for sym in (ord("a"), ord("b")):
        c, b = codes[sym]
        bw.write(c, b)
    c, b = codes[sym_explicit]
    bw.write(c, b)
    bw.write(0, 1)  # footer bit for slot 4 (extra_bits=1)
    c, b = codes[sym_r0]
    bw.write(c, b)
    assert lzx_decompress(bw.getvalue(), len(out_ref)) == out_ref


def test_chm_roundtrip_and_multiframe():
    members = [
        ("index.html", b"<html><body><p>Hello CHM</p></body></html>"),
        ("pages/two.html", b"<p>" + b"repeat " * 2000 + b"</p>"),
        ("style.css", b"body { color: red }"),
    ]
    assert chm_children(build_chm(members)) == sorted(members)
    rng = random.Random(3)
    big = [("a.txt", b"tiny"),
           ("big.bin", bytes(rng.randrange(256) for _ in range(90000)))]
    kids = dict(chm_children(build_chm(big)))
    assert kids["big.bin"] == big[1][1]
    assert kids["a.txt"] == b"tiny"


def test_chm_metadata_entries_present():
    files = parse_chm(build_chm([("x.html", b"<p>x</p>")]))
    assert "::DataSpace/Storage/MSCompressed/Content" in files
    assert "::DataSpace/NameList" in files


def test_chm_truncation_typed():
    blob = build_chm([("f.html", b"<p>content here</p>" * 50)])
    assert looks_like_chm(blob)
    for cut in (40, 200, len(blob) - 10):
        with pytest.raises(ChmBroken):
            parse_chm(blob[:cut])


def test_lzx_garbage_typed():
    with pytest.raises(LzxError):
        lzx_decompress(b"\x00\x00\x00\x00\x00\x00", 100)


def test_analyze_chm_fanout_recurses_html():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    blob = build_chm([
        ("topic.html",
         b"<html><body><p>Compiled help topic body text.</p></body></html>"),
    ])
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == "application/vnd.ms-htmlhelp"
    assert out[0]["status"] == "success"
    assert [c["child_name"] for c in out[1:]] == ["topic.html"]
    sub = analyze_blob("x", out[1]["child_data"])
    assert "Compiled help topic body text." in sub[0]["text"]
