"""[MS-CAB] cabinet reader: all three supported methods, checksum
enforcement, Quantum typed refusal, truncation fuzz, analyze fan-out."""
import random
import struct

import pytest

from hoover_snoop2_spark.operators.cab_extract import (
    CabBroken,
    _checksum,
    build_cab,
    looks_like_cab,
    parse_cab,
)


def _members(rng):
    return [
        ("readme.txt", b"hello cab world " * 40),
        ("docs/a.html", b"<p>page</p>" * 500),
        ("bin/data.bin", bytes(rng.randrange(256) for _ in range(70000))),
    ]


@pytest.mark.parametrize("method", ["none", "mszip", "lzx"])
def test_roundtrip(method):
    rng = random.Random(4)
    members = _members(rng)
    assert parse_cab(build_cab(members, method)) == members


def test_mszip_cross_block_dictionary():
    # one file spanning two 32 KiB blocks with shared history: the
    # second block's deflate references the first via zdict (spec MSZIP)
    payload = (b"abcdefgh" * 5000)[:70000]
    got = parse_cab(build_cab([("big.bin", payload)], "mszip"))
    assert got == [("big.bin", payload)]


def test_checksum_enforced():
    blob = bytearray(build_cab([("f.txt", b"x" * 5000)], "mszip"))
    blob[-1] ^= 0xFF  # corrupt last CFDATA payload byte
    with pytest.raises(CabBroken) as ei:
        parse_cab(bytes(blob))
    assert ei.value.reason in ("cab_checksum_mismatch", "cab_bad_mszip")


def test_quantum_typed():
    blob = bytearray(build_cab([("f.txt", b"y" * 100)], "none"))
    # patch the folder's typeCompress (offset 36 + 4 + 2) to Quantum
    struct.pack_into("<H", blob, 36 + 6, 2)
    with pytest.raises(CabBroken) as ei:
        parse_cab(bytes(blob))
    assert ei.value.reason == "cab_quantum_unsupported"


def test_truncation_typed():
    blob = build_cab([("f.txt", b"content " * 200)], "mszip")
    assert looks_like_cab(blob)
    for cut in (20, 50, len(blob) - 5):
        with pytest.raises(CabBroken):
            parse_cab(blob[:cut])


def test_checksum_kernel():
    # XOR-of-u32 with big-endian tail fold, per the [MS-CAB] pseudo-code
    assert _checksum(b"\x01\x00\x00\x00") == 1
    assert _checksum(b"\x01\x00\x00\x00\x02\x00\x00\x00") == 3
    assert _checksum(b"\xAB") == 0xAB
    assert _checksum(b"\xAB\xCD") == 0xABCD


def test_analyze_cab_fanout():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    blob = build_cab(
        [("topic.html", b"<html><body><p>Cab body text.</p></body></html>")],
        "lzx")
    out = analyze_blob("k", blob)
    assert out[0]["mime_type"] == "application/vnd.ms-cab-compressed"
    assert out[0]["status"] == "success"
    assert [c["child_name"] for c in out[1:]] == ["topic.html"]
    sub = analyze_blob("x", out[1]["child_data"])
    assert "Cab body text." in sub[0]["text"]
