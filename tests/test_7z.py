"""7z container unpacking (pure-Python reader over the public 7zFormat
spec; reference shells out to `7z x`, archives.py:173-203)."""

import hashlib
import io

import pytest

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.sevenzip_extract import (
    SevenZipBroken,
    _read_number,
    _write_number,
    build_7z,
    is_7z,
    unpack_7z,
)

MEMBERS = [
    ("docs/a.txt", b"alpha bravo " * 50),
    ("b.txt", b"second file"),
    ("bin/c.bin", bytes(range(256))),
]


def test_number_codec_round_trip():
    for v in (0, 1, 0x7F, 0x80, 0x3FFF, 0x4000, 123456, 2**20, 2**33,
              2**56, 2**62):
        assert _read_number(io.BytesIO(_write_number(v))) == v


@pytest.mark.parametrize("codec", ["copy", "lzma2"])
def test_round_trip(codec):
    data = build_7z(MEMBERS, codec=codec)
    assert is_7z(data)
    assert unpack_7z(data) == MEMBERS


def test_unicode_member_names():
    data = build_7z([("päth/ünïcode — file.txt", b"x")], codec="copy")
    assert unpack_7z(data)[0][0] == "päth/ünïcode — file.txt"


def test_analyze_routes_7z():
    data = build_7z(MEMBERS, codec="lzma2")
    rows = analyze_blob(hashlib.sha3_256(data).hexdigest(), data)
    digest = rows[0]
    assert digest["mime_type"] == "application/x-7z-compressed"
    assert digest["status"] == "success"
    assert digest["n_children"] == 3
    assert [r["child_name"] for r in rows[1:]] == [n for n, _ in MEMBERS]
    assert rows[1]["child_data"] == MEMBERS[0][1]


def test_truncated_is_broken():
    data = build_7z(MEMBERS, codec="lzma2")
    with pytest.raises(SevenZipBroken):
        unpack_7z(data[:40])


def test_garbage_is_broken():
    import struct

    # all-zero start header = valid empty archive
    assert unpack_7z(b"7z\xbc\xaf\x27\x1c" + bytes(64)) == []
    # declared header full of garbage bytes must surface broken
    data = (b"7z\xbc\xaf\x27\x1c" + bytes(6)
            + struct.pack("<QQ", 0, 16) + bytes(4) + b"\x55" * 16)
    with pytest.raises(SevenZipBroken):
        unpack_7z(data)


def test_no_substreams_info_defaults_to_full_folder():
    """A header that omits SubStreamsInfo (legal for single-stream folders)
    must extract the member's full bytes, not b''."""
    payload = b"solid single stream " * 20
    data = build_7z([("only.txt", payload)], codec="lzma2",
                    with_substreams=False)
    assert unpack_7z(data) == [("only.txt", payload)]


def test_unpackinfo_crc_single_substream_digest_exclusion():
    """SubStreamsInfo kCRC excludes single-substream folders whose CRC is
    already defined in UnpackInfo — counting them misaligns the header."""
    payload = b"crc checked bytes"
    data = build_7z([("f.txt", payload)], codec="copy",
                    unpackinfo_crc=True, substreams_crc=True)
    assert unpack_7z(data) == [("f.txt", payload)]


def test_substreams_crc_multi_member():
    data = build_7z(MEMBERS, codec="copy",
                    unpackinfo_crc=True, substreams_crc=True)
    assert unpack_7z(data) == MEMBERS


@pytest.mark.parametrize("codec", ["bcj_lzma2", "delta_lzma2"])
def test_branch_filter_chains(codec):
    """BCJ(x86)+LZMA2 and Delta+LZMA2 two-coder folders decode through
    stdlib raw filter chains (the common layout for executables)."""
    # x86-ish payload with relative CALLs so BCJ actually transforms bytes
    payload = (b"\xe8\x12\x34\x56\x00" + bytes(range(64))) * 200
    members = [("bin/prog.exe", payload), ("readme.txt", b"docs " * 100)]
    data = build_7z(members, codec=codec)
    assert unpack_7z(data) == members


def test_bcj_lzma2_header_shape_is_two_coders():
    """The fixture writes a REAL 2-coder folder with a bind pair — the
    reader must not take the single-coder path."""
    from hoover_snoop2_spark.operators.sevenzip_extract import (
        _parse_streams_info,
    )

    data = build_7z([("a", b"x" * 100)], codec="bcj_lzma2")
    # parse the raw (unencoded) header directly
    nh_off, nh_size = __import__("struct").unpack_from("<QQ", data, 12)
    f = io.BytesIO(data[32 + nh_off: 32 + nh_off + nh_size])
    assert _read_number(f) == 0x01  # kHeader
    assert _read_number(f) == 0x04  # kMainStreams
    info = _parse_streams_info(f)
    folder = info.folders[0]
    assert len(folder.coders) == 2
    assert folder.bind_pairs == [(1, 0)]


def test_bcj2_codec_roundtrip():
    """BCJ2 (4-stream x86 converter): range-coded control stream, big-
    endian absolute targets in call/jump streams, candidate rules for
    E8/E9/0F 8x opcodes."""
    import random

    from hoover_snoop2_spark.operators.sevenzip_extract import (
        bcj2_decode,
        bcj2_encode,
    )

    rng = random.Random(23)
    samples = [
        b"",
        b"\xe8\x10\x00\x00\x00plain call",
        b"with \xe9\xf0\xff\xff\xffjmp and \x0f\x84\x01\x02\x03\x04 jcc",
        bytes(rng.randrange(256) for _ in range(8192)),
        b"\xe8" * 51,                       # candidate storm + short tail
        b"p \x0f\x80\x00\x00\x00\x00" + b"\xe9\x00\x01\x02\x03" * 40,
    ]
    for s in samples:
        m, c, j, rc = bcj2_encode(s)
        assert bcj2_decode(m, c, j, rc, len(s)) == s
    # converted branches really leave the main stream
    m, c, j, rc = bcj2_encode(b"\xe8\x10\x00\x00\x00tail")
    assert len(m) == 5 and len(c) == 4  # opcode+tail in main, target in call


def test_bcj2_archive_extracts():
    """A 4-packed-stream BCJ2+LZMA2 folder extracts byte-identically;
    reserved 7z_codec_unsupported now means genuinely unknown coders."""
    import random

    from hoover_snoop2_spark.operators.sevenzip_extract import (
        build_7z,
        unpack_7z,
    )

    rng = random.Random(31)
    members = [
        ("bin/app.exe",
         b"\xe8\x10\x00\x00\x00" + bytes(rng.randrange(256) for _ in range(3000))),
        ("doc/readme.txt", b"plain text payload " * 20),
    ]
    data = build_7z(members, codec="bcj2_lzma2")
    assert unpack_7z(data) == members
