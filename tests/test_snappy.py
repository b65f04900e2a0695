"""snappy codec: raw + framed round-trips, hand-built tag vectors,
pinned CRC-32C, corruption typing, .sz/.tar.sz unpack through analyze."""
import io
import random
import struct
import tarfile

import pytest

from hoover_snoop2_spark.functions.snappy_codec import (
    SnappyError,
    crc32c,
    snappy_compress_framed,
    snappy_compress_raw,
    snappy_decompress_framed,
    snappy_decompress_raw,
)


def test_crc32c_published_check_value():
    assert crc32c(b"123456789") == 0xE3069283


def test_raw_roundtrip_shapes():
    rng = random.Random(9)
    shapes = [
        b"", b"a", b"a" * 100000,
        bytes(rng.randrange(256) for _ in range(30000)),
        bytes(rng.randrange(256) for _ in range(80000)),  # 3-byte literal
        (b"the quick brown fox ") * 5000,
        bytes(range(256)) * 100,
        b"ab" * 40000,  # overlapping copies
    ]
    for s in shapes:
        assert snappy_decompress_raw(snappy_compress_raw(s)) == s
        assert snappy_decompress_framed(snappy_compress_framed(s)) == s


def test_hand_built_copy1():
    # literal 'ab' + copy-1 (offset 2, length 4) -> "ababab"; pins the
    # 3-bit length / 11-bit offset split independent of the compressor
    blob = bytes([6, (2 - 1) << 2]) + b"ab" + bytes([0b001, 2])
    assert snappy_decompress_raw(blob) == b"ababab"


def test_hand_built_copy4_overlap():
    blob = (bytes([9, 0]) + b"x"
            + bytes([((8 - 1) << 2) | 3]) + (1).to_bytes(4, "little"))
    assert snappy_decompress_raw(blob) == b"x" * 9


def test_framed_crc_detects_corruption():
    blob = bytearray(snappy_compress_framed(b"payload " * 100))
    blob[-1] ^= 0xFF
    with pytest.raises(SnappyError) as ei:
        snappy_decompress_framed(bytes(blob))
    assert ei.value.reason in ("snappy_crc_mismatch", "snappy_truncated",
                               "snappy_length_mismatch",
                               "snappy_bad_offset")


def test_framed_skippable_and_reserved():
    from hoover_snoop2_spark.functions.snappy_codec import FRAME_MAGIC

    ok = FRAME_MAGIC + bytes([0x90, 3, 0, 0]) + b"pad"
    assert snappy_decompress_framed(ok) == b""
    bad = FRAME_MAGIC + bytes([0x02, 1, 0, 0]) + b"x"
    with pytest.raises(SnappyError) as ei:
        snappy_decompress_framed(bad)
    assert ei.value.reason == "snappy_reserved_chunk"


def test_bad_offset_typed():
    blob = bytes([4, 0b001, 9])  # copy-1 with empty window
    with pytest.raises(SnappyError) as ei:
        snappy_decompress_raw(blob)
    assert ei.value.reason == "snappy_bad_offset"


def test_analyze_sz_and_tar_sz():
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    out = analyze_blob("k", snappy_compress_framed(b"plain inner text"))
    assert out[0]["mime_type"] == "application/x-snappy-framed"
    assert [(c["child_name"], c["child_data"]) for c in out[1:]] == [
        ("data", b"plain inner text")
    ]

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        info = tarfile.TarInfo("member.txt")
        payload = b"tarred text body"
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    out = analyze_blob("k", snappy_compress_framed(buf.getvalue()))
    assert out[0]["status"] == "success"
    names = [c["child_name"] for c in out[1:]]
    assert "member.txt" in names
