"""LZ4 decoder tests (functions/lz4_codec.py).

Same two-layer ground truth as the zstd suite: hand-built store-mode
frames (always on) and bit-exact agreement with the real ``lz4`` CLI
across levels, block sizes, block-DEPENDENT mode, checksums, and the
legacy ``-l`` frame; the store-mode writer is itself decoded by the CLI.
"""

import hashlib
import random
import struct
import shutil
import subprocess

import pytest

from hoover_snoop2_spark.functions.lz4_codec import (
    Lz4Error,
    lz4_block_decompress,
    lz4_compress_store,
    lz4_decompress,
    xxh32,
)

HAVE_CLI = shutil.which("lz4") is not None
needs_cli = pytest.mark.skipif(not HAVE_CLI, reason="lz4 CLI not present")


def _shapes() -> dict[str, bytes]:
    rnd = random.Random(7)
    return {
        "empty": b"",
        "tiny": b"x",
        "zeros": bytes(5000),
        "text": b"the quick brown fox jumps over the lazy dog. " * 300,
        "rand": bytes(rnd.randrange(256) for _ in range(60000)),
        "cyclic": bytes((i * 7) % 256 for i in range(70000)),
        "runs": bytes((i * 7) % 256 for i in range(70000)) + b"A" * 100000,
        "semi": b"".join(hashlib.sha256(bytes([i // 100])).digest()
                         for i in range(3000)),
    }


# ---------------------------------------------------------------------------
# xxh32 — public xxHash reference values
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("data,seed,want", [
    (b"", 0, 0x02CC5D05),
    (b"", 1, 0x0B2CB792),
    (b"a", 0, 0x550D7456),
    (b"abc", 0, 0x32D153FF),
    (b"Nobody inspects the spammish repetition", 0, 0xE2293B2F),
])
def test_xxh32_vectors(data, seed, want):
    assert xxh32(data, seed) == want


# ---------------------------------------------------------------------------
# CLI-free: store-mode writer ↔ decoder
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    {}, {"block_checksums": True}, {"content_size": True},
    {"content_checksum": False}, {"block_size": 17},
])
def test_store_roundtrip(kw):
    for payload in _shapes().values():
        assert lz4_decompress(lz4_compress_store(payload, **kw)) == payload


def test_skippable_and_multiframe():
    a = lz4_compress_store(b"first frame ")
    b = lz4_compress_store(b"second frame")
    skip = b"\x50\x2a\x4d\x18\x04\x00\x00\x00meta"
    assert lz4_decompress(skip + a + b) == b"first frame second frame"


def test_dictionary_frame_refused_typed():
    frame = bytearray(lz4_compress_store(b"payload"))
    frame[4] |= 0x01  # DictID flag
    # fix header checksum so only the dict refusal fires
    desc = bytes(frame[4:6])
    frame[6] = (xxh32(desc) >> 8) & 0xFF
    with pytest.raises(Lz4Error) as ei:
        lz4_decompress(bytes(frame) + b"\x00\x00\x00\x00")
    assert ei.value.reason == "lz4_dictionary_unsupported"


def test_header_checksum_typed():
    frame = bytearray(lz4_compress_store(b"payload"))
    frame[6] ^= 0xFF
    with pytest.raises(Lz4Error) as ei:
        lz4_decompress(bytes(frame))
    assert ei.value.reason == "lz4_header_checksum"


def test_content_checksum_typed():
    frame = bytearray(lz4_compress_store(b"payload here"))
    frame[-1] ^= 0x01
    with pytest.raises(Lz4Error) as ei:
        lz4_decompress(bytes(frame))
    assert ei.value.reason == "lz4_content_checksum"


def test_block_checksum_typed():
    frame = bytearray(lz4_compress_store(b"payload here",
                                         block_checksums=True,
                                         content_checksum=False))
    # corrupt the block body (after magic+FLG/BD/HC+4-byte block size)
    frame[7 + 4 + 2] ^= 0x01
    with pytest.raises(Lz4Error) as ei:
        lz4_decompress(bytes(frame))
    assert ei.value.reason == "lz4_block_checksum"


def test_bad_offset_typed():
    # literal-only block then a match reaching before the start
    block = b"\x13AAA\x09\x00\x00"  # lit_len 1? craft precisely below
    block = bytes([0x14]) + b"A" + struct.pack("<H", 9) + b""
    with pytest.raises(Lz4Error) as ei:
        lz4_block_decompress(block, 1 << 20)
    assert ei.value.reason == "lz4_malformed"


def test_max_output_enforced():
    frame = lz4_compress_store(b"A" * 10000)
    with pytest.raises(Lz4Error) as ei:
        lz4_decompress(frame, max_output=100)
    assert ei.value.reason == "lz4_too_big"


# ---------------------------------------------------------------------------
# CLI cross-validation (the authoritative pin)
# ---------------------------------------------------------------------------

def _cli_compress(payload: bytes, args) -> bytes:
    p = subprocess.run(["lz4", "-z", "-c", *args],
                       input=payload, capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


def _cli_decompress(frame: bytes) -> bytes:
    p = subprocess.run(["lz4", "-d", "-c"], input=frame,
                       capture_output=True)
    assert p.returncode == 0, p.stderr
    return p.stdout


@needs_cli
@pytest.mark.parametrize("args", [
    ("-1",), ("-9",), ("-12",),
    ("-1", "-B4"), ("-9", "-B5", "-BD"), ("-12", "-B4", "-BD"),
    ("-9", "-B7", "-BD", "-BX"), ("--content-size", "-9"),
    ("-l", "-9"),
])
def test_cli_matrix(args):
    for name, payload in _shapes().items():
        enc = _cli_compress(payload, args)
        assert lz4_decompress(enc) == payload, (name, args)


@needs_cli
def test_cli_decodes_our_store_frames():
    for payload in _shapes().values():
        for kw in ({}, {"block_checksums": True}, {"content_size": True}):
            assert _cli_decompress(lz4_compress_store(payload, **kw)) \
                == payload


# ---------------------------------------------------------------------------
# unpack integration: .lz4 and .tar.lz4
# ---------------------------------------------------------------------------

def test_unpack_lz4_and_tar_lz4(tmp_path):
    import io
    import tarfile

    from hoover_snoop2_spark.functions.magic import sniff_bytes
    from hoover_snoop2_spark.operators.archive_unpack import unpack_bytes as unpack

    frame = lz4_compress_store(b"plain lz4 payload")
    assert sniff_bytes(frame)[0] == "application/x-lz4"
    assert unpack(frame, "application/x-lz4") == \
        [("data", b"plain lz4 payload")]

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        data = b"tar member content"
        ti = tarfile.TarInfo("dir/m.txt")
        ti.size = len(data)
        tf.addfile(ti, io.BytesIO(data))
    tz = lz4_compress_store(buf.getvalue())
    assert unpack(tz, "application/x-lz4") == \
        [("dir/m.txt", b"tar member content")]
