"""zstd (RFC 8878) decoder tests.

Two layers of ground truth: hand-built store-mode frames (always on),
and — the strong one — bit-exact agreement with the real ``zstd`` CLI
across compression levels, data shapes, and flags, which drives every
FSE/Huffman path: predefined + FSE-compressed + RLE + repeat sequence
tables, 1- and 4-stream Huffman literals, direct and FSE-compressed
weights, treeless repeats, repeat offsets, and multi-block frames.
"""

import random
import shutil
import struct
import subprocess

import pytest

from hoover_snoop2_spark.functions.zstd_codec import (
    ZstdError,
    is_zstd,
    zstd_compress_store,
    zstd_decompress,
)

HAVE_CLI = shutil.which("zstd") is not None

needs_cli = pytest.mark.skipif(not HAVE_CLI, reason="zstd CLI not present")


def cli_compress(data: bytes, level: int = 3, extra=()) -> bytes:
    p = subprocess.run(
        ["zstd", "-q", "-c", f"-{level}", *extra],
        input=data, capture_output=True,
    )
    assert p.returncode == 0, p.stderr
    return p.stdout


def _shapes() -> dict[str, bytes]:
    rnd = random.Random(42)
    return {
        "empty": b"",
        "one": b"x",
        "ascii": b"hello zstd world " * 3,
        "repetitive": b"abcabcabc" * 5000,
        "english": b"The quick brown fox jumps over the lazy dog. " * 800,
        "binary_small": rnd.randbytes(100),
        "binary_64k": rnd.randbytes(65536),
        "rle_runs": b"".join(bytes([i % 7]) * (i % 50) for i in range(3000)),
        "lines": b"".join(
            f"line {i} entropy {i * i}\n".encode() for i in range(20000)
        ),
        "multi_block": rnd.randbytes(200000) + b"Z" * 200000,
    }


# ------------------------------------------------------------- store mode


def test_store_roundtrip_and_rle_blocks():
    for data in (b"", b"q", b"mixed payload", b"A" * 70000,
                 bytes(range(256)) * 600):
        frame = zstd_compress_store(data)
        assert is_zstd(frame)
        assert zstd_decompress(frame) == data


def test_skippable_frame_and_concat():
    skip = struct.pack("<II", 0x184D2A50, 5) + b"metax"
    frame = skip + zstd_compress_store(b"abc") + zstd_compress_store(b"def")
    assert zstd_decompress(frame) == b"abcdef"


def test_output_cap_guard():
    frame = zstd_compress_store(b"B" * 100000)
    with pytest.raises(ZstdError, match="zstd_too_large"):
        zstd_decompress(frame, max_output=1000)


def test_typed_errors_only():
    with pytest.raises(ZstdError, match="not_zstd"):
        zstd_decompress(b"\x00\x01\x02\x03\x04")
    with pytest.raises(ZstdError, match="zstd_truncated_frame"):
        zstd_decompress(zstd_compress_store(b"hello" * 100)[:10])
    with pytest.raises(ZstdError, match="zstd_dictionary_unsupported"):
        # frame header demanding a 1-byte dictionary id
        zstd_decompress(struct.pack("<I", 0xFD2FB528) + b"\x21\x07\x00")


@needs_cli
def test_store_frames_accepted_by_real_zstd():
    for data in (b"", b"payload", b"R" * 50000):
        p = subprocess.run(
            ["zstd", "-d", "-c"], input=zstd_compress_store(data),
            capture_output=True,
        )
        assert p.returncode == 0 and p.stdout == data


# ------------------------------------------------------ CLI ground truth


@needs_cli
@pytest.mark.parametrize("level", [1, 3, 9, 19])
def test_cli_matrix_bit_exact(level):
    for name, data in _shapes().items():
        comp = cli_compress(data, level)
        assert zstd_decompress(comp, max_output=1 << 28) == data, (
            name, level,
        )


@needs_cli
def test_cli_flags_and_concat():
    data = _shapes()["lines"]
    for extra in (("--no-check",), ("--long=20",), ("--ultra", "-22")):
        comp = cli_compress(data, 3 if extra[0] != "--ultra" else 22,
                            extra if extra[0] != "--ultra" else ("--ultra",))
        assert zstd_decompress(comp, max_output=1 << 28) == data
    two = cli_compress(b"frame one ", 1) + cli_compress(b"and two", 19)
    assert zstd_decompress(two) == b"frame one and two"


@needs_cli
def test_cli_fuzz_mutations_only_typed_errors():
    """Corrupted real-compressor streams must decode or raise ZstdError
    — never an untyped exception (Arrow-kernel safety contract)."""
    rng = random.Random(7)
    base = cli_compress(_shapes()["english"], 3)
    for _ in range(400):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            op = rng.random()
            if op < 0.6:
                buf[rng.randrange(len(buf))] = rng.randrange(256)
            elif op < 0.8 and len(buf) > 8:
                del buf[rng.randrange(len(buf))]
            else:
                buf.insert(rng.randrange(len(buf) + 1), rng.randrange(256))
        if rng.random() < 0.3:
            buf = buf[: rng.randrange(len(buf) + 1)]
        try:
            zstd_decompress(bytes(buf), max_output=1 << 24)
        except ZstdError:
            pass


# ------------------------------------------------------------ integration


def test_rpm_zstd_payload():
    from hoover_snoop2_spark.operators.unix_archives import (
        build_rpm,
        unpack_rpm,
    )

    members = [("usr/bin/tool", b"#!/bin/sh\necho hi\n"),
               ("etc/conf", b"key=value\n" * 200)]
    arc = build_rpm(members, "zstd")
    assert unpack_rpm(arc) == members


def test_unpack_bytes_zst_and_tar_zst():
    import io
    import tarfile

    from hoover_snoop2_spark.operators.archive_unpack import unpack_bytes

    # plain .zst member
    out = unpack_bytes(zstd_compress_store(b"inner doc text"),
                       "application/zstd")
    assert out == [("data", b"inner doc text")]

    # .tar.zst recurses into the tar immediately (like .tar.gz)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, body in (("a.txt", b"alpha"), ("d/b.txt", b"beta")):
            ti = tarfile.TarInfo(name)
            ti.size = len(body)
            tf.addfile(ti, io.BytesIO(body))
    out = unpack_bytes(zstd_compress_store(buf.getvalue()),
                       "application/zstd")
    assert dict(out) == {"a.txt": b"alpha", "d/b.txt": b"beta"}


def test_magic_sniffs_zstd():
    from hoover_snoop2_spark.functions.magic import sniff_bytes

    mime, _enc = sniff_bytes(zstd_compress_store(b"zzz"))
    assert mime == "application/zstd"


def test_content_encoding_zstd():
    from hoover_snoop2_spark.sources.warc import _decode_content

    body = b"<html><body>compressed page</body></html>"
    assert _decode_content(zstd_compress_store(body), "zstd") == body
    # garbage under the zstd label passes through unchanged
    assert _decode_content(b"\x00garbage", "zstd") == b"\x00garbage"


@needs_cli
def test_content_encoding_real_zstd():
    from hoover_snoop2_spark.sources.warc import _decode_content

    body = b"<html>" + b"<p>paragraph</p>" * 500 + b"</html>"
    assert _decode_content(cli_compress(body, 19), "zstd") == body


# ------------------------------------------------- brotli (system lib)


def test_brotli_roundtrip_and_content_encoding():
    from hoover_snoop2_spark.functions.brotli_codec import (
        BrotliError,
        brotli_available,
        brotli_compress,
        brotli_decompress,
    )
    from hoover_snoop2_spark.sources.warc import _decode_content

    if not brotli_available():
        pytest.skip("libbrotlidec not present")
    body = b"<html>" + b"<p>the same paragraph of text</p>" * 400 + b"</html>"
    comp = brotli_compress(body)
    assert len(comp) < len(body) // 4
    assert brotli_decompress(comp) == body
    assert _decode_content(comp, "br") == body
    # garbage under the br label passes through unchanged
    assert _decode_content(b"\x00junk", "br") == b"\x00junk"
    with pytest.raises(BrotliError):
        brotli_decompress(comp[: len(comp) // 2])
    # output cap guard
    big = brotli_compress(b"A" * 2_000_000)
    with pytest.raises(BrotliError, match="corrupt_or_too_large"):
        brotli_decompress(big, max_output=10_000)
