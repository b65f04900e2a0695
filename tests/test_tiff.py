"""Baseline TIFF codec tests — byte orders, strips, PackBits, photometrics."""

import struct

import numpy as np
import pytest

from hoover_snoop2_spark.functions.raster import decode_raster
from hoover_snoop2_spark.functions.tiff_codec import (
    TiffError,
    _unpackbits,
    tiff_decode,
    tiff_encode,
)


def _pattern(w, h):
    x = np.arange(w)
    y = np.arange(h)
    r = (np.add.outer(y * 5, x * 3) % 256).astype(np.uint8)
    return np.stack([r, (r * 2) % 256, 255 - r], axis=2).astype(np.uint8)


@pytest.mark.parametrize("order", ["<", ">"])
@pytest.mark.parametrize("packbits", [False, True])
@pytest.mark.parametrize("rps", [None, 4])
def test_roundtrip_matrix(order, packbits, rps):
    rgb = _pattern(17, 11)
    out = tiff_decode(
        tiff_encode(rgb, order=order, packbits=packbits, rows_per_strip=rps)
    )
    assert np.array_equal(out, rgb)


def test_packbits_kernel():
    # spec example shapes: run, literal, run
    row = b"\xaa" * 5 + b"\x01\x02\x03" + b"\xbb" * 4
    from hoover_snoop2_spark.functions.tiff_codec import _packbits

    enc = _packbits(row)
    assert _unpackbits(enc, len(row)) == row
    with pytest.raises(TiffError, match="tiff_truncated"):
        _unpackbits(enc[:2], len(row))


def _gray_fixture(white_is_zero=False):
    # hand-built 3x2 8-bit grayscale, single strip
    g = bytes([0, 100, 255, 7, 8, 9])
    order = "<"
    tags = [
        (256, 4, [3]), (257, 4, [2]), (258, 3, [8]), (259, 3, [1]),
        (262, 3, [0 if white_is_zero else 1]),
        (273, 4, [8 + 2 + 12 * 8 + 4]), (277, 3, [1]), (279, 4, [6]),
    ]
    entries = b""
    for tg, typ, vals in tags:
        fmt = "I" if typ == 4 else "H"
        raw = struct.pack(order + fmt * len(vals), *vals)
        raw += b"\x00" * (4 - len(raw))
        entries += struct.pack(order + "HHI", tg, typ, len(vals)) + raw
    ifd = struct.pack(order + "H", len(tags)) + entries + struct.pack(order + "I", 0)
    return b"II*\x00" + struct.pack(order + "I", 8) + ifd + g


def test_grayscale_and_whiteiszero():
    out = tiff_decode(_gray_fixture())
    assert tuple(out[0, 1]) == (100, 100, 100)
    inv = tiff_decode(_gray_fixture(white_is_zero=True))
    assert tuple(inv[0, 1]) == (155, 155, 155)


def test_broken_reasons():
    with pytest.raises(TiffError, match="not_tiff"):
        tiff_decode(b"GIF89a")
    good = tiff_encode(_pattern(6, 4))
    with pytest.raises(TiffError, match="tiff_truncated"):
        tiff_decode(good[:-10])
    jpg = bytearray(good)
    # flip the compression tag value (259) to 7 = JPEG-in-TIFF
    i = good.find(struct.pack("<HH", 259, 3))
    jpg[i + 8] = 7
    with pytest.raises(TiffError, match="tiff_compression_unsupported"):
        tiff_decode(bytes(jpg))
    bomb = bytearray(good)
    i = good.find(struct.pack("<HH", 256, 4))
    bomb[i + 8 : i + 12] = struct.pack("<I", 70000)
    i = good.find(struct.pack("<HH", 257, 4))
    bomb[i + 8 : i + 12] = struct.pack("<I", 70000)
    with pytest.raises(TiffError, match="tiff_too_large"):
        tiff_decode(bytes(bomb))


def test_fuzz_mutations_only_raise_tiff_error():
    import random

    rng = random.Random(55)
    enc = tiff_encode(_pattern(16, 12), packbits=True, rows_per_strip=3)
    for _ in range(800):
        data = bytearray(enc)
        for _ in range(rng.randint(1, 8)):
            op = rng.random()
            if op < 0.5:
                data[rng.randrange(len(data))] = rng.randrange(256)
            elif op < 0.8 and len(data) > 4:
                del data[rng.randrange(len(data))]
            else:
                data.insert(rng.randrange(len(data) + 1), rng.randrange(256))
        if rng.random() < 0.3:
            data = data[: rng.randrange(len(data) + 1)]
        try:
            tiff_decode(bytes(data))
        except TiffError:
            pass


def test_raster_dispatch_and_operators(spark):
    from hoover_snoop2_spark.operators.media_stats import image_stats
    from hoover_snoop2_spark.operators.thumbnails import generate_thumbnails

    rgb = _pattern(500, 120)
    data = tiff_encode(rgb, packbits=True, rows_per_strip=16)
    out, reason = decode_raster(data)
    assert reason is None and np.array_equal(out, rgb)
    df = spark.createDataFrame(
        [("t", bytearray(data))], "sha3_256 string, data binary"
    )
    thumbs = {r.size: r for r in generate_thumbnails(df).collect()}
    assert (thumbs[400].width, thumbs[400].height) == (400, 96)
    stats = image_stats(df).collect()[0]
    sums = rgb.astype(np.int64).sum(axis=(0, 1))
    assert (stats.sum_r, stats.sum_g, stats.sum_b) == tuple(int(s) for s in sums)


# ---- LZW / Predictor 2 / tiles (r4 continuation) ----

def test_lzw_kernel_roundtrip_and_early_change():
    from hoover_snoop2_spark.functions.tiff_codec import (
        _lzw_decode,
        _lzw_encode,
    )

    # highly compressible: exercises long matches
    raw = b"abcabcabcabc" * 50 + b"\x00" * 300
    assert _lzw_decode(_lzw_encode(raw), len(raw)) == raw
    # incompressible noise big enough to push the code width through
    # 9 -> 10 -> 11 -> 12 bits and force a table reset (> 4094 codes)
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, 9000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(noise), len(noise)) == noise


def test_lzw_spec_example():
    # TIFF 6.0 §13 walks the string "7 7 7 8 8 7 7 6 6": verify our
    # decoder against the codes its sample encoder would emit
    from hoover_snoop2_spark.functions.tiff_codec import (
        _lzw_decode,
        _lzw_encode,
    )

    raw = bytes([7, 7, 7, 8, 8, 7, 7, 6, 6])
    enc = _lzw_encode(raw)
    # expected code sequence: Clear(256), 7, 258(=7,7), 8, 8, 258, 6, 6, EOI
    def codes(buf):
        acc = nbits = 0
        width = 9
        out = []
        table_len = 258
        for byte in buf:
            acc = (acc << 8) | byte
            nbits += 8
            while nbits >= width:
                c = (acc >> (nbits - width)) & ((1 << width) - 1)
                nbits -= width
                out.append(c)
                if c == 257:
                    return out
        return out

    assert codes(enc) == [256, 7, 258, 8, 8, 258, 6, 6, 257]
    assert _lzw_decode(enc, len(raw)) == raw


@pytest.mark.parametrize("order", ["<", ">"])
@pytest.mark.parametrize("predictor", [1, 2])
@pytest.mark.parametrize("rps", [None, 4])
def test_lzw_roundtrip_matrix(order, predictor, rps):
    rgb = _pattern(33, 21)
    out = tiff_decode(
        tiff_encode(rgb, order=order, lzw=True, predictor=predictor,
                    rows_per_strip=rps)
    )
    assert np.array_equal(out, rgb)


@pytest.mark.parametrize("lzw", [False, True])
@pytest.mark.parametrize("predictor", [1, 2])
def test_tiled_roundtrip(lzw, predictor):
    # 40x25 image over 16x16 tiles: 3x2 grid with right+bottom padding
    rgb = _pattern(40, 25)
    out = tiff_decode(
        tiff_encode(rgb, lzw=lzw, predictor=predictor, tile=(16, 16))
    )
    assert np.array_equal(out, rgb)


def test_predictor2_streak_compresses_better():
    # a smooth gradient is LZW's worst case raw but trivial after
    # horizontal differencing — the reason Predictor 2 exists
    grad = np.tile(np.arange(200, dtype=np.uint8)[None, :, None], (8, 1, 3))
    plain = tiff_encode(grad, lzw=True, predictor=1)
    pred = tiff_encode(grad, lzw=True, predictor=2)
    assert len(pred) < len(plain)
    assert np.array_equal(tiff_decode(pred), grad)


def test_lzw_broken_reasons():
    rgb = _pattern(9, 5)
    enc = bytearray(tiff_encode(rgb, lzw=True))
    # truncate the strip data
    with pytest.raises(TiffError, match="tiff_truncated"):
        tiff_decode(bytes(enc[:-10]))
    # predictor 3 (floating point) must surface unsupported, not garbage
    bad = tiff_encode(rgb, lzw=True, predictor=2).replace(
        struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 2, 0),
        struct.pack("<HHI", 317, 3, 1) + struct.pack("<HH", 3, 0),
    )
    with pytest.raises(TiffError, match="tiff_predictor_unsupported"):
        tiff_decode(bad)
