"""PNG codec + thumbnail operator tests.

The encoder can emit every filter type per row, so decode round-trips
exercise all five unfilter paths against ground-truth pixel arrays.
Interlaced / sub-byte / palette / 16-bit streams are hand-built in the
helpers below (the encoder itself only writes 8-bit truecolor)."""

import struct
import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hoover_snoop2_spark.functions.png_codec import (
    _ADAM7,
    PngError,
    make_thumbnail_png,
    png_decode,
    png_encode,
    resize_box,
)
from hoover_snoop2_spark.operators.thumbnails import (
    THUMBNAIL_SIZES,
    generate_thumbnails,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _build_png(width, height, bit_depth, color_type, raw_scanlines,
               palette=None, interlace=0):
    """Assemble a PNG from already-filtered scanline bytes."""
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0,
                       interlace)
    out = sig + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    out += _chunk(b"IDAT", zlib.compress(raw_scanlines))
    return out + _chunk(b"IEND", b"")


def _rand_rgb(rng, h, w):
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# ---------------------------------------------------------------- codec


def test_roundtrip_filter0():
    rng = np.random.default_rng(7)
    img = _rand_rgb(rng, 13, 17)
    assert np.array_equal(png_decode(png_encode(img)), img)


@pytest.mark.parametrize("f", [0, 1, 2, 3, 4])
def test_roundtrip_each_filter(f):
    rng = np.random.default_rng(f)
    img = _rand_rgb(rng, 9, 11)
    data = png_encode(img, filters=[f] * 9)
    assert np.array_equal(png_decode(data), img)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    seed=st.integers(0, 2**31),
    data=st.data(),
)
def test_roundtrip_mixed_filters_property(h, w, seed, data):
    rng = np.random.default_rng(seed)
    img = _rand_rgb(rng, h, w)
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    assert np.array_equal(png_decode(png_encode(img, filters=filters)), img)


def test_gray_8bit():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    scan = b"".join(b"\x00" + g[y].tobytes() for y in range(3))
    img = png_decode(_build_png(4, 3, 8, 0, scan))
    assert np.array_equal(img[:, :, 0], g) and np.array_equal(img[:, :, 1], g)


def test_gray_1bit_and_4bit():
    # 1-bit: pattern 1010 1100 -> pixels 255,0,255,0,255,255,0,0
    scan = b"\x00" + bytes([0b10101100])
    img = png_decode(_build_png(8, 1, 1, 0, scan))
    assert list(img[0, :, 0]) == [255, 0, 255, 0, 255, 255, 0, 0]
    # 4-bit: 0xAB -> 10*17, 11*17
    scan = b"\x00" + bytes([0xAB])
    img = png_decode(_build_png(2, 1, 4, 0, scan))
    assert list(img[0, :, 0]) == [170, 187]


def test_palette():
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R,G,B entries
    scan = b"\x00" + bytes([0, 1, 2, 1])
    img = png_decode(_build_png(4, 1, 8, 3, scan, palette=palette))
    assert [tuple(p) for p in img[0]] == [
        (255, 0, 0), (0, 255, 0), (0, 0, 255), (0, 255, 0)]


def test_palette_2bit():
    palette = bytes([10, 10, 10, 200, 200, 200, 0, 0, 0, 255, 255, 255])
    # 2-bit indices 3,0,1,2 packed MSB-first: 11 00 01 10
    scan = b"\x00" + bytes([0b11000110])
    img = png_decode(_build_png(4, 1, 2, 3, scan, palette=palette))
    assert [int(p[0]) for p in img[0]] == [255, 10, 200, 0]


def test_rgba_over_white_and_gray_alpha():
    # RGBA pixel (0,0,0,128) over white -> 127 (floor((0*128+255*127+127)/255))
    scan = b"\x00" + bytes([0, 0, 0, 128, 10, 20, 30, 255])
    img = png_decode(_build_png(2, 1, 8, 6, scan))
    assert tuple(img[0, 0]) == (127, 127, 127)
    assert tuple(img[0, 1]) == (10, 20, 30)
    # gray+alpha fully transparent -> white
    scan = b"\x00" + bytes([99, 0])
    img = png_decode(_build_png(1, 1, 8, 4, scan))
    assert tuple(img[0, 0]) == (255, 255, 255)


def test_16bit_truecolor_msb():
    px = struct.pack(">HHH", 0xFF00, 0x0102, 0x8081)
    scan = b"\x00" + px
    img = png_decode(_build_png(1, 1, 16, 2, scan))
    assert tuple(img[0, 0]) == (0xFF, 0x01, 0x80)


def test_adam7_interlace_roundtrip():
    rng = np.random.default_rng(42)
    h, w = 11, 13
    img = _rand_rgb(rng, h, w)
    # build the interlaced stream pass by pass (filter 0 rows)
    body = bytearray()
    for xoff, yoff, xstep, ystep in _ADAM7:
        sub = img[yoff::ystep, xoff::xstep]
        if sub.size == 0:
            continue
        for y in range(sub.shape[0]):
            body.append(0)
            body.extend(sub[y].tobytes())
    data = _build_png(w, h, 8, 2, bytes(body), interlace=1)
    assert np.array_equal(png_decode(data), img)


def test_crc_and_truncation_rejected():
    img = png_encode(np.zeros((2, 2, 3), dtype=np.uint8))
    corrupt = bytearray(img)
    corrupt[40] ^= 0xFF
    with pytest.raises(PngError):
        png_decode(bytes(corrupt))
    with pytest.raises(PngError):
        png_decode(img[:-8])
    with pytest.raises(PngError):
        png_decode(b"not a png at all")


# ---------------------------------------------------------------- resize


def test_resize_exact_box_mean():
    # 4x4 image of 2x2 constant blocks -> 2x2 with the block values
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    img[:2, :2] = 10
    img[:2, 2:] = 20
    img[2:, :2] = 30
    img[2:, 2:] = 40
    out = resize_box(img, 2)
    assert out.shape == (2, 2, 3)
    assert [int(out[0, 0, 0]), int(out[0, 1, 0]),
            int(out[1, 0, 0]), int(out[1, 1, 0])] == [10, 20, 30, 40]


def test_resize_preserves_aspect_and_never_upscales():
    img = np.zeros((30, 60, 3), dtype=np.uint8)
    out = resize_box(img, 20)
    assert out.shape == (10, 20, 3)
    small = np.zeros((5, 7, 3), dtype=np.uint8)
    assert resize_box(small, 100).shape == (5, 7, 3)


def test_resize_deterministic_pinned():
    rng = np.random.default_rng(123)
    img = _rand_rgb(rng, 37, 23)
    out = resize_box(img, 10)
    import hashlib

    assert out.shape == (10, 6, 3)  # 23*10/37 rounds half-up to 6
    digest = hashlib.sha256(out.tobytes()).hexdigest()
    # pinned: any platform drift in the box average breaks this
    assert digest == PINNED_RESIZE_SHA, digest


# computed once on numpy int/float64 ops only; platform-stable because the
# integral sums of uint8 pixels are exact in float64.
PINNED_RESIZE_SHA = (
    "a1232c81c80accd5611043b1b65a82ade906331d1ee0d8fd4c91739672640e7c"
)


def test_make_thumbnail_sizes():
    rng = np.random.default_rng(5)
    img = _rand_rgb(rng, 801, 400)
    data = png_encode(img)
    thumb = make_thumbnail_png(data, 400)
    decoded = png_decode(thumb)
    assert decoded.shape[0] == 400 and decoded.shape[1] <= 400


# ---------------------------------------------------------------- operator


def test_generate_thumbnails_spark(spark):
    rng = np.random.default_rng(9)
    big = png_encode(_rand_rgb(rng, 500, 900))
    small = png_encode(_rand_rgb(rng, 50, 40))
    rows = [
        ("png_big", bytearray(big)),
        ("png_small", bytearray(small)),
        ("jpeg_trunc", bytearray(b"\xff\xd8\xff\xe0" + bytes(16))),
        ("junk", bytearray(b"plain text")),
    ]
    df = spark.createDataFrame(rows, "sha3_256 string, data binary")
    got = generate_thumbnails(df).collect()
    by = {}
    for r in got:
        by.setdefault(r["sha3_256"], []).append(r)
    bigs = sorted(by["png_big"], key=lambda r: r["size"])
    assert [r["size"] for r in bigs] == [100, 200, 400]
    for r in bigs:
        assert r["status"] == "ok"
        dec = png_decode(bytes(r["thumbnail"]))
        assert max(dec.shape[:2]) <= r["size"]
        assert (dec.shape[1], dec.shape[0]) == (r["width"], r["height"])
    # aspect preserved: 900x500 -> 400-wide
    assert (bigs[-1]["width"], bigs[-1]["height"]) == (400, 222)
    # small image: not upscaled at any size
    smalls = by["png_small"]
    assert all(r["width"] == 40 and r["height"] == 50 for r in smalls)
    assert by["jpeg_trunc"][0]["broken_reason"].startswith("jpeg_")
    assert by["junk"][0]["broken_reason"] == "not_image"


def test_thumbnail_sizes_match_reference():
    # models.py:1243-1246 SizeChoices SMALL=100 MEDIUM=200 LARGE=400
    assert tuple(sorted(THUMBNAIL_SIZES)) == (100, 200, 400)


def test_png_zlib_bomb_capped():
    """A 1x1 header whose IDAT expands to hundreds of MB must stop at
    the geometry-derived inflate cap with a typed error, not allocate."""
    import zlib as _zlib

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    bomb = _zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="png_too_large"):
        png_decode(png)
