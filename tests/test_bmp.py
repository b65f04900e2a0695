"""BMP codec tests — bit depths, row order, padding, and integration."""

import struct

import numpy as np
import pytest

from hoover_snoop2_spark.functions.bmp_codec import (
    BmpError,
    bmp_decode,
    bmp_encode,
)
from hoover_snoop2_spark.functions.raster import decode_raster


def _pattern(w, h):
    x = np.arange(w)
    y = np.arange(h)
    r = (np.add.outer(y * 5, x * 3) % 256).astype(np.uint8)
    return np.stack([r, (r * 2) % 256, 255 - r], axis=2).astype(np.uint8)


def test_roundtrip_24bpp():
    for w, h in ((1, 1), (3, 2), (13, 7), (64, 33)):
        rgb = _pattern(w, h)
        assert np.array_equal(bmp_decode(bmp_encode(rgb)), rgb), (w, h)


def test_row_padding_widths():
    # widths whose 3*w is not a multiple of 4 exercise the stride pad
    for w in (1, 2, 3, 5, 6, 7):
        rgb = _pattern(w, 3)
        assert np.array_equal(bmp_decode(bmp_encode(rgb)), rgb), w


def test_top_down_negative_height():
    rgb = _pattern(5, 4)
    data = bytearray(bmp_encode(rgb))
    # flip to top-down: negate height, reverse the stored row order
    stride = (5 * 3 + 3) & ~3
    body = bytes(data[54:])
    rows = [body[i * stride : (i + 1) * stride] for i in range(4)]
    data[22:26] = struct.pack("<i", -4)
    data[54:] = b"".join(rows[::-1])
    assert np.array_equal(bmp_decode(bytes(data)), rgb)


def test_8bpp_palette():
    # hand-built 4x2 8-bpp with a 4-entry palette
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in
                   [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)])
    rows = bytes([0, 1, 2, 3]) + bytes([3, 2, 1, 0])  # stride 4, no pad
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 0, len(rows),
                       0, 0, 4, 0)
    off = 14 + 40 + len(pal)
    data = (b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
            + info + pal + rows)
    out = bmp_decode(data)
    # bottom-up: stored first row is the BOTTOM row
    assert tuple(out[1, 0]) == (255, 0, 0)
    assert tuple(out[0, 3]) == (255, 0, 0)
    assert tuple(out[0, 0]) == (9, 9, 9)


def test_1bpp_palette():
    pal = bytes([0, 0, 0, 0]) + bytes([255, 255, 255, 0])
    row = bytes([0b10100000]) + b"\x00" * 3  # 5px: 1,0,1,0,0
    info = struct.pack("<IiiHHIIiiII", 40, 5, 1, 1, 1, 0, 4, 0, 0, 2, 0)
    off = 14 + 40 + len(pal)
    data = (b"BM" + struct.pack("<IHHI", off + 4, 0, 0, off)
            + info + pal + row)
    out = bmp_decode(data)
    assert [int(p[0]) for p in out[0]] == [255, 0, 255, 0, 0]


def test_32bpp_reserved_byte_opaque_by_default():
    """BI_RGB's 4th byte is RESERVED — GDI-style writers zero it, and a
    decoder honoring it as alpha would render those files all-white."""
    px = bytes([30, 20, 10, 0])  # BGRX with zeroed reserved byte
    info = struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 32, 0, 4, 0, 0, 0, 0)
    off = 14 + 40
    data = (b"BM" + struct.pack("<IHHI", off + 4, 0, 0, off) + info + px)
    assert tuple(bmp_decode(data)[0, 0]) == (10, 20, 30)
    # the ICO convention: opt-in alpha, half-transparent black → 127
    px2 = bytes([0, 0, 0, 128])
    data2 = (b"BM" + struct.pack("<IHHI", off + 4, 0, 0, off) + info + px2)
    assert tuple(bmp_decode(data2, alpha_32bpp=True)[0, 0]) == (127, 127, 127)


def test_broken_reasons():
    with pytest.raises(BmpError, match="not_bmp"):
        bmp_decode(b"PNG stuff")
    good = bytearray(bmp_encode(_pattern(4, 4)))
    with pytest.raises(BmpError, match="bmp_truncated"):
        bmp_decode(bytes(good[:-8]))
    rle = bytearray(good)
    rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(BmpError, match="bmp_compression_unsupported"):
        bmp_decode(bytes(rle))
    bomb = bytearray(good)
    bomb[18:26] = struct.pack("<ii", 60000, 60000)
    with pytest.raises(BmpError, match="bmp_too_large"):
        bmp_decode(bytes(bomb))


def test_fuzz_mutations_only_raise_bmp_error():
    import random

    rng = random.Random(31)
    enc = bmp_encode(_pattern(16, 12))
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
            bmp_decode(bytes(data))
        except BmpError:
            pass


def test_raster_dispatch_and_operators(spark):
    from hoover_snoop2_spark.operators.media_stats import image_stats
    from hoover_snoop2_spark.operators.thumbnails import generate_thumbnails

    rgb = _pattern(500, 120)
    data = bmp_encode(rgb)
    out, reason = decode_raster(data)
    assert reason is None and np.array_equal(out, rgb)

    df = spark.createDataFrame(
        [("b", bytearray(data))], "sha3_256 string, data binary"
    )
    thumbs = {r.size: r for r in generate_thumbnails(df).collect()}
    assert (thumbs[400].width, thumbs[400].height) == (400, 96)
    stats = image_stats(df).collect()[0]
    sums = rgb.astype(np.int64).sum(axis=(0, 1))
    assert (stats.sum_r, stats.sum_g, stats.sum_b) == tuple(int(s) for s in sums)


# ------------------------------------------------------------------- ICO


def _build_ico(entries):
    """entries: list of (w, h, image_bytes)."""
    header = struct.pack("<HHH", 0, 1, len(entries))
    directory = b""
    blobs = b""
    off = 6 + 16 * len(entries)
    for w, h, blob in entries:
        directory += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(blob), off
        )
        off += len(blob)
        blobs += blob
    return header + directory + blobs


def _dib_entry(rgb, mask_bits=None):
    """32-bpp DIB with doubled height + AND mask."""
    h, w = rgb.shape[:2]
    info = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0, 0,
                       0, 0, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = rgb[y, x]
            body += bytes([b, g, r, 255])
    mask_stride = ((w + 31) // 32) * 4
    if mask_bits is None:
        mask = b"\x00" * (mask_stride * h)
    else:
        rows = []
        for y in range(h - 1, -1, -1):
            packed = np.packbits(mask_bits[y].astype(np.uint8))
            rows.append(packed.tobytes().ljust(mask_stride, b"\x00"))
        mask = b"".join(rows)
    return bytes(info) + bytes(body) + mask


def test_ico_png_entry():
    from hoover_snoop2_spark.functions.bmp_codec import ico_decode
    from hoover_snoop2_spark.functions.png_codec import png_encode

    rgb = _pattern(24, 16)
    data = _build_ico([(24, 16, png_encode(rgb))])
    assert np.array_equal(ico_decode(data), rgb)


def test_ico_dib_entry_and_largest_selection():
    from hoover_snoop2_spark.functions.bmp_codec import ico_decode

    small = _pattern(4, 4)
    big = _pattern(16, 8)
    data = _build_ico([
        (4, 4, _dib_entry(small)),
        (16, 8, _dib_entry(big)),
    ])
    assert np.array_equal(ico_decode(data), big)


def test_ico_raster_dispatch_and_broken():
    from hoover_snoop2_spark.functions.bmp_codec import BmpError, ico_decode

    rgb = _pattern(8, 8)
    data = _build_ico([(8, 8, _dib_entry(rgb))])
    out, reason = decode_raster(data)
    assert reason is None and np.array_equal(out, rgb)
    with pytest.raises(BmpError, match="not_ico"):
        ico_decode(b"\x01\x02")
    with pytest.raises(BmpError, match="ico_truncated"):
        ico_decode(data[: len(data) // 2])


def test_32bpp_alpha_wide_image():
    """Regression: the alpha composite broadcast only worked at width 1
    (trailing-dim coincidence) — exercise a wide 32-bpp image."""
    h, w = 3, 7
    body = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            body += bytes([10, 20, 30, 128])  # BGRA half-transparent
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 32, 0, len(body),
                       0, 0, 0, 0)
    off = 14 + 40
    data = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + info + bytes(body))
    out = bmp_decode(data, alpha_32bpp=True)
    # (c*128 + 255*127 + 127) // 255 per channel
    expect = tuple((c * 128 + 255 * 127 + 127) // 255 for c in (30, 20, 10))
    assert out.shape == (h, w, 3)
    assert all(tuple(px) == expect for row in out for px in row)


def test_ico_legacy_zero_alpha_uses_and_mask():
    """Legacy 32-bpp icons zero the alpha byte and rely on the AND mask
    — honoring zero alpha would render them invisible (all white)."""
    from hoover_snoop2_spark.functions.bmp_codec import ico_decode

    h, w = 4, 8
    rgb = _pattern(w, h)
    info = struct.pack("<IiiHHIIiiII", 40, w, 2 * h, 1, 32, 0, 0, 0, 0, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = rgb[y, x]
            body += bytes([b, g, r, 0])  # zero alpha
    mask_stride = ((w + 31) // 32) * 4
    mask = np.zeros((h, w), dtype=bool)
    mask[0, 0] = True  # top-left pixel masked out
    rows = []
    for y in range(h - 1, -1, -1):
        packed = np.packbits(mask[y].astype(np.uint8))
        rows.append(packed.tobytes().ljust(mask_stride, b"\x00"))
    blob = bytes(info) + bytes(body) + b"".join(rows)
    data = _build_ico([(w, h, blob)])
    out = ico_decode(data)
    assert tuple(out[0, 0]) == (255, 255, 255)  # masked → white
    assert np.array_equal(out[1:], rgb[1:])  # everything else opaque
