"""GIF codec tests — LZW edge cases, interlace, transparency, and the
thumbnail/feature integration."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hoover_snoop2_spark.functions.gif_codec import (
    GifError,
    gif_decode,
    gif_encode,
)
from hoover_snoop2_spark.functions.raster import decode_raster


def _pattern(w, h, ncolors):
    x = np.arange(w)
    y = np.arange(h)
    idx = (np.add.outer(y * 3, x) % ncolors).astype(np.uint8)
    palette = np.stack(
        [
            (np.arange(ncolors) * 17) % 256,
            (np.arange(ncolors) * 31) % 256,
            (np.arange(ncolors) * 7) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    return palette[idx]


def test_roundtrip_two_colors():
    rgb = _pattern(7, 5, 2)
    assert np.array_equal(gif_decode(gif_encode(rgb)), rgb)


def test_roundtrip_many_colors():
    rgb = _pattern(40, 30, 200)
    assert np.array_equal(gif_decode(gif_encode(rgb)), rgb)


def test_roundtrip_256_colors():
    # full palette — encoder clear-code cadence at max table width
    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    v = np.arange(256, dtype=np.uint8).reshape(16, 16)
    rgb[:, :, 0] = v
    rgb[:, :, 1] = v[::-1]
    rgb[:, :, 2] = 7
    assert np.array_equal(gif_decode(gif_encode(rgb)), rgb)


def test_roundtrip_interlaced():
    rgb = _pattern(23, 17, 9)
    out = gif_decode(gif_encode(rgb, interlace=True))
    assert np.array_equal(out, rgb)


def test_transparency_composites_white():
    rgb = _pattern(8, 8, 4)
    t = tuple(int(c) for c in rgb[0, 0])
    out = gif_decode(gif_encode(rgb, transparent_rgb=t))
    mask = (rgb == np.array(t, dtype=np.uint8)).all(axis=2)
    assert (out[mask] == 255).all()
    assert np.array_equal(out[~mask], rgb[~mask])


def test_gif87a_header_accepted():
    data = bytearray(gif_encode(_pattern(5, 4, 3)))
    data[:6] = b"GIF87a"
    assert gif_decode(bytes(data)).shape == (4, 5, 3)


def test_frame_offset_clips_to_screen():
    """An image descriptor offset inside a larger logical screen paints
    onto a white canvas (first-frame semantics)."""
    rgb = _pattern(4, 3, 5)
    data = bytearray(gif_encode(rgb))
    # widen the logical screen to 6x5 and offset the frame to (2, 1)
    data[6:10] = struct.pack("<HH", 6, 5)
    desc = bytes(data).index(b"\x2c")
    data[desc + 1 : desc + 5] = struct.pack("<HH", 2, 1)
    out = gif_decode(bytes(data))
    assert out.shape == (5, 6, 3)
    assert np.array_equal(out[1:4, 2:6], rgb)
    assert (out[0] == 255).all() and (out[:, :2] == 255).all()


def test_broken_reasons():
    with pytest.raises(GifError, match="not_gif"):
        gif_decode(b"NOTAGIF")
    with pytest.raises(GifError, match="gif_truncated"):
        gif_decode(b"GIF89a" + b"\x00" * 4)
    good = gif_encode(_pattern(6, 6, 4))
    with pytest.raises(GifError, match="truncated"):
        gif_decode(good[:-12])
    with pytest.raises(GifError, match="gif_no_image"):
        gif_decode(good[:13] + good[13 : 13 + 4 * 3] + b"\x3b")


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=2, max_value=256),
    st.booleans(),
)
def test_roundtrip_property(w, h, ncolors, interlace):
    rgb = _pattern(w, h, ncolors)
    assert np.array_equal(gif_decode(gif_encode(rgb, interlace=interlace)), rgb)


# ------------------------------------------------------------- integration


def test_decode_raster_dispatch():
    rgb = _pattern(9, 6, 8)
    out, reason = decode_raster(gif_encode(rgb))
    assert reason is None and np.array_equal(out, rgb)
    out, reason = decode_raster(b"\xff\xd8\xff\xe0...")
    assert out is None and reason.startswith("jpeg_")
    out, reason = decode_raster(b"GIF89a\xff")
    assert out is None and reason == "gif_truncated"


def test_gif_thumbnails_and_stats(spark):
    from hoover_snoop2_spark.operators.media_stats import image_stats
    from hoover_snoop2_spark.operators.thumbnails import generate_thumbnails

    rgb = _pattern(500, 120, 32)
    df = spark.createDataFrame(
        [("g", bytearray(gif_encode(rgb)))], "sha3_256 string, data binary"
    )
    thumbs = {r.size: r for r in generate_thumbnails(df).collect()}
    assert set(thumbs) == {100, 200, 400}
    assert (thumbs[400].width, thumbs[400].height) == (400, 96)
    stats = image_stats(df).collect()[0]
    sums = rgb.astype(np.int64).sum(axis=(0, 1))
    assert (stats.sum_r, stats.sum_g, stats.sum_b) == tuple(int(s) for s in sums)
    assert stats.status == "ok"


def test_fuzz_mutations_only_raise_gif_error():
    """Same kernel-safety invariant as the JPEG fuzz: mutations of a
    valid stream decode or raise GifError — never an untyped exception
    that would fail a whole Spark task."""
    import random

    rng = random.Random(77)
    enc = gif_encode(_pattern(24, 16, 17))
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
            gif_decode(bytes(data))
        except GifError:
            pass


def test_gif_dimension_bomb_guard():
    data = bytearray(gif_encode(_pattern(4, 4, 3)))
    data[6:10] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(GifError, match="gif_too_large"):
        gif_decode(bytes(data))
