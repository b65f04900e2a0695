"""WebP (VP8L lossless) codec tests — transforms, LZ77, cache, meta
groups, container kinds, and the magic/raster/multimodal integration."""

import struct

import numpy as np
import pytest

from hoover_snoop2_spark.functions.raster import decode_raster
from hoover_snoop2_spark.functions.raster_common import composite_over_white
from hoover_snoop2_spark.functions.webp_codec import (
    DIST_MAP,
    WebpError,
    webp_decode,
    webp_dims,
    webp_encode_lossless,
)


def _pattern(w, h):
    x = np.arange(w)
    y = np.arange(h)
    r = (np.add.outer(y * 5, x * 3) % 256).astype(np.uint8)
    return np.stack([r, (r * 2) % 256, 255 - r], axis=2).astype(np.uint8)


# ---------------------------------------------------------------------------
# short-distance map: pin the generated table against the spec's literal
# listing (prefix) and its structural invariants
# ---------------------------------------------------------------------------

_SPEC_PREFIX = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5),
]


def test_dist_map_spec_prefix():
    assert DIST_MAP[: len(_SPEC_PREFIX)] == _SPEC_PREFIX


def test_dist_map_invariants():
    assert len(DIST_MAP) == 120
    assert len(set(DIST_MAP)) == 120
    # window: one row of pure-left offsets, seven rows above
    for dx, dy in DIST_MAP:
        if dy == 0:
            assert 1 <= dx <= 8
        else:
            assert 1 <= dy <= 7 and -7 <= dx <= 8
    # sorted by Euclidean distance (ties broken inside equal-distance runs)
    d2 = [dx * dx + dy * dy for dx, dy in DIST_MAP]
    assert d2 == sorted(d2)
    assert DIST_MAP[-1] == (8, 7)


# ---------------------------------------------------------------------------
# round-trips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("kw", [
    dict(use_lz77=False),
    dict(use_lz77=True),
    dict(cache_bits=4),
    dict(use_lz77=True, cache_bits=6),
    dict(subtract_green=True),
    dict(meta_split=True),
    dict(use_lz77=True, subtract_green=True, cache_bits=3, meta_split=True),
    dict(color_transform=(23, -17, 5)),
    dict(color_transform=(-128, 127, 66), use_lz77=True),
])
def test_roundtrip_matrix(kw):
    img = _pattern(17, 11)
    assert np.array_equal(webp_decode(webp_encode_lossless(img, **kw)), img)


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes(mode):
    img = _pattern(19, 13)
    out = webp_decode(webp_encode_lossless(img, predictor_mode=mode))
    assert np.array_equal(out, img)


@pytest.mark.parametrize("ncol", [1, 2, 4, 13, 16, 17, 250])
def test_palette_packing(ncol):
    base = np.arange(ncol, dtype=np.uint8)
    idx = np.add.outer(np.arange(9) * 3, np.arange(31)) % ncol
    img = np.stack(
        [base[idx], 255 - base[idx], (base[idx] * 7) % 256], axis=2
    ).astype(np.uint8)
    out = webp_decode(webp_encode_lossless(img, palette=True))
    assert np.array_equal(out, img)


def test_alpha_composites_over_white():
    img = _pattern(17, 11)
    alpha = (np.arange(11 * 17) % 256).reshape(11, 17).astype(np.uint8)
    rgba = np.dstack([img, alpha])
    out = webp_decode(webp_encode_lossless(rgba))
    assert np.array_equal(out, composite_over_white(img, alpha))


def test_grayscale_input():
    g = (np.add.outer(np.arange(7) * 11, np.arange(5) * 3) % 256)
    g = g.astype(np.uint8)
    out = webp_decode(webp_encode_lossless(g))
    assert np.array_equal(out, np.stack([g] * 3, axis=2))


def test_single_pixel_and_single_column():
    one = np.array([[[7, 8, 9]]], np.uint8)
    assert np.array_equal(webp_decode(webp_encode_lossless(one)), one)
    col = _pattern(1, 9)
    assert np.array_equal(webp_decode(webp_encode_lossless(col)), col)


def test_random_stress_all_paths():
    rng = np.random.default_rng(7)
    for trial in range(20):
        w = int(rng.integers(1, 40))
        h = int(rng.integers(1, 40))
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        kw = {}
        if trial % 3 == 0:
            kw["use_lz77"] = True
        if trial % 4 == 0:
            kw["cache_bits"] = int(rng.integers(1, 9))
        if trial % 5 == 0:
            kw["subtract_green"] = True
        if trial % 7 == 0:
            kw["predictor_mode"] = int(rng.integers(0, 14))
        if trial % 6 == 0:
            kw["meta_split"] = True
        out = webp_decode(webp_encode_lossless(img, **kw))
        assert np.array_equal(out, img), (trial, kw)


# ---------------------------------------------------------------------------
# container kinds, dims, and typed failures
# ---------------------------------------------------------------------------


def _riff(fourcc, payload):
    chunk = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _vp8_lossy_bytes(w, h):
    payload = b"\x00\x00\x00" + b"\x9d\x01\x2a"
    payload += struct.pack("<HH", w, h) + b"\x00" * 8
    return _riff(b"VP8 ", payload)


def test_dims_lossless():
    data = webp_encode_lossless(_pattern(33, 21))
    assert webp_dims(data) == ("webp-lossless", 33, 21)


def test_dims_lossy_and_unsupported():
    data = _vp8_lossy_bytes(640, 480)
    assert webp_dims(data) == ("webp-lossy", 640, 480)
    with pytest.raises(WebpError, match="webp_vp8_unsupported"):
        webp_decode(data)


def test_dims_vp8x():
    payload = b"\x00\x00\x00\x00" + (799).to_bytes(3, "little") \
        + (599).to_bytes(3, "little")
    data = _riff(b"VP8X", payload)
    assert webp_dims(data) == ("webp-extended", 800, 600)


def test_vp8x_wrapped_lossless_decodes():
    img = _pattern(9, 7)
    inner = webp_encode_lossless(img)
    # re-wrap: VP8X header chunk + the VP8L chunk from the plain file
    vp8l_chunk = inner[12:]
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4 \
        + (8).to_bytes(3, "little") + (6).to_bytes(3, "little")
    body = b"WEBP" + vp8x + vp8l_chunk
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    assert np.array_equal(webp_decode(data), img)


def test_truncation_is_typed():
    data = webp_encode_lossless(_pattern(20, 20))
    with pytest.raises(WebpError):
        webp_decode(data[: len(data) // 2])
    with pytest.raises(WebpError, match="webp_bad_container"):
        webp_decode(b"RIFF\x00\x00\x00\x00NOPE")


# ---------------------------------------------------------------------------
# integration: magic sniff, raster dispatch, multimodal dims
# ---------------------------------------------------------------------------


def test_magic_sniffs_webp():
    from hoover_snoop2_spark.functions.magic import sniff_bytes

    data = webp_encode_lossless(_pattern(5, 4))
    assert sniff_bytes(data)[0] == "image/webp"
    # plain RIFF (WAVE) still maps to the generic RIFF type
    wav = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"\x00" * 16
    assert sniff_bytes(wav)[0] == "application/x-riff"


def test_decode_raster_dispatch():
    img = _pattern(13, 8)
    rgb, reason = decode_raster(webp_encode_lossless(img))
    assert reason is None and np.array_equal(rgb, img)
    rgb, reason = decode_raster(_vp8_lossy_bytes(16, 16))
    assert rgb is None and reason == "webp_vp8_unsupported"


def test_multimodal_header_dims():
    from hoover_snoop2_spark.operators.multimodal import parse_image_header

    data = webp_encode_lossless(_pattern(31, 14))
    assert parse_image_header(data) == ("webp", 31, 14)
    assert parse_image_header(_vp8_lossy_bytes(320, 200)) == (
        "webp", 320, 200)
