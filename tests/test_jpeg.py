"""Baseline JPEG codec tests — spec-exact hand-built fixtures, encoder
round-trips, subsampling, restart markers, and raster integration."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hoover_snoop2_spark.functions.jpeg_codec import (
    _STD_AC_LUM,
    _STD_DC_LUM,
    _BitWriter,
    _HuffEnc,
    JpegError,
    jpeg_decode,
    jpeg_encode,
)
from hoover_snoop2_spark.functions.raster import decode_raster


def _grad(h, w):
    x = np.arange(w, dtype=np.float64)
    y = np.arange(h, dtype=np.float64)
    r = (np.add.outer(y * 2, x) % 200 + 20).astype(np.uint8)
    return np.stack([r, (r // 2) + 40, 255 - r], axis=2).astype(np.uint8)


def test_flat_color_roundtrip_exact():
    """A flat block has zero AC energy, so quant=1 round-trips exactly —
    end-to-end validation of FDCT/quant/Huffman/IDCT/color conversion."""
    for v in (0, 1, 127, 128, 130, 254, 255):
        rgb = np.full((16, 24, 3), v, dtype=np.uint8)
        out = jpeg_decode(jpeg_encode(rgb))
        assert np.array_equal(out, rgb), v


def test_gradient_roundtrip_quant1():
    rgb = _grad(32, 40)
    out = jpeg_decode(jpeg_encode(rgb))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_non_multiple_of_8_dims():
    rgb = _grad(13, 19)
    out = jpeg_decode(jpeg_encode(rgb))
    assert out.shape == (13, 19, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_subsampled_420_roundtrip():
    rgb = _grad(30, 34)
    out = jpeg_decode(jpeg_encode(rgb, subsample=True))
    assert out.shape == (30, 34, 3)
    # chroma is box-averaged 2x2 then replicated — luma stays tight
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 12


def test_restart_markers_roundtrip():
    rgb = _grad(24, 40)
    data = jpeg_encode(rgb, restart_interval=2)
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    out = jpeg_decode(data)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 2


def test_higher_quant_still_close():
    rgb = _grad(16, 16)
    out = jpeg_decode(jpeg_encode(rgb, quant=4))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 16


def _gray_dc_fixture(dc_quantized: int, pq16: bool = False) -> bytes:
    """Hand-built single-component 8x8 JPEG with one DC-only block —
    the decoder's output is exact in closed form: every pixel equals
    ``128 + dc/8`` (orthonormal IDCT of a DC-only block)."""

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    if pq16:
        dqt = seg(0xDB, bytes([0x10]) + struct.pack(">64H", *([1] * 64)))
    else:
        dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    dht_dc = seg(0xC4, bytes([0x00] + _STD_DC_LUM[0] + _STD_DC_LUM[1]))
    dht_ac = seg(0xC4, bytes([0x10] + _STD_AC_LUM[0] + _STD_AC_LUM[1]))
    sof = seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    hdc = _HuffEnc(*_STD_DC_LUM)
    hac = _HuffEnc(*_STD_AC_LUM)
    bw = _BitWriter()
    t = abs(dc_quantized).bit_length()
    ln, code = hdc.codes[t]
    bw.put(ln, code)
    if t:
        v = dc_quantized if dc_quantized >= 0 else dc_quantized + (1 << t) - 1
        bw.put(t, v)
    ln, code = hac.codes[0x00]  # EOB
    bw.put(ln, code)
    bw.flush()
    return b"\xff\xd8" + dqt + dht_dc + dht_ac + sof + sos + bytes(bw.out) + b"\xff\xd9"


def test_hand_built_dc_only_exact():
    for dc in (0, 8, -16, 64, 8 * 15):
        out = jpeg_decode(_gray_dc_fixture(dc))
        assert out.shape == (8, 8, 3)
        expect = min(255, max(0, 128 + dc // 8))
        assert (out == expect).all(), dc


def test_16bit_dqt_parsed():
    out = jpeg_decode(_gray_dc_fixture(8, pq16=True))
    assert (out == 129).all()


def test_unsupported_variants_honest_reasons():
    data = jpeg_encode(_grad(8, 8))
    # a baseline stream relabeled SOF2 is a MALFORMED progressive file
    # (a progressive scan may not span ss=0..se=63) — typed error, not
    # a wrong decode
    prog = data.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(JpegError, match="jpeg_bad_scan_params"):
        jpeg_decode(prog)
    arith = data.replace(b"\xff\xc0", b"\xff\xc9", 1)
    with pytest.raises(JpegError, match="jpeg_sof_unsupported"):
        jpeg_decode(arith)
    with pytest.raises(JpegError, match="not_jpeg"):
        jpeg_decode(b"PNG?")
    with pytest.raises(JpegError, match="jpeg_truncated|jpeg_no_scan"):
        jpeg_decode(data[: len(data) // 2])


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=1, max_value=40),
    st.integers(min_value=0, max_value=2**32 - 1),
)
def test_noise_roundtrip_property(w, h, seed):
    """Random images exercise byte stuffing (0xFF00) and every AC
    run/size class; quant=1 keeps the error within rounding."""
    rng = np.random.default_rng(seed)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    out = jpeg_decode(jpeg_encode(rgb))
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3


def test_decode_raster_and_thumbnails(spark):
    from hoover_snoop2_spark.operators.media_stats import image_stats
    from hoover_snoop2_spark.operators.thumbnails import generate_thumbnails

    rgb = _grad(120, 500)
    data = jpeg_encode(rgb)
    out, reason = decode_raster(data)
    assert reason is None and out.shape == (120, 500, 3)

    df = spark.createDataFrame(
        [("j", bytearray(data))], "sha3_256 string, data binary"
    )
    thumbs = {r.size: r for r in generate_thumbnails(df).collect()}
    assert set(thumbs) == {100, 200, 400}
    assert (thumbs[400].width, thumbs[400].height) == (400, 96)
    stats = image_stats(df).collect()[0]
    assert stats.status == "ok"
    sums = rgb.astype(np.int64).sum(axis=(0, 1))
    # lossy: sums within ±2 per pixel per channel
    for got, exact in zip((stats.sum_r, stats.sum_g, stats.sum_b), sums):
        assert abs(got - int(exact)) <= 2 * 120 * 500


def test_fuzz_mutations_only_raise_jpeg_error():
    """A 100-TB decode stage must never leak an untyped exception out of
    the kernel (it fails the whole Spark task instead of yielding one
    broken row) — random byte mutations/truncations of a valid stream
    must decode or raise JpegError, nothing else."""
    import random

    rng = random.Random(1234)
    x = np.arange(24)
    y = np.arange(16)
    base = np.stack(
        [((np.add.outer(y * 3, x)) % 250).astype(np.uint8)] * 3, axis=2
    )
    enc = jpeg_encode(base)
    for _ in range(1500):
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
            jpeg_decode(bytes(data))
        except JpegError:
            pass


def test_jpeg_dimension_bomb_guard():
    data = bytearray(jpeg_encode(_grad(8, 8)))
    i = bytes(data).find(b"\xff\xc0")
    data[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(JpegError, match="jpeg_too_large"):
        jpeg_decode(bytes(data))


def test_jpeg_tem_marker_tolerated():
    ok = jpeg_encode(np.full((8, 8, 3), 100, dtype=np.uint8))
    out = jpeg_decode(ok[:2] + b"\xff\x01" + ok[2:])
    assert (out == 100).all()


# ---- progressive (SOF2, Annex G) — r4 continuation ----

from hoover_snoop2_spark.functions.jpeg_codec import jpeg_encode_progressive


@pytest.mark.parametrize("subsample", [False, True])
@pytest.mark.parametrize("quant", [1, 8])
def test_progressive_equals_sequential(subsample, quant):
    # successive approximation refines to al=0, so the decoded pixels
    # must be BIT-IDENTICAL to the sequential encoding of the same
    # quantized coefficients — across sampling and quant levels
    img = _grad(37, 29)
    seq = jpeg_decode(jpeg_encode(img, quant=quant, subsample=subsample))
    pro = jpeg_decode(
        jpeg_encode_progressive(img, quant=quant, subsample=subsample)
    )
    assert np.array_equal(seq, pro)


def test_progressive_grayscale_exact():
    gray = (np.add.outer(np.arange(25) * 7, np.arange(31) * 3) % 256).astype(
        np.uint8
    )
    out = jpeg_decode(jpeg_encode_progressive(gray, quant=1))
    assert out.shape == (25, 31, 3)
    # quant=1 grayscale is near-lossless; FDCT/IDCT round-trip is exact
    # here because the pattern's block energy stays well inside range
    assert np.array_equal(out, np.repeat(gray[:, :, None], 3, axis=2))


def test_progressive_restart_markers():
    img = _grad(37, 29)
    seq = jpeg_decode(jpeg_encode(img, quant=1))
    pro = jpeg_decode(
        jpeg_encode_progressive(img, quant=1, restart_interval=3)
    )
    assert np.array_equal(seq, pro)


def test_progressive_long_eob_runs():
    # a flat image makes every AC band empty: the first AC scan is one
    # giant EOB run covering all blocks (> 2^4 so multi-bit EOBn codes),
    # and the refinement scans exercise the run-with-correction tail
    img = np.full((64, 96, 3), 200, np.uint8)
    seq = jpeg_decode(jpeg_encode(img, quant=1))
    pro = jpeg_decode(jpeg_encode_progressive(img, quant=1))
    assert np.array_equal(seq, pro)


def test_progressive_custom_scan_script():
    # odd split points + an extra refinement stage
    img = _grad(24, 18)
    scans = [
        ((0, 1, 2), 0, 0, 0, 2),
        ((0,), 1, 2, 0, 1), ((0,), 3, 63, 0, 1),
        ((1,), 1, 63, 0, 0), ((2,), 1, 63, 0, 0),
        ((0, 1, 2), 0, 0, 2, 1), ((0, 1, 2), 0, 0, 1, 0),
        ((0,), 1, 2, 1, 0), ((0,), 3, 63, 1, 0),
    ]
    seq = jpeg_decode(jpeg_encode(img, quant=1))
    pro = jpeg_decode(jpeg_encode_progressive(img, quant=1, scans=scans))
    assert np.array_equal(seq, pro)


def test_progressive_truncation_and_partial():
    img = _grad(37, 29)
    data = jpeg_encode_progressive(img, quant=1)
    # cutting into entropy data surfaces a typed error
    with pytest.raises(JpegError):
        jpeg_decode(data[: len(data) // 3])
    # complete scans with the EOI missing still render (browser
    # semantics for a cut-off progressive download)
    out = jpeg_decode(data[:-2])
    assert out.shape == img.shape


def test_progressive_fuzz_only_typed_errors():
    import random

    rng = random.Random(11)
    base = jpeg_encode_progressive(_grad(16, 12), quant=2)
    for _ in range(300):
        buf = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            buf[rng.randrange(len(buf))] = rng.randrange(256)
        try:
            jpeg_decode(bytes(buf))
        except JpegError:
            pass
