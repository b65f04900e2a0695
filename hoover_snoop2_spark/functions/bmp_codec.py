"""Pure-Python + numpy BMP (Windows DIB) decoder/encoder.

``image/x-ms-bmp`` sits in the reference's thumbnail mime allowlist
(``/root/reference/snoop/data/analyzers/thumbnails.py:31``); the format
is public-spec (BITMAPFILEHEADER + BITMAPINFOHEADER) and uncompressed in
the overwhelmingly common case, so it joins the native raster set
(:mod:`.png_codec`, :mod:`.gif_codec`, :mod:`.jpeg_codec`) at stdlib
cost.

Decoder coverage: BITMAPINFOHEADER (40) and the V4/V5 supersets
(108/124), bottom-up and top-down rows, BI_RGB at 24/32 bpp, and 1/4/8
bpp palette images; 4-byte row padding.  RLE and bitfield compressions
surface ``bmp_compression_unsupported``.  Encoder: 24-bpp BI_RGB
bottom-up, for fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

from .raster_common import MAX_PIXELS, composite_over_white


class BmpError(ValueError):
    """Malformed/unsupported BMP input; callers map it to broken_reason."""


def bmp_decode(data: bytes, alpha_32bpp: bool = False) -> np.ndarray:
    """Decode to (h, w, 3) uint8 RGB.

    In BI_RGB the 32-bpp fourth byte is RESERVED and most writers (GDI,
    screenshots) leave it 0 — standard decoders render those opaque, so
    the default here ignores it; ``alpha_32bpp=True`` treats it as real
    alpha composited over white (the ICO DIB convention,
    :func:`ico_decode`)."""
    if data[:2] != b"BM" or len(data) < 54:
        raise BmpError("not_bmp")
    (pixel_off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise BmpError("bmp_header_unsupported")  # BITMAPCOREHEADER etc.
    width, height_raw = (
        struct.unpack("<i", data[18:22])[0],
        struct.unpack("<i", data[22:26])[0],
    )
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height == 0:
        raise BmpError("bmp_zero_dims")
    if width * height > MAX_PIXELS:
        raise BmpError("bmp_too_large")  # same header-bomb guard as png/gif
    if compression != 0:
        raise BmpError("bmp_compression_unsupported")
    if bpp not in (1, 4, 8, 24, 32):
        raise BmpError("bmp_bpp_unsupported")

    palette = None
    if bpp in (1, 4, 8):
        (colors_used,) = struct.unpack("<I", data[46:50])
        n = colors_used or (1 << bpp)
        pal_off = 14 + hdr_size
        raw = data[pal_off : pal_off + 4 * n]
        if len(raw) < 4 * n:
            raise BmpError("bmp_truncated")
        pal = np.frombuffer(raw, dtype=np.uint8).reshape(n, 4)
        palette = pal[:, [2, 1, 0]]  # BGRX → RGB

    row_bytes = (width * bpp + 7) // 8
    stride = (row_bytes + 3) & ~3
    need = stride * height
    body = data[pixel_off : pixel_off + need]
    if len(body) < need:
        raise BmpError("bmp_truncated")
    rows = np.frombuffer(body, dtype=np.uint8).reshape(height, stride)
    rows = rows[:, :row_bytes]
    if not top_down:
        rows = rows[::-1]

    if bpp == 24:
        px = rows.reshape(height, -1)[:, : width * 3].reshape(height, width, 3)
        return px[:, :, ::-1].copy()  # BGR → RGB
    if bpp == 32:
        px = rows.reshape(height, -1)[:, : width * 4].reshape(height, width, 4)
        rgb = px[:, :, 2::-1]  # BGR(X) → RGB
        if not alpha_32bpp:
            return rgb.copy()
        return composite_over_white(rgb, px[:, :, 3])
    # palette depths: unpack bits MSB-first
    bits = np.unpackbits(rows, axis=1)
    if bpp == 1:
        idx = bits[:, :width]
    else:
        idx = bits.reshape(height, -1, bpp)
        weights = 1 << np.arange(bpp - 1, -1, -1)
        idx = (idx * weights).sum(axis=2)[:, :width]
    if int(idx.max()) >= len(palette):
        raise BmpError("bmp_index_out_of_range")
    return palette[idx].copy()


def bmp_encode(rgb: np.ndarray) -> bytes:
    """24-bpp BI_RGB bottom-up writer for fixtures."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    row_bytes = w * 3
    stride = (row_bytes + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = rgb[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (stride - row_bytes)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                       2835, 2835, 0, 0)
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    return header + info + bytes(body)


# ------------------------------------------------------------------- ICO

def ico_decode(data: bytes) -> np.ndarray:
    """ICO/CUR container decode (``image/vnd.microsoft.icon``, in the
    reference's thumbnail allowlist, thumbnails.py:44): pick the LARGEST
    directory entry (thumbnail semantics) and decode it — each entry is
    either an embedded PNG (Vista+) or a BMP DIB with doubled height
    (XOR pixels + 1-bpp AND transparency mask, applied over white).

    Reuses :func:`bmp_decode` by synthesizing a BITMAPFILEHEADER around
    the DIB with the height halved back to the real value."""
    if len(data) < 6:
        raise BmpError("not_ico")
    reserved, ico_type, count = struct.unpack("<HHH", data[:6])
    if reserved != 0 or ico_type not in (1, 2) or count == 0:
        raise BmpError("not_ico")
    best = None
    for i in range(count):
        e = 6 + 16 * i
        if e + 16 > len(data):
            raise BmpError("ico_truncated")
        w, h, _pal, _res, _planes, _bpp, size, off = struct.unpack(
            "<BBBBHHII", data[e : e + 16]
        )
        w = w or 256
        h = h or 256
        if best is None or w * h > best[0]:
            best = (w * h, w, h, size, off)
    _, w, h, size, off = best
    blob = data[off : off + size]
    if len(blob) < size:
        raise BmpError("ico_truncated")
    if blob[:8] == b"\x89PNG\r\n\x1a\n":
        from .png_codec import PngError, png_decode

        try:
            return png_decode(blob)
        except PngError as exc:
            raise BmpError(str(exc))
    if len(blob) < 40:
        raise BmpError("ico_truncated")
    (hdr_size,) = struct.unpack("<I", blob[:4])
    height2 = struct.unpack("<i", blob[8:12])[0]
    bpp = struct.unpack("<H", blob[14:16])[0]
    # palette follows the header for <=8 bpp
    n_pal = 0
    if bpp in (1, 4, 8):
        (colors_used,) = struct.unpack("<I", blob[32:36])
        n_pal = colors_used or (1 << bpp)
    pixel_off = hdr_size + 4 * n_pal
    # rebuild a standalone BMP with the true (halved) height
    dib = bytearray(blob)
    dib[8:12] = struct.pack("<i", height2 // 2)
    fileheader = b"BM" + struct.pack("<IHHI", 14 + len(dib), 0, 0,
                                     14 + pixel_off)
    rh = abs(height2) // 2
    rw = struct.unpack("<i", blob[4:8])[0]
    # 32-bpp icons MAY carry real alpha (Vista+), but legacy writers
    # zero the reserved byte and rely on the AND mask — render alpha
    # only when any alpha byte is nonzero (standard renderer behavior)
    use_alpha = False
    if bpp == 32:
        a = blob[pixel_off + 3 : pixel_off + 4 * rw * rh : 4]
        use_alpha = any(a)
    rgb = bmp_decode(bytes(fileheader) + bytes(dib), alpha_32bpp=use_alpha)
    rh, rw = rgb.shape[:2]
    # AND mask: 1-bpp rows (stride 4) after the XOR pixels, bottom-up;
    # skipped when real alpha already composited
    xor_stride = ((rw * bpp + 31) // 32) * 4
    mask_off = pixel_off + xor_stride * rh
    mask_stride = ((rw + 31) // 32) * 4
    mask_bytes = blob[mask_off : mask_off + mask_stride * rh]
    if not use_alpha and len(mask_bytes) == mask_stride * rh:
        rows = np.frombuffer(mask_bytes, dtype=np.uint8).reshape(
            rh, mask_stride
        )[::-1]
        bits = np.unpackbits(rows, axis=1)[:, :rw].astype(bool)
        rgb = rgb.copy()
        rgb[bits] = 255  # masked-out pixels → white
    return rgb
