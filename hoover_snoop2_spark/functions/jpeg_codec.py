"""Pure-Python + numpy baseline JPEG codec (ITU-T T.81, public spec).

Completes the native raster triad (PNG :mod:`.png_codec`, GIF
:mod:`.gif_codec`): with baseline sequential JPEG decoded natively, the
thumbnail ladder and image feature/pHash operators cover the three
dominant web image formats without external binaries.  The reference
ships JPEGs to ImageMagick / an HTTP classifier
(``/root/reference/snoop/data/analyzers/thumbnails.py:346-443``,
``image_classification.py:128-181``).

Decoder coverage:

- baseline and extended sequential Huffman DCT (SOF0/SOF1), 8-bit
- grayscale and 3-component YCbCr; sampling factors 1 or 2 per axis
  (4:4:4, 4:2:2, 4:4:0, 4:2:0), nearest-neighbor chroma upsampling
- multiple DQT/DHT segments, 16-bit quantization entries, restart
  markers (DRI/RSTn), 0xFF00 byte stuffing, trailing-garbage tolerance
- progressive (SOF2) and arithmetic/lossless/hierarchical SOFs surface
  honest ``jpeg_*_unsupported`` reasons — never a wrong decode

JPEG is lossy, so unlike PNG/GIF there is no bit-exact oracle against a
pixel generator; correctness is pinned by (a) DC-only fixtures whose
IDCT output is exact in closed form, (b) encoder round-trips at
quantization 1 within a small tolerance, and (c) cross-format
agreement on flat-color images (tests/test_jpeg.py).

Encoder (fixtures + golden corpus only): baseline, quality expressed as
a flat quantization value, T.81 Annex K standard Huffman tables,
optional 2x2 chroma subsampling (box mean), optional restart interval.

IDCT/FDCT are exact separable float64 matrix products of the same
orthonormal DCT-II basis the pHash uses; rounding is ``floor(x+0.5)``
after +128 level shift, clamped to [0, 255].
"""

from __future__ import annotations

import struct

import numpy as np

from .raster_common import MAX_PIXELS


class JpegError(ValueError):
    """Malformed/unsupported JPEG input; callers map it to broken_reason."""


#: zig-zag scan order, T.81 figure 5
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_UNZIGZAG = np.argsort(_ZIGZAG)

# T.81 Annex K.3 standard Huffman tables: (bits[1..16], values)
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: pixels = M.T @ coef @ M with the
    usual alpha scaling folded in."""
    k = np.arange(8, dtype=np.float64)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0)
    m *= np.sqrt(2.0 / 8.0)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m

_M = _dct_basis()


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _M.T @ coef @ _M


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _M @ block @ _M.T


# -------------------------------------------------------------- bit reader


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any real marker (leaves it for the caller)."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise JpegError("jpeg_truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is not None and 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                # real marker (EOI etc.) — data exhausted
                raise JpegError("jpeg_truncated")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        return v

    def align_and_skip_rst(self):
        """Consume padding bits + the pending restart marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        # skip fill bytes up to the RST marker
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise JpegError("jpeg_truncated")


class _RestartMarker(Exception):
    def __init__(self, marker):
        self.marker = marker


class _Huff:
    """Canonical Huffman decode table from (bits, values)."""

    __slots__ = ("lookup",)

    def __init__(self, bits, values):
        # map (length, code) -> symbol
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                if k >= len(values):
                    raise JpegError("jpeg_bad_dht")
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.bits(1)
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("jpeg_bad_huffman_code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ------------------------------------------------------------------ decode


def jpeg_decode(data: bytes) -> np.ndarray:
    """Decode a baseline/extended-sequential JPEG to (h, w, 3) uint8.

    Every failure mode raises :class:`JpegError` — fuzzing found short
    segments leaking bare ValueError/struct.error out of the parsers,
    and an untyped exception inside mapInPandas fails the whole Spark
    task instead of producing one broken row (the round-3 mvhd lesson),
    so the typed safety net here is load-bearing."""
    try:
        return _decode_impl(data)
    except JpegError:
        raise
    except (ValueError, IndexError, KeyError, struct.error) as e:
        raise JpegError("jpeg_malformed") from e
    except MemoryError as e:
        raise JpegError("jpeg_too_large") from e


def _decode_impl(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise JpegError("not_jpeg")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    restart_interval = 0
    frame = None  # (h, w, components)
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        # 0x01 is TEM — standalone like RSTn, no length field (T.81 B.1.1.3)
        if marker in (0xFF, 0x00, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 1 if marker == 0xFF else 2
            continue
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seglen]
        if len(seg) < seglen - 2:
            raise JpegError("jpeg_truncated")
        nextpos = pos + 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if pq == 0:
                    table = np.frombuffer(seg[i : i + 64], dtype=np.uint8)
                    i += 64
                else:
                    if len(seg) - i < 128:
                        raise JpegError("jpeg_truncated")
                    table = np.frombuffer(seg[i : i + 128], dtype=">u2")
                    i += 128
                if len(table) < 64:
                    raise JpegError("jpeg_truncated")
                qt[tq] = table.astype(np.float64)[_UNZIGZAG].reshape(8, 8)
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                cnt = sum(bits)
                values = list(seg[i + 17 : i + 17 + cnt])
                if len(values) < cnt:
                    raise JpegError("jpeg_truncated")
                (huff_dc if tc == 0 else huff_ac)[th] = _Huff(bits, values)
                i += 17 + cnt
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline/extended sequential
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise JpegError("jpeg_precision_unsupported")
            if fh == 0 or fw == 0:
                raise JpegError("jpeg_zero_dims")
            if fh * fw > MAX_PIXELS:
                # the planes allocate from these header dims BEFORE any
                # entropy data is validated — same bomb guard as png/gif
                raise JpegError("jpeg_too_large")
            if len(seg) < 6 + 3 * nc:
                raise JpegError("jpeg_truncated")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(dict(id=cid, h=hv >> 4, v=hv & 0x0F, tq=tq))
            frame = (fh, fw, comps)
        elif marker == 0xC2:
            raise JpegError("jpeg_progressive_unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError("jpeg_sof_unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("jpeg_no_frame")
            return _decode_scan(
                data, nextpos, seg, frame, qt, huff_dc, huff_ac,
                restart_interval,
            )
        pos = nextpos
    raise JpegError("jpeg_no_scan")


def _decode_scan(data, pos, seg, frame, qt, huff_dc, huff_ac,
                 restart_interval):
    fh, fw, comps = frame
    ns = seg[0]
    if ns != len(comps):
        raise JpegError("jpeg_partial_scan_unsupported")
    sel = {}
    for i in range(ns):
        cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
        sel[cs] = (tables >> 4, tables & 0x0F)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise JpegError("jpeg_sampling_unsupported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcux = (fw + mcu_w - 1) // mcu_w
    mcuy = (fh + mcu_h - 1) // mcu_h

    planes = []
    for c in comps:
        if c["h"] not in (1, 2) or c["v"] not in (1, 2):
            raise JpegError("jpeg_sampling_unsupported")
        if c["tq"] not in qt:
            raise JpegError("jpeg_missing_dqt")
        if c["id"] not in sel:
            raise JpegError("jpeg_partial_scan_unsupported")
        td, ta = sel[c["id"]]
        if td not in huff_dc or ta not in huff_ac:
            raise JpegError("jpeg_missing_dht")
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )

    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                br.align_and_skip_rst()
                preds = [0] * len(comps)
            mcu_count += 1
            try:
                for ci, c in enumerate(comps):
                    td, ta = sel[c["id"]]
                    q = qt[c["tq"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            coef = _decode_block(
                                br, huff_dc[td], huff_ac[ta], preds, ci
                            )
                            block = _idct2(coef * q)
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            except _RestartMarker:
                raise JpegError("jpeg_unexpected_rst")

    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        # nearest-neighbor upsample to full resolution
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        out.append(p[:fh, :fw])

    if len(out) == 1:
        y = np.floor(out[0] + 128.5).clip(0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    if len(out) != 3:
        raise JpegError("jpeg_components_unsupported")
    y, cb, cr = out[0] + 128.0, out[1], out[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.floor(rgb + 0.5).clip(0, 255).astype(np.uint8)


def _decode_block(br, hdc, hac, preds, ci) -> np.ndarray:
    zz = np.zeros(64, dtype=np.float64)
    t = hdc.decode(br)
    diff = _extend(br.bits(t), t) if t else 0
    preds[ci] += diff
    zz[0] = preds[ci]
    k = 1
    while k < 64:
        rs = hac.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise JpegError("jpeg_bad_ac_index")
        zz[k] = _extend(br.bits(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    coef[_ZIGZAG] = zz  # zz[k] sits at natural position _ZIGZAG[k]
    return coef.reshape(8, 8)


# ------------------------------------------------------------------ encode


class _HuffEnc:
    __slots__ = ("codes",)

    def __init__(self, bits, values):
        self.codes = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.codes[values[k]] = (length, code)
                code += 1
                k += 1
            code <<= 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, length, code):
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.put(pad, (1 << pad) - 1)


def _mag(v: int) -> tuple[int, int]:
    """(size, magnitude-bits) per T.81 F.1.2.1."""
    t = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << t) - 1
    return t, v


def _encode_block(bw, coef_q, hdc, hac, pred):
    zz = coef_q.ravel()[_ZIGZAG]
    diff = int(zz[0]) - pred
    t, bitsv = _mag(diff)
    ln, code = hdc.codes[t]
    bw.put(ln, code)
    if t:
        bw.put(t, bitsv)
    run = 0
    last_nz = 0
    nz = np.nonzero(zz[1:])[0]
    last_nz = (nz[-1] + 1) if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = hac.codes[0xF0]
            bw.put(ln, code)
            run -= 16
        t, bitsv = _mag(v)
        ln, code = hac.codes[(run << 4) | t]
        bw.put(ln, code)
        bw.put(t, bitsv)
        run = 0
    if last_nz < 63:
        ln, code = hac.codes[0x00]
        bw.put(ln, code)
    return int(zz[0])


def jpeg_encode(rgb: np.ndarray, quant: int = 1, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JFIF writer for fixtures: flat quantization table of
    ``quant`` (1 = near-lossless), standard Annex K Huffman tables,
    optional 2x2 chroma subsampling and restart markers."""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise JpegError("jpeg_zero_dims")
    r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b

    qtab = np.full((8, 8), float(quant))
    hdc_l, hac_l = _HuffEnc(*_STD_DC_LUM), _HuffEnc(*_STD_AC_LUM)
    hdc_c, hac_c = _HuffEnc(*_STD_DC_CHR), _HuffEnc(*_STD_AC_CHR)

    if subsample:
        hs, vs = 2, 2
    else:
        hs, vs = 1, 1
    mcu_w, mcu_h = 8 * hs, 8 * vs
    mcux = (w + mcu_w - 1) // mcu_w
    mcuy = (h + mcu_h - 1) // mcu_h

    def pad(plane, ph, pw):
        out = np.zeros((ph, pw))
        out[: plane.shape[0], : plane.shape[1]] = plane
        # edge-replicate padding avoids ringing at borders
        if plane.shape[0] < ph:
            out[plane.shape[0] :, : plane.shape[1]] = plane[-1:, :]
        if plane.shape[1] < pw:
            out[:, plane.shape[1] :] = out[:, plane.shape[1] - 1 : plane.shape[1]]
        return out

    yp = pad(y, mcuy * mcu_h, mcux * mcu_w)
    if subsample:
        # box-mean downsample chroma 2x2 (pad to even first)
        cbp = pad(cb, mcuy * mcu_h, mcux * mcu_w)
        crp = pad(cr, mcuy * mcu_h, mcux * mcu_w)
        cbp = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(axis=(1, 3))
    else:
        cbp = pad(cb, mcuy * 8, mcux * 8)
        crp = pad(cr, mcuy * 8, mcux * 8)

    bw = _BitWriter()
    preds = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            mcu_count += 1
            for by in range(vs):
                for bx in range(hs):
                    y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                    blk = yp[y0 : y0 + 8, x0 : x0 + 8]
                    q = np.floor(_fdct2(blk) / qtab + 0.5)
                    preds[0] = _encode_block(bw, q, hdc_l, hac_l, preds[0])
            for ci, plane in ((1, cbp), (2, crp)):
                y0, x0 = my * 8, mx * 8
                blk = plane[y0 : y0 + 8, x0 : x0 + 8]
                q = np.floor(_fdct2(blk) / qtab + 0.5)
                preds[ci] = _encode_block(bw, q, hdc_c, hac_c, preds[ci])
    bw.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    zz_q = np.full(64, int(quant), dtype=np.uint8)
    dqt = seg(0xDB, bytes([0x00]) + zz_q.tobytes())
    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    def dht(tc, th, tbl):
        bits, values = tbl
        return seg(0xC4, bytes([(tc << 4) | th] + bits + values))

    dri = seg(0xDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8" + jfif + dqt
        + dht(0, 0, _STD_DC_LUM) + dht(1, 0, _STD_AC_LUM)
        + dht(0, 1, _STD_DC_CHR) + dht(1, 1, _STD_AC_CHR)
        + dri + sof + sos + bytes(bw.out) + b"\xff\xd9"
    )
