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
- progressive Huffman DCT (SOF2, Annex G): spectral selection +
  successive approximation, DC/AC first and refinement scans, EOB
  runs, interleaved DC scans, per-scan restart intervals; a complete
  scan set with a missing EOI still renders (browser semantics)
- grayscale and 3-component YCbCr; sampling factors 1 or 2 per axis
  (4:4:4, 4:2:2, 4:4:0, 4:2:0), nearest-neighbor chroma upsampling
- multiple DQT/DHT segments, 16-bit quantization entries, restart
  markers (DRI/RSTn), 0xFF00 byte stuffing, trailing-garbage tolerance
- arithmetic/lossless/hierarchical SOFs surface honest
  ``jpeg_*_unsupported`` reasons — never a wrong decode

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
    progressive = False
    prog = None  # _ProgressiveState
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
            if prog is not None:
                return prog.reconstruct(qt)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog
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
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise JpegError("jpeg_sof_unsupported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("jpeg_no_frame")
            if not progressive:
                return _decode_scan(
                    data, nextpos, seg, frame, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            if prog is None:
                prog = _ProgressiveState(frame)
            nextpos = prog.decode_scan(
                data, nextpos, seg, huff_dc, huff_ac, restart_interval
            )
        pos = nextpos
    if prog is not None:
        # missing EOI but scans were decoded — render what arrived,
        # like every browser does for a cut-off progressive download
        return prog.reconstruct(qt)
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

    return _planes_to_rgb(planes, comps, hmax, vmax, fh, fw)


def _planes_to_rgb(planes, comps, hmax, vmax, fh, fw) -> np.ndarray:
    """Upsample + color-convert decoded component planes (shared by the
    sequential and progressive paths)."""
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


# ------------------------------------------------- progressive (Annex G)


class _ProgressiveState:
    """Coefficient accumulator across a progressive JPEG's scans.

    Each component holds an int32 array of shape (block_rows, block_cols,
    64) in ZIGZAG index order; DC/AC first scans deposit approximated
    coefficients, refinement scans OR in successive-approximation bits
    (G.1.2), and :meth:`reconstruct` dequantizes + IDCTs once at the end.
    Interleaved scans (ns == all components) and single-component scans
    are supported — the shapes every mainstream encoder emits; other
    component subsets surface ``jpeg_partial_scan_unsupported``."""

    def __init__(self, frame):
        fh, fw, comps = frame
        self.frame = frame
        self.hmax = max(c["h"] for c in comps)
        self.vmax = max(c["v"] for c in comps)
        if not (1 <= self.hmax <= 2 and 1 <= self.vmax <= 2):
            raise JpegError("jpeg_sampling_unsupported")
        for c in comps:
            if c["h"] not in (1, 2) or c["v"] not in (1, 2):
                raise JpegError("jpeg_sampling_unsupported")
        self.mcux = (fw + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcuy = (fh + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coef = [
            np.zeros((self.mcuy * c["v"], self.mcux * c["h"], 64), np.int32)
            for c in comps
        ]
        # non-interleaved scans walk the component's OWN block grid
        # (ceil of its scaled dims), not the MCU-padded grid (G.1/A.2.2)
        self.nblocks = []
        for c in comps:
            cw = (fw * c["h"] + self.hmax - 1) // self.hmax
            ch = (fh * c["v"] + self.vmax - 1) // self.vmax
            self.nblocks.append(((ch + 7) // 8, (cw + 7) // 8))
        self.eobrun = 0

    def decode_scan(self, data, pos, seg, huff_dc, huff_ac,
                    restart_interval) -> int:
        fh, fw, comps = self.frame
        ns = seg[0]
        if len(seg) < 4 + 2 * ns:
            raise JpegError("jpeg_truncated")
        scomp = []
        for i in range(ns):
            cs, tables = seg[1 + 2 * i], seg[2 + 2 * i]
            ci = next(
                (j for j, c in enumerate(comps) if c["id"] == cs), None
            )
            if ci is None:
                raise JpegError("jpeg_bad_scan_component")
            scomp.append((ci, tables >> 4, tables & 0x0F))
        ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
        ah, al = a >> 4, a & 0x0F
        if ss > se or se > 63 or al > 13 or ah > 13:
            raise JpegError("jpeg_bad_scan_params")
        if ss == 0 and se != 0:
            # a scan may not mix DC and AC coefficients (G.1.1.1.1)
            raise JpegError("jpeg_bad_scan_params")
        if ss > 0 and ns != 1:
            raise JpegError("jpeg_bad_scan_params")  # AC scans: 1 comp
        if ss == 0 and ns not in (1, len(comps)):
            raise JpegError("jpeg_partial_scan_unsupported")

        br = _BitReader(data, pos)
        self.eobrun = 0
        try:
            if ss == 0:
                self._dc_scan(br, scomp, comps, huff_dc, ah, al,
                              restart_interval, ns)
            else:
                self._ac_scan(br, scomp[0], huff_ac, ss, se, ah, al,
                              restart_interval)
        except _RestartMarker:
            raise JpegError("jpeg_unexpected_rst")
        return br.pos

    # ---- DC scans (G.2.1): interleaved over MCUs or single-component

    def _dc_scan(self, br, scomp, comps, huff_dc, ah, al,
                 restart_interval, ns):
        preds = [0] * len(scomp)

        def one_unit(units):
            for u, (ci, td, _ta) in enumerate(scomp):
                for by, bx in units[u]:
                    blk = self.coef[ci][by, bx]
                    if ah == 0:
                        if td not in huff_dc:
                            raise JpegError("jpeg_missing_dht")
                        t = huff_dc[td].decode(br)
                        if t > 15:
                            raise JpegError("jpeg_bad_dc_size")
                        preds[u] += _extend(br.bits(t), t) if t else 0
                        blk[0] = preds[u] << al
                    else:
                        # refinement: one raw bit per block (G.1.2.1)
                        if br.bits(1):
                            blk[0] |= 1 << al

        count = 0
        if ns == 1:
            ci = scomp[0][0]
            bh, bw = self.nblocks[ci]
            for by in range(bh):
                for bx in range(bw):
                    if restart_interval and count and \
                            count % restart_interval == 0:
                        br.align_and_skip_rst()
                        preds = [0] * len(scomp)
                    count += 1
                    one_unit([[(by, bx)]])
        else:
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    if restart_interval and count and \
                            count % restart_interval == 0:
                        br.align_and_skip_rst()
                        preds = [0] * len(scomp)
                    count += 1
                    units = []
                    for ci, _, _ in scomp:
                        c = comps[ci]
                        units.append([
                            (my * c["v"] + by, mx * c["h"] + bx)
                            for by in range(c["v"])
                            for bx in range(c["h"])
                        ])
                    one_unit(units)

    # ---- AC scans (G.2.2): always non-interleaved

    def _ac_scan(self, br, sc, huff_ac, ss, se, ah, al, restart_interval):
        ci, _, ta = sc
        if ta not in huff_ac:
            raise JpegError("jpeg_missing_dht")
        hac = huff_ac[ta]
        bh, bw = self.nblocks[ci]
        count = 0
        for by in range(bh):
            for bx in range(bw):
                if restart_interval and count and \
                        count % restart_interval == 0:
                    br.align_and_skip_rst()
                    self.eobrun = 0
                count += 1
                blk = self.coef[ci][by, bx]
                if ah == 0:
                    self._ac_first(br, hac, blk, ss, se, al)
                else:
                    self._ac_refine(br, hac, blk, ss, se, al)

    def _ac_first(self, br, hac, blk, ss, se, al):
        if self.eobrun > 0:
            self.eobrun -= 1
            return
        k = ss
        while k <= se:
            rs = hac.decode(br)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                # EOBn: this block ends; r extra bits count FURTHER blocks
                self.eobrun = (1 << r) - 1
                if r:
                    self.eobrun += br.bits(r)
                return
            k += r
            if k > se:
                raise JpegError("jpeg_bad_ac_index")
            blk[k] = _extend(br.bits(s), s) << al
            k += 1

    def _ac_refine(self, br, hac, blk, ss, se, al):
        # G.1.2.3: correction bits for already-nonzero coefficients are
        # interleaved with newly-significant ones (the libjpeg-compatible
        # reading of figure G.7)
        p1 = 1 << al
        m1 = -1 << al

        def correct(k):
            if br.bits(1) and not (blk[k] & p1):
                blk[k] += p1 if blk[k] >= 0 else m1

        k = ss
        if self.eobrun == 0:
            while k <= se:
                rs = hac.decode(br)
                r, s = rs >> 4, rs & 0x0F
                val = 0
                if s:
                    if s != 1:
                        raise JpegError("jpeg_bad_refine_size")
                    val = p1 if br.bits(1) else m1
                else:
                    if r != 15:
                        # EOBn in a refinement scan INCLUDES this block
                        self.eobrun = 1 << r
                        if r:
                            self.eobrun += br.bits(r)
                        break
                while k <= se:
                    if blk[k] != 0:
                        correct(k)
                    else:
                        if r == 0:
                            if val:
                                blk[k] = val
                            k += 1
                            break
                        r -= 1
                    k += 1
        if self.eobrun > 0:
            # inside an EOB run every remaining nonzero coefficient in
            # the band still receives its correction bit
            while k <= se:
                if blk[k] != 0:
                    correct(k)
                k += 1
            self.eobrun -= 1

    # ---- final reconstruction

    def reconstruct(self, qt) -> np.ndarray:
        fh, fw, comps = self.frame
        planes = []
        for ci, c in enumerate(comps):
            if c["tq"] not in qt:
                raise JpegError("jpeg_missing_dqt")
            q = qt[c["tq"]]
            rows, cols, _ = self.coef[ci].shape
            plane = np.zeros((rows * 8, cols * 8), np.float64)
            for by in range(rows):
                for bx in range(cols):
                    zz = self.coef[ci][by, bx].astype(np.float64)
                    coef = np.zeros(64, np.float64)
                    coef[_ZIGZAG] = zz
                    plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                        _idct2(coef.reshape(8, 8) * q)
                    )
            planes.append(plane)
        return _planes_to_rgb(planes, comps, self.hmax, self.vmax, fh, fw)


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


# -------------------------------------------- progressive encode (fixtures)

#: uniform-length canonical tables for progressive scans — Annex K's
#: sequential tables lack the EOBn symbols (r<<4 with r>0, s=0) that
#: progressive EOB runs need, so fixtures use flat tables instead:
#: DC = 16 symbols @ 5 bits, AC = all 256 (r,s) symbols @ 9 bits
#: (255 of them) + 1 @ 10 bits, keeping the all-ones code unused as
#: C.2 requires.
_PROG_DC = ([0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
            list(range(16)))
_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0],
            list(range(256)))


class _ProgScanEnc:
    """Entropy encoder for one progressive scan (G.1.2), tracking the
    cross-block EOB run and — in refinement scans — the buffered
    correction bits that must follow the next emitted symbol."""

    def __init__(self, bw: "_BitWriter", hac: "_HuffEnc"):
        self.bw = bw
        self.hac = hac
        self.eobrun = 0
        self.corr: list[int] = []

    def _sym(self, s):
        ln, code = self.hac.codes[s]
        self.bw.put(ln, code)

    def flush_eobrun(self):
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            if nbits > 14:
                raise JpegError("jpeg_eobrun_overflow")
            self._sym(nbits << 4)
            if nbits:
                self.bw.put(nbits, self.eobrun & ((1 << nbits) - 1))
            self.eobrun = 0
            for b in self.corr:
                self.bw.put(1, b)
            self.corr = []

    def ac_first(self, zz, ss, se, al):
        r = 0
        any_nz = False
        for k in range(ss, se + 1):
            v = int(zz[k])
            mag = (abs(v)) >> al
            if mag == 0:
                r += 1
                continue
            any_nz = True
            self.flush_eobrun()
            while r > 15:
                self._sym(0xF0)
                r -= 16
            t, bitsv = _mag(mag if v > 0 else -mag)
            self._sym((r << 4) | t)
            self.bw.put(t, bitsv)
            r = 0
        if not any_nz or r > 0:
            self.eobrun += 1
            if self.eobrun == 0x7FFF:
                self.flush_eobrun()

    def ac_refine(self, zz, ss, se, al):
        p1 = 1 << al
        absval = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
        eob = 0  # band index past the last NEWLY significant coefficient
        for i, a in enumerate(absval):
            if a == 1:
                eob = i + 1
        r = 0
        pending: list[int] = []
        for i, a in enumerate(absval):
            if a == 0:
                r += 1
                continue
            while r > 15 and i < eob:
                self.flush_eobrun()
                self._sym(0xF0)
                r -= 16
                for b in pending:
                    self.bw.put(1, b)
                pending = []
            if a > 1:
                # history bit: coefficient was already significant
                pending.append(a & 1)
                continue
            self.flush_eobrun()
            self._sym((r << 4) | 1)
            r = 0
            self.bw.put(1, 1 if int(zz[ss + i]) >= 0 else 0)
            for b in pending:
                self.bw.put(1, b)
            pending = []
        if r > 0 or pending:
            self.eobrun += 1
            self.corr.extend(pending)
            # bound the deferred buffers like libjpeg does
            if self.eobrun == 0x7FFF or len(self.corr) > 937:
                self.flush_eobrun()


def _quantized_blocks(rgb, quant, subsample):
    """Per-component arrays of zigzag-order quantized coefficients,
    sharing the sequential encoder's color/pad/FDCT conventions."""
    rgb = np.asarray(rgb, dtype=np.float64)
    h, w = rgb.shape[:2]
    if h == 0 or w == 0:
        raise JpegError("jpeg_zero_dims")
    if rgb.ndim == 2 or rgb.shape[2] == 1:
        plane = rgb if rgb.ndim == 2 else rgb[:, :, 0]
        planes = [plane - 128.0]
        factors = [(1, 1)]
    else:
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsample:
            def ds(p):
                ph = (p.shape[0] + 1) // 2 * 2
                pw = (p.shape[1] + 1) // 2 * 2
                q = np.zeros((ph, pw))
                q[: p.shape[0], : p.shape[1]] = p
                if p.shape[0] < ph:
                    q[p.shape[0]:, : p.shape[1]] = p[-1:, :]
                if p.shape[1] < pw:
                    q[:, p.shape[1]:] = q[:, p.shape[1] - 1 : p.shape[1]]
                return q.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes = [y, ds(cb), ds(cr)]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1), (1, 1), (1, 1)]

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    qtab = np.full((8, 8), float(quant))
    comps = []
    for plane, (fx, fy) in zip(planes, factors):
        ph, pw = mcuy * fy * 8, mcux * fx * 8
        padded = np.zeros((ph, pw))
        padded[: plane.shape[0], : plane.shape[1]] = plane
        if plane.shape[0] < ph:
            padded[plane.shape[0]:, : plane.shape[1]] = plane[-1:, :]
        if plane.shape[1] < pw:
            padded[:, plane.shape[1]:] = (
                padded[:, plane.shape[1] - 1 : plane.shape[1]]
            )
        rows, cols = ph // 8, pw // 8
        zz = np.zeros((rows, cols, 64), np.int32)
        for by in range(rows):
            for bx in range(cols):
                blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                q = np.floor(_fdct2(blk) / qtab + 0.5)
                zz[by, bx] = q.ravel()[_ZIGZAG].astype(np.int32)
        comps.append(dict(zz=zz, fx=fx, fy=fy))
    return comps, (h, w), (mcux, mcuy), (hmax, vmax)


def jpeg_encode_progressive(rgb: np.ndarray, quant: int = 1,
                            subsample: bool = False,
                            scans: list | None = None,
                            restart_interval: int = 0) -> bytes:
    """Progressive JFIF writer for fixtures (SOF2 + a spectral-selection
    / successive-approximation scan script; default script mirrors
    libjpeg's: approximated DC first, per-component AC bands, then
    refinement passes down to full precision, so the decode is exactly
    the sequential encoder's pixels)."""
    comps, (h, w), (mcux, mcuy), (hmax, vmax) = _quantized_blocks(
        rgb, quant, subsample
    )
    nc = len(comps)
    if scans is None:
        if nc == 1:
            scans = [
                ((0,), 0, 0, 0, 1), ((0,), 1, 63, 0, 1),
                ((0,), 1, 63, 1, 0), ((0,), 0, 0, 1, 0),
            ]
        else:
            scans = [
                ((0, 1, 2), 0, 0, 0, 1),
                ((0,), 1, 5, 0, 2), ((0,), 6, 63, 0, 2),
                ((1,), 1, 63, 0, 1), ((2,), 1, 63, 0, 1),
                ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
                ((0, 1, 2), 0, 0, 1, 0),
                ((1,), 1, 63, 1, 0), ((2,), 1, 63, 1, 0),
            ]

    hdc = _HuffEnc(*_PROG_DC)
    hac = _HuffEnc(*_PROG_AC)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(
            ">H", len(payload) + 2
        ) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0x00]) + np.full(64, int(quant), np.uint8)
               .tobytes())
    out += seg(0xC4, bytes([0x00] + _PROG_DC[0] + _PROG_DC[1]))
    out += seg(0xC4, bytes([0x10] + _PROG_AC[0] + _PROG_AC[1]))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i, c in enumerate(comps):
        sof += bytes([i + 1, (c["fx"] << 4) | c["fy"], 0])
    out += seg(0xC2, sof)

    for sel, ss, se, ah, al in scans:
        hdr = bytes([len(sel)])
        for ci in sel:
            hdr += bytes([ci + 1, 0x00])
        hdr += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, hdr)
        bw = _BitWriter()
        enc = _ProgScanEnc(bw, hac)
        preds = [0] * len(sel)
        rst = 0

        def restart():
            nonlocal preds, rst
            enc.flush_eobrun()
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            preds = [0] * len(sel)

        if ss == 0:
            # DC scan: interleaved MCU order (or the single component's
            # own grid, identical when nc == 1)
            units = []
            if len(sel) == 1:
                ci = sel[0]
                zz = comps[ci]["zz"]
                cw = (w * comps[ci]["fx"] + hmax - 1) // hmax
                ch = (h * comps[ci]["fy"] + vmax - 1) // vmax
                for by in range((ch + 7) // 8):
                    for bx in range((cw + 7) // 8):
                        units.append([(ci, by, bx)])
            else:
                for my in range(mcuy):
                    for mx in range(mcux):
                        unit = []
                        for ci in sel:
                            c = comps[ci]
                            for by in range(c["fy"]):
                                for bx in range(c["fx"]):
                                    unit.append(
                                        (ci, my * c["fy"] + by,
                                         mx * c["fx"] + bx)
                                    )
                        units.append(unit)
            for n_u, unit in enumerate(units):
                if restart_interval and n_u and \
                        n_u % restart_interval == 0:
                    restart()
                for ci, by, bx in unit:
                    u = sel.index(ci)
                    v0 = int(comps[ci]["zz"][by, bx, 0])
                    if ah == 0:
                        d = (v0 >> al) - preds[u]
                        preds[u] = v0 >> al
                        t, bitsv = _mag(d)
                        ln, code = hdc.codes[t]
                        bw.put(ln, code)
                        if t:
                            bw.put(t, bitsv)
                    else:
                        bw.put(1, (v0 >> al) & 1)
        else:
            ci = sel[0]
            zz = comps[ci]["zz"]
            cw = (w * comps[ci]["fx"] + hmax - 1) // hmax
            ch = (h * comps[ci]["fy"] + vmax - 1) // vmax
            n_b = 0
            for by in range((ch + 7) // 8):
                for bx in range((cw + 7) // 8):
                    if restart_interval and n_b and \
                            n_b % restart_interval == 0:
                        restart()
                        enc.eobrun = 0
                        enc.corr = []
                    n_b += 1
                    if ah == 0:
                        enc.ac_first(zz[by, bx], ss, se, al)
                    else:
                        enc.ac_refine(zz[by, bx], ss, se, al)
        enc.flush_eobrun()
        bw.flush()
        out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)
