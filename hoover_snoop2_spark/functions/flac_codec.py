"""Pure-Python + numpy FLAC decoder/encoder (public format spec).

The audio sibling of :mod:`.webp_codec`: with WAV and AIFF decoded
sample-exact in :mod:`..operators.media_stats`, FLAC is the remaining
common LOSSLESS audio container on the open web (the reference's Tika
mime list carries ``audio/x-flac``; the magic table here already sniffs
``fLaC``).  Sample-exact decode feeds the same audio-stats operators the
PCM paths use.

Decoder coverage (FLAC format specification):

- metadata walk: STREAMINFO (rates, depths, total samples) + skip of all
  other block types
- frame headers: sync, both blocking strategies, all block-size and
  sample-rate code forms (incl. the 8/16-bit trailing forms), UTF-8-coded
  frame/sample numbers, CRC-8 verification
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (signed quantized coefficients + shift), wasted-bits unary prefix
- residuals: 4-bit and 5-bit Rice partitions (method 0/1), partition
  orders 0-15, escape codes (raw n-bit residuals)
- stereo decorrelation: independent, left/side, right/side, mid/side
  (side channel carries the +1 bit depth)
- frame CRC-16 verification

Encoder: spec-valid FLAC for fixtures and property tests — CONSTANT /
VERBATIM / FIXED(0-4) / LPC subframes, any Rice partition order, all
four stereo modes, correct CRC-8/CRC-16 — so every decoder path above is
exercised round-trip byte-exactly (lossless: decoded samples must equal
the input).
"""

from __future__ import annotations

import struct

import numpy as np


class FlacError(ValueError):
    """Malformed/unsupported FLAC input; callers map it to broken_reason."""


# ---------------------------------------------------------------------------
# bit IO — FLAC packs bits MSB-first
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self.pos = pos_bits

    def read(self, n: int) -> int:
        p = self.pos
        end = p + n
        if end > len(self.data) * 8:
            raise FlacError("flac_truncated")
        v = 0
        d = self.data
        while p < end:
            byte = d[p >> 3]
            avail = 8 - (p & 7)
            take = min(avail, end - p)
            chunk = (byte >> (avail - take)) & ((1 << take) - 1)
            v = (v << take) | chunk
            p += take
        self.pos = end
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        if v >= (1 << (n - 1)):
            v -= 1 << n
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 24:
                raise FlacError("flac_bad_unary")
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def getvalue(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


# ---------------------------------------------------------------------------
# CRCs (frame header CRC-8 poly 0x07, frame CRC-16 poly 0x8005, both
# init 0 — the FLAC spec's exact parameters)
# ---------------------------------------------------------------------------


def _make_crc8_table():
    table = []
    for b in range(256):
        c = b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
        table.append(c)
    return table


def _make_crc16_table():
    table = []
    for b in range(256):
        c = b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 \
                else (c << 1) & 0xFFFF
        table.append(c)
    return table


_CRC8 = _make_crc8_table()
_CRC16 = _make_crc16_table()


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC8[c ^ b]
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c = _CRC16[((c >> 8) ^ b) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


# ---------------------------------------------------------------------------
# UTF-8-style coded numbers (frame header sample/frame index; the FLAC
# extension allows up to 36 bits / 7 bytes)
# ---------------------------------------------------------------------------


def _read_coded_number(r: _BitReader) -> int:
    b0 = r.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise FlacError("flac_bad_coded_number")
    v = b0 & (mask - 1)
    for _ in range(n):
        b = r.read(8)
        if (b & 0xC0) != 0x80:
            raise FlacError("flac_bad_coded_number")
        v = (v << 6) | (b & 0x3F)
    return v


def _write_coded_number(bw: _BitWriter, v: int) -> None:
    if v < 0x80:
        bw.write(v, 8)
        return
    # count continuation bytes needed
    for n in range(1, 7):
        if v < (1 << (6 * n + (6 - n))):
            break
    payload = [(v >> (6 * i)) & 0x3F for i in range(n)][::-1]
    lead = (0xFF << (7 - n)) & 0xFF
    bw.write(lead | (v >> (6 * n)), 8)
    for p in payload:
        bw.write(0x80 | p, 8)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_DEPTH_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}

#: fixed predictor coefficients, orders 0-4
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _parse_streaminfo(data: bytes) -> dict:
    if data[:4] != b"fLaC":
        raise FlacError("flac_bad_magic")
    pos = 4
    info = None
    while pos + 4 <= len(data):
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + length]
        if btype == 0:  # STREAMINFO
            if len(body) < 34:
                raise FlacError("flac_truncated")
            r = _BitReader(body)
            r.read(16)  # min blocksize
            r.read(16)  # max blocksize
            r.read(24)  # min framesize
            r.read(24)  # max framesize
            rate = r.read(20)
            channels = r.read(3) + 1
            bits = r.read(5) + 1
            total = r.read(36)
            info = {"rate": rate, "channels": channels, "bits": bits,
                    "total_samples": total}
        pos += 4 + length
        if last:
            if info is None:
                raise FlacError("flac_no_streaminfo")
            info["frames_at"] = pos
            return info
    raise FlacError("flac_no_streaminfo")


def _decode_subframe(r: _BitReader, n: int, depth: int) -> np.ndarray:
    if r.read(1) != 0:
        raise FlacError("flac_bad_subframe_padding")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    depth -= wasted
    if stype == 0:  # CONSTANT
        v = r.read_signed(depth)
        out = np.full(n, v, np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([r.read_signed(depth) for _ in range(n)], np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        out = _decode_predicted(r, n, depth, _FIXED_COEFS[order], 0)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [r.read_signed(depth) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise FlacError("flac_bad_lpc_precision")
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacError("flac_bad_lpc_shift")
        coefs = [r.read_signed(precision) for _ in range(order)]
        res = _decode_residual(r, n, order)
        out = np.empty(n, np.int64)
        out[:order] = warm
        for i in range(order, n):
            pred = 0
            for j, c in enumerate(coefs):
                pred += c * int(out[i - 1 - j])
            out[i] = res[i - order] + (pred >> shift)
    else:
        raise FlacError("flac_reserved_subframe_type")
    if wasted:
        out = out << wasted
    return out


def _decode_predicted(r: _BitReader, n: int, depth: int,
                      coefs: list[int], shift: int) -> np.ndarray:
    order = len(coefs)
    warm = [r.read_signed(depth) for _ in range(order)]
    res = _decode_residual(r, n, order)
    out = np.empty(n, np.int64)
    out[:order] = warm
    for i in range(order, n):
        pred = 0
        for j, c in enumerate(coefs):
            pred += c * int(out[i - 1 - j])
        out[i] = res[i - order] + (pred >> shift if shift else pred)
    return out


def _decode_residual(r: _BitReader, n: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise FlacError("flac_bad_residual_method")
    pbits = 4 + method
    escape = (1 << pbits) - 1
    porder = r.read(4)
    nparts = 1 << porder
    if n % nparts != 0:
        raise FlacError("flac_bad_partition_order")
    out: list[int] = []
    for p in range(nparts):
        count = (n >> porder) - (order if p == 0 else 0)
        if count < 0:
            raise FlacError("flac_bad_partition")
        param = r.read(pbits)
        if param == escape:
            raw_bits = r.read(5)
            for _ in range(count):
                out.append(r.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(count):
                q = r.read_unary()
                v = (q << param) | (r.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def flac_decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode a FLAC file to ``(sample_rate, n_channels, samples)`` with
    samples shaped (n, channels) int32 — the same contract as
    ``media_stats.wav_decode``."""
    info = _parse_streaminfo(data)
    rate, channels, bits = info["rate"], info["channels"], info["bits"]
    total = info["total_samples"]
    pos = info["frames_at"]
    chunks = []
    got = 0
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        r = _BitReader(data, pos * 8)
        sync = r.read(14)
        if sync != 0x3FFE:
            raise FlacError("flac_bad_sync")
        r.read(1)  # reserved
        r.read(1)  # blocking strategy
        bs_code = r.read(4)
        rate_code = r.read(4)
        chan_code = r.read(4)
        depth_code = r.read(3)
        r.read(1)  # reserved
        _read_coded_number(r)
        if bs_code == 0:
            raise FlacError("flac_reserved_blocksize")
        elif bs_code == 6:
            n = r.read(8) + 1
        elif bs_code == 7:
            n = r.read(16) + 1
        else:
            n = _BLOCKSIZE_CODES[bs_code]
        if rate_code == 12:
            r.read(8)
        elif rate_code in (13, 14):
            r.read(16)
        elif rate_code == 15:
            raise FlacError("flac_bad_rate_code")
        depth = bits if depth_code == 0 else _DEPTH_CODES.get(depth_code)
        if depth is None:
            raise FlacError("flac_reserved_depth")
        hdr_end = r.pos >> 3
        if crc8(data[frame_start:hdr_end]) != r.read(8):
            raise FlacError("flac_header_crc_mismatch")
        if chan_code < 8:
            nch = chan_code + 1
            subs = [_decode_subframe(r, n, depth) for _ in range(nch)]
            frame = np.stack(subs, axis=1)
        elif chan_code in (8, 9, 10):
            # left/side, right/side, mid/side — side gets +1 bit
            a = _decode_subframe(r, n, depth + (1 if chan_code == 9 else 0))
            b = _decode_subframe(r, n, depth + (0 if chan_code == 9 else 1))
            if chan_code == 8:  # left/side: right = left - side
                left, side = a, b
                right = left - side
            elif chan_code == 9:  # right/side: left = right + side
                side, right = a, b
                left = right + side
            else:  # mid/side
                mid, side = a, b
                left = mid + ((side + (side & 1)) >> 1)
                right = left - side
            frame = np.stack([left, right], axis=1)
            nch = 2
        else:
            raise FlacError("flac_reserved_channels")
        if nch != channels:
            raise FlacError("flac_channel_mismatch")
        r.align()
        body_end = r.pos >> 3
        frame_crc = r.read(16)
        if crc16(data[frame_start:body_end]) != frame_crc:
            raise FlacError("flac_frame_crc_mismatch")
        chunks.append(frame)
        got += n
        pos = r.pos >> 3
    if not chunks:
        return rate, channels, np.zeros((0, channels), np.int32)
    samples = np.concatenate(chunks, axis=0)
    if total:
        samples = samples[:total]
    return rate, channels, samples.astype(np.int32)


def flac_duration_ms(data: bytes) -> tuple[int, int, int]:
    """Header-only ``(sample_rate, n_channels, duration_ms)`` from
    STREAMINFO — the cheap path for media stats on big files."""
    info = _parse_streaminfo(data)
    rate = info["rate"]
    dur = int(info["total_samples"] * 1000 / rate) if rate else 0
    return rate, info["channels"], dur


# ---------------------------------------------------------------------------
# encoder (fixtures + property tests)
# ---------------------------------------------------------------------------


def _best_rice_param(res: np.ndarray, pbits: int) -> int:
    if len(res) == 0:
        return 0
    mean = max(1, int(np.abs(res).mean() * 2))
    p = max(0, mean.bit_length() - 1)
    return min(p, (1 << pbits) - 2)


def _write_residual(bw: _BitWriter, res: np.ndarray, n: int, order: int,
                    porder: int, method: int = 0,
                    escape_raw: int | None = None) -> None:
    pbits = 4 + method
    bw.write(method, 2)
    bw.write(porder, 4)
    nparts = 1 << porder
    idx = 0
    for p in range(nparts):
        count = (n >> porder) - (order if p == 0 else 0)
        part = res[idx:idx + count]
        idx += count
        if escape_raw is not None:
            bw.write((1 << pbits) - 1, pbits)
            bw.write(escape_raw, 5)
            for v in part:
                bw.write_signed(int(v), escape_raw)
            continue
        param = _best_rice_param(part, pbits)
        bw.write(param, pbits)
        for v in part:
            u = (int(v) << 1) ^ (int(v) >> 63)  # zigzag (int64 arithmetic)
            bw.write_unary(u >> param)
            if param:
                bw.write(u & ((1 << param) - 1), param)


def _write_subframe(bw: _BitWriter, x: np.ndarray, depth: int,
                    mode: str, porder: int = 0, wasted: int = 0,
                    escape_raw: int | None = None) -> None:
    x = x.astype(np.int64)
    if wasted:
        assert (x & ((1 << wasted) - 1) == 0).all()
        x = x >> wasted
        depth -= wasted
    n = len(x)
    bw.write(0, 1)
    if mode == "constant":
        assert (x == x[0]).all()
        bw.write(0, 6)
        _write_wasted(bw, wasted)
        bw.write_signed(int(x[0]), depth)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        _write_wasted(bw, wasted)
        for v in x:
            bw.write_signed(int(v), depth)
        return
    if mode.startswith("fixed"):
        order = int(mode[5:])
        bw.write(8 + order, 6)
        _write_wasted(bw, wasted)
        for v in x[:order]:
            bw.write_signed(int(v), depth)
        coefs = _FIXED_COEFS[order]
        res = np.array(
            [int(x[i]) - sum(c * int(x[i - 1 - j])
                             for j, c in enumerate(coefs))
             for i in range(order, n)], np.int64)
        _write_residual(bw, res, n, order, porder, escape_raw=escape_raw)
        return
    if mode == "lpc":
        order = 2
        coefs = [3, -1]       # x2 - x1-ish shaped; shift makes it exact
        precision = 5
        shift = 1
        bw.write(32 + order - 1, 6)
        _write_wasted(bw, wasted)
        for v in x[:order]:
            bw.write_signed(int(v), depth)
        bw.write(precision - 1, 4)
        bw.write_signed(shift, 5)
        for c in coefs:
            bw.write_signed(c, precision)
        res = np.array(
            [int(x[i]) - (sum(c * int(x[i - 1 - j])
                              for j, c in enumerate(coefs)) >> shift)
             for i in range(order, n)], np.int64)
        _write_residual(bw, res, n, order, porder)
        return
    raise FlacError(f"flac_encoder_bad_mode:{mode}")


def _write_wasted(bw: _BitWriter, wasted: int) -> None:
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)


def flac_encode(samples: np.ndarray, sample_rate: int, *, bits: int = 16,
                block_size: int = 1024, mode: str = "fixed2",
                stereo: str = "independent", porder: int = 0,
                wasted: int = 0, escape_raw: int | None = None) -> bytes:
    """Encode int samples (n,) or (n, channels) to a spec-valid FLAC
    file.  ``mode``: constant | verbatim | fixed0-4 | lpc.  ``stereo``
    (2-channel input only): independent | left_side | right_side |
    mid_side.  Intended for fixtures/tests; every option maps to one
    decoder path."""
    x = np.asarray(samples, np.int64)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    lim = 1 << (bits - 1)
    if (x >= lim).any() or (x < -lim).any():
        raise FlacError("flac_encoder_sample_overflow")

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    body = si.getvalue() + b"\x00" * 16  # md5 unset (spec-legal)
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    for fidx, start in enumerate(range(0, n, block_size)):
        blk = x[start:start + block_size]
        bn = len(blk)
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # 16-bit blocksize-1 follows
        bw.write(0, 4)  # rate from STREAMINFO
        if channels == 2 and stereo != "independent":
            chan_code = {"left_side": 8, "right_side": 9,
                         "mid_side": 10}[stereo]
        else:
            chan_code = channels - 1
        bw.write(chan_code, 4)
        bw.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits], 3)
        bw.write(0, 1)
        _write_coded_number(bw, fidx)
        bw.write(bn - 1, 16)
        hdr = bw.buf[:]
        assert bw.nacc == 0
        bw.write(crc8(bytes(hdr)), 8)
        if chan_code < 8:
            for ch in range(channels):
                _write_subframe(bw, blk[:, ch], bits, mode, porder,
                                wasted, escape_raw)
        else:
            left = blk[:, 0]
            right = blk[:, 1]
            side = left - right
            if chan_code == 8:
                _write_subframe(bw, left, bits, mode, porder)
                _write_subframe(bw, side, bits + 1, mode, porder)
            elif chan_code == 9:
                _write_subframe(bw, side, bits + 1, mode, porder)
                _write_subframe(bw, right, bits, mode, porder)
            else:
                mid = (left + right) >> 1
                _write_subframe(bw, mid, bits, mode, porder)
                _write_subframe(bw, side, bits + 1, mode, porder)
        bw.align()
        frame = bytes(bw.buf)
        out += frame + struct.pack(">H", crc16(frame))
    return bytes(out)
