"""Pure-Python + numpy WebP decoder/encoder (RIFF container + VP8L
lossless bitstream, both public specs).

Completes the web-raster set next to :mod:`.png_codec` / :mod:`.gif_codec`
/ :mod:`.jpeg_codec`: WebP is the fourth most common image MIME on the
open web, and the reference's Tika mime list carries ``image/webp``
(``/root/reference/snoop/data/_tika_mime_types.py``).  With this module
the thumbnail ladder and the sample-exact image feature/pHash operators
(``operators/thumbnails.py``, ``operators/media_stats.py``) accept
lossless WebP natively.

Decoder coverage (WebP Lossless Bitstream Specification):

- RIFF/WEBP container walk: plain ``VP8L`` files, ``VP8X`` extended files
  (the lossless payload chunk is decoded; canvas metadata ignored), and
  animations (first ``ANMF`` frame, lossless frames only)
- the full VP8L entropy-coded image: canonical prefix codes (simple
  2-symbol codes, code-length codes with the 16/17/18 repeat operators
  and the optional ``max_symbol`` cap), LZ77 backward references with
  both scan-order and short-distance codes, the color cache, and
  meta-prefix (multi-group) coding with its sub-resolution entropy image
- all four transforms, inverted in reverse stream order: PREDICTOR (all
  14 modes, libwebp edge conventions), cross-color COLOR transform,
  SUBTRACT_GREEN, and COLOR_INDEXING (palettes, including the sub-byte
  packed widths for palettes of 2/4/16 colors)
- alpha composited over white — the flatten contract every codec in
  :mod:`.raster` shares

Lossy ``VP8 `` payloads raise the typed reason ``webp_vp8_unsupported``
(the VP8 intra DCT decoder is out of scope here the way RAR compression
is for :mod:`..operators.rar_extract`); dimensions still parse via
:func:`webp_dims` so media stats cover lossy files.

Encoder: spec-valid VP8L for fixtures and property tests — literals-only
or greedy LZ77 (left-run and row-above candidates, short-distance codes
when in range), optional color cache, optional SUBTRACT_GREEN /
PREDICTOR / cross-color / palette transforms, and an optional 2-group
meta-prefix split, with real package-merge length-limited canonical
codes throughout.  Every decoder path above is exercised round-trip.

The 120-entry short-distance map is generated from the spec table's
ordering rule (Euclidean distance ascending, then row offset descending,
then positive column offset first); ``tests/test_webp.py`` pins the
generated table against the literal spec listing.
"""

from __future__ import annotations

import struct

import numpy as np

from .raster_common import MAX_PIXELS, composite_over_white


class WebpError(ValueError):
    """Malformed/unsupported WebP input; callers map it to broken_reason."""


# ---------------------------------------------------------------------------
# bit IO — VP8L packs bits LSB-first within each byte
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        p, d = self.pos, self.data
        end = p + n
        if end > len(d) * 8:
            raise WebpError("webp_truncated")
        v = 0
        shift = 0
        while p < end:
            byte = d[p >> 3]
            bit_in_byte = p & 7
            take = min(8 - bit_in_byte, end - p)
            v |= ((byte >> bit_in_byte) & ((1 << take) - 1)) << shift
            shift += take
            p += take
        self.pos = end
        return v


class _BitWriter:
    def __init__(self):
        self.bits: list[tuple[int, int]] = []  # (value, nbits)

    def write(self, value: int, n: int) -> None:
        if n:
            self.bits.append((value & ((1 << n) - 1), n))

    def getvalue(self) -> bytes:
        out = bytearray()
        acc = 0
        nacc = 0
        for v, n in self.bits:
            acc |= v << nacc
            nacc += n
            while nacc >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nacc -= 8
        if nacc:
            out.append(acc & 0xFF)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical prefix codes (DEFLATE-style canonical assignment; code bits are
# written most-significant-first into the LSB-first stream, so a tree walk
# reading one bit at a time descends the canonical code directly)
# ---------------------------------------------------------------------------


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits) for nonzero lengths, canonical order."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    code = 0
    next_code = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _HuffDecoder:
    """Bit-at-a-time canonical decoder; the single-symbol degenerate code
    reads zero bits per symbol (spec: a code with one symbol has length
    zero)."""

    def __init__(self, lengths: list[int]):
        nonzero = [s for s, ln in enumerate(lengths) if ln]
        if not nonzero:
            raise WebpError("webp_empty_code")
        if len(nonzero) == 1:
            self.single: int | None = nonzero[0]
            self.table: dict[tuple[int, int], int] = {}
            self.max_len = 0
            return
        self.single = None
        codes = _canonical_codes(lengths)
        # completeness (Kraft) check — an over/under-full code desyncs
        kraft = sum(1 << (15 - ln) for _, ln in codes.values())
        if kraft != (1 << 15):
            raise WebpError("webp_bad_code_lengths")
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}
        self.max_len = max(ln for _, (_, ln) in codes.items())

    def decode(self, r: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | r.read(1)
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise WebpError("webp_bad_symbol")


def _limited_lengths(counts: list[int], max_len: int = 15) -> list[int]:
    """Huffman code lengths limited to ``max_len`` — plain Huffman first,
    then the standard overflow redistribution if any length exceeds the
    cap (the fixture alphabets are small, so this path is rare)."""
    import heapq

    used = [s for s, c in enumerate(counts) if c > 0]
    lengths = [0] * len(counts)
    if not used:
        return lengths
    if len(used) == 1:
        lengths[used[0]] = 1
        return lengths
    heap: list[tuple[int, int, tuple[int, ...]]] = [
        (counts[s], s, (s,)) for s in used
    ]
    heapq.heapify(heap)
    uid = len(counts)
    while len(heap) > 1:
        c1, _, s1 = heapq.heappop(heap)
        c2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            lengths[s] += 1
        heapq.heappush(heap, (c1 + c2, uid, s1 + s2))
        uid += 1
    if max(lengths) <= max_len:
        return lengths
    # redistribute: clamp, then repair the Kraft sum by deepening the
    # shallowest leaves (zlib's bit_length overflow fix, simplified)
    for s in used:
        lengths[s] = min(lengths[s], max_len)
    kraft = sum(1 << (max_len - lengths[s]) for s in used)
    limit = 1 << max_len
    order = sorted(used, key=lambda s: (lengths[s], counts[s]))
    i = 0
    while kraft > limit:
        s = order[i % len(order)]
        if lengths[s] < max_len:
            kraft -= 1 << (max_len - lengths[s] - 1)
            lengths[s] += 1
        i += 1
    return lengths


# ---------------------------------------------------------------------------
# prefix-coded lengths/distances (LZ77 value coding)
# ---------------------------------------------------------------------------


def _prefix_decode(sym: int, r: _BitReader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + r.read(extra) + 1


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>=1) -> (symbol, extra_value, extra_bits)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    n = x.bit_length() - 1
    b = (x >> (n - 1)) & 1
    sym = 2 * n + b
    offset = (2 + b) << (n - 1)
    return sym, x - offset, n - 1


# ---------------------------------------------------------------------------
# short-distance map — the spec's 120-entry (dx, dy) neighborhood table,
# generated by its ordering rule and pinned literally in tests
# ---------------------------------------------------------------------------


def _gen_dist_map() -> list[tuple[int, int]]:
    cands = [(x, 0) for x in range(1, 9)]
    cands += [(x, y) for y in range(1, 8) for x in range(-7, 9)]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              abs(p[0]), 0 if p[0] >= 0 else 1))
    return cands


DIST_MAP: list[tuple[int, int]] = _gen_dist_map()
_DIST_REV: dict[tuple[int, int], int] = {
    p: i + 1 for i, p in enumerate(DIST_MAP)
}


def _plane_to_dist(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = DIST_MAP[code - 1]
    return max(1, dy * xsize + dx)


def _dist_to_plane(dist: int, xsize: int) -> int:
    """Inverse mapping for the encoder: prefer a short code when the
    scan-order distance falls inside the (dx, dy) neighborhood."""
    for dy in (dist // xsize, dist // xsize + 1) if xsize else ():
        dx = dist - dy * xsize
        code = _DIST_REV.get((dx, dy))
        if code is not None and dy * xsize + dx >= 1:
            return code
    return dist + 120


# ---------------------------------------------------------------------------
# color cache
# ---------------------------------------------------------------------------

_CACHE_MULT = 0x1E35A7BD


def _cache_slot(argb: int, bits: int) -> int:
    return ((_CACHE_MULT * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------------------
# entropy-coded image decode (shared by the ARGB image, the meta-prefix
# image, and every transform's sub-resolution image)
# ---------------------------------------------------------------------------

#: code-length-code symbol transmission order
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _SimplePair:
    """Simple 2-symbol code: code 0 is the FIRST transmitted symbol (not
    the numerically smaller one — the spec's simple codes are positional,
    unlike canonical assignment)."""

    def __init__(self, sym0: int, sym1: int):
        self.sym0 = sym0
        self.sym1 = sym1

    def decode(self, r: _BitReader) -> int:
        return self.sym1 if r.read(1) else self.sym0


def _read_code(r: _BitReader, alphabet_size: int):
    if r.read(1):  # simple code
        num_symbols = r.read(1) + 1
        first_8bit = r.read(1)
        sym0 = r.read(8 if first_8bit else 1)
        if sym0 >= alphabet_size:
            raise WebpError("webp_bad_simple_symbol")
        if num_symbols == 1:
            lengths = [0] * alphabet_size
            lengths[sym0] = 1  # _HuffDecoder maps single symbol -> 0 bits
            return _HuffDecoder(lengths)
        sym1 = r.read(8)
        if sym1 >= alphabet_size or sym1 == sym0:
            raise WebpError("webp_bad_simple_symbol")
        return _SimplePair(sym0, sym1)
    # normal: code-length code first
    num_codes = 4 + r.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = r.read(3)
    cl_dec = _HuffDecoder(cl_lengths)
    if r.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol <= 0:
            break
        max_symbol -= 1
        sym = cl_dec.decode(r)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            rep = 3 + r.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_len
                    i += 1
        elif sym == 17:
            i += 3 + r.read(3)
        else:  # 18
            i += 11 + r.read(7)
    return _HuffDecoder(lengths)


_GREEN, _RED, _BLUE, _ALPHA, _DIST = range(5)


def _read_group(r: _BitReader, cache_size: int) -> list:
    sizes = [256 + 24 + cache_size, 256, 256, 256, 40]
    return [_read_code(r, s) for s in sizes]


def _decode_image(r: _BitReader, w: int, h: int,
                  is_level0: bool) -> tuple[np.ndarray, list]:
    """Decode one entropy-coded image at (w, h); returns (argb uint32
    (h, w), transforms) — transforms only non-empty at level 0."""
    if w * h > MAX_PIXELS:
        raise WebpError("webp_too_large")
    transforms: list[tuple] = []
    cur_w = w
    if is_level0:
        seen = set()
        while r.read(1):
            ttype = r.read(2)
            if ttype in seen:
                raise WebpError("webp_duplicate_transform")
            seen.add(ttype)
            if ttype in (0, 1):  # PREDICTOR / COLOR
                bits = r.read(3) + 2
                sw = (cur_w + (1 << bits) - 1) >> bits
                sh = (h + (1 << bits) - 1) >> bits
                sub, _ = _decode_image(r, sw, sh, False)
                transforms.append((ttype, bits, sub, cur_w))
            elif ttype == 2:  # SUBTRACT_GREEN
                transforms.append((2,))
            else:  # COLOR_INDEXING
                psize = r.read(8) + 1
                praw, _ = _decode_image(r, psize, 1, False)
                palette = np.zeros(psize, np.uint32)
                acc = np.zeros(4, np.uint32)
                for i in range(psize):
                    px = int(praw[0, i])
                    acc = (acc + np.array(
                        [(px >> 24) & 0xFF, (px >> 16) & 0xFF,
                         (px >> 8) & 0xFF, px & 0xFF], np.uint32)) & 0xFF
                    palette[i] = (
                        (int(acc[0]) << 24) | (int(acc[1]) << 16)
                        | (int(acc[2]) << 8) | int(acc[3])
                    )
                if psize <= 2:
                    xbits = 3
                elif psize <= 4:
                    xbits = 2
                elif psize <= 16:
                    xbits = 1
                else:
                    xbits = 0
                transforms.append((3, xbits, palette, cur_w))
                cur_w = (cur_w + (1 << xbits) - 1) >> xbits
    # color cache
    cache_bits = 0
    if r.read(1):
        cache_bits = r.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpError("webp_bad_cache_bits")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size
    # meta-prefix groups (level 0 only)
    meta = None
    hbits = 0
    num_groups = 1
    if is_level0 and r.read(1):
        hbits = r.read(3) + 2
        hx = (cur_w + (1 << hbits) - 1) >> hbits
        hy = (h + (1 << hbits) - 1) >> hbits
        meta_img, _ = _decode_image(r, hx, hy, False)
        meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(meta.max()) + 1
    groups = [_read_group(r, cache_size) for _ in range(num_groups)]

    npix = cur_w * h
    out = np.zeros(npix, np.uint32)
    pos = 0
    while pos < npix:
        if meta is not None:
            y, x = divmod(pos, cur_w)
            g = groups[int(meta[y >> hbits, x >> hbits])]
        else:
            g = groups[0]
        sym = g[_GREEN].decode(r)
        if sym < 256:
            red = g[_RED].decode(r)
            blue = g[_BLUE].decode(r)
            alpha = g[_ALPHA].decode(r)
            px = (alpha << 24) | (red << 16) | (sym << 8) | blue
            out[pos] = px
            if cache_size:
                cache[_cache_slot(px, cache_bits)] = px
            pos += 1
        elif sym < 280:
            length = _prefix_decode(sym - 256, r)
            dist_sym = g[_DIST].decode(r)
            dist = _plane_to_dist(_prefix_decode(dist_sym, r), cur_w)
            if dist > pos or pos + length > npix:
                raise WebpError("webp_bad_backref")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                if cache_size:
                    cache[_cache_slot(px, cache_bits)] = px
                pos += 1
        else:
            idx = sym - 280
            if idx >= cache_size:
                raise WebpError("webp_bad_cache_index")
            px = cache[idx]
            out[pos] = px
            # re-inserting a cache hit is a no-op by construction
            pos += 1
    return out.reshape(h, cur_w), transforms


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _split(argb: np.ndarray) -> np.ndarray:
    """(h, w) uint32 -> (h, w, 4) int64 channels [A, R, G, B]."""
    a = argb.astype(np.int64)
    return np.stack([(a >> 24) & 0xFF, (a >> 16) & 0xFF,
                     (a >> 8) & 0xFF, a & 0xFF], axis=2)


def _join(ch: np.ndarray) -> np.ndarray:
    c = ch.astype(np.int64) & 0xFF
    return ((c[:, :, 0] << 24) | (c[:, :, 1] << 16)
            | (c[:, :, 2] << 8) | c[:, :, 3]).astype(np.uint32)


def _avg2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return (a + b) >> 1


def _predict(mode: int, left: np.ndarray, top: np.ndarray,
             tl: np.ndarray, tr: np.ndarray) -> np.ndarray:
    """One predicted ARGB pixel (channel vector of 4 int64)."""
    if mode == 0:
        return np.array([0xFF, 0, 0, 0], np.int64)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(left, tr), top)
    if mode == 6:
        return _avg2(left, tl)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(tl, top)
    if mode == 9:
        return _avg2(top, tr)
    if mode == 10:
        return _avg2(_avg2(left, tl), _avg2(top, tr))
    if mode == 11:  # Select
        p = top + left - tl
        pa = int(np.abs(p - top).sum())
        pb = int(np.abs(p - left).sum())
        return top if pa <= pb else left
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(left + top - tl, 0, 255)
    if mode == 13:  # ClampAddSubtractHalf
        ave = _avg2(left, top)
        return np.clip(ave + ((ave - tl) >> 1), 0, 255)
    raise WebpError("webp_bad_predictor_mode")


def _inv_predictor(argb: np.ndarray, bits: int, sub: np.ndarray) -> np.ndarray:
    h, w = argb.shape
    res = _split(argb)
    out = np.zeros_like(res)
    modes = ((sub >> 8) & 0xFF).astype(np.int64)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], np.int64)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                mode = int(modes[y >> bits, x >> bits])
                left = out[y, x - 1]
                top = out[y - 1, x]
                tl = out[y - 1, x - 1]
                # right edge: top[x+1] aliases the current row's first
                # pixel in the row-buffer layout (libwebp convention)
                tr = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                pred = _predict(mode, left, top, tl, tr)
            out[y, x] = (res[y, x] + pred) & 0xFF
    return _join(out)


def _ct_delta(t: np.ndarray | int, c: np.ndarray | int) -> np.ndarray:
    """ColorTransformDelta: (int8)t * (int8)c >> 5 (arithmetic)."""
    ts = np.asarray(t, np.int64)
    cs = np.asarray(c, np.int64)
    ts = np.where(ts > 127, ts - 256, ts)
    cs = np.where(cs > 127, cs - 256, cs)
    return (ts * cs) >> 5


def _inv_color(argb: np.ndarray, bits: int, sub: np.ndarray) -> np.ndarray:
    h, w = argb.shape
    ch = _split(argb)
    ys, xs = np.indices((h, w))
    cte = sub[ys >> bits, xs >> bits].astype(np.int64)
    g2r = cte & 0xFF
    g2b = (cte >> 8) & 0xFF
    r2b = (cte >> 16) & 0xFF
    green = ch[:, :, 2]
    red = (ch[:, :, 1] + _ct_delta(g2r, green)) & 0xFF
    blue = (ch[:, :, 3] + _ct_delta(g2b, green) + _ct_delta(r2b, red)) & 0xFF
    ch[:, :, 1] = red
    ch[:, :, 3] = blue
    return _join(ch)


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    ch = _split(argb)
    ch[:, :, 1] = (ch[:, :, 1] + ch[:, :, 2]) & 0xFF
    ch[:, :, 3] = (ch[:, :, 3] + ch[:, :, 2]) & 0xFF
    return _join(ch)


def _inv_palette(argb: np.ndarray, xbits: int, palette: np.ndarray,
                 orig_w: int) -> np.ndarray:
    h = argb.shape[0]
    bits_per = 8 >> xbits
    mask = (1 << bits_per) - 1
    green = ((argb >> 8) & 0xFF).astype(np.int64)
    xs = np.arange(orig_w)
    packed_x = xs >> xbits
    shift = (xs & ((1 << xbits) - 1)) * bits_per
    idx = (green[:, packed_x] >> shift[None, :]) & mask
    out = np.zeros((h, orig_w), np.uint32)
    valid = idx < len(palette)
    out[valid] = palette[idx[valid]]
    return out


def _apply_inverse_transforms(argb: np.ndarray,
                              transforms: list[tuple]) -> np.ndarray:
    for t in reversed(transforms):
        if t[0] == 0:
            argb = _inv_predictor(argb, t[1], t[2])
        elif t[0] == 1:
            argb = _inv_color(argb, t[1], t[2])
        elif t[0] == 2:
            argb = _inv_subtract_green(argb)
        else:
            argb = _inv_palette(argb, t[1], t[2], t[3])
    return argb


# ---------------------------------------------------------------------------
# public decode API
# ---------------------------------------------------------------------------


def vp8l_decode(payload: bytes) -> np.ndarray:
    """Decode a raw VP8L chunk payload to (h, w, 3) uint8 RGB (alpha
    composited over white)."""
    if not payload or payload[0] != 0x2F:
        raise WebpError("webp_bad_vp8l_signature")
    r = _BitReader(payload)
    r.pos = 8
    w = r.read(14) + 1
    h = r.read(14) + 1
    r.read(1)  # alpha hint
    if r.read(3) != 0:
        raise WebpError("webp_bad_vp8l_version")
    argb, transforms = _decode_image(r, w, h, True)
    argb = _apply_inverse_transforms(argb, transforms)
    if argb.shape != (h, w):
        raise WebpError("webp_size_mismatch")
    ch = _split(argb)
    # channel order in ch is [A, R, G, B] -> rgb needs [R, G, B]
    rgb = np.stack([ch[:, :, 1], ch[:, :, 2], ch[:, :, 3]],
                   axis=2).astype(np.uint8)
    alpha = ch[:, :, 0].astype(np.uint8)
    if (alpha != 255).any():
        rgb = composite_over_white(rgb, alpha)
    return rgb


def _walk_riff(data: bytes):
    """Yield (fourcc, payload) for each top-level RIFF chunk."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpError("webp_bad_container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + size]
        if len(payload) < size:
            raise WebpError("webp_truncated")
        yield fourcc, payload
        pos += 8 + size + (size & 1)


def webp_decode(data: bytes) -> np.ndarray:
    """Decode a WebP file to (h, w, 3) uint8 RGB.  Lossless (VP8L) only;
    lossy VP8 raises ``webp_vp8_unsupported``."""
    chunks = list(_walk_riff(data))
    for fourcc, payload in chunks:
        if fourcc == b"VP8L":
            return vp8l_decode(payload)
    for fourcc, payload in chunks:
        if fourcc == b"ANMF" and len(payload) > 16:
            # first animation frame: sub-chunks start at offset 16
            sub = payload[16:]
            pos = 0
            while pos + 8 <= len(sub):
                fc = sub[pos:pos + 4]
                (size,) = struct.unpack("<I", sub[pos + 4:pos + 8])
                if fc == b"VP8L":
                    return vp8l_decode(sub[pos + 8:pos + 8 + size])
                if fc == b"VP8 ":
                    raise WebpError("webp_vp8_unsupported")
                pos += 8 + size + (size & 1)
    for fourcc, _ in chunks:
        if fourcc == b"VP8 ":
            raise WebpError("webp_vp8_unsupported")
    raise WebpError("webp_no_image_chunk")


def webp_dims(data: bytes) -> tuple[str, int, int] | None:
    """Header-only (kind, width, height) for VP8 / VP8L / VP8X files;
    None when the bytes are not a RIFF/WEBP container."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP" or len(data) < 21:
        return None
    fourcc = data[12:16]
    p = data[20:]
    if fourcc == b"VP8X" and len(p) >= 10:
        w = 1 + int.from_bytes(p[4:7], "little")
        h = 1 + int.from_bytes(p[7:10], "little")
        return "webp-extended", w, h
    if fourcc == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
        bits = int.from_bytes(p[1:5], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        return "webp-lossless", w, h
    if fourcc == b"VP8 " and len(p) >= 10:
        # key frame: 3-byte frame tag, start code 9D 01 2A, then dims
        if p[3:6] == b"\x9d\x01\x2a":
            w = struct.unpack("<H", p[6:8])[0] & 0x3FFF
            h = struct.unpack("<H", p[8:10])[0] & 0x3FFF
            return "webp-lossy", w, h
        return "webp-lossy", 0, 0
    return "webp", 0, 0


# ---------------------------------------------------------------------------
# encoder (fixtures + property tests)
# ---------------------------------------------------------------------------


def _write_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Write one prefix code: the simple form when possible, else the
    code-length-code form (all 19 CL lengths, no max_symbol cap, no RLE)."""
    used = [s for s, ln in enumerate(lengths) if ln]
    if not used:
        # unused alphabet (e.g. distances without LZ77): 1-symbol simple
        bw.write(1, 1)
        bw.write(0, 1)  # num_symbols - 1 = 0
        bw.write(0, 1)  # 1-bit first symbol
        bw.write(0, 1)  # symbol 0
        return
    if len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)
        bw.write(len(used) - 1, 1)
        first = used[0]
        if first <= 1:
            bw.write(0, 1)
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)
    # code-length alphabet: literal per-symbol emission
    cl_counts = [0] * 19
    for ln in lengths:
        cl_counts[ln] += 1
    cl_lengths = _limited_lengths(cl_counts, 7)
    if sum(1 for x in cl_lengths if x) == 1:
        # avoid the degenerate single-symbol CL code: pad with an unused
        # sibling so the canonical code is complete at 1 bit each
        solo = next(s for s, x in enumerate(cl_lengths) if x)
        cl_lengths[solo] = 1
        cl_lengths[0 if solo else 1] = 1
    bw.write(19 - 4, 4)  # num_codes = 19
    for sym in _CL_ORDER:
        bw.write(cl_lengths[sym], 3)
    bw.write(0, 1)  # no max_symbol cap
    cl_codes = _canonical_codes(cl_lengths)
    for ln in lengths:
        code, n = cl_codes[ln]
        # canonical codes are written MSB-first into the LSB-first stream
        bw.write(int(format(code, f"0{n}b")[::-1], 2), n)


def _emit_sym(bw: _BitWriter, codes: dict[int, tuple[int, int]],
              sym: int) -> None:
    code, n = codes[sym]
    if n:
        bw.write(int(format(code, f"0{n}b")[::-1], 2), n)


def _tokenize(pixels: np.ndarray, cur_w: int, use_lz77: bool,
              cache_bits: int) -> list[tuple]:
    """Greedy tokens over the flat pixel stream: ('lit', px), ('copy',
    length, dist), ('cache', slot)."""
    npix = len(pixels)
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [None] * cache_size
    toks: list[tuple] = []
    pos = 0
    while pos < npix:
        best_len = 0
        best_dist = 0
        if use_lz77:
            for dist in (cur_w, 1):
                if dist == 0 or dist > pos:
                    continue
                ln = 0
                while (pos + ln < npix and ln < 4096
                       and pixels[pos + ln] == pixels[pos + ln - dist]):
                    ln += 1
                if ln > best_len:
                    best_len, best_dist = ln, dist
        if best_len >= 3:
            toks.append(("copy", best_len, best_dist))
            if cache_size:
                for k in range(best_len):
                    px = int(pixels[pos + k])
                    cache[_cache_slot(px, cache_bits)] = px
            pos += best_len
            continue
        px = int(pixels[pos])
        if cache_size:
            slot = _cache_slot(px, cache_bits)
            if cache[slot] == px:
                toks.append(("cache", slot))
                pos += 1
                continue
            cache[slot] = px
        toks.append(("lit", px))
        pos += 1
    return toks


def _encode_entropy_image(bw: _BitWriter, argb: np.ndarray, *,
                          use_lz77: bool = True, cache_bits: int = 0,
                          meta_split: bool = False,
                          is_level0: bool = False) -> None:
    """Write one entropy-coded image (cache bit, optional 2-group meta
    split, prefix codes, tokens).  The meta-prefix presence bit exists
    only at level 0 — sub-resolution images must not write it."""
    h, cur_w = argb.shape
    flat = argb.reshape(-1)
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    cache_size = (1 << cache_bits) if cache_bits else 0

    hbits = 0
    group_of_pos = None
    num_groups = 1
    if is_level0:
        if meta_split and cur_w >= 2:
            bw.write(1, 1)
            # choose hbits so the meta image is 2 columns wide
            hbits = min(9, max(2, (cur_w - 1).bit_length() - 1))
            while hbits < 9 and ((cur_w + (1 << hbits) - 1) >> hbits) > 2:
                hbits += 1
            bw.write(hbits - 2, 3)
            hx = (cur_w + (1 << hbits) - 1) >> hbits
            hy = (h + (1 << hbits) - 1) >> hbits
            meta_img = np.zeros((hy, hx), np.uint32)
            for mx in range(hx):
                meta_img[:, mx] = (mx % 2) << 8  # group id in green channel
            _encode_entropy_image(bw, meta_img, use_lz77=False, cache_bits=0)
            ys, xs = np.divmod(np.arange(h * cur_w), cur_w)
            group_of_pos = (xs >> hbits) % 2
            num_groups = 2
        else:
            bw.write(0, 1)

    toks = _tokenize(flat, cur_w, use_lz77, cache_bits)

    # token -> symbol streams per group
    green_size = 256 + 24 + cache_size
    counts = [[[0] * s for s in (green_size, 256, 256, 256, 40)]
              for _ in range(num_groups)]
    pos = 0
    planned: list[tuple] = []
    for tok in toks:
        gid = int(group_of_pos[pos]) if group_of_pos is not None else 0
        if tok[0] == "lit":
            px = tok[1]
            a, rr, g, b = ((px >> 24) & 0xFF, (px >> 16) & 0xFF,
                           (px >> 8) & 0xFF, px & 0xFF)
            counts[gid][_GREEN][g] += 1
            counts[gid][_RED][rr] += 1
            counts[gid][_BLUE][b] += 1
            counts[gid][_ALPHA][a] += 1
            planned.append((gid, "lit", g, rr, b, a))
            pos += 1
        elif tok[0] == "cache":
            counts[gid][_GREEN][280 + tok[1]] += 1
            planned.append((gid, "cache", tok[1]))
            pos += 1
        else:
            _, length, dist = tok
            lsym, lext, lbits = _prefix_encode(length)
            dcode = _dist_to_plane(dist, cur_w)
            dsym, dext, dbits = _prefix_encode(dcode)
            counts[gid][_GREEN][256 + lsym] += 1
            counts[gid][_DIST][dsym] += 1
            planned.append((gid, "copy", lsym, lext, lbits,
                            dsym, dext, dbits))
            pos += length

    all_lengths = []
    all_codes = []
    for gid in range(num_groups):
        glens = [_limited_lengths(c) for c in counts[gid]]
        gcodes = []
        for ln in glens:
            used = [s for s, x in enumerate(ln) if x]
            if len(used) == 1:
                # degenerate single-symbol code: the decoder reads ZERO
                # bits per symbol, so the emitter must write zero bits
                gcodes.append({used[0]: (0, 0)})
            else:
                gcodes.append(_canonical_codes(ln))
        all_lengths.append(glens)
        all_codes.append(gcodes)
        for ln in glens:
            _write_code(bw, ln)

    for item in planned:
        gid = item[0]
        gcodes = all_codes[gid]
        if item[1] == "lit":
            _, _, g, rr, b, a = item
            _emit_sym(bw, gcodes[_GREEN], g)
            _emit_sym(bw, gcodes[_RED], rr)
            _emit_sym(bw, gcodes[_BLUE], b)
            _emit_sym(bw, gcodes[_ALPHA], a)
        elif item[1] == "cache":
            _emit_sym(bw, gcodes[_GREEN], 280 + item[2])
        else:
            _, _, lsym, lext, lbits, dsym, dext, dbits = item
            _emit_sym(bw, gcodes[_GREEN], 256 + lsym)
            bw.write(lext, lbits)
            _emit_sym(bw, gcodes[_DIST], dsym)
            bw.write(dext, dbits)


def _fwd_subtract_green(argb: np.ndarray) -> np.ndarray:
    ch = _split(argb)
    ch[:, :, 1] = (ch[:, :, 1] - ch[:, :, 2]) & 0xFF
    ch[:, :, 3] = (ch[:, :, 3] - ch[:, :, 2]) & 0xFF
    return _join(ch)


def _fwd_predictor(argb: np.ndarray, bits: int,
                   mode_img: np.ndarray) -> np.ndarray:
    """Residuals for the predictor transform (fixed mode per block, the
    mode image supplied as (sh, sw) ints)."""
    h, w = argb.shape
    src = _split(argb)
    res = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([0xFF, 0, 0, 0], np.int64)
            elif y == 0:
                pred = src[0, x - 1]
            elif x == 0:
                pred = src[y - 1, 0]
            else:
                mode = int(mode_img[y >> bits, x >> bits])
                left = src[y, x - 1]
                top = src[y - 1, x]
                tl = src[y - 1, x - 1]
                tr = src[y - 1, x + 1] if x + 1 < w else src[y, 0]
                pred = _predict(mode, left, top, tl, tr)
            res[y, x] = (src[y, x] - pred) & 0xFF
    return _join(res)


def _fwd_color(argb: np.ndarray, bits: int, g2r: int, g2b: int,
               r2b: int) -> np.ndarray:
    ch = _split(argb)
    green = ch[:, :, 2]
    red0 = ch[:, :, 1]
    ch[:, :, 3] = (ch[:, :, 3] - _ct_delta(g2b, green)
                   - _ct_delta(r2b, red0)) & 0xFF
    ch[:, :, 1] = (red0 - _ct_delta(g2r, green)) & 0xFF
    return _join(ch)


def webp_encode_lossless(img: np.ndarray, *, use_lz77: bool = True,
                         cache_bits: int = 0, subtract_green: bool = False,
                         predictor_mode: int | None = None,
                         color_transform: tuple[int, int, int] | None = None,
                         palette: bool = False,
                         meta_split: bool = False) -> bytes:
    """Encode (h, w, 3) or (h, w, 4) uint8 (or (h, w) grayscale) to a
    spec-valid lossless WebP file.  Intended for fixtures/tests; every
    option maps to one decoder path."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=2)
    h, w = img.shape[:2]
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise WebpError("webp_encoder_bad_dims")
    alpha = (img[:, :, 3].astype(np.int64) if img.shape[2] == 4
             else np.full((h, w), 255, np.int64))
    argb = ((alpha << 24)
            | (img[:, :, 0].astype(np.int64) << 16)
            | (img[:, :, 1].astype(np.int64) << 8)
            | img[:, :, 2].astype(np.int64)).astype(np.uint32)

    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (alpha != 255).any() else 0, 1)
    bw.write(0, 3)  # version

    if palette:
        colors = np.unique(argb)
        if len(colors) > 256:
            raise WebpError("webp_encoder_palette_overflow")
        lut = {int(c): i for i, c in enumerate(colors)}
        psize = len(colors)
        bw.write(1, 1)
        bw.write(3, 2)  # COLOR_INDEXING
        bw.write(psize - 1, 8)
        # delta-coded palette row
        prow = np.zeros((1, psize), np.uint32)
        prev = np.zeros(4, np.int64)
        for i, c in enumerate(colors):
            cur = np.array([(int(c) >> 24) & 0xFF, (int(c) >> 16) & 0xFF,
                            (int(c) >> 8) & 0xFF, int(c) & 0xFF], np.int64)
            d = (cur - prev) & 0xFF
            prow[0, i] = ((int(d[0]) << 24) | (int(d[1]) << 16)
                          | (int(d[2]) << 8) | int(d[3]))
            prev = cur
        _encode_entropy_image(bw, prow, use_lz77=False, cache_bits=0)
        if psize <= 2:
            xbits = 3
        elif psize <= 4:
            xbits = 2
        elif psize <= 16:
            xbits = 1
        else:
            xbits = 0
        bits_per = 8 >> xbits
        packed_w = (w + (1 << xbits) - 1) >> xbits
        packed = np.zeros((h, packed_w), np.int64)
        for x in range(w):
            idx = np.vectorize(lut.__getitem__)(argb[:, x].astype(np.int64))
            packed[:, x >> xbits] |= idx << ((x & ((1 << xbits) - 1))
                                             * bits_per)
        argb = (0xFF000000 | (packed << 8)).astype(np.uint32)
        bw.write(0, 1)  # end of transforms
        _encode_entropy_image(bw, argb, use_lz77=use_lz77,
                              cache_bits=cache_bits, meta_split=meta_split,
                              is_level0=True)
        payload = b"\x2f" + bw.getvalue()
        return _riff_wrap(payload)

    if color_transform is not None:
        g2r, g2b, r2b = color_transform
        bw.write(1, 1)
        bw.write(1, 2)  # COLOR
        bits = 4
        bw.write(bits - 2, 3)
        sw = (w + (1 << bits) - 1) >> bits
        sh = (h + (1 << bits) - 1) >> bits
        cte = (0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8)
               | (g2r & 0xFF))
        sub = np.full((sh, sw), cte, np.uint32)
        _encode_entropy_image(bw, sub, use_lz77=False, cache_bits=0)
        argb = _fwd_color(argb, bits, g2r, g2b, r2b)
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        argb = _fwd_subtract_green(argb)
    if predictor_mode is not None:
        bw.write(1, 1)
        bw.write(0, 2)  # PREDICTOR
        bits = 4
        bw.write(bits - 2, 3)
        sw = (w + (1 << bits) - 1) >> bits
        sh = (h + (1 << bits) - 1) >> bits
        mode_img = np.full((sh, sw), predictor_mode, np.int64)
        sub = (0xFF000000 | (mode_img << 8)).astype(np.uint32)
        _encode_entropy_image(bw, sub, use_lz77=False, cache_bits=0)
        argb = _fwd_predictor(argb, bits, mode_img)
    bw.write(0, 1)  # end of transforms
    _encode_entropy_image(bw, argb, use_lz77=use_lz77,
                          cache_bits=cache_bits, meta_split=meta_split,
                          is_level0=True)
    payload = b"\x2f" + bw.getvalue()
    return _riff_wrap(payload)


def _riff_wrap(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def webp_frame_count(data: bytes) -> int:
    """Animation frame count: ANMF chunks in the RIFF walk; a still
    image (VP8/VP8L/VP8X without ANMF) counts 1."""
    try:
        frames = sum(1 for fc, _ in _walk_riff(data) if fc == b"ANMF")
    except WebpError:
        return 0
    return frames or 1
