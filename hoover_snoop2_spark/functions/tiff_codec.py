"""Pure-Python + numpy baseline TIFF decoder/encoder (TIFF 6.0).

``image/tiff`` is in the reference's thumbnail mime allowlist
(``/root/reference/snoop/data/analyzers/thumbnails.py:63``) and its
Tika list; the baseline profile (uncompressed or PackBits strips) is
public-spec and stdlib-decodable, completing the native raster set
(PNG/GIF/JPEG/BMP).  The EXIF reader (:mod:`..operators.exif_extract`)
already walks TIFF IFDs for metadata — this module decodes pixels.

Decoder coverage: II/MM byte orders, IFD0 only (thumbnail semantics —
subsequent IFDs are usually reduced previews), chunky planar config,
compression 1 (none), 5 (LZW, TIFF 6.0 §13: MSB-first codes with the
de-facto "early change" width bump at 511/1023/2047 that libtiff and
every mainstream writer use) and 32773 (PackBits), horizontal
differencing Predictor 2 (§14), tiled layout (§15: TileWidth/Length/
Offsets/ByteCounts, right/bottom tile padding cropped), photometric
0/1 (gray, incl. WhiteIsZero inversion), 2 (RGB, extra sample
composited over white) and 3 (palette via ColorMap), 8-bit samples,
multi-strip images.  Planar configuration 2, JPEG-in-TIFF and other
bit depths surface ``tiff_*_unsupported`` reasons.

Encoder (fixtures): chunky 8-bit RGB, single or multi strip,
uncompressed, PackBits, or LZW (+ optional Predictor 2, optional
tiled layout), either byte order.
"""

from __future__ import annotations

import struct

import numpy as np

from .raster_common import MAX_PIXELS, composite_over_white


class TiffError(ValueError):
    """Malformed/unsupported TIFF input; callers map it to broken_reason."""


_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8}


def _read_ifd(data: bytes, order: str) -> dict[int, tuple]:
    if len(data) < 8:
        raise TiffError("tiff_truncated")
    (off,) = struct.unpack(order + "I", data[4:8])
    if off + 2 > len(data):
        raise TiffError("tiff_truncated")
    (n,) = struct.unpack(order + "H", data[off : off + 2])
    tags: dict[int, tuple] = {}
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(data):
            raise TiffError("tiff_truncated")
        tag, typ, cnt = struct.unpack(order + "HHI", data[e : e + 8])
        size = _TYPE_SIZE.get(typ, 0) * cnt
        if size == 0:
            continue
        if size <= 4:
            raw = data[e + 8 : e + 8 + size]
        else:
            (voff,) = struct.unpack(order + "I", data[e + 8 : e + 12])
            raw = data[voff : voff + size]
            if len(raw) < size:
                raise TiffError("tiff_truncated")
        if typ == 3:
            vals = struct.unpack(order + "H" * cnt, raw)
        elif typ == 4:
            vals = struct.unpack(order + "I" * cnt, raw)
        elif typ in (1, 6, 7):
            vals = tuple(raw)
        else:
            continue  # rationals etc. — not needed for pixel decode
        tags[tag] = vals
    return tags


def _unpackbits(src: bytes, expect: int) -> bytes:
    """PackBits (Apple RLE, TIFF 6.0 §9)."""
    out = bytearray()
    i = 0
    n = len(src)
    while i < n and len(out) < expect:
        b = src[i]
        i += 1
        if b < 128:
            out += src[i : i + b + 1]
            i += b + 1
        elif b > 128:
            if i >= n:
                raise TiffError("tiff_truncated")
            out += bytes([src[i]]) * (257 - b)
            i += 1
        # 128 = no-op
    if len(out) < expect:
        raise TiffError("tiff_truncated")
    return bytes(out[:expect])


_LZW_CLEAR = 256
_LZW_EOI = 257


def _lzw_decode(src: bytes, expect: int) -> bytes:
    """TIFF-flavor LZW (TIFF 6.0 §13): MSB-first bit packing, 9→12-bit
    codes, ClearCode=256 / EOI=257, and the early width change (the
    decoder widens when the NEXT code to be assigned would be
    ``(1 << width) - 1`` — i.e. at table sizes 511/1023/2047, one code
    earlier than GIF's LSB-first variant)."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    acc = 0
    nbits = 0
    prev: bytes | None = None
    i = 0
    n = len(src)
    while len(out) < expect:
        while nbits < width:
            if i >= n:
                raise TiffError("tiff_truncated")
            acc = (acc << 8) | src[i]
            nbits += 8
            i += 1
        code = (acc >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            del table[258:]
            width = 9
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise TiffError("tiff_lzw_bad_code")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
        prev = entry
        # early change: widen when the next assignable code would not
        # fit, leaving one slack slot exactly as §13's sample code does
        if len(table) >= (1 << width) - 1 and width < 12:
            width += 1
    if len(out) < expect:
        raise TiffError("tiff_truncated")
    return bytes(out[:expect])


def _lzw_encode(raw: bytes) -> bytes:
    """Matching §13 writer (fixtures): emits Clear, strings, EOI with
    the early width change, resetting the table when it fills."""
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    width = 9
    d: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    emit(_LZW_CLEAR, width)
    s = b""
    for b in raw:
        t = s + bytes([b])
        if t in d:
            s = t
            continue
        emit(d[s], width)
        d[t] = next_code
        next_code += 1
        # the decoder's table lags the writer's by exactly one entry
        # (it reconstructs add #j while reading code #j+1), so the
        # writer widens one add LATER than the decoder's (1<<w)-1 rule:
        # at next_code == 1<<w the decoder has (1<<w)-1 entries and has
        # just widened — the next emitted code must use the new width
        if next_code >= (1 << width):
            if width < 12:
                width += 1
            else:
                emit(_LZW_CLEAR, width)
                d = {bytes([i]): i for i in range(256)}
                next_code = 258
                width = 9
        s = bytes([b])
    if s:
        emit(d[s], width)
    emit(_LZW_EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _undo_predictor2(px: np.ndarray) -> np.ndarray:
    """Horizontal differencing Predictor=2 (§14): each sample stores
    the delta to its left neighbour; cumsum per row (mod 256) undoes
    it."""
    return np.cumsum(px, axis=1, dtype=np.uint8)


def tiff_decode(data: bytes) -> np.ndarray:
    """Decode IFD0 to (h, w, 3) uint8 RGB."""
    if data[:4] == b"II*\x00":
        order = "<"
    elif data[:4] == b"MM\x00*":
        order = ">"
    else:
        raise TiffError("not_tiff")
    tags = _read_ifd(data, order)

    def one(tag, default=None):
        v = tags.get(tag)
        return v[0] if v else default

    width = one(256)
    height = one(257)
    if not width or not height:
        raise TiffError("tiff_missing_dims")
    if width * height > MAX_PIXELS:
        raise TiffError("tiff_too_large")
    compression = one(259, 1)
    if compression not in (1, 5, 32773):
        raise TiffError(f"tiff_compression_unsupported:{compression}")
    predictor = one(317, 1)
    if predictor not in (1, 2):
        raise TiffError(f"tiff_predictor_unsupported:{predictor}")
    photometric = one(262, 1)
    spp = one(277, 1)
    if spp not in (1, 2, 3, 4):
        # also caps the raw buffer: the pixel guard bounds w*h but a
        # 16-bit SamplesPerPixel would multiply it by up to 65535
        raise TiffError(f"tiff_samples_unsupported:{spp}")
    bits = tags.get(258, (8,) * spp)
    if any(b != 8 for b in bits):
        raise TiffError("tiff_bits_unsupported")
    if one(284, 1) != 1:
        raise TiffError("tiff_planar_unsupported")

    def inflate(chunk: bytes, expect: int) -> bytes:
        if compression == 32773:
            return _unpackbits(chunk, expect)
        if compression == 5:
            return _lzw_decode(chunk, expect)
        if len(chunk) < expect:
            raise TiffError("tiff_truncated")
        return chunk[:expect]

    tile_w = one(322)
    if tile_w:
        # §15 tiled layout: every tile is a full tile_w×tile_l block
        # (edge tiles padded by the writer); stitch then crop
        tile_l = one(323)
        t_offsets = tags.get(324)
        t_counts = tags.get(325)
        if not tile_l or not t_offsets or not t_counts:
            raise TiffError("tiff_missing_tiles")
        across = (width + tile_w - 1) // tile_w
        down = (height + tile_l - 1) // tile_l
        if len(t_offsets) < across * down:
            raise TiffError("tiff_missing_tiles")
        if tile_w * tile_l * across * down > 4 * MAX_PIXELS:
            raise TiffError("tiff_too_large")
        full = np.zeros((down * tile_l, across * tile_w, spp), np.uint8)
        t_expect = tile_w * tile_l * spp
        for t in range(across * down):
            chunk = data[t_offsets[t] : t_offsets[t] + t_counts[t]]
            if len(chunk) < t_counts[t]:
                raise TiffError("tiff_truncated")
            tile = np.frombuffer(inflate(chunk, t_expect), np.uint8)
            tile = tile.reshape(tile_l, tile_w, spp)
            if predictor == 2:
                tile = _undo_predictor2(tile)
            r, c = divmod(t, across)
            full[
                r * tile_l : (r + 1) * tile_l,
                c * tile_w : (c + 1) * tile_w,
            ] = tile
        px = full[:height, :width]
    else:
        offsets = tags.get(273)
        counts = tags.get(279)
        if not offsets:
            raise TiffError("tiff_missing_strips")
        rows_per_strip = one(278, height)
        if not counts:
            if len(offsets) != 1:
                raise TiffError("tiff_missing_strips")
            counts = (width * height * spp,)

        row_bytes = width * spp
        raw = bytearray()
        rows_left = height
        for off, cnt in zip(offsets, counts):
            strip = data[off : off + cnt]
            if len(strip) < cnt:
                raise TiffError("tiff_truncated")
            strip_rows = min(rows_per_strip, rows_left)
            raw += inflate(strip, strip_rows * row_bytes)
            rows_left -= strip_rows
        if len(raw) < height * row_bytes:
            raise TiffError("tiff_truncated")
        px = np.frombuffer(bytes(raw[: height * row_bytes]), dtype=np.uint8)
        px = px.reshape(height, width, spp)
        if predictor == 2:
            px = _undo_predictor2(px)

    if photometric in (0, 1):
        g = px[:, :, 0]
        if photometric == 0:
            g = 255 - g  # WhiteIsZero
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    if photometric == 3:
        cmap = tags.get(320)
        if not cmap or len(cmap) < 3 * 256:
            raise TiffError("tiff_missing_colormap")
        n = len(cmap) // 3
        # ColorMap entries are 16-bit; scale to 8 by the high byte
        table = np.array(cmap, dtype=np.uint32).reshape(3, n).T >> 8
        idx = px[:, :, 0]
        if int(idx.max()) >= n:
            raise TiffError("tiff_index_out_of_range")
        return table[idx].astype(np.uint8)
    if photometric == 2:
        if spp < 3:
            raise TiffError("tiff_samples_unsupported")
        if spp == 3:
            return px.copy()
        return composite_over_white(px[:, :, :3], px[:, :, 3])
    raise TiffError(f"tiff_photometric_unsupported:{photometric}")


def _packbits(row: bytes) -> bytes:
    """Simple PackBits encoder: runs ≥ 3 compress, else literals."""
    out = bytearray()
    i = 0
    n = len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (n - i < 3 or not (
            i + 2 < n and row[i] == row[i + 1] == row[i + 2]
        )) and i - lit_start < 128:
            i += 1
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def _apply_predictor2(block: np.ndarray) -> bytes:
    """Forward horizontal differencing for the fixture writer."""
    d = block.astype(np.int16)
    d[:, 1:] -= block[:, :-1].astype(np.int16)
    return (d & 0xFF).astype(np.uint8).tobytes()


def tiff_encode(rgb: np.ndarray, order: str = "<", packbits: bool = False,
                rows_per_strip: int | None = None, lzw: bool = False,
                predictor: int = 1,
                tile: tuple[int, int] | None = None) -> bytes:
    """Chunky 8-bit RGB writer for fixtures (strips or tiles;
    uncompressed / PackBits / LZW; optional Predictor 2)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]

    def body_bytes(block: np.ndarray) -> bytes:
        raw = (
            _apply_predictor2(block) if predictor == 2 else block.tobytes()
        )
        if lzw:
            return _lzw_encode(raw)
        return _packbits(raw) if packbits else raw

    tiled = tile is not None
    if tiled:
        tw, tl = tile
        if tw % 16 or tl % 16:
            raise ValueError("tile dims must be multiples of 16 (§15)")
        strips = []
        for y0 in range(0, h, tl):
            for x0 in range(0, w, tw):
                block = np.zeros((tl, tw, 3), np.uint8)
                part = rgb[y0 : y0 + tl, x0 : x0 + tw]
                block[: part.shape[0], : part.shape[1]] = part
                strips.append(body_bytes(block))
        rps = tl
    else:
        rps = rows_per_strip or h
        strips = [
            body_bytes(rgb[y0 : y0 + rps]) for y0 in range(0, h, rps)
        ]

    compression = 5 if lzw else (32773 if packbits else 1)
    magic = b"II*\x00" if order == "<" else b"MM\x00*"
    n_tags = 9 + (1 if predictor == 2 else 0) + (1 if tiled else 0)
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_tags + 4
    # strip offsets/counts arrays (if >1 strip they spill after IFD)
    extra = bytearray()
    def arr_or_inline(vals, typ):
        nonlocal extra
        fmt = "I" if typ == 4 else "H"
        size = len(vals) * _TYPE_SIZE[typ]
        if size <= 4:
            raw = struct.pack(order + fmt * len(vals), *vals)
            return raw + b"\x00" * (4 - size), None
        pos = data_off + len(extra)
        extra += struct.pack(order + fmt * len(vals), *vals)
        return struct.pack(order + "I", pos), pos

    # reserve strip data positions after the arrays
    counts = [len(s) for s in strips]
    # two passes: first compute extra arrays with placeholder offsets
    placeholder = [0] * len(strips)
    tags_spec = []

    def build(offsets_vals):
        nonlocal extra
        extra = bytearray()
        entries = []
        def tag(tg, typ, vals):
            raw, _ = arr_or_inline(vals, typ)
            entries.append(struct.pack(order + "HHI", tg, typ, len(vals)) + raw)
        tag(256, 4, [w])
        tag(257, 4, [h])
        tag(258, 3, [8, 8, 8])
        tag(259, 3, [compression])
        tag(262, 3, [2])
        if not tiled:
            tag(273, 4, offsets_vals)
        tag(277, 3, [3])
        if not tiled:
            tag(278, 4, [rps])
            tag(279, 4, counts)
        if predictor == 2:
            tag(317, 3, [2])
        if tiled:
            tag(322, 4, [tw])
            tag(323, 4, [tl])
            tag(324, 4, offsets_vals)
            tag(325, 4, counts)
        return entries

    build(placeholder)
    arrays_size = len(extra)
    strip_base = data_off + arrays_size
    offsets_vals = []
    pos = strip_base
    for c in counts:
        offsets_vals.append(pos)
        pos += c
    entries = build(offsets_vals)
    ifd = struct.pack(order + "H", n_tags) + b"".join(entries) + struct.pack(
        order + "I", 0
    )
    header = magic + struct.pack(order + "I", ifd_off)
    return header + ifd + bytes(extra) + b"".join(strips)
