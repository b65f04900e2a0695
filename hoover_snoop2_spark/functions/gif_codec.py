"""Pure-Python + numpy GIF decoder/encoder (GIF87a/GIF89a, public spec).

Companion to :mod:`.png_codec`: with PNG and GIF decoded natively, both
lossless web-raster formats feed the real thumbnail ladder and the
sample-exact image feature/pHash operators
(``operators/thumbnails.py``, ``operators/media_stats.py``), leaving
``media_decoder_missing`` for JPEG only.  The reference's thumbnail
mime allowlist includes ``image/gif``
(``/root/reference/snoop/data/analyzers/thumbnails.py:25-29``).

Decoder coverage (W3C GIF89a specification):

- global and local color tables, any size 2..256
- LZW decompression (variable 3..12-bit codes, LSB-first packing,
  clear / end-of-information codes, the deferred-clear growth rule)
- interlaced images (the 4-pass row schedule)
- extension blocks are walked; the graphic-control extension's
  transparency index is honored (transparent pixels composite over
  white — the same flatten contract as PNG alpha)
- only the FIRST image frame is returned (thumbnail semantics; later
  frames of an animation are skipped)

Encoder: single-frame GIF89a with a power-of-two global color table
built from the image's unique colors (≤ 256 required — fixtures only),
uncompressed-style LZW (emit literal codes, reset the table via clear
codes before width overflow) for implementation simplicity; decoders
(including this one) accept it because it is spec-valid LZW.
"""

from __future__ import annotations

import struct

import numpy as np

from .raster_common import MAX_PIXELS


class GifError(ValueError):
    """Malformed/unsupported GIF input; callers map it to broken_reason."""


#: interlace pass (start_row, step), GIF89a appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """LZW decompress to exactly ``n_pixels`` palette indices."""
    if not (1 <= min_code_size <= 11):
        raise GifError("gif_bad_lzw_code_size")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_pixels, dtype=np.uint16)
    n_out = 0

    # table maps code -> byte sequence; rebuilt on clear
    def fresh_table():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh_table()
    width = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    total = len(data)
    while n_out < n_pixels:
        while nbits < width:
            if pos >= total:
                raise GifError("gif_lzw_truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("gif_lzw_bad_code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("gif_lzw_bad_code")
        take = min(len(entry), n_pixels - n_out)
        out[n_out : n_out + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        n_out += take
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if n_out < n_pixels:
        raise GifError("gif_lzw_truncated")
    return out


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate GIF data sub-blocks starting at ``pos``; returns
    (payload, position after the block terminator)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise GifError("gif_truncated")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        chunks.append(data[pos : pos + n])
        if len(data[pos : pos + n]) < n:
            raise GifError("gif_truncated")
        pos += n


def gif_decode(data: bytes) -> np.ndarray:
    """Decode the first frame to an (h, w, 3) uint8 RGB array sized to
    the logical screen; transparent and uncovered pixels are white."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not_gif")
    if len(data) < 13:
        raise GifError("gif_truncated")
    sw, sh, flags, bg_index, _ = struct.unpack("<HHBBB", data[6:13])
    if sw == 0 or sh == 0:
        raise GifError("gif_zero_dims")
    if sw * sh > MAX_PIXELS:
        # same decompression-bomb guard as png_decode: a ~20-byte header
        # can otherwise demand a multi-GB canvas before any pixel data
        raise GifError("gif_too_large")
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) < 3 * n:
            raise GifError("gif_truncated")
        gct = gct.reshape(n, 3)
        pos += 3 * n

    canvas = np.full((sh, sw, 3), 255, dtype=np.uint8)
    transparent_index = None
    while pos < len(data):
        marker = data[pos]
        pos += 1
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            if pos >= len(data):
                raise GifError("gif_truncated")
            label = data[pos]
            pos += 1
            payload, pos = _sub_blocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:
                packed, _delay, tix = struct.unpack("<BHB", payload[:4])
                transparent_index = tix if packed & 0x01 else None
            continue
        if marker != 0x2C:  # image descriptor
            raise GifError("gif_bad_block")
        if pos + 9 > len(data):
            raise GifError("gif_truncated")
        ix, iy, iw, ih, iflags = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        table = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            lct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
            if len(lct) < 3 * n:
                raise GifError("gif_truncated")
            table = lct.reshape(n, 3)
            pos += 3 * n
        if table is None:
            raise GifError("gif_no_color_table")
        if iw == 0 or ih == 0:
            raise GifError("gif_zero_dims")
        if iw * ih > MAX_PIXELS:
            raise GifError("gif_too_large")
        if pos >= len(data):
            raise GifError("gif_truncated")
        min_code_size = data[pos]
        pos += 1
        lzw, pos = _sub_blocks(data, pos)
        indices = _lzw_decode(min_code_size, lzw, iw * ih).reshape(ih, iw)
        if int(indices.max()) >= len(table):
            raise GifError("gif_index_out_of_range")
        if iflags & 0x40:  # interlaced: reorder rows into display order
            display = np.empty_like(indices)
            src = 0
            for start, step in _INTERLACE:
                rows = range(start, ih, step)
                for r in rows:
                    display[r] = indices[src]
                    src += 1
            indices = display
        rgb = table[indices]
        if transparent_index is not None and transparent_index < len(table):
            mask = indices == transparent_index
            rgb = rgb.copy()
            rgb[mask] = 255
        # clip the frame to the logical screen
        y1 = min(iy + ih, sh)
        x1 = min(ix + iw, sw)
        if y1 > iy and x1 > ix:
            canvas[iy:y1, ix:x1] = rgb[: y1 - iy, : x1 - ix]
        return canvas  # first frame only
    raise GifError("gif_no_image")


def gif_encode(rgb: np.ndarray, interlace: bool = False,
               transparent_rgb: tuple[int, int, int] | None = None) -> bytes:
    """Single-frame GIF89a writer for fixtures; requires ≤ 256 unique
    colors (+1 if a transparent color is reserved)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w = rgb.shape[:2]
    flat = rgb.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    transparent_index = None
    if transparent_rgb is not None:
        t = np.array(transparent_rgb, dtype=np.uint8)
        hit = np.nonzero((colors == t).all(axis=1))[0]
        if len(hit):
            transparent_index = int(hit[0])
        else:
            colors = np.vstack([colors, t])
            transparent_index = len(colors) - 1
    if len(colors) > 256:
        raise GifError("gif_too_many_colors")
    # pad table to a power of two >= 2
    bits = 1
    while (1 << bits) < len(colors):
        bits += 1
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(colors)] = colors

    indices = inverse.astype(np.uint16).reshape(h, w)
    if interlace:
        rows = []
        for start, step in _INTERLACE:
            rows.extend(range(start, h, step))
        indices = indices[rows]

    min_code_size = max(2, bits)
    clear = 1 << min_code_size
    eoi = clear + 1
    # literal-only LZW: emit each pixel as its own code, issuing a clear
    # code whenever the (virtual) table would force a width bump
    out_bits = bytearray()
    acc = 0
    nacc = 0
    width_ = min_code_size + 1

    def emit(code: int):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += width_
        while nacc >= 8:
            out_bits.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    table_size = eoi + 1
    for v in indices.ravel():
        emit(int(v))
        table_size += 1  # the decoder grows its table per emitted code
        if table_size == (1 << width_) - 1:
            emit(clear)
            table_size = eoi + 1
    emit(eoi)
    if nacc:
        out_bits.append(acc & 0xFF)

    payload = bytes(out_bits)
    blocks = b"".join(
        bytes([len(payload[i : i + 255])]) + payload[i : i + 255]
        for i in range(0, len(payload), 255)
    )

    header = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0)
    out = [header, table.tobytes()]
    if transparent_index is not None:
        out.append(
            b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 0, transparent_index)
            + b"\x00"
        )
    iflags = 0x40 if interlace else 0x00
    out.append(b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, iflags))
    out.append(bytes([min_code_size]) + blocks + b"\x00")
    out.append(b"\x3b")
    return b"".join(out)


def gif_frame_count(data: bytes) -> int:
    """Count image descriptors by walking the block stream (header,
    optional global color table, extensions, image blocks) — animation
    frame count for media stats without decoding pixels.  Returns what
    was countable before any truncation; minimum 1 for a valid header."""
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return 0
    flags = data[10]
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    frames = 0

    def skip_subblocks(p: int) -> int:
        while p < len(data):
            size = data[p]
            p += 1
            if size == 0:
                return p
            p += size
        return p

    while pos < len(data):
        block = data[pos]
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos = skip_subblocks(pos + 2)
        elif block == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                break
            frames += 1
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x80:  # local color table
                pos += 3 * (2 << (iflags & 0x07))
            pos += 1  # LZW min code size
            pos = skip_subblocks(pos)
        else:
            break  # unknown block: stop counting, keep what we have
    return max(frames, 1)
