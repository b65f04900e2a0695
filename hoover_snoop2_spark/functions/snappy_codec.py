"""Pure-Python snappy decoder (raw block format + the framing format),
plus a from-scratch compressor for round-trip self-verification.

The reference Tika-accepts ``application/x-snappy-framed``
(``snoop/data/analyzers/_tika_mime_types.py:1004``).  Both formats are
published by the snappy project (format_description.txt and
framing_format.txt):

raw block: uncompressed-length varint, then tagged elements —
  tag&3 == 0  literal   (len = (tag>>2)+1, or 60..63 → 1..4 extra
                         little-endian length bytes holding len-1)
  tag&3 == 1  copy-1    (len = ((tag>>2)&7)+4, offset = 11 bits:
                         (tag>>5)<<8 | next byte)
  tag&3 == 2  copy-2    (len = (tag>>2)+1, offset = u16 LE)
  tag&3 == 3  copy-4    (len = (tag>>2)+1, offset = u32 LE)
Copies may overlap (offset < len repeats the window).

framing: 0xFF stream identifier ("sNaPpY"), then chunks
  (type u8, length u24 LE): 0x00 compressed (masked CRC-32C of the
  UNCOMPRESSED bytes + raw-snappy block), 0x01 uncompressed
  (masked CRC + raw bytes), 0x80-0xFE skippable, 0x02-0x7F reserved
  unskippable -> typed error.  CRC mask: ((crc>>15)|(crc<<17)) +
  0xa282ead8 (mod 2^32).

Self-verification: CRC-32C is pinned to the published check value
(crc32c("123456789") == 0xE3069283 — the same independent-pin standard
as the FLAC CRCs), the compressor implements the tag grammar
independently of the decoder (round-trip asserted over adversarial
shapes), and hand-built copy-1/copy-4 streams pin the offset/length
bit splits.
"""
from __future__ import annotations

import struct


class SnappyError(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli, reflected poly 0x82F63B78)
# ---------------------------------------------------------------------------

_CRC_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ 0x82F63B78 if _c & 1 else _c >> 1
    _CRC_TABLE.append(_c)


def crc32c(data: bytes) -> int:
    c = 0xFFFFFFFF
    for b in data:
        c = _CRC_TABLE[(c ^ b) & 0xFF] ^ (c >> 8)
    return c ^ 0xFFFFFFFF


def _mask(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# raw block format
# ---------------------------------------------------------------------------


def _uvarint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    shift = 0
    while True:
        if pos >= len(data) or shift > 35:
            raise SnappyError("snappy_truncated")
        b = data[pos]
        v |= (b & 0x7F) << shift
        pos += 1
        if not b & 0x80:
            return v, pos
        shift += 7


def snappy_decompress_raw(data: bytes,
                          max_output: int = 1 << 30) -> bytes:
    total, pos = _uvarint(data, 0)
    if total > max_output:
        raise SnappyError("snappy_too_large")
    out = bytearray()
    while pos < len(data):
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            n = tag >> 2
            if n >= 60:
                extra = n - 59
                if pos + extra > len(data):
                    raise SnappyError("snappy_truncated")
                n = int.from_bytes(data[pos:pos + extra], "little")
                pos += extra
            n += 1
            if pos + n > len(data):
                raise SnappyError("snappy_truncated")
            out += data[pos:pos + n]
            pos += n
        else:
            if kind == 1:
                if pos >= len(data):
                    raise SnappyError("snappy_truncated")
                length = ((tag >> 2) & 0x7) + 4
                offset = ((tag >> 5) << 8) | data[pos]
                pos += 1
            elif kind == 2:
                if pos + 2 > len(data):
                    raise SnappyError("snappy_truncated")
                length = (tag >> 2) + 1
                (offset,) = struct.unpack_from("<H", data, pos)
                pos += 2
            else:
                if pos + 4 > len(data):
                    raise SnappyError("snappy_truncated")
                length = (tag >> 2) + 1
                (offset,) = struct.unpack_from("<I", data, pos)
                pos += 4
            if offset == 0 or offset > len(out):
                raise SnappyError("snappy_bad_offset")
            for _ in range(length):
                out.append(out[-offset])
        if len(out) > max_output:
            raise SnappyError("snappy_too_large")
    if len(out) != total:
        raise SnappyError("snappy_length_mismatch")
    return bytes(out)


def snappy_compress_raw(data: bytes) -> bytes:
    """Greedy compressor over a 4-byte-prefix hash chain; emits
    literal + copy-2 elements (a strictly valid subset of the format,
    and an independent implementation of the tag grammar)."""
    out = bytearray()
    n = len(data)
    v = n
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            break

    def emit_literal(chunk: bytes) -> None:
        m = len(chunk) - 1
        if m < 60:
            out.append(m << 2)
        elif m < 256:
            out.append(60 << 2)
            out.append(m)
        elif m < 1 << 16:
            out.append(61 << 2)
            out.extend(struct.pack("<H", m))
        else:
            out.append(62 << 2)
            out.extend(m.to_bytes(3, "little"))
        out.extend(chunk)

    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 0xFFFF and data[j:j + 4] == key:
            if i > lit_start:
                emit_literal(data[lit_start:i])
            length = 4
            # comparing source bytes handles overlap: output == data, so
            # out[i+len-offset] == data[j+len] by induction
            while (i + length < n and length < 64
                   and data[j + length] == data[i + length]):
                length += 1
            out.append(((length - 1) << 2) | 2)
            out += struct.pack("<H", i - j)
            i += length
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        emit_literal(data[lit_start:n])
    return bytes(out)


# ---------------------------------------------------------------------------
# framing format
# ---------------------------------------------------------------------------

FRAME_MAGIC = b"\xff\x06\x00\x00sNaPpY"


def snappy_decompress_framed(data: bytes,
                             max_output: int = 1 << 30) -> bytes:
    if not data.startswith(FRAME_MAGIC):
        raise SnappyError("snappy_bad_magic")
    out = bytearray()
    pos = len(FRAME_MAGIC)
    while pos < len(data):
        if pos + 4 > len(data):
            raise SnappyError("snappy_truncated")
        ctype = data[pos]
        clen = int.from_bytes(data[pos + 1:pos + 4], "little")
        pos += 4
        if pos + clen > len(data):
            raise SnappyError("snappy_truncated")
        chunk = data[pos:pos + clen]
        pos += clen
        if ctype == 0x00:
            if clen < 4:
                raise SnappyError("snappy_truncated")
            (crc,) = struct.unpack_from("<I", chunk, 0)
            block = snappy_decompress_raw(chunk[4:],
                                          max_output - len(out))
            if _mask(crc32c(block)) != crc:
                raise SnappyError("snappy_crc_mismatch")
            out += block
        elif ctype == 0x01:
            if clen < 4:
                raise SnappyError("snappy_truncated")
            (crc,) = struct.unpack_from("<I", chunk, 0)
            block = chunk[4:]
            if _mask(crc32c(block)) != crc:
                raise SnappyError("snappy_crc_mismatch")
            out += block
        elif ctype == 0xFF:
            if chunk != b"sNaPpY":
                raise SnappyError("snappy_bad_magic")
        elif 0x80 <= ctype <= 0xFE:
            continue  # skippable
        else:
            raise SnappyError("snappy_reserved_chunk")
        if len(out) > max_output:
            raise SnappyError("snappy_too_large")
    return bytes(out)


def snappy_compress_framed(data: bytes, block: int = 65536) -> bytes:
    out = bytearray(FRAME_MAGIC)
    for i in range(0, max(len(data), 1), block):
        chunk = data[i:i + block] if data else b""
        comp = snappy_compress_raw(chunk)
        crc = struct.pack("<I", _mask(crc32c(chunk)))
        if len(comp) < len(chunk):
            body = crc + comp
            out += bytes([0x00]) + len(body).to_bytes(3, "little") + body
        else:
            body = crc + chunk
            out += bytes([0x01]) + len(body).to_bytes(3, "little") + body
        if not data:
            break
    return bytes(out)
