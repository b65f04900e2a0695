"""Pure-Python LZ4 decoder — frame format (lz4_Frame_format.md, the
public spec shipped with the lz4 project) plus the legacy ``lz4 -l``
frame, over the raw LZ4 block format (lz4_Block_format.md).

The reference's ``7z x`` call covers none of this (p7zip has no lz4),
but ``.lz4`` / ``.tar.lz4`` show up in crawl drops and data lakes the
same way ``.zst`` does, and the container's real ``lz4`` CLI gives the
same authoritative cross-validation the zstd codec got: the decoder is
pinned bit-exact against CLI output across level/shape matrices in
``tests/test_lz4.py``, and the store-mode writer is itself decoded by
the CLI.

Implements:

- frame descriptor (FLG/BD/HC with the XXH32-derived header checksum
  verified), optional content size, dict-id refusal (typed — no
  dictionary plumbing here, same decision as the zstd codec);
- data blocks: compressed and uncompressed (high-bit size flag),
  optional per-block XXH32 checksums, EndMark, optional content
  XXH32 verified over the decoded output;
- skippable frames (0x184D2A50..5F) and multi-frame concatenation;
- the legacy frame (magic 0x184C2102, 8 MiB blocks, no end marker);
- raw block decode: token nibbles with 255-extension lengths, 16-bit
  little-endian match offsets, overlap-safe match copy.

XXH32 is implemented from the public xxHash spec (the five primes and
the rotate-multiply ladder) — needed for header/content checksums.

Every failure raises :class:`Lz4Error` with a typed reason so the
Arrow-batched unpack kernel maps it to a per-row broken reason.
"""

from __future__ import annotations

import struct

__all__ = ["Lz4Error", "lz4_decompress", "lz4_block_decompress",
           "lz4_compress_store", "xxh32"]

_MAGIC = 0x184D2204
_MAGIC_LEGACY = 0x184C2102
_MAGIC_SKIP_LO = 0x184D2A50
_MAGIC_SKIP_HI = 0x184D2A5F

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


class Lz4Error(ValueError):
    def __init__(self, reason: str, detail: str = ""):
        super().__init__(f"{reason}: {detail}" if detail else reason)
        self.reason = reason


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 from the public xxHash spec (one-shot)."""
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed
        v4 = (seed - _P1) & _M32
        end = n - 16
        while pos <= end:
            l1, l2, l3, l4 = struct.unpack_from("<4I", data, pos)
            v1 = (_rotl((v1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _M32
    else:
        h = (seed + _P5) & _M32
    h = (h + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        h = (_rotl((h + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        h = (_rotl((h + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    h ^= h >> 15
    h = (h * _P2) & _M32
    h ^= h >> 13
    h = (h * _P3) & _M32
    h ^= h >> 16
    return h


def lz4_block_decompress(src: bytes, max_output: int,
                         history: bytes = b"") -> bytes:
    """One raw LZ4 block (lz4_Block_format.md).  ``history`` is the
    already-decoded frame tail for block-DEPENDENT frames (FLG bit 5
    clear): matches may reach up to 64 KiB back into prior blocks."""
    out = bytearray(history)
    base = len(history)
    pos = 0
    n = len(src)
    while pos < n:
        token = src[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise Lz4Error("lz4_truncated", "literal length")
                b = src[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise Lz4Error("lz4_truncated", "literals")
        if len(out) - base + lit_len > max_output:
            raise Lz4Error("lz4_too_big")
        out += src[pos:pos + lit_len]
        pos += lit_len
        if pos == n:
            break  # last sequence carries literals only
        if pos + 2 > n:
            raise Lz4Error("lz4_truncated", "offset")
        (offset,) = struct.unpack_from("<H", src, pos)
        pos += 2
        if offset == 0 or offset > len(out):
            raise Lz4Error("lz4_malformed", f"offset {offset}")
        match_len = (token & 0x0F) + 4
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise Lz4Error("lz4_truncated", "match length")
                b = src[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        if len(out) - base + match_len > max_output:
            raise Lz4Error("lz4_too_big")
        start = len(out) - offset
        if offset >= match_len:
            out += out[start:start + match_len]
        else:
            for i in range(match_len):  # overlap copy, byte-serial
                out.append(out[start + i])
    return bytes(out[base:])


def _decode_frame(data: bytes, pos: int, out: bytearray,
                  max_output: int) -> int:
    flg = data[pos]
    bd = data[pos + 1]
    if (flg >> 6) != 1:
        raise Lz4Error("lz4_version", f"FLG version {flg >> 6}")
    if flg & 0x02:
        raise Lz4Error("lz4_malformed", "reserved FLG bit set")
    indep = bool(flg & 0x20)
    has_bsum = bool(flg & 0x10)
    has_csize = bool(flg & 0x08)
    has_csum = bool(flg & 0x04)
    has_dict = bool(flg & 0x01)
    if has_dict:
        # same decision as the zstd codec's dictionary-frame refusal:
        # no dictionary plumbing → typed reason, never a wrong decode
        raise Lz4Error("lz4_dictionary_unsupported")
    desc_len = 2 + (8 if has_csize else 0)
    desc = data[pos:pos + desc_len]
    hc = data[pos + desc_len]
    if ((xxh32(desc) >> 8) & 0xFF) != hc:
        raise Lz4Error("lz4_header_checksum")
    content_size = None
    if has_csize:
        (content_size,) = struct.unpack_from("<Q", data, pos + 2)
    pos += desc_len + 1
    frame_start = len(out)
    while True:
        if pos + 4 > len(data):
            raise Lz4Error("lz4_truncated", "block size")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:  # EndMark
            break
        uncompressed = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if pos + bsize > len(data):
            raise Lz4Error("lz4_truncated", "block")
        block = data[pos:pos + bsize]
        pos += bsize
        if has_bsum:
            if pos + 4 > len(data):
                raise Lz4Error("lz4_truncated", "block checksum")
            (want,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(block) != want:
                raise Lz4Error("lz4_block_checksum")
        if uncompressed:
            if len(out) + bsize > max_output:
                raise Lz4Error("lz4_too_big")
            out += block
        else:
            hist = b"" if indep else bytes(
                out[max(frame_start, len(out) - 65536):])
            out += lz4_block_decompress(block, max_output - len(out), hist)
    if has_csum:
        if pos + 4 > len(data):
            raise Lz4Error("lz4_truncated", "content checksum")
        (want,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if xxh32(bytes(out[frame_start:])) != want:
            raise Lz4Error("lz4_content_checksum")
    if content_size is not None and len(out) - frame_start != content_size:
        raise Lz4Error("lz4_malformed", "content size mismatch")
    return pos


def _decode_legacy_frame(data: bytes, pos: int, out: bytearray,
                         max_output: int) -> int:
    """lz4 -l: raw 8 MiB blocks, 4-byte compressed sizes, no end mark —
    the frame ends at EOF or at the next magic."""
    while pos + 4 <= len(data):
        (bsize,) = struct.unpack_from("<I", data, pos)
        if bsize in (_MAGIC, _MAGIC_LEGACY) or \
                _MAGIC_SKIP_LO <= bsize <= _MAGIC_SKIP_HI:
            break  # next frame begins
        pos += 4
        if pos + bsize > len(data):
            raise Lz4Error("lz4_truncated", "legacy block")
        out += lz4_block_decompress(data[pos:pos + bsize],
                                    max_output - len(out))
        pos += bsize
    return pos


def lz4_decompress(data: bytes, max_output: int = 1 << 30) -> bytes:
    """Concatenated LZ4 frames → payload bytes."""
    out = bytearray()
    pos = 0
    frames = 0
    while pos < len(data):
        if pos + 4 > len(data):
            raise Lz4Error("lz4_truncated", "magic")
        (magic,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if magic == _MAGIC:
            pos = _decode_frame(data, pos, out, max_output)
            frames += 1
        elif magic == _MAGIC_LEGACY:
            pos = _decode_legacy_frame(data, pos, out, max_output)
            frames += 1
        elif _MAGIC_SKIP_LO <= magic <= _MAGIC_SKIP_HI:
            if pos + 4 > len(data):
                raise Lz4Error("lz4_truncated", "skippable size")
            (sz,) = struct.unpack_from("<I", data, pos)
            pos += 4 + sz
            if pos > len(data):
                raise Lz4Error("lz4_truncated", "skippable frame")
        else:
            raise Lz4Error("lz4_malformed", f"bad magic {magic:#x}")
    if frames == 0:
        raise Lz4Error("lz4_malformed", "no frames")
    return bytes(out)


def lz4_compress_store(data: bytes, block_size: int = 65536,
                       block_checksums: bool = False,
                       content_checksum: bool = True,
                       content_size: bool = False) -> bytes:
    """Store-mode frame writer (uncompressed blocks) for fixtures —
    valid LZ4 the real CLI decodes; cross-checked in tests."""
    flg = 0x40 | 0x20  # version 01, block-independent
    if block_checksums:
        flg |= 0x10
    if content_size:
        flg |= 0x08
    if content_checksum:
        flg |= 0x04
    bd = 0x40  # 64 KiB max block size
    desc = bytes([flg, bd])
    if content_size:
        desc += struct.pack("<Q", len(data))
    out = bytearray(struct.pack("<I", _MAGIC))
    out += desc
    out.append((xxh32(desc) >> 8) & 0xFF)
    for off in range(0, len(data), block_size):
        block = data[off:off + block_size]
        out += struct.pack("<I", 0x80000000 | len(block))
        out += block
        if block_checksums:
            out += struct.pack("<I", xxh32(block))
    out += struct.pack("<I", 0)  # EndMark
    if content_checksum:
        out += struct.pack("<I", xxh32(data))
    return bytes(out)
