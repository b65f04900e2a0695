"""Legacy mail/Mac transfer encodings decoded natively: uuencode,
BinHex 4.0, and AppleSingle/AppleDouble.

All three are in the reference's Tika accept list
(``snoop/data/analyzers/_tika_mime_types.py``: ``text/x-uuencode``
:1465, ``application/mac-binhex40`` :86, ``application/applefile``
:7) — the reference Tika-parses them and indexes the embedded payloads;
here each container is walked natively and its payload files become
child rows that ride the same recursion as archive members.

Self-verification standards (the repo rule: no constant or algorithm
lands without an independent check):

- uuencode: the decode is pinned line-by-line against the stdlib's
  ``binascii.a2b_uu`` (an independent C implementation), and the
  in-repo fixture encoder cross-checks against ``binascii.b2a_uu``.
- BinHex 4.0: all three stream CRCs (header / data fork / resource
  fork) are CRC-16/XMODEM and are verified with the stdlib's
  ``binascii.crc_hqx``; a corrupted stream is a typed
  ``binhex_crc_mismatch``, never wrong bytes.  The 64-char alphabet is
  pinned in tests against the stdlib encoding round-trip.
- AppleSingle/AppleDouble: pure structure (magic, version, entry
  table); the fixture writer + reader round-trip plus truncation fuzz
  cover it.

Typed broken reasons (reference pattern: archives.py surfaces typed
errors, never silent drops): ``uu_truncated`` / ``uu_bad_char``,
``binhex_truncated`` / ``binhex_bad_char`` / ``binhex_crc_mismatch``,
``applefile_truncated``.
"""
from __future__ import annotations

import binascii
import datetime
import re
import struct

# ---------------------------------------------------------------------------
# uuencode (text/x-uuencode)
# ---------------------------------------------------------------------------

# "begin <octal mode> <name>" opens a block; a valid first data line is
# required by the sniffer so prose that merely starts with the word
# "begin" never matches.
_UU_BEGIN = re.compile(rb"^begin ([0-7]{3,4}) (.+?)\r?\n", re.MULTILINE)


class UuBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def _uu_line_ok(line: bytes) -> bool:
    """True when ``line`` is a plausible uu data line (length char plus
    enough 6-bit chars for the declared byte count)."""
    if not line:
        return False
    n = (line[0] - 0x20) & 0x3F
    if n > 45:
        return False
    need = (n + 2) // 3 * 4
    body = line[1:]
    if len(body) < need:
        return False
    return all(0x20 <= c <= 0x60 for c in body[:need])


def looks_like_uuencode(data: bytes) -> bool:
    """Sniff: a begin line followed by a valid uu data line (or an
    immediate ``end`` for an empty file)."""
    m = _UU_BEGIN.search(data[:4096])
    if not m or m.start() > 1024:
        return False
    rest = data[m.end():]
    first = rest.split(b"\n", 1)[0].rstrip(b"\r")
    return first.strip() == b"end" or _uu_line_ok(first)


def _decode_uu_line(line: bytes) -> bytes:
    """One uu data line -> raw bytes.  Same contract as
    ``binascii.a2b_uu`` (tests pin the equivalence) but with typed
    errors instead of ``binascii.Error``."""
    n = (line[0] - 0x20) & 0x3F
    if n > 45:
        raise UuBroken("uu_bad_char")
    need = (n + 2) // 3 * 4
    body = line[1:]
    if len(body) < need:
        raise UuBroken("uu_truncated")
    out = bytearray()
    for i in range(0, need, 4):
        quad = body[i:i + 4]
        acc = 0
        for c in quad:
            if not (0x20 <= c <= 0x60):
                raise UuBroken("uu_bad_char")
            acc = (acc << 6) | ((c - 0x20) & 0x3F)
        out += acc.to_bytes(3, "big")
    return bytes(out[:n])


def parse_uuencode(data: bytes) -> list[tuple[str, bytes]]:
    """All ``begin``..``end`` blocks in the stream -> [(name, bytes)].

    Classic uuencoded mail carries one file, but concatenated blocks
    are legal and each becomes its own child.
    """
    files: list[tuple[str, bytes]] = []
    pos = 0
    while True:
        m = _UU_BEGIN.search(data, pos)
        if not m:
            break
        name = m.group(2).decode("latin-1").strip()
        body = bytearray()
        cursor = m.end()
        closed = False
        while cursor < len(data):
            nl = data.find(b"\n", cursor)
            line = (data[cursor:] if nl < 0 else data[cursor:nl]).rstrip(b"\r")
            cursor = len(data) if nl < 0 else nl + 1
            stripped = line.strip()
            if stripped == b"end":
                closed = True
                break
            if stripped == b"`" or stripped == b"":
                # zero-length terminator line before "end"
                continue
            body += _decode_uu_line(line)
        if not closed:
            raise UuBroken("uu_truncated")
        files.append((name, bytes(body)))
        pos = cursor
    if not files:
        raise UuBroken("uu_truncated")
    return files


def build_uuencode(files: list[tuple[str, bytes]], mode: str = "644") -> bytes:
    """Fixture writer; cross-checked against ``binascii.b2a_uu``."""
    out = bytearray()
    for name, payload in files:
        out += b"begin %s %s\n" % (mode.encode(), name.encode())
        for i in range(0, len(payload), 45):
            chunk = payload[i:i + 45]
            line = bytearray([0x20 + len(chunk)])
            padded = chunk + b"\x00" * (-len(chunk) % 3)
            for j in range(0, len(padded), 3):
                acc = int.from_bytes(padded[j:j + 3], "big")
                for shift in (18, 12, 6, 0):
                    c = (acc >> shift) & 0x3F
                    line.append(0x60 if c == 0 else 0x20 + c)
            out += bytes(line) + b"\n"
        out += b"`\nend\n"
    return bytes(out)


# ---------------------------------------------------------------------------
# BinHex 4.0 (application/mac-binhex40)
# ---------------------------------------------------------------------------

_BINHEX_BANNER = b"must be converted with BinHex"
# the published BinHex 4.0 64-char alphabet
_HQX_ALPHABET = (
    b"!\"#$%&'()*+,-012345689@ABCDEFGHIJKLMNPQRSTUVXYZ[`abcdefhijklmpqr"
)
_HQX_REV = {c: i for i, c in enumerate(_HQX_ALPHABET)}


class BinhexBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_binhex(data: bytes) -> bool:
    return _BINHEX_BANNER in data[:1024]


def _hqx_crc(payload: bytes) -> int:
    """BinHex stream CRC: CRC-16/XMODEM over the bytes followed by two
    zero bytes (the classic hqx convention); ``binascii.crc_hqx`` is the
    independent stdlib kernel."""
    return binascii.crc_hqx(payload + b"\x00\x00", 0)


def _rle90_expand(data: bytes) -> bytes:
    """RLE90: ``0x90 n`` repeats the previous byte to n total copies;
    ``0x90 0x00`` is a literal 0x90."""
    out = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        if b == 0x90:
            if i + 1 >= len(data):
                raise BinhexBroken("binhex_truncated")
            n = data[i + 1]
            if n == 0:
                out.append(0x90)
            else:
                if not out:
                    raise BinhexBroken("binhex_truncated")
                out += bytes([out[-1]]) * (n - 1)
            i += 2
        else:
            out.append(b)
            i += 1
    return bytes(out)


def _rle90_compress(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        b = data[i]
        run = 1
        while i + run < len(data) and data[i + run] == b and run < 255:
            run += 1
        if b == 0x90:
            out += b"\x90\x00" * run
            i += run
        elif run >= 4:
            out += bytes([b, 0x90, run])
            i += run
        else:
            out.append(b)
            i += 1
    return bytes(out)


def parse_binhex(data: bytes) -> dict:
    """Full BinHex 4.0 decode -> {name, type, creator, flags, data,
    rsrc}; all three CRCs enforced."""
    pos = data.find(_BINHEX_BANNER)
    if pos < 0:
        raise BinhexBroken("binhex_truncated")
    colon = data.find(b":", pos)
    if colon < 0:
        raise BinhexBroken("binhex_truncated")
    acc = 0
    nbits = 0
    stream = bytearray()
    done = False
    for c in data[colon + 1:]:
        if c in (0x0A, 0x0D, 0x20, 0x09):
            continue
        if c == 0x3A:  # closing ':'
            done = True
            break
        v = _HQX_REV.get(c)
        if v is None:
            raise BinhexBroken("binhex_bad_char")
        acc = (acc << 6) | v
        nbits += 6
        if nbits >= 8:
            nbits -= 8
            stream.append((acc >> nbits) & 0xFF)
    if not done:
        raise BinhexBroken("binhex_truncated")
    raw = _rle90_expand(bytes(stream))

    if len(raw) < 22:
        raise BinhexBroken("binhex_truncated")
    nlen = raw[0]
    hdr_end = 1 + nlen + 1 + 4 + 4 + 2 + 4 + 4
    if len(raw) < hdr_end + 2:
        raise BinhexBroken("binhex_truncated")
    hdr = raw[:hdr_end]
    (hcrc,) = struct.unpack_from(">H", raw, hdr_end)
    if _hqx_crc(hdr) != hcrc:
        raise BinhexBroken("binhex_crc_mismatch")
    name = hdr[1:1 + nlen].decode("mac_roman", "replace")
    ftype = hdr[1 + nlen + 1:1 + nlen + 5]
    creator = hdr[1 + nlen + 5:1 + nlen + 9]
    (flags,) = struct.unpack_from(">H", hdr, 1 + nlen + 9)
    (dlen, rlen) = struct.unpack_from(">II", hdr, 1 + nlen + 11)

    p = hdr_end + 2
    if len(raw) < p + dlen + 2:
        raise BinhexBroken("binhex_truncated")
    dfork = raw[p:p + dlen]
    (dcrc,) = struct.unpack_from(">H", raw, p + dlen)
    if _hqx_crc(dfork) != dcrc:
        raise BinhexBroken("binhex_crc_mismatch")
    p += dlen + 2
    if len(raw) < p + rlen + 2:
        raise BinhexBroken("binhex_truncated")
    rfork = raw[p:p + rlen]
    (rcrc,) = struct.unpack_from(">H", raw, p + rlen)
    if _hqx_crc(rfork) != rcrc:
        raise BinhexBroken("binhex_crc_mismatch")
    return {
        "name": name,
        "type": ftype,
        "creator": creator,
        "flags": flags,
        "data": dfork,
        "rsrc": rfork,
    }


def build_binhex(name: str, data: bytes, rsrc: bytes = b"",
                 ftype: bytes = b"TEXT", creator: bytes = b"ttxt",
                 flags: int = 0) -> bytes:
    """Fixture writer: banner + 6-bit stream with the standard 64-char
    line wrap; round-trips through ``parse_binhex``."""
    nm = name.encode("mac_roman")
    hdr = bytes([len(nm)]) + nm + b"\x00" + ftype + creator
    hdr += struct.pack(">HII", flags, len(data), len(rsrc))
    raw = (hdr + struct.pack(">H", _hqx_crc(hdr))
           + data + struct.pack(">H", _hqx_crc(data))
           + rsrc + struct.pack(">H", _hqx_crc(rsrc)))
    packed = _rle90_compress(raw)
    acc = 0
    nbits = 0
    chars = bytearray()
    for b in packed:
        acc = (acc << 8) | b
        nbits += 8
        while nbits >= 6:
            nbits -= 6
            chars.append(_HQX_ALPHABET[(acc >> nbits) & 0x3F])
    if nbits:
        chars.append(_HQX_ALPHABET[(acc << (6 - nbits)) & 0x3F])
    body = b":" + bytes(chars) + b":"
    lines = [body[i:i + 64] for i in range(0, len(body), 64)]
    return (b"(This file must be converted with BinHex 4.0)\n\n"
            + b"\n".join(lines) + b"\n")


# ---------------------------------------------------------------------------
# AppleSingle / AppleDouble (application/applefile)
# ---------------------------------------------------------------------------

APPLESINGLE_MAGIC = 0x00051600
APPLEDOUBLE_MAGIC = 0x00051607
# entry ids (AppleSingle format spec, public)
_AS_DATA_FORK = 1
_AS_RSRC_FORK = 2
_AS_REAL_NAME = 3
_AS_FILE_DATES = 8
_AS_FINDER_INFO = 9

_MAC_EPOCH = datetime.datetime(2000, 1, 1, tzinfo=datetime.timezone.utc)


class AppleFileBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_applefile(data: bytes) -> bool:
    return (len(data) >= 8
            and struct.unpack_from(">I", data)[0] in (APPLESINGLE_MAGIC,
                                                      APPLEDOUBLE_MAGIC))


def parse_applefile(data: bytes) -> dict:
    """AppleSingle/AppleDouble entry walk -> {kind, name, data, rsrc,
    type, creator, date_created, date_modified}."""
    if len(data) < 26:
        raise AppleFileBroken("applefile_truncated")
    magic, version = struct.unpack_from(">II", data)
    if magic not in (APPLESINGLE_MAGIC, APPLEDOUBLE_MAGIC):
        raise AppleFileBroken("applefile_truncated")
    (count,) = struct.unpack_from(">H", data, 24)
    out = {
        "kind": "applesingle" if magic == APPLESINGLE_MAGIC else "appledouble",
        "version": version,
        "name": None, "data": None, "rsrc": None,
        "type": None, "creator": None,
        "date_created": None, "date_modified": None,
    }
    for i in range(count):
        off = 26 + i * 12
        if off + 12 > len(data):
            raise AppleFileBroken("applefile_truncated")
        eid, eoff, elen = struct.unpack_from(">III", data, off)
        if eoff + elen > len(data):
            raise AppleFileBroken("applefile_truncated")
        blob = data[eoff:eoff + elen]
        if eid == _AS_DATA_FORK:
            out["data"] = blob
        elif eid == _AS_RSRC_FORK:
            out["rsrc"] = blob
        elif eid == _AS_REAL_NAME:
            out["name"] = blob.decode("utf-8", "replace")
        elif eid == _AS_FILE_DATES and elen >= 8:
            create, modify = struct.unpack_from(">ii", blob)
            # 0x80000000 means "unknown" per the spec
            if create != -0x80000000:
                out["date_created"] = (
                    _MAC_EPOCH + datetime.timedelta(seconds=create)
                ).strftime("%Y-%m-%dT%H:%M:%SZ")
            if modify != -0x80000000:
                out["date_modified"] = (
                    _MAC_EPOCH + datetime.timedelta(seconds=modify)
                ).strftime("%Y-%m-%dT%H:%M:%SZ")
        elif eid == _AS_FINDER_INFO and elen >= 8:
            out["type"] = blob[0:4]
            out["creator"] = blob[4:8]
    return out


def build_applefile(name: str | None, data: bytes | None,
                    rsrc: bytes | None = None,
                    ftype: bytes = b"TEXT", creator: bytes = b"ttxt",
                    dates: tuple[int, int] | None = None,
                    double: bool = False) -> bytes:
    """Fixture writer for AppleSingle (or AppleDouble when
    ``double=True``, which by definition carries no data fork)."""
    entries: list[tuple[int, bytes]] = []
    if name is not None:
        entries.append((_AS_REAL_NAME, name.encode("utf-8")))
    if dates is not None:
        entries.append((_AS_FILE_DATES,
                        struct.pack(">iiii", dates[0], dates[1],
                                    -0x80000000, -0x80000000)))
    entries.append((_AS_FINDER_INFO, ftype + creator + b"\x00" * 24))
    if rsrc is not None:
        entries.append((_AS_RSRC_FORK, rsrc))
    if not double and data is not None:
        entries.append((_AS_DATA_FORK, data))
    magic = APPLEDOUBLE_MAGIC if double else APPLESINGLE_MAGIC
    hdr = struct.pack(">II16xH", magic, 0x00020000, len(entries))
    pos = 26 + 12 * len(entries)
    table = bytearray()
    payload = bytearray()
    for eid, blob in entries:
        table += struct.pack(">III", eid, pos, len(blob))
        payload += blob
        pos += len(blob)
    return hdr + bytes(table) + bytes(payload)
