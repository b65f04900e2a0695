"""MIME sniffing from raw bytes — a pure-Python, deterministic replacement
for the reference's libmagic subprocess wrapper + custom overrides
(reference: snoop/data/magic.py:18-191).

The reference shells out to ``file --mime-type --mime-encoding -kbpL`` and
then applies three hand-rolled overrides because libmagic misdetects email
formats (magic.py:91-111):

- RFC-822 check: >= 2 of 9 well-known headers in the first 64 KiB
  (magic.py:114-138),
- emlx check: first line is all digits (magic.py:141-152),
- mbox check: >= 3 complete header-pattern groups (magic.py:155-191),
- PST / OLE overrides from magic output strings (magic.py:106-111).

Here the base detection is a magic-byte signature table (public file-format
magic numbers) plus a text/binary heuristic; the three email overrides are
reimplemented bit-exactly over bytes.  No subprocess, no filesystem — the
whole sniff runs inside an Arrow batch.
"""

from __future__ import annotations

import re
import struct

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# ---------------------------------------------------------------------------
# magic-byte signature table (prefix, offset, mime type)
# ---------------------------------------------------------------------------

_SIGNATURES: list[tuple[int, bytes, str]] = [
    (0, b"%PDF-", "application/pdf"),
    (0, b"{\\rtf", "application/rtf"),
    (0, b"PK\x03\x04", "application/zip"),
    (0, b"PK\x05\x06", "application/zip"),  # empty archive
    (0, b"\x1f\x8b", "application/gzip"),
    (0, b"BZh", "application/x-bzip2"),
    (0, b"\xfd7zXZ\x00", "application/x-xz"),
    (0, b"7z\xbc\xaf\x27\x1c", "application/x-7z-compressed"),
    (0, b"Rar!\x1a\x07", "application/x-rar"),
    (257, b"ustar", "application/x-tar"),
    (0, b"\x89PNG\r\n\x1a\n", "image/png"),
    (0, b"\xff\xd8\xff", "image/jpeg"),
    (0, b"GIF87a", "image/gif"),
    (0, b"GIF89a", "image/gif"),
    (0, b"RIFF", "application/x-riff"),
    (0, b"OggS", "audio/ogg"),
    (0, b"ID3", "audio/mpeg"),
    (0, b"fLaC", "audio/x-flac"),
    (0, b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", "application/x-ole-storage"),
    (0, b"!BDN", "application/x-hoover-pst"),  # PST magic
    (0, b"SQLite format 3\x00", "application/vnd.sqlite3"),
    (0, b"\x78\x9f\x3e\x22", "application/vnd.ms-tnef"),  # winmail.dat
    (0, b"\x00\x05\x16\x00", "application/applefile"),  # AppleSingle
    (0, b"\x00\x05\x16\x07", "application/applefile"),  # AppleDouble
    (0, b"\x7fELF", "application/x-elf"),  # refined below (Tika :874/:999)
    # WordPerfect (Tika :773-776): detection + typed refusal — the
    # WP5/6 fixed-length function-size tables could not be sourced and
    # self-verified here (the VP8/mpbbS standard)
    (0, b"\xffWPC", "application/vnd.wordperfect"),
    (0, b"#!AMR-WB\n", "audio/amr-wb"),  # Tika :1059
    (0, b"#!AMR\n", "audio/amr"),  # Tika :1058
    (0, b"FORM", "application/x-iff"),  # refined below (AIFF Tika :1179)
    (0, b".snd", "audio/basic"),  # Sun AU (Tika :1062)
    (0, b"MThd", "audio/midi"),  # Standard MIDI (Tika :1107)
    # Microsoft Cabinet (Tika list :496; reference 7z ext set
    # archives.py:43)
    (0, b"MSCF\x00\x00\x00\x00", "application/vnd.ms-cab-compressed"),
    # CHM / ITSS compiled help (Tika list :509)
    (0, b"ITSF\x03\x00\x00\x00", "application/vnd.ms-htmlhelp"),
    # PCX headers: 0x0A + version + RLE flag (image/vnd.zbrush.pcx,
    # Tika list :1250); only the RLE=1 variants are distinctive enough
    (0, b"\x0a\x00\x01", "image/vnd.zbrush.pcx"),
    (0, b"\x0a\x02\x01", "image/vnd.zbrush.pcx"),
    (0, b"\x0a\x03\x01", "image/vnd.zbrush.pcx"),
    (0, b"\x0a\x04\x01", "image/vnd.zbrush.pcx"),
    (0, b"\x0a\x05\x01", "image/vnd.zbrush.pcx"),
    # snappy framing stream identifier (Tika list :1004)
    (0, b"\xff\x06\x00\x00sNaPpY", "application/x-snappy-framed"),
    # StuffIt archives (Tika list :1015-1016); codecs proprietary, so
    # extraction is a typed refusal like compressed RAR members
    (0, b"StuffIt (c)1997-", "application/x-stuffit"),
    (0, b"SIT!", "application/x-stuffit"),
    # Lotus 1-2-3 WK1: BOF record + revision word (Tika list :452)
    (0, b"\x00\x00\x02\x00\x04\x04", "application/vnd.lotus-1-2-3"),
    (0, b"\x00\x00\x02\x00\x05\x04", "application/vnd.lotus-1-2-3"),
    (0, b"\x00\x00\x02\x00\x06\x04", "application/vnd.lotus-1-2-3"),
    # OneNote on-disk header GUIDs ([MS-ONESTORE]; Tika list :129-132)
    (0, bytes.fromhex("e4525c7b8cd8a74daeb15378d02996d3"),
     "application/onenote"),  # .one
    (0, bytes.fromhex("a12fff43d9ef764c9ee210ea5722765f"),
     "application/onenote"),  # .onetoc2
    # classic Unix containers — all 7z-accepted in the reference
    # (archives.py:41-55), unpacked natively by operators/unix_archives
    (0, b"070701", "application/x-cpio"),  # cpio newc
    (0, b"070702", "application/x-cpio"),  # cpio newc+crc
    (0, b"070707", "application/x-cpio"),  # cpio odc (ASCII octal)
    (0, b"\xc7\x71", "application/x-cpio"),  # cpio old binary (LE)
    (0, b"!<arch>\n", "application/x-archive"),  # ar / .deb / .a
    (0, b"\xed\xab\xee\xdb", "application/x-rpm"),
    (0, b"\x1f\x9d", "application/x-compress"),  # compress(1) .Z
    (0, b"\x28\xb5\x2f\xfd", "application/zstd"),  # RFC 8878
    (0, b"\x04\x22\x4d\x18", "application/x-lz4"),  # lz4 frame magic
    (0, b"\x02\x21\x4c\x18", "application/x-lz4"),  # lz4 legacy (-l)
    (0, b"\x7fELF", "application/x-executable"),
    (0, b"MZ", "application/x-dosexec"),
]

#: first-byte dispatch over _SIGNATURES (r6): the linear table scan ran
#: ~50 slice-compares per sniff, nearly all of them impossible given the
#: first byte.  For each possible first byte, keep — in original table
#: order — only the entries that could match: offset-0 signatures whose
#: first byte agrees, plus every non-zero-offset signature (which does
#: not constrain byte 0).  First-match-wins order is preserved exactly,
#: so the dispatch is behavior-identical to the full scan (pinned by
#: test_magic's differential sweep).
_SIG_DISPATCH: tuple[tuple[tuple[int, bytes, str], ...], ...] = tuple(
    tuple(
        (offset, sig, mt)
        for offset, sig, mt in _SIGNATURES
        if offset != 0 or (sig and sig[0] == b)
    )
    for b in range(256)
)

_HTML_PAT = re.compile(
    rb"^\s*(?:<!doctype\s+html|<html|<head|<body|<!--|<\?xml)", re.IGNORECASE
)

_SVG_SKIP = re.compile(
    rb"\s+|<\?.*?\?>|<!--.*?-->|<!DOCTYPE[^>]*>", re.DOTALL | re.IGNORECASE
)


def svg_root_tag(data: bytes) -> bytes | None:
    """The root ``<svg ...>`` tag bytes when the document's ROOT element
    is svg (after BOM / XML declaration / comments / doctype) — inline
    <svg> islands inside HTML do NOT match.  None otherwise."""
    head = data[:4096]
    if head[:3] == b"\xef\xbb\xbf":
        head = head[3:]
    pos = 0
    while True:
        m = _SVG_SKIP.match(head, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
    m = re.match(rb"<svg[\s>]", head[pos:], re.IGNORECASE)
    if not m:
        return None
    end = head.find(b">", pos)
    return head[pos:end + 1] if end >= 0 else head[pos:]

# --- email override heuristics (magic.py:114-191 semantics, over bytes) ----

_HEADER_SET = {
    "Relay-Version", "Return-Path", "From", "To",
    "Received", "Message-Id", "Date", "In-Reply-To", "Subject",
}
_HEADER_MIN_HIT_COUNT = 2
_HEADER_READ_SIZE = 64 * 1024

_MBOX_PATTERNS = (b"From ", b"From: ", b"Date: ", b"Subject: ", b"")
_MBOX_MINIMUM_EMAILS = 3


def looks_like_email(data: bytes) -> bool:
    """>= 2 of 9 usual headers in the first 64 KiB (magic.py:114-138)."""
    content = data[:_HEADER_READ_SIZE].decode("latin-1")
    headers_found = {
        s.split(":")[0].strip().title() for s in content.splitlines() if ":" in s
    }
    return len(headers_found & _HEADER_SET) >= _HEADER_MIN_HIT_COUNT


def looks_like_emlx(data: bytes) -> bool:
    """Apple emlx: first line of the 20-byte prefix is all digits
    (magic.py:141-152)."""
    content = data[:20].decode("latin-1")
    lines = content.splitlines()
    return bool(lines) and lines[0].strip().isdigit()


def looks_like_mbox(data: bytes) -> bool:
    """Count complete groups of the five mbox header patterns; >= 3 groups
    means mbox (magic.py:155-191).  The empty pattern matches blank lines."""
    emails = 0
    pending = set(_MBOX_PATTERNS)
    for line in data.split(b"\n"):
        line = line.rstrip(b"\r")
        for pattern in pending:
            if (line == b"" and pattern == b"") or (pattern and line.startswith(pattern)):
                pending.remove(pattern)
                break
        if not pending:
            pending = set(_MBOX_PATTERNS)
            emails += 1
            if emails >= _MBOX_MINIMUM_EMAILS:
                return True
    return False


# ---------------------------------------------------------------------------
# encoding detection (libmagic mime_encoding analog; chardet is unavailable
# in this environment so the reference's 4 KiB probe + 0.7-confidence rule
# (digests.py:152-168) degrades to this deterministic ladder)
# ---------------------------------------------------------------------------


def detect_mime_encoding(data: bytes) -> str:
    if not data:
        return "binary"
    probe = data[:4096]
    if probe.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    if probe.startswith(b"\xff\xfe") or probe.startswith(b"\xfe\xff"):
        return "utf-16"
    if b"\x00" in probe:
        return "binary"
    try:
        probe.decode("ascii")
        return "us-ascii"
    except UnicodeDecodeError:
        pass
    try:
        # avoid mis-judging a multi-byte char split at the probe boundary
        probe[: len(probe) - 3 if len(probe) == 4096 else len(probe)].decode("utf-8")
        return "utf-8"
    except UnicodeDecodeError:
        return "iso-8859-1"


def decode_for_probe(data: bytes) -> str | None:
    """Decode bytes with the detected encoding (errors='replace'), the same
    fallback chain as the reference's read_text (digests.py:171-200)."""
    enc = detect_mime_encoding(data)
    if enc == "binary":
        return None
    if enc == "utf-16":
        return data.decode("utf-16", errors="replace")
    if enc == "us-ascii":
        return data.decode("ascii", errors="replace")
    if enc == "utf-8":
        # utf-8-sig: strip a leading BOM (no-op otherwise) so U+FEFF
        # never reaches text probes — consistent with the utf-16 rung
        return data.decode("utf-8-sig", errors="replace")
    return data.decode("iso-8859-1", errors="replace")


# ---------------------------------------------------------------------------
# the sniffer
# ---------------------------------------------------------------------------


def sniff_bytes(data: bytes | None) -> tuple[str, str]:
    """Return (mime_type, mime_encoding) for raw bytes.

    Mirrors Magic.__init__ (magic.py:86-111): base detection, then the
    email/emlx/mbox override chain, then PST/OLE rewrites.
    """
    if not data:
        return "inode/x-empty", "binary"

    mime_type = ""
    # two-range RIFF refinement: WEBP before the generic RIFF table entry
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        mime_type = "image/webp"
    # ISO-BMFF brand dispatch (box size precedes the ftyp fourcc, so the
    # signature table's fixed-offset prefixes can't express this)
    elif len(data) >= 12 and data[4:8] == b"ftyp":
        brand = data[8:12]
        if brand in (b"avif", b"avis"):
            mime_type = "image/avif"
        elif brand in (b"heic", b"heix", b"mif1", b"msf1"):
            mime_type = "image/heic"
        elif brand == b"qt  ":
            mime_type = "video/quicktime"
        else:
            mime_type = "video/mp4"
    # bare MPEG-audio sync (no ID3 tag): demand a fully valid Layer III
    # header so random 0xFF-leading binaries don't sniff as audio
    elif (
        len(data) >= 4 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0
        and (data[1] >> 3) & 0x3 != 0b01        # version not reserved
        and (data[1] >> 1) & 0x3 == 0b01        # layer III
        and (data[2] >> 4) not in (0, 15)       # bitrate index valid
        and (data[2] >> 2) & 0x3 != 3           # sample-rate index valid
    ):
        mime_type = "audio/mpeg"
    # ADTS AAC: same 0xFFF sync but layer bits 00 and a valid
    # sampling-frequency index (Tika :1177); disjoint from Layer III
    elif (
        len(data) >= 7 and data[0] == 0xFF and (data[1] & 0xF6) == 0xF0
        and ((data[2] >> 2) & 0xF) < 13
    ):
        mime_type = "audio/x-aac"
    if not mime_type:
        for offset, sig, mt in _SIG_DISPATCH[data[0]]:
            if data[offset : offset + len(sig)] == sig:
                mime_type = mt
                break

    encoding = detect_mime_encoding(data)

    if not mime_type and data[:1] == b"d":
        # bencoded metainfo dict (Tika list :842); the gate is a FULL
        # bencode parse so prose starting with 'd' can't match
        from ..operators.torrent_extract import looks_like_torrent

        if looks_like_torrent(data):
            mime_type = "application/x-bittorrent"

    if not mime_type:
        # SVG roots outrank the generic html/xml heuristic (an XML decl
        # followed by <svg> is an image, not a web page); inline <svg>
        # inside HTML does not match the root check
        if svg_root_tag(data) is not None:
            mime_type = "image/svg+xml"
        elif _HTML_PAT.match(data[:1024]):
            mime_type = "text/html"
        elif encoding != "binary":
            mime_type = "text/plain"
        elif data[-18:] == b"TRUEVISION-XFILE.\x00":
            # TGA 2.0 footer — the only reliable TGA magic (Tika :1290)
            mime_type = "image/x-tga"
        else:
            # dBase has no fixed magic — structural geometry check
            # (Tika-accepted application/x-dbf, _tika_mime_types.py:863)
            from ..operators.dbf_extract import looks_like_dbf

            if looks_like_dbf(data):
                mime_type = "application/x-dbf"
            else:
                mime_type = "application/octet-stream"

    # calendar / contact text formats — both Tika-accepted in the
    # reference (_tika_mime_types.py:1350,1469-1470); the mandatory
    # BEGIN: first content line is the magic
    if mime_type == "text/plain":
        head = data[:64].lstrip(b"\xef\xbb\xbf \t\r\n").upper()
        if head.startswith(b"BEGIN:VCALENDAR"):
            return "text/calendar", encoding
        if head.startswith(b"BEGIN:VCARD"):
            return "text/x-vcard", encoding

    # email overrides — applied when base detection says text or nothing
    # (magic.py:91-103)
    should_check_email = mime_type.startswith("text/") or not mime_type
    if should_check_email and looks_like_email(data):
        if looks_like_emlx(data):
            mime_type = "message/x-emlx"
        elif looks_like_mbox(data):
            mime_type = "application/mbox"
        else:
            mime_type = "message/rfc822"

    # legacy transfer encodings — both Tika-accepted in the reference
    # (_tika_mime_types.py:1465 text/x-uuencode, :86 mac-binhex40);
    # refined AFTER the email overrides so an rfc822 message whose BODY
    # carries a uu block stays message/rfc822
    if mime_type == "text/plain":
        from ..operators.legacy_encodings import (
            looks_like_binhex,
            looks_like_uuencode,
        )

        if looks_like_binhex(data):
            mime_type = "application/mac-binhex40"
        elif looks_like_uuencode(data):
            mime_type = "text/x-uuencode"

    # IFF FORM refinement: AIFF/AIFC are audio (Tika :1179)
    if mime_type == "application/x-iff" and data[8:12] in (b"AIFF", b"AIFC"):
        mime_type = "audio/x-aiff"

    # ELF type refinement: ET_DYN shared objects get their own Tika
    # mime (:999); endianness per EI_DATA
    if mime_type == "application/x-elf" and len(data) >= 18:
        endian = "<" if data[5] == 1 else ">"
        (e_type,) = struct.unpack_from(endian + "H", data, 16)
        if e_type == 3:
            mime_type = "application/x-sharedlib"

    # MZ with a real PE chain refines to the Tika-accepted PE mime
    # (:939-942); bare DOS stubs stay x-dosexec
    if mime_type == "application/x-dosexec":
        from ..operators.pe_extract import looks_like_pe

        if looks_like_pe(data):
            mime_type = "application/x-msdownload"

    # OLE → treat as legacy excel, like the reference (magic.py:110-111)
    if mime_type == "application/x-ole-storage":
        mime_type = "application/vnd.ms-excel"

    if mime_type in ("application/pdf", "application/zip", "image/png",
                     "image/jpeg", "image/gif"):
        encoding = "binary"

    return mime_type, encoding


_SNIFF_SCHEMA = StructType(
    [
        StructField("mime_type", StringType()),
        StructField("mime_encoding", StringType()),
    ]
)


@F.pandas_udf(_SNIFF_SCHEMA)
def sniff_udf(data: pd.Series) -> pd.DataFrame:
    out = [sniff_bytes(b) for b in data]
    return pd.DataFrame(out, columns=["mime_type", "mime_encoding"])
