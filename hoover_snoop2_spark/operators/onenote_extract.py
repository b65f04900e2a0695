"""OneNote (.one / .onetoc2) embedded-file extraction — public
[MS-ONESTORE] spec.

The reference Tika-parses ``application/onenote``
(``snoop/data/analyzers/_tika_mime_types.py:129-132``).  Full section
text requires the ONESTORE node-tree walk (revision manifests, object
spaces, property sets) — out of scope here, documented in COVERAGE.md.
What IS extracted natively: every embedded file payload, which
[MS-ONESTORE] §2.6.13 stores as a self-delimiting FileDataStoreObject:

    guidHeader {BDE316E7-2665-4511-A4C4-8D4D0B7A9EAC}
    cbLength   (u64 LE)   — FileData byte count
    unused     (u32)      +  reserved (u64)
    FileData   (cbLength bytes, zero-padded to an 8-byte boundary)
    guidFooter {71FBA722-0F79-4A0B-BB13-899256426B24}

Each payload becomes a child row; the magic sniffer recurses into it
(a PDF pasted into a notebook re-analyzes as a PDF).  A header GUID
whose length/footer don't check out is a typed ``onenote_truncated``
broken reason, never wrong bytes.

Self-verification: the fixture writer emits the same structure
independently of the scanner; round-trip + truncation/bit-flip fuzz in
``tests/test_onenote.py``.  The four GUID byte strings are the public
on-disk magics (header GUIDs are also how `file` identifies .one).
"""
from __future__ import annotations

import struct

# on-disk (mixed-endian) GUID byte forms
ONE_MAGIC = bytes.fromhex("e4525c7b8cd8a74daeb15378d02996d3")
ONETOC2_MAGIC = bytes.fromhex("a12fff43d9ef764c9ee210ea5722765f")
_FDSO_HEADER = bytes.fromhex("e716e3bd65261145a4c48d4d0b7a9eac")
# {71FBA722-0F79-4A0B-BB13-899256426B24} → Data1/2/3 LE + Data4 as-is
_FDSO_FOOTER = bytes.fromhex("22a7fb71790f0b4abb13899256426b24")


class OneNoteBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_onenote(data: bytes) -> bool:
    return data[:16] in (ONE_MAGIC, ONETOC2_MAGIC)


def onenote_kind(data: bytes) -> str:
    return "one" if data[:16] == ONE_MAGIC else "onetoc2"


def extract_onenote_files(data: bytes) -> list[tuple[str, bytes]]:
    """All FileDataStoreObject payloads -> [(name, bytes)] in stream
    order.  Names are positional (``embedded0`` ...) — ONESTORE keeps
    display names in the property tree, which is not walked here."""
    out: list[tuple[str, bytes]] = []
    pos = 0
    i = 0
    while True:
        pos = data.find(_FDSO_HEADER, pos)
        if pos < 0:
            break
        body = pos + 16
        if body + 20 > len(data):
            raise OneNoteBroken("onenote_truncated")
        (cb,) = struct.unpack_from("<Q", data, body)
        payload_at = body + 20
        if cb > len(data) - payload_at:
            raise OneNoteBroken("onenote_truncated")
        end = payload_at + cb
        padded = end + (-(end - payload_at) % 8)
        # the footer GUID sits right after the zero padding
        if data[padded:padded + 16] != _FDSO_FOOTER:
            # try the unpadded position too (zero-length padding)
            if data[end:end + 16] == _FDSO_FOOTER:
                padded = end
            else:
                raise OneNoteBroken("onenote_truncated")
        out.append((f"embedded{i}", bytes(data[payload_at:end])))
        i += 1
        pos = padded + 16
    return out


def build_onenote(embedded: list[bytes], kind: str = "one",
                  filler: bytes = b"") -> bytes:
    """Fixture writer: header magic + opaque filler + one
    FileDataStoreObject per payload (independent emitter for the
    scanner's round-trip check)."""
    out = bytearray(ONE_MAGIC if kind == "one" else ONETOC2_MAGIC)
    out += filler
    for payload in embedded:
        out += _FDSO_HEADER
        out += struct.pack("<QIQ", len(payload), 0, 0)
        out += payload
        out += b"\x00" * (-len(payload) % 8)
        out += _FDSO_FOOTER
    return bytes(out)
