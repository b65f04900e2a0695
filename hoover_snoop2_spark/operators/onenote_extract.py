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


# ---------------------------------------------------------------------------
# [MS-ONESTORE] node-tree walk — the notebook's OWN text (round 5)
# ---------------------------------------------------------------------------
#
# Structure: Header(1024, fcrFileNodeListRoot @172 as {stp u64, cb u32})
# → FileNodeListFragment chain (uintMagic / footer magics, nextFragment
# FileChunkReference64x32 in the last 20 bytes) → FileNode stream
# (header u32: id:10 size:13 stpFormat:2 cbFormat:2 baseType:4) —
# BaseType 2 nodes reference child lists (object-space manifests,
# revision manifest lists, object groups), BaseType 1 object
# declarations reference ObjectSpaceObjectPropSet blobs (OID/OSID/
# ContextID CompactID streams + a PropertySet of 26-bit ids with 5-bit
# types).  Text is harvested from prtFourBytesOfLengthFollowedByData
# (type 0x7) properties whose payload is clean, mostly-printable
# UTF-16LE — the representation [MS-ONE] RichEditTextUnicode uses —
# rather than trusting any single property-id constant.
#
# Posture: best-effort and FAIL-LOUD.  Any structural inconsistency
# (bad magic, out-of-range chunk reference, short read) aborts the walk
# and the caller falls back to the embedded-file scan only — a
# misremembered constant can cost recall on real notebooks, never
# precision (wrong bytes surfaced as text).  Self-verification:
# ``build_onenote_section`` emits the same structures independently and
# round-trips in tests/test_onenote.py.

_FNL_MAGIC = 0xA4567AB1F5F7F4C4
_FNL_FOOTER = 0x8BC215C38233BA4B
_FCR_ROOT_OFFSET = 172
_CHUNK_TERMINATOR = 0x0FF
#: object-declaration FileNode ids whose first field is a blob ref to an
#: ObjectSpaceObjectPropSet ([MS-ONESTORE] §2.5)
_OBJ_DECL_IDS = frozenset({0x02D, 0x02E, 0x0A4, 0x0A5, 0x0C4, 0x0C5})
_MAX_LISTS = 4096
_MAX_DEPTH = 32


def _read_chunk_ref(data: bytes, pos: int, stp_fmt: int,
                    cb_fmt: int) -> tuple[int, int, int]:
    """FileNodeChunkReference → (stp, cb, new_pos)."""
    if stp_fmt == 0:
        (stp,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    elif stp_fmt == 1:
        (stp,) = struct.unpack_from("<I", data, pos)
        pos += 4
    elif stp_fmt == 2:
        (stp,) = struct.unpack_from("<H", data, pos)
        stp *= 8
        pos += 2
    else:
        (stp,) = struct.unpack_from("<I", data, pos)
        stp *= 8
        pos += 4
    if cb_fmt == 0:
        (cb,) = struct.unpack_from("<I", data, pos)
        pos += 4
    elif cb_fmt == 1:
        (cb,) = struct.unpack_from("<Q", data, pos)
        pos += 8
    elif cb_fmt == 2:
        cb = data[pos] * 8
        pos += 1
    else:
        (cb,) = struct.unpack_from("<H", data, pos)
        cb *= 8
        pos += 2
    return stp, cb, pos


def _iter_file_nodes(data: bytes, stp: int, cb: int, seen: set,
                     depth: int = 0):
    """Yield (node_id, base_type, ref_stp, ref_cb) across a fragment
    chain, recursing into BaseType-2 child lists depth-first (stream
    order)."""
    if depth > _MAX_DEPTH or len(seen) > _MAX_LISTS:
        raise OneNoteBroken("onenote_truncated")
    while True:
        if stp in seen:
            return
        seen.add(stp)
        if cb < 36 or stp + cb > len(data):
            raise OneNoteBroken("onenote_truncated")
        (magic,) = struct.unpack_from("<Q", data, stp)
        if magic != _FNL_MAGIC:
            raise OneNoteBroken("onenote_truncated")
        (footer,) = struct.unpack_from("<Q", data, stp + cb - 8)
        if footer != _FNL_FOOTER:
            raise OneNoteBroken("onenote_truncated")
        pos = stp + 16
        end = stp + cb - 20
        while pos + 4 <= end:
            (h,) = struct.unpack_from("<I", data, pos)
            if h == 0:
                break
            node_id = h & 0x3FF
            size = (h >> 10) & 0x1FFF
            stp_fmt = (h >> 23) & 3
            cb_fmt = (h >> 25) & 3
            base_type = (h >> 27) & 0xF
            if node_id == _CHUNK_TERMINATOR:
                break
            if size < 4 or pos + size > end:
                raise OneNoteBroken("onenote_truncated")
            if base_type in (1, 2):
                ref_stp, ref_cb, _ = _read_chunk_ref(
                    data, pos + 4, stp_fmt, cb_fmt)
                if base_type == 2:
                    nil = (stp_fmt in (0, 2, 3)
                           and ref_stp in (0xFFFFFFFFFFFFFFFF,
                                           0xFFFFFFFF * 8)) or \
                          (stp_fmt == 1 and ref_stp == 0xFFFFFFFF)
                    if not nil and ref_cb:
                        yield from _iter_file_nodes(
                            data, ref_stp, ref_cb, seen, depth + 1)
                else:
                    yield node_id, base_type, ref_stp, ref_cb
            else:
                yield node_id, base_type, None, None
            pos += size
        # nextFragment FileChunkReference64x32 in the last 20 bytes
        nstp, ncb = struct.unpack_from("<QI", data, stp + cb - 20)
        if nstp in (0, 0xFFFFFFFFFFFFFFFF) or ncb == 0:
            return
        stp, cb = nstp, ncb


def _skip_compact_id_stream(blob: bytes, pos: int) -> tuple[int, bool]:
    """ObjectSpaceObjectStreamOf{OIDs,OSIDs,ContextIDs} → (new_pos,
    extended_streams_present)."""
    (h,) = struct.unpack_from("<I", blob, pos)
    count = h & 0xFFFFFF
    extended = bool(h & (1 << 30))
    pos += 4 + 4 * count
    if pos > len(blob):
        raise OneNoteBroken("onenote_truncated")
    return pos, extended, bool(h & (1 << 31))


def _harvest_property_set(blob: bytes, pos: int,
                          out: list[str], depth: int = 0) -> int:
    """PropertySet at pos → new pos; type-0x7 UTF-16 payloads → out."""
    if depth > 8:
        raise OneNoteBroken("onenote_truncated")
    (n_props,) = struct.unpack_from("<H", blob, pos)
    pos += 2
    prids = []
    for _ in range(n_props):
        (prid,) = struct.unpack_from("<I", blob, pos)
        prids.append(prid)
        pos += 4
    for prid in prids:
        ptype = (prid >> 26) & 0x1F
        if ptype in (0x1, 0x2, 0x8, 0xA, 0xC):
            continue
        if ptype == 0x3:
            pos += 1
        elif ptype == 0x4:
            pos += 2
        elif ptype in (0x5, 0x9, 0xB, 0xD):
            pos += 4
        elif ptype == 0x6:
            pos += 8
        elif ptype == 0x7:
            (n,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            if pos + n > len(blob):
                raise OneNoteBroken("onenote_truncated")
            payload = blob[pos:pos + n]
            pos += n
            text = _as_utf16_text(payload)
            if text:
                out.append(text)
        elif ptype == 0x10:
            (n,) = struct.unpack_from("<I", blob, pos)
            pos += 4
            if n:
                pos += 4  # inner PropertyID (type 0x11)
                for _ in range(n):
                    pos = _harvest_property_set(blob, pos, out, depth + 1)
        elif ptype == 0x11:
            pos = _harvest_property_set(blob, pos, out, depth + 1)
        else:
            raise OneNoteBroken("onenote_truncated")
        if pos > len(blob):
            raise OneNoteBroken("onenote_truncated")
    return pos


def _as_utf16_text(payload: bytes) -> str:
    """UTF-16LE if it decodes strictly and is ≥90% printable — the
    RichEditTextUnicode representation — else ''."""
    if len(payload) < 4 or len(payload) % 2:
        return ""
    try:
        text = payload.decode("utf-16-le")
    except UnicodeDecodeError:
        return ""
    text = text.rstrip("\x00")
    if not text:
        return ""
    printable = sum(1 for c in text if c.isprintable() or c in "\n\r\t")
    if printable / len(text) < 0.9:
        return ""
    return text


def extract_onenote_text(data: bytes) -> str:
    """Best-effort notebook text via the ONESTORE node-tree walk;
    returns '' when the structure doesn't parse (caller keeps the
    embedded-file children either way — recall-only degradation)."""
    if len(data) < 1024 or data[:16] != ONE_MAGIC:
        return ""
    try:
        stp, cb = struct.unpack_from("<QI", data, _FCR_ROOT_OFFSET)
        if stp in (0, 0xFFFFFFFFFFFFFFFF) or cb == 0 \
                or stp + cb > len(data):
            return ""
        texts: list[str] = []
        seen: set = set()
        for node_id, base_type, ref_stp, ref_cb in _iter_file_nodes(
                data, stp, cb, seen):
            if base_type != 1 or node_id not in _OBJ_DECL_IDS:
                continue
            if ref_cb == 0 or ref_stp + ref_cb > len(data):
                continue
            blob = data[ref_stp:ref_stp + ref_cb]
            try:
                pos, extended, osid_absent = _skip_compact_id_stream(blob, 0)
                if not osid_absent:
                    pos, ext2, _ = _skip_compact_id_stream(blob, pos)
                    if ext2:
                        pos, _, _ = _skip_compact_id_stream(blob, pos)
                _harvest_property_set(blob, pos, texts)
            except (OneNoteBroken, struct.error, IndexError):
                continue  # not a prop-set blob (or a variant we refuse)
        return "\n".join(t for t in texts if t)
    except (OneNoteBroken, struct.error, IndexError, ValueError):
        return ""


def _file_node(node_id: int, base_type: int, body: bytes,
               stp_fmt: int = 0, cb_fmt: int = 0) -> bytes:
    size = 4 + len(body)
    h = (node_id | (size << 10) | (stp_fmt << 23) | (cb_fmt << 25)
         | (base_type << 27))
    return struct.pack("<I", h) + body


def _fragment(nodes: list[bytes]) -> bytes:
    body = b"".join(nodes) + _file_node(_CHUNK_TERMINATOR, 0, b"")
    out = struct.pack("<QII", _FNL_MAGIC, 1, 0) + body
    out += struct.pack("<QI", 0xFFFFFFFFFFFFFFFF, 0)  # fcrNil next
    out += struct.pack("<Q", _FNL_FOOTER)
    return out


def build_onenote_section(texts: list[str],
                          embedded: list[bytes] = ()) -> bytes:
    """Fixture writer for the node-tree walk: header →
    ObjectSpaceManifestListReferenceFND → RevisionManifestListReference
    → revision manifest with one ObjectDeclaration2RefCountFND per text
    (each referencing an ObjectSpaceObjectPropSet whose single property
    is prtFourBytesOfLengthFollowedByData UTF-16LE).  Independent
    emitter for the reader's round-trip check; ``embedded`` payloads
    are appended as FileDataStoreObjects as in :func:`build_onenote`."""
    out = bytearray(1024)
    out[:16] = ONE_MAGIC

    # property-set blobs first (their offsets feed the object decls)
    blob_refs = []
    for text in texts:
        payload = text.encode("utf-16-le")
        blob = struct.pack("<I", 1 << 31)          # 0 OIDs, no OSID stream
        blob += struct.pack("<H", 1)               # one property
        blob += struct.pack("<I", (0x7 << 26) | 0x00001C)
        blob += struct.pack("<I", len(payload)) + payload
        blob_refs.append((len(out), len(blob)))
        out += blob

    decls = []
    for stp, cb in blob_refs:
        body = struct.pack("<QI", stp, cb) + bytes(9)  # ref + opaque body
        decls.append(_file_node(0x0A4, 1, body))
    rev_list = _fragment(
        [_file_node(0x01E, 0, bytes(46))] + decls
        + [_file_node(0x01C, 0, b"")]
    )
    rev_stp = len(out)
    out += rev_list

    child = _fragment(
        [_file_node(0x010, 2, struct.pack("<QI", rev_stp, len(rev_list)))]
    )
    child_stp = len(out)
    out += child

    root = _fragment(
        [_file_node(0x008, 2,
                    struct.pack("<QI", child_stp, len(child)) + bytes(20))]
    )
    root_stp = len(out)
    out += root

    struct.pack_into("<QI", out, _FCR_ROOT_OFFSET, root_stp, len(root))
    for payload in embedded:
        out += _FDSO_HEADER
        out += struct.pack("<QIQ", len(payload), 0, 0)
        out += payload
        out += b"\x00" * (-len(payload) % 8)
        out += _FDSO_FOOTER
    return bytes(out)


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
