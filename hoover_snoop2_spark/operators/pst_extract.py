"""Outlook PST mailbox unpacking — a read-only [MS-PST] subset over raw
bytes, emitting one ``folder/N.eml`` child per message.

The reference shells PSTs out to ``readpst`` (archives.py:155-170, task
``pst-5``; mime ``application/x-hoover-pst`` set by its magic rewrite) and
re-walks the extracted directory of .eml files.  Here the format is parsed
directly from the public [MS-PST] spec:

- NDB layer: Unicode (wVer >= 23, 64-bit) AND ANSI (wVer 14/15, 32-bit)
  headers → ROOT BREFs → Node BTree (NBT) and Block BTree (BBT) page
  walks; data trees (XBLOCK/XXBLOCK) and subnode BTrees (SLBLOCK/SIBLOCK)
  resolved per node with format-aware entry widths.
- LTP layer: Heap-on-Node (HN) page map → BTH → Property Context (PC);
  variable-length values through HID (heap) or NID (subnode) indirection.
- Messaging layer: every NBT node of type NID_TYPE_NORMAL_MESSAGE becomes
  an RFC-822 child assembled from its PC properties (subject, sender,
  display-to, client-submit time, plain body); folder display names from
  the parent chain give the child path, mirroring readpst's
  folder-directory layout.

Crypt: NDB_CRYPT_NONE and NDB_CRYPT_PERMUTE (Outlook's default
"compressible encryption", [MS-PST] §5.1 — a fixed byte substitution over
external data blocks) both decode; the mpbbR table is embedded with a
permutation self-check and the decrypt table is computed as its inverse.

Deliberate limits (all surfaced as broken reasons, never silent):
- bCryptMethod CYCLIC (the §5.2 rolling-key cipher needs the mpbbS
  table, which could not be sourced-and-verified like mpbbR) →
  ``pst_crypt_unsupported``;
- BTH index levels (bIdxLevels > 0 — beyond what mailbox-scale PCs use)
  → ``pst_parse_error``.  Multi-block heaps ARE supported: HIDs address
  (block index, item index) and data-tree block boundaries are kept.
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta, timezone

HOOVER_PST_MIME = "application/x-hoover-pst"

_MAGIC = b"!BDN"

NID_TYPE_NORMAL_FOLDER = 0x02
NID_TYPE_NORMAL_MESSAGE = 0x04
NID_TYPE_ATTACHMENT = 0x05

PT_LONG = 0x0003
PT_BOOLEAN = 0x000B
PT_UNICODE = 0x001F
PT_STRING8 = 0x001E
PT_SYSTIME = 0x0040
PT_BINARY = 0x0102

PR_SUBJECT = 0x0037
PR_CLIENT_SUBMIT_TIME = 0x0039
PR_SENDER_NAME = 0x0C1A
PR_SENDER_EMAIL = 0x0C1F
PR_DISPLAY_TO = 0x0E04
PR_BODY = 0x1000
PR_DISPLAY_NAME = 0x3001
PR_ATTACH_DATA = 0x3701        # PidTagAttachDataBinary
PR_ATTACH_FILENAME = 0x3704    # PidTagAttachFilename (8.3 short name)
PR_ATTACH_LONG_FILENAME = 0x3707  # PidTagAttachLongFilename
PR_ATTACH_MIME_TAG = 0x370E    # PidTagAttachMimeTag

#: FILETIME epoch (1601-01-01) in 100 ns ticks
_FILETIME_EPOCH = datetime(1601, 1, 1, tzinfo=timezone.utc)

#: NDB_CRYPT_PERMUTE ([MS-PST] §5.1): Outlook's DEFAULT "compressible
#: encryption" is a fixed byte substitution.  This is the spec's mpbbR
#: table (encrypt direction); decrypt applies its inverse permutation.
#: Self-check: the table must be an exact permutation of 0..255 — asserted
#: below, so a transcription error cannot silently corrupt extractions.
_MPBB_R = bytes([
     71, 241, 180, 230,  11, 106, 114,  72, 133,  78, 158, 235, 226, 248, 148,  83,
    224, 187, 160,   2, 232,  90,   9, 171, 219, 227, 186, 198, 124, 195,  16, 221,
     57,   5, 150,  48, 245,  55,  96, 130, 140, 201,  19,  74, 107,  29, 243, 251,
    143,  38, 151, 202, 145,  23,   1, 196,  50,  45, 110,  49, 149, 255, 217,  35,
    209,   0,  94, 121, 220,  68,  59,  26,  40, 197,  97,  87,  32, 144,  61, 131,
    185,  67, 190, 103, 210,  70,  66, 118, 192, 109,  91, 126, 178,  15,  22,  41,
     60, 169,   3,  84,  13, 218,  93, 223, 246, 183, 199,  98, 205, 141,   6, 211,
    105,  92, 134, 214,  20, 247, 165, 102, 117, 172, 177, 233,  69,  33, 112,  12,
    135, 159, 116, 164,  34,  76, 111, 191,  31,  86, 170,  46, 179, 120,  51,  80,
    176, 163, 146, 188, 207,  25,  28, 167,  99, 203,  30,  77,  62,  75,  27, 155,
     79, 231, 240, 238, 173,  58, 181,  89,   4, 234,  64,  85,  37,  81, 229, 122,
    137,  56, 104,  82, 123, 252,  39, 174, 215, 189, 250,   7, 244, 204, 142,  95,
    239,  53, 156, 132,  43,  21, 213, 119,  52,  73, 182,  18,  10, 127, 113, 136,
    253, 157,  24,  65, 125, 147, 216,  88,  44, 206, 254,  36, 175, 222, 184,  54,
    200, 161, 128, 166, 153, 152, 168,  47,  14, 129, 101, 115, 228, 194, 162, 138,
    212, 225,  17, 208,   8, 139,  42, 242, 237, 154, 100,  63, 193, 108, 249, 236,
])
assert sorted(_MPBB_R) == list(range(256)), "mpbbR must be a permutation"

#: decrypt table (mpbbI in the spec — the inverse permutation of mpbbR,
#: computed rather than transcribed)
_MPBB_I = bytes(256)
_MPBB_I = bytearray(256)
for _i, _v in enumerate(_MPBB_R):
    _MPBB_I[_v] = _i
_MPBB_I = bytes(_MPBB_I)

NDB_CRYPT_NONE = 0
NDB_CRYPT_PERMUTE = 1
NDB_CRYPT_CYCLIC = 2


class PstBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def is_pst(data: bytes) -> bool:
    return data[:4] == _MAGIC


class PstFile:
    """Minimal PST reader (NDB + LTP + messaging subset), Unicode (wVer
    >= 23, 64-bit bids/ibs) and ANSI (wVer 14/15, 32-bit) formats.  The
    LTP and messaging layers are format-independent; only the NDB header
    offsets, page metadata position, and entry widths differ
    ([MS-PST] 2.2.2.6 HEADER, 2.2.2.7 pages/blocks)."""

    def __init__(self, data: bytes):
        if data[:4] != _MAGIC:
            raise PstBroken("pst_parse_error")
        self.data = data
        (w_ver,) = struct.unpack_from("<H", data, 10)
        self.ansi = w_ver < 23
        if self.ansi and w_ver not in (14, 15):
            raise PstBroken("pst_parse_error")
        if self.ansi:
            # ANSI HEADER: rgnid ends at 164, ROOT @164 with 4-byte
            # fields → BREF NBT {bid@184, ib@188}, BREF BBT {bid@192,
            # ib@196}; bSentinel 460, bCryptMethod 461
            crypt = data[461]
            (self._ib_nbt,) = struct.unpack_from("<I", data, 188)
            (self._ib_bbt,) = struct.unpack_from("<I", data, 196)
        else:
            # Unicode ROOT @180: dwReserved 4, ibFileEof 8, ibAMapLast 8,
            # cbAMapFree 8, cbPMapFree 8 → BREF NBT @216 {bid, ib},
            # BREF BBT @232 {bid, ib}; bCryptMethod @513
            crypt = data[513]
            (self._ib_nbt,) = struct.unpack_from("<Q", data, 224)
            (self._ib_bbt,) = struct.unpack_from("<Q", data, 240)
        if crypt not in (NDB_CRYPT_NONE, NDB_CRYPT_PERMUTE):
            # CYCLIC (bCryptMethod=2) needs the §5.2 rolling-key cipher —
            # still surfaced honestly rather than decoded wrong
            raise PstBroken("pst_crypt_unsupported")
        self._crypt = crypt
        # bid → (ib, cb)
        self.blocks: dict[int, tuple[int, int]] = {}
        for entry in self._walk_btree(self._ib_bbt):
            if self.ansi:  # BBTENTRY ANSI: BREF {bid 4, ib 4}, cb 2
                bid, ib = struct.unpack_from("<II", entry, 0)
                (cb,) = struct.unpack_from("<H", entry, 8)
            else:          # BBTENTRY: BREF {bid 8, ib 8}, cb 2
                bid, ib = struct.unpack_from("<QQ", entry, 0)
                (cb,) = struct.unpack_from("<H", entry, 16)
            self.blocks[bid] = (ib, cb)
        # nid → (bidData, bidSub, nidParent)
        self.nodes: dict[int, tuple[int, int, int]] = {}
        for entry in self._walk_btree(self._ib_nbt):
            if self.ansi:  # NBTENTRY ANSI: nid 4, bidData 4, bidSub 4,
                           # nidParent 4
                nid, bid_data, bid_sub, nid_parent = struct.unpack_from(
                    "<IIII", entry, 0)
            else:          # NBTENTRY: nid 8, bidData 8, bidSub 8,
                           # nidParent 4
                nid, bid_data, bid_sub = struct.unpack_from("<QQQ", entry, 0)
                (nid_parent,) = struct.unpack_from("<I", entry, 24)
            self.nodes[nid & 0xFFFFFFFF] = (bid_data, bid_sub, nid_parent)

    # ---- NDB ----------------------------------------------------------

    def _walk_btree(self, ib: int, depth: int = 0):
        """Yield raw leaf-entry bytes of a 512-byte BTree page chain."""
        if depth > 16 or ib + 512 > len(self.data):
            raise PstBroken("pst_parse_error")
        page = self.data[ib : ib + 512]
        # page metadata: Unicode @488 (492-495 padding, 16-byte trailer);
        # ANSI @496 (12-byte trailer)
        meta_off = 496 if self.ansi else 488
        c_ent, _c_max, cb_ent, c_level = struct.unpack_from(
            "<BBBB", page, meta_off)
        if cb_ent == 0 or c_ent * cb_ent > meta_off:
            raise PstBroken("pst_parse_error")
        for i in range(c_ent):
            entry = page[i * cb_ent : (i + 1) * cb_ent]
            if c_level > 0:
                # BTENTRY: btkey + BREF — child ib after (key, bid):
                # Unicode 8+8 → @16 (8 bytes); ANSI 4+4 → @8 (4 bytes)
                if self.ansi:
                    (child_ib,) = struct.unpack_from("<I", entry, 8)
                else:
                    (child_ib,) = struct.unpack_from("<Q", entry, 16)
                yield from self._walk_btree(child_ib, depth + 1)
            else:
                yield entry

    def _read_block(self, bid: int) -> bytes:
        try:
            ib, cb = self.blocks[bid]
        except KeyError:
            raise PstBroken("pst_parse_error") from None
        if ib + cb > len(self.data):
            raise PstBroken("pst_parse_error")
        return self.data[ib : ib + cb]

    def _node_blocks(self, bid: int, depth: int = 0) -> list[bytes]:
        """Leaf data blocks of a node in order, resolving XBLOCK/XXBLOCK
        data trees (bid bit 1 set = internal block).  Block BOUNDARIES are
        preserved — multi-block heaps address items per block."""
        if bid == 0:
            return []
        raw = self._read_block(bid)
        if not bid & 2:
            # PERMUTE applies to external DATA blocks only ([MS-PST]
            # §5.1); internal blocks (XBLOCK/SLBLOCK, bid bit 1) and
            # BTree pages are never encoded
            if self._crypt == NDB_CRYPT_PERMUTE:
                raw = raw.translate(_MPBB_I)
            return [raw]
        if depth > 4 or len(raw) < 8:
            raise PstBroken("pst_parse_error")
        btype, _c_level, c_ent = struct.unpack_from("<BBH", raw, 0)
        if btype != 1:  # not an XBLOCK/XXBLOCK
            raise PstBroken("pst_parse_error")
        parts: list[bytes] = []
        for i in range(c_ent):
            # rgbid after the 8-byte header; 4-byte bids in ANSI
            if self.ansi:
                (child_bid,) = struct.unpack_from("<I", raw, 8 + i * 4)
            else:
                (child_bid,) = struct.unpack_from("<Q", raw, 8 + i * 8)
            parts.extend(self._node_blocks(child_bid, depth + 1))
        return parts

    def _node_data(self, bid: int) -> bytes:
        return b"".join(self._node_blocks(bid))

    def _subnodes(self, bid_sub: int, depth: int = 0) -> dict[int, tuple[int, int]]:
        """Subnode BTree → {nid: (bidData, bidSub)} (SLBLOCK leaves)."""
        out: dict[int, tuple[int, int]] = {}
        if bid_sub == 0:
            return out
        raw = self._read_block(bid_sub)
        if len(raw) < 8 or depth > 4:
            raise PstBroken("pst_parse_error")
        btype, c_level, c_ent = struct.unpack_from("<BBH", raw, 0)
        if btype != 2:
            raise PstBroken("pst_parse_error")
        # entries start after dwPadding (Unicode only) — ANSI packs them
        # right after the 4-byte header; ANSI entries are 4-byte fields
        base = 4 if self.ansi else 8
        if c_level == 0:  # SLENTRY: nid, bidData, bidSub
            for i in range(c_ent):
                if self.ansi:
                    nid, bd, bs = struct.unpack_from("<III", raw, base + i * 12)
                else:
                    nid, bd, bs = struct.unpack_from("<QQQ", raw, base + i * 24)
                out[nid & 0xFFFFFFFF] = (bd, bs)
        else:  # SIENTRY: nid, bid
            for i in range(c_ent):
                if self.ansi:
                    _nid, bid = struct.unpack_from("<II", raw, base + i * 8)
                else:
                    _nid, bid = struct.unpack_from("<QQ", raw, base + i * 16)
                out.update(self._subnodes(bid, depth + 1))
        return out

    # ---- LTP ----------------------------------------------------------

    @staticmethod
    def _heap_item(blocks: list[bytes], hid: int) -> bytes:
        """HN heap item bytes for a HID.  hidBlockIndex (bits 16-31)
        selects the data block; every HN block header variant (HNHDR /
        HNPAGEHDR / HNBITMAPHDR) starts with a 2-byte ibHnpm, so the page
        map lookup is uniform across blocks."""
        if hid == 0:
            return b""
        if hid & 0x1F:  # hidType must be 0 (heap)
            raise PstBroken("pst_parse_error")
        block_index = hid >> 16
        index = (hid >> 5) & 0x7FF
        if block_index >= len(blocks):
            raise PstBroken("pst_parse_error")
        block = blocks[block_index]
        (ib_hnpm,) = struct.unpack_from("<H", block, 0)
        if ib_hnpm + 4 > len(block):
            raise PstBroken("pst_parse_error")
        c_alloc, _c_free = struct.unpack_from("<HH", block, ib_hnpm)
        if index < 1 or index > c_alloc:
            raise PstBroken("pst_parse_error")
        rgib = struct.unpack_from(f"<{c_alloc + 1}H", block, ib_hnpm + 4)
        return block[rgib[index - 1] : rgib[index]]

    def _pc_props(self, bid_data: int, bid_sub: int) -> dict[int, tuple[int, bytes]]:
        """Property Context → {propId: (propType, raw value bytes)}."""
        blocks = self._node_blocks(bid_data)
        if not blocks or len(blocks[0]) < 12 or blocks[0][2] != 0xEC:
            raise PstBroken("pst_parse_error")
        (hid_user_root,) = struct.unpack_from("<I", blocks[0], 4)
        bth = self._heap_item(blocks, hid_user_root)
        if len(bth) < 8 or bth[0] != 0xB5:
            raise PstBroken("pst_parse_error")
        cb_key, cb_ent, idx_levels = bth[1], bth[2], bth[3]
        (hid_root,) = struct.unpack_from("<I", bth, 4)
        if cb_key != 2 or cb_ent != 6 or idx_levels != 0:
            raise PstBroken("pst_parse_error")
        records = self._heap_item(blocks, hid_root)
        subnodes = self._subnodes(bid_sub) if bid_sub else {}
        props: dict[int, tuple[int, bytes]] = {}
        for off in range(0, len(records) - len(records) % 8, 8):
            prop_id, prop_type, hnid = struct.unpack_from("<HHI", records, off)
            if prop_type in (PT_LONG, PT_BOOLEAN):
                props[prop_id] = (prop_type, records[off + 4 : off + 8])
            elif hnid == 0:
                props[prop_id] = (prop_type, b"")
            elif hnid & 0x1F:  # NID → subnode data
                entry = subnodes.get(hnid)
                if entry:
                    props[prop_id] = (prop_type, self._node_data(entry[0]))
            else:  # HID → heap item
                props[prop_id] = (prop_type, self._heap_item(blocks, hnid))
        return props

    # ---- messaging -----------------------------------------------------

    def node_props(self, nid: int) -> dict[int, tuple[int, bytes]]:
        bid_data, bid_sub, _parent = self.nodes[nid]
        return self._pc_props(bid_data, bid_sub)

    def folder_name(self, nid: int) -> str | None:
        try:
            props = self.node_props(nid)
        except (PstBroken, KeyError):
            return None
        return _prop_str(props.get(PR_DISPLAY_NAME))

    def folder_path(self, nid: int) -> str:
        """'/'-joined display names up the parent chain (readpst's
        directory layout)."""
        parts: list[str] = []
        seen: set[int] = set()
        cur = nid
        while cur in self.nodes and cur not in seen:
            seen.add(cur)
            if cur & 0x1F == NID_TYPE_NORMAL_FOLDER:
                name = self.folder_name(cur)
                if name:
                    parts.append(name.replace("/", "_"))
            parent = self.nodes[cur][2]
            if parent == cur:
                break
            cur = parent
        return "/".join(reversed(parts))

    def messages(self) -> list[tuple[int, dict[int, tuple[int, bytes]]]]:
        out = []
        for nid in sorted(self.nodes):
            if nid & 0x1F == NID_TYPE_NORMAL_MESSAGE:
                out.append((nid, self.node_props(nid)))
        return out

    def attachments(self, nid: int) -> list[tuple[str, str, bytes]]:
        """(filename, mime, bytes) per attachment of a message node.

        Attachments live in the message's subnode tree as
        NID_TYPE_ATTACHMENT objects, each its own PC
        (PidTagAttachDataBinary + filename/mime tags) — the structures
        readpst walks to emit .eml-with-attachments (the reference then
        fans those out via create_attachment_files,
        filesystem.py:441-478)."""
        _bid_data, bid_sub, _parent = self.nodes[nid]
        out: list[tuple[str, str, bytes]] = []
        subs = self._subnodes(bid_sub)
        for sub_nid in sorted(subs):
            if sub_nid & 0x1F != NID_TYPE_ATTACHMENT:
                continue
            bd, bs = subs[sub_nid]
            try:
                props = self._pc_props(bd, bs)
            except PstBroken:
                continue  # one bad attachment never drops the message
            name = (
                _prop_str(props.get(PR_ATTACH_LONG_FILENAME))
                or _prop_str(props.get(PR_ATTACH_FILENAME))
                or f"attachment-{len(out) + 1}"
            )
            mime = (
                _prop_str(props.get(PR_ATTACH_MIME_TAG))
                or "application/octet-stream"
            )
            v = props.get(PR_ATTACH_DATA)
            data = v[1] if v is not None and v[0] == PT_BINARY else b""
            out.append((name, mime, data))
        return out


def _prop_str(
    v: tuple[int, bytes] | None, subject_prefix: bool = False
) -> str | None:
    if v is None:
        return None
    prop_type, raw = v
    if prop_type == PT_UNICODE:
        s = raw.decode("utf-16-le", "replace")
    elif prop_type == PT_STRING8:
        s = raw.decode("cp1252", "replace")
    else:
        return None
    # PidTagSubject prefix convention ([MS-PST] 2.5.3.1.1.1): a leading
    # 0x01 control byte + prefix-length char precede the normalized
    # subject.  ONLY PidTagSubject carries it — a body/display-name that
    # happens to start with 0x01 must keep its bytes.
    if subject_prefix and s.startswith("\x01") and len(s) >= 2:
        s = s[2:]
    return s.rstrip("\x00")


def _prop_time(v: tuple[int, bytes] | None) -> datetime | None:
    if v is None or v[0] != PT_SYSTIME or len(v[1]) < 8:
        return None
    (ticks,) = struct.unpack("<q", v[1][:8])
    return _FILETIME_EPOCH + timedelta(microseconds=ticks / 10)


def _rfc2822(dt: datetime | None) -> str | None:
    if dt is None:
        return None
    from email.utils import format_datetime

    return format_datetime(dt)


def message_to_eml(
    props: dict[int, tuple[int, bytes]],
    attachments: list[tuple[str, str, bytes]] | None = None,
) -> bytes:
    """RFC-822 bytes from PC properties (the shape readpst emits: plain
    headers + text body; with attachments, multipart/mixed with base64
    parts, which the email fan-out path re-explodes as children)."""
    import base64
    import hashlib as _hl

    subject = _prop_str(props.get(PR_SUBJECT), subject_prefix=True) or ""
    sender_name = _prop_str(props.get(PR_SENDER_NAME)) or ""
    sender_email = _prop_str(props.get(PR_SENDER_EMAIL)) or ""
    display_to = _prop_str(props.get(PR_DISPLAY_TO)) or ""
    date = _rfc2822(_prop_time(props.get(PR_CLIENT_SUBMIT_TIME)))
    body = _prop_str(props.get(PR_BODY)) or ""

    from_hdr = (
        f"{sender_name} <{sender_email}>" if sender_name and sender_email
        else sender_email or sender_name
    )
    lines = []
    if from_hdr:
        lines.append(f"From: {from_hdr}")
    if display_to:
        lines.append(f"To: {display_to}")
    if subject:
        lines.append(f"Subject: {subject}")
    if date:
        lines.append(f"Date: {date}")
    if not attachments:
        lines.append('Content-Type: text/plain; charset="utf-8"')
        lines.append("MIME-Version: 1.0")
        head = "\r\n".join(lines)
        return head.encode("utf-8") + b"\r\n\r\n" + body.encode("utf-8") + b"\r\n"

    # deterministic boundary: hashed from the parts, no randomness
    bnd = "=_pst_" + _hl.sha256(
        body.encode("utf-8") + b"".join(d for _, _, d in attachments)
    ).hexdigest()[:16]
    lines.append(f'Content-Type: multipart/mixed; boundary="{bnd}"')
    lines.append("MIME-Version: 1.0")
    parts = ["\r\n".join(lines), ""]
    parts.append(f"--{bnd}")
    parts.append('Content-Type: text/plain; charset="utf-8"')
    parts.append("")
    parts.append(body)
    for name, mime, data in attachments:
        parts.append(f"--{bnd}")
        parts.append(f'Content-Type: {mime}; name="{name}"')
        parts.append(f'Content-Disposition: attachment; filename="{name}"')
        parts.append("Content-Transfer-Encoding: base64")
        parts.append("")
        b64 = base64.b64encode(data).decode("ascii")
        parts.append("\r\n".join(b64[i:i + 76] for i in range(0, len(b64), 76)))
    parts.append(f"--{bnd}--")
    return ("\r\n".join(parts) + "\r\n").encode("utf-8")


def unpack_pst(data: bytes) -> list[tuple[str, bytes]]:
    """PST bytes → [(folder/N.eml, rfc822 bytes), ...] — the unarchive
    listing the reference gets from readpst (archives.py:155-170)."""
    pst = PstFile(data)
    out: list[tuple[str, bytes]] = []
    counters: dict[str, int] = {}
    for nid, props in pst.messages():
        folder = pst.folder_path(pst.nodes[nid][2])
        n = counters.get(folder, 0) + 1
        counters[folder] = n
        name = f"{folder}/{n}.eml" if folder else f"{n}.eml"
        out.append((name, message_to_eml(props, pst.attachments(nid))))
    return out


# ---------------------------------------------------------------------------
# fixture writer (tests + synthetic corpus) — a valid NDB_CRYPT_NONE
# Unicode PST exercising every structure the reader supports
# ---------------------------------------------------------------------------


def _hid(index: int) -> int:
    return index << 5


#: var-value bytes beyond this spill into a second heap block (real PSTs
#: cap HN blocks near 8 KiB; exercised by large message bodies)
_HN_SPLIT_BYTES = 3500


class _SubnodeRef:
    """PC record whose value lives in a subnode (NID-typed HNID) — how
    Outlook stores very large property values."""

    def __init__(self, nid: int):
        self.nid = nid


def _hn_pagemap(items: list[bytes], first_offset: int) -> bytes:
    offsets = [first_offset]
    for item in items:
        offsets.append(offsets[-1] + len(item))
    return struct.pack("<HH", len(items), 0) + struct.pack(
        f"<{len(offsets)}H", *offsets
    )


def _build_hn_pc(props: list[tuple[int, int, object]]) -> list[bytes]:
    """HN block payload(s) containing a PC BTH.  props: (propId, propType,
    value) with str → UTF-16LE heap values, datetime → SYSTIME heap
    values, int/bool inline.  Large var-value sets spill into a second
    block (HIDs carry the block index), exercising the multi-block read
    path."""
    var_values: list[bytes] = []
    encoded: list[tuple[int, int, bytes | int]] = []
    total_var = 0
    subnode_refs: list[tuple[int, int, int]] = []
    for prop_id, prop_type, value in sorted(props, key=lambda p: p[:2]):
        if isinstance(value, _SubnodeRef):
            subnode_refs.append((prop_id, prop_type, value.nid))
            continue
        if prop_type in (PT_LONG, PT_BOOLEAN):
            encoded.append((prop_id, prop_type, int(value)))
            continue
        if prop_type in (PT_UNICODE,):
            raw = str(value).encode("utf-16-le")
        elif prop_type == PT_STRING8:
            raw = str(value).encode("cp1252")
        elif prop_type == PT_SYSTIME:
            ticks = int((value - _FILETIME_EPOCH).total_seconds() * 10**7)
            raw = struct.pack("<q", ticks)
        else:
            raw = bytes(value)  # PT_BINARY
        encoded.append((prop_id, prop_type, raw))
        total_var += len(raw)

    two_blocks = total_var > _HN_SPLIT_BYTES
    record_parts: list[tuple[int, bytes]] = [
        (prop_id, struct.pack("<HHI", prop_id, prop_type, nid))
        for prop_id, prop_type, nid in subnode_refs
    ]
    for prop_id, prop_type, payload in encoded:
        if isinstance(payload, int):
            record_parts.append(
                (prop_id, struct.pack("<HHI", prop_id, prop_type, payload))
            )
            continue
        if two_blocks:
            hid = (1 << 16) | _hid(len(var_values) + 1)  # block 1
        else:
            hid = _hid(3 + len(var_values))  # block 0, after BTH+records
        var_values.append(payload)
        record_parts.append(
            (prop_id, struct.pack("<HHI", prop_id, prop_type, hid))
        )
    records = b"".join(r for _, r in sorted(record_parts, key=lambda p: p[0]))

    bth_header = struct.pack("<BBBBI", 0xB5, 2, 6, 0, _hid(2))
    block0_items = [bth_header, records]
    if not two_blocks:
        block0_items.extend(var_values)
    payload0 = b"".join(block0_items)
    hnhdr = struct.pack("<HBBII", 12 + len(payload0), 0xEC, 0xBC, _hid(1), 0)
    block0 = hnhdr + payload0 + _hn_pagemap(block0_items, 12)
    if not two_blocks:
        return [block0]
    payload1 = b"".join(var_values)
    hnpagehdr = struct.pack("<H", 2 + len(payload1))
    block1 = hnpagehdr + payload1 + _hn_pagemap(var_values, 2)
    return [block0, block1]


class _PstWriter:
    """Byte-level writer for a minimal, reader-complete PST — Unicode by
    default, ANSI (wVer 15, 32-bit structures, 12-byte trailers) with
    ``ansi=True``."""

    def __init__(self, crypt: int = 0, ansi: bool = False):
        self.buf = bytearray(1024)  # header area
        self.blocks: list[tuple[int, int, int]] = []  # (bid, ib, cb)
        self.next_bid = 4
        self.crypt = crypt
        self.ansi = ansi

    def add_block(self, payload: bytes, internal: bool = False) -> int:
        bid = self.next_bid | (2 if internal else 0)  # bit 1 = internal
        self.next_bid += 4
        ib = len(self.buf)
        if self.crypt == NDB_CRYPT_PERMUTE and not internal:
            payload = payload.translate(_MPBB_R)  # encrypt direction
        self.buf += payload
        # block trailer at 64-byte-aligned end:
        # Unicode (16 B): cb 2, wSig 2, dwCRC 4, bid 8
        # ANSI    (12 B): cb 2, wSig 2, bid 4, dwCRC 4
        tsize = 12 if self.ansi else 16
        total = -(-(len(payload) + tsize) // 64) * 64
        pad = total - len(payload) - tsize
        trailer = (
            struct.pack("<HHII", len(payload), 0, bid, 0) if self.ansi
            else struct.pack("<HHIQ", len(payload), 0, 0, bid)
        )
        self.buf += bytes(pad) + trailer
        self.blocks.append((bid, ib, len(payload)))
        return bid

    def _page(self, entries: list[bytes], cb_ent: int, ptype: int) -> int:
        body_size = 496 if self.ansi else 488
        assert len(entries) * cb_ent <= body_size, "fixture exceeds one page"
        body = b"".join(entries)
        page = body + bytes(body_size - len(body))
        if self.ansi:
            page += struct.pack("<BBBB", len(entries), body_size // cb_ent,
                                cb_ent, 0)
            page += struct.pack("<BBHII", ptype, ptype, 0, 0, 0)  # 12 B
        else:
            page += struct.pack("<BBBBI", len(entries), body_size // cb_ent,
                                cb_ent, 0, 0)
            page += struct.pack("<BBHIQ", ptype, ptype, 0, 0, 0)  # 16 B
        assert len(page) == body_size + (16 if self.ansi else 24)
        ib = len(self.buf)
        self.buf += page
        return ib

    def finish(self, node_entries: list[bytes]) -> bytes:
        if self.ansi:
            bbt_entries = [
                struct.pack("<IIHH", bid, ib, cb, 1)
                for bid, ib, cb in self.blocks
            ]
            ib_bbt = self._page(bbt_entries, 12, 0x80)
            ib_nbt = self._page(node_entries, 16, 0x81)
        else:
            bbt_entries = [
                struct.pack("<QQHHI", bid, ib, cb, 1, 0)
                for bid, ib, cb in self.blocks
            ]
            ib_bbt = self._page(bbt_entries, 24, 0x80)
            ib_nbt = self._page(node_entries, 32, 0x81)
        hdr = self.buf
        hdr[0:4] = _MAGIC
        struct.pack_into("<H", hdr, 8, 0x4D53)  # wMagicClient 'SM'
        if self.ansi:
            struct.pack_into("<H", hdr, 10, 15)     # wVer: ANSI
            struct.pack_into("<I", hdr, 168, len(hdr))   # ibFileEof
            struct.pack_into("<II", hdr, 184, 0, ib_nbt)  # BREF NBT
            struct.pack_into("<II", hdr, 192, 0, ib_bbt)  # BREF BBT
            hdr[461] = self.crypt  # bCryptMethod (ANSI offset)
        else:
            struct.pack_into("<H", hdr, 10, 23)     # wVer: Unicode
            struct.pack_into("<Q", hdr, 184, len(hdr))  # ibFileEof
            struct.pack_into("<QQ", hdr, 216, 0, ib_nbt)  # BREF NBT
            struct.pack_into("<QQ", hdr, 232, 0, ib_bbt)  # BREF BBT
            hdr[513] = self.crypt  # bCryptMethod
        return bytes(hdr)


def _add_hn(w: "_PstWriter", blocks: list[bytes]) -> int:
    """Write HN block(s); multi-block heaps get an XBLOCK data tree."""
    if len(blocks) == 1:
        return w.add_block(blocks[0])
    bids = [w.add_block(b) for b in blocks]
    fmt = "<I" if w.ansi else "<Q"
    xblock = struct.pack(
        "<BBHI", 1, 1, len(bids), sum(len(b) for b in blocks)
    ) + b"".join(struct.pack(fmt, b) for b in bids)
    return w.add_block(xblock, internal=True)


def _sl_block(w: "_PstWriter", entries: list[tuple[int, int, int]]) -> int:
    """Write an SLBLOCK for (nid, bidData, bidSub) entries — Unicode has
    a 4-byte padding after the header and 24-byte entries; ANSI packs
    12-byte entries immediately."""
    if w.ansi:
        sl = struct.pack("<BBH", 2, 0, len(entries)) + b"".join(
            struct.pack("<III", n, bd, bs) for n, bd, bs in entries
        )
    else:
        sl = struct.pack("<BBHI", 2, 0, len(entries), 0) + b"".join(
            struct.pack("<QQQ", n, bd, bs) for n, bd, bs in entries
        )
    return w.add_block(sl, internal=True)


def build_pst(
    folders: dict[str, list[dict]],
    base_time: datetime | None = None,
    crypt: int = 0,
    ansi: bool = False,
) -> bytes:
    """Deterministic PST fixture.  ``folders``: {folder_name: [message
    dicts with subject/body/sender_name/sender_email/to keys]}.  Bodies
    past ~3.5 KB produce a two-block heap behind an XBLOCK data tree.
    ``crypt=1`` writes NDB_CRYPT_PERMUTE-encoded data blocks (Outlook's
    default on real files); ``ansi=True`` writes the 32-bit wVer-15
    format."""
    w = _PstWriter(crypt=crypt, ansi=ansi)
    node_entries: list[tuple[int, int, int, int]] = []  # nid,bidData,bidSub,parent

    folder_nid = 0x402  # nidIndex 32, type NORMAL_FOLDER
    msg_index = 64
    for fname, messages in sorted(folders.items()):
        fprops = [(PR_DISPLAY_NAME, PT_UNICODE, fname)]
        fbid = _add_hn(w, _build_hn_pc(fprops))
        this_folder = folder_nid
        node_entries.append((this_folder, fbid, 0, this_folder))
        folder_nid += 0x20
        for i, m in enumerate(messages):
            sl_entries: list[tuple[int, int, int]] = []
            if m.get("body_via_subnode"):
                # the third value-indirection path: the body lives in its
                # own subnode data block, referenced by a NID-typed HNID
                vbid = w.add_block(m.get("body", "").encode("utf-16-le"))
                sub_nid = ((0x4000 + msg_index) << 5) | 0x1F
                sl_entries.append((sub_nid, vbid, 0))
                body_prop = (PR_BODY, PT_UNICODE, _SubnodeRef(sub_nid))
            else:
                body_prop = (PR_BODY, PT_UNICODE, m.get("body", ""))
            # attachment objects: one NID_TYPE_ATTACHMENT subnode each,
            # holding its own PC with data + filename + mime tag
            for k, att in enumerate(m.get("attachments", [])):
                aprops = [
                    (PR_ATTACH_LONG_FILENAME, PT_UNICODE, att["name"]),
                    (PR_ATTACH_MIME_TAG, PT_STRING8,
                     att.get("mime", "application/octet-stream")),
                    (PR_ATTACH_DATA, PT_BINARY, att.get("data", b"")),
                ]
                abid = _add_hn(w, _build_hn_pc(aprops))
                att_nid = (
                    (0x6000 + msg_index * 16 + k) << 5
                ) | NID_TYPE_ATTACHMENT
                sl_entries.append((att_nid, abid, 0))
            bid_sub = _sl_block(w, sl_entries) if sl_entries else 0
            props = [
                (PR_SUBJECT, PT_UNICODE, m.get("subject", "")),
                body_prop,
                (PR_SENDER_NAME, PT_UNICODE, m.get("sender_name", "")),
                (PR_SENDER_EMAIL, PT_STRING8, m.get("sender_email", "")),
                (PR_DISPLAY_TO, PT_UNICODE, m.get("to", "")),
            ]
            when = m.get("when") or (
                (base_time or _FILETIME_EPOCH.replace(year=2024))
                + timedelta(hours=i)
            )
            props.append((PR_CLIENT_SUBMIT_TIME, PT_SYSTIME, when))
            mbid = _add_hn(w, _build_hn_pc(props))
            nid = (msg_index << 5) | NID_TYPE_NORMAL_MESSAGE
            msg_index += 1
            node_entries.append((nid, mbid, bid_sub, this_folder))

    if ansi:
        raw_entries = [
            struct.pack("<IIII", nid, bd, bs, parent)
            for nid, bd, bs, parent in sorted(node_entries)
        ]
    else:
        raw_entries = [
            struct.pack("<QQQII", nid, bd, bs, parent, 0)
            for nid, bd, bs, parent in sorted(node_entries)
        ]
    return w.finish(raw_entries)
