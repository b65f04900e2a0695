"""Legacy Word 97-2003 `.doc` text extraction — public [MS-DOC] spec,
built on the CFB reader (operators/cfb.py).

Covers the text layer only (no formatting/fields/tables beyond their
character runs): FIB → Clx in the 0Table/1Table stream → PlcPcd piece
table → pieces decoded cp1252 (fCompressed) or UTF-16LE.  This replaces
Tika for the most common legacy office body-text case; exotic features
degrade to whatever characters the piece table yields.

Control characters used by Word (0x07 cell/row marks, 0x0B line break,
0x0D paragraph mark, 0x0C page break, 0x13-0x15 field marks) are mapped to
separators before normalization.
"""

from __future__ import annotations

import re
import struct

from ..functions.textutils import normalize_text
from .cfb import CfbError, CompoundFile

_WORD_MAGIC = 0xA5EC

#: absolute FIB offsets ([MS-DOC] 2.5.1): base flags + FibRgFcLcb97 pair 33
_OFF_FLAGS = 0x0A
_OFF_FCCLX = 0x01A2
_F_WHICH_TBL_STM = 0x0200


class DocBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def is_word_doc(data: bytes) -> bool:
    try:
        cf = CompoundFile(data)
    except (CfbError, struct.error):
        return False
    paths = cf.paths()
    if "WordDocument" not in paths:
        return False
    wd = cf.read(paths["WordDocument"])
    return len(wd) >= 2 and struct.unpack_from("<H", wd, 0)[0] == _WORD_MAGIC


def _pieces(word_stream: bytes, table_stream: bytes) -> list[tuple[int, int, bool]]:
    """[(cp_len, fc, compressed)] from the Clx piece table."""
    (fc_clx,) = struct.unpack_from("<I", word_stream, _OFF_FCCLX)
    (lcb_clx,) = struct.unpack_from("<I", word_stream, _OFF_FCCLX + 4)
    clx = table_stream[fc_clx : fc_clx + lcb_clx]
    i = 0
    while i < len(clx) and clx[i] == 0x01:  # Prc (property) blocks: skip
        (cb,) = struct.unpack_from("<h", clx, i + 1)
        i += 3 + cb
    if i >= len(clx) or clx[i] != 0x02:
        raise DocBroken("doc_clx_malformed")
    (lcb,) = struct.unpack_from("<I", clx, i + 1)
    plc = clx[i + 5 : i + 5 + lcb]
    n = (lcb - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    out = []
    for k in range(n):
        fc_raw = struct.unpack_from("<I", plc, (n + 1) * 4 + k * 8 + 2)[0]
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        if compressed:
            fc //= 2
        out.append((cps[k + 1] - cps[k], fc, compressed))
    return out


_CTRL = re.compile("[\x00-\x06\x08\x0e-\x1f]")


def doc_to_text(data: bytes) -> str:
    try:
        cf = CompoundFile(data)
        paths = cf.paths()
        wd = cf.read(paths["WordDocument"])
        (flags,) = struct.unpack_from("<H", wd, _OFF_FLAGS)
        table_name = "1Table" if flags & _F_WHICH_TBL_STM else "0Table"
        if table_name not in paths:  # some writers emit only the other one
            table_name = "0Table" if "1Table" != table_name else "1Table"
            table_name = next(
                (p for p in ("1Table", "0Table") if p in paths), None
            )
            if table_name is None:
                raise DocBroken("doc_table_stream_missing")
        table = cf.read(paths[table_name])
        from .doc_crypto import (
            DocCryptoBroken,
            decrypt_doc_streams,
            doc_is_encrypted,
        )

        if doc_is_encrypted(wd):
            # fEncrypted ([MS-DOC] §2.2.6): RC4 over WordDocument/Table,
            # worker-local password then the VelvetSweatshop default
            from ..functions.archive_crypto import default_archive_password

            try:
                wd, table, _ = decrypt_doc_streams(
                    wd, table, default_archive_password())
            except DocCryptoBroken as err:
                raise DocBroken(err.reason) from err
        parts = []
        for cp_len, fc, compressed in _pieces(wd, table):
            if compressed:
                parts.append(wd[fc : fc + cp_len].decode("cp1252", "replace"))
            else:
                parts.append(
                    wd[fc : fc + 2 * cp_len].decode("utf-16-le", "replace")
                )
        text = "".join(parts)
    except (CfbError, struct.error, IndexError, KeyError) as e:
        raise DocBroken("doc_parse_error") from e
    # Word control characters → separators
    text = (
        text.replace("\r", "\n\n").replace("\x0b", "\n")
        .replace("\x07", " ").replace("\x0c", "\n\n")
    )
    text = _CTRL.sub("", text)
    return normalize_text(text) or ""


def build_doc_file(paragraphs: list[str], compressed: bool = False) -> bytes:
    """Deterministic .doc fixture: minimal FIB + single text piece + Clx in
    1Table — enough structure for any piece-table-aware reader."""
    text = "\r".join(paragraphs)
    if compressed:
        payload = text.encode("cp1252", "replace")
        cp_len = len(payload)
    else:
        payload = text.encode("utf-16-le")
        cp_len = len(text)

    fib = bytearray(1472)  # standard Word97 FIB size
    struct.pack_into("<H", fib, 0, _WORD_MAGIC)
    struct.pack_into("<H", fib, 2, 0x00C1)  # nFib (Word 97)
    struct.pack_into("<H", fib, _OFF_FLAGS, _F_WHICH_TBL_STM)  # use 1Table

    text_fc = len(fib)
    word_stream = bytes(fib) + payload

    fc_field = text_fc * 2 if compressed else text_fc
    if compressed:
        fc_field |= 0x40000000
    n = 1
    plc = struct.pack(f"<{n + 1}I", 0, cp_len)
    plc += struct.pack("<HIH", 0, fc_field, 0)
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc

    word_stream_b = bytearray(word_stream)
    struct.pack_into("<I", word_stream_b, _OFF_FCCLX, 0)        # fcClx
    struct.pack_into("<I", word_stream_b, _OFF_FCCLX + 4, len(clx))  # lcbClx

    # wrap the two streams in a CFB container via the msg builder's
    # low-level machinery — reuse build via a tiny local writer
    from .msg_extract import build_msg  # noqa: F401  (same CFB layout ideas)

    return _build_cfb(
        [("WordDocument", bytes(word_stream_b)), ("1Table", clx)]
    )


def _build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Minimal CFB writer for a flat list of (often >4096-byte) streams.
    Streams >= 4096 bytes use regular FAT chains; smaller ones go through
    the mini stream."""
    SECT, MINI = 512, 64
    entries = [dict(name="Root Entry", type=5, start=0xFFFFFFFE, size=0,
                    left=0xFFFFFFFF, right=0xFFFFFFFF, child=0xFFFFFFFF)]
    big: list[tuple[int, bytes]] = []
    mini_payloads: list[tuple[int, bytes]] = []
    for name, payload in streams:
        idx = len(entries)
        entries.append(dict(name=name, type=2, start=0, size=len(payload),
                            left=0xFFFFFFFF, right=0xFFFFFFFF,
                            child=0xFFFFFFFF))
        (big if len(payload) >= 4096 else mini_payloads).append((idx, payload))
    entries[0]["child"] = 1
    for a in range(1, len(entries) - 1):
        entries[a]["right"] = a + 1

    # mini stream
    mini_data = bytearray()
    mini_fat: list[int] = []
    for idx, payload in mini_payloads:
        start = len(mini_fat)
        nsec = max(1, (len(payload) + MINI - 1) // MINI)
        mini_data += payload + b"\x00" * ((-len(payload)) % MINI)
        for i in range(nsec - 1):
            mini_fat.append(start + i + 1)
        mini_fat.append(0xFFFFFFFE)
        entries[idx]["start"] = start

    # sector plan: FAT | dir | miniFAT | ministream | big streams
    n_dir = max(1, (len(entries) * 128 + SECT - 1) // SECT)
    minifat_raw = b"".join(struct.pack("<I", v) for v in mini_fat) or b"\xfe\xff\xff\xff"
    n_minifat = max(1, (len(minifat_raw) + SECT - 1) // SECT)
    n_mini = max(1, (len(mini_data) + SECT - 1) // SECT)

    fat_sid, dir_sid = 0, 1
    minifat_sid = dir_sid + n_dir
    ministream_sid = minifat_sid + n_minifat
    next_sid = ministream_sid + n_mini
    big_plans = []
    for idx, payload in big:
        nsec = (len(payload) + SECT - 1) // SECT
        entries[idx]["start"] = next_sid
        big_plans.append((next_sid, nsec, payload))
        next_sid += nsec
    total = next_sid
    n_fat_sectors = max(1, (total * 4 + SECT - 1) // SECT)
    # shift everything after FAT if more than one FAT sector is needed
    assert n_fat_sectors == 1, "fixture streams exceed single-FAT capacity"

    root = entries[0]
    root["start"] = ministream_sid
    root["size"] = len(mini_data)

    dir_raw = bytearray()
    for e in entries:
        name_b = e["name"].encode("utf-16-le")[:62] + b"\x00\x00"
        chunk = bytearray(128)
        chunk[: len(name_b)] = name_b
        struct.pack_into("<H", chunk, 64, len(name_b))
        chunk[66] = e["type"]
        chunk[67] = 1
        struct.pack_into("<3I", chunk, 68, e["left"], e["right"], e["child"])
        struct.pack_into("<I", chunk, 116, e["start"])
        struct.pack_into("<Q", chunk, 120, e["size"])
        dir_raw += chunk
    dir_raw += b"\x00" * ((-len(dir_raw)) % SECT)

    fat = [0xFFFFFFFF] * (SECT // 4)
    fat[fat_sid] = 0xFFFFFFFD
    def chain(start, nsec):
        for i in range(nsec):
            fat[start + i] = start + i + 1 if i < nsec - 1 else 0xFFFFFFFE
    chain(dir_sid, n_dir)
    chain(minifat_sid, n_minifat)
    chain(ministream_sid, n_mini)
    for start, nsec, _ in big_plans:
        chain(start, nsec)

    header = bytearray(512)
    header[:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", header, 26, 0x003E)
    struct.pack_into("<H", header, 28, 0x0003)
    struct.pack_into("<H", header, 30, 9)
    struct.pack_into("<H", header, 32, 6)
    struct.pack_into("<I", header, 44, 1)
    struct.pack_into("<I", header, 48, dir_sid)
    struct.pack_into("<I", header, 56, 4096)
    struct.pack_into("<I", header, 60, minifat_sid)
    struct.pack_into("<I", header, 64, n_minifat)
    struct.pack_into("<I", header, 68, 0xFFFFFFFE)
    struct.pack_into("<I", header, 72, 0)
    struct.pack_into("<109I", header, 76, *([fat_sid] + [0xFFFFFFFF] * 108))

    out = bytearray(header)
    out += b"".join(struct.pack("<I", v) for v in fat)
    out += dir_raw
    out += minifat_raw + b"\x00" * ((-len(minifat_raw)) % SECT)
    out += mini_data + b"\x00" * ((-len(mini_data)) % SECT)
    for _, _, payload in big_plans:
        out += payload + b"\x00" * ((-len(payload)) % SECT)
    return bytes(out)
