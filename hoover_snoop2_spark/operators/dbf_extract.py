"""dBase .dbf table extraction — the public dBase III/IV file layout.

The reference Tika-parses ``application/x-dbf``
(``snoop/data/analyzers/_tika_mime_types.py:863``).  DBF is a
fixed-width row store: a 32-byte header (version, last-update date,
record count, header/record sizes), 32-byte field descriptors up to a
0x0D terminator, then one flag-prefixed record per row.  The table
surfaces exactly like csv/xls: ``table-columns``/``table-row-count``
info plus one ``<n>.txt`` child per row through ``tables.explode_row``
(reference archives.py:244-344 explode semantics).

Field values: C (character) and N/F (numeric) are space-trimmed text;
L (logical) maps T/t/Y/y -> "true", F/f/N/n -> "false", else "";
D (date) stays the raw YYYYMMDD digits; M (memo) is surfaced as ""
(the companion .dbt block file is a separate blob by design).  Text
decodes latin-1 — deterministic, and byte-preserving for the ASCII
fixtures; the language-driver byte is not interpreted (documented).

Deleted records (flag 0x2A) are skipped, matching every dBase reader.

Self-verification: ``build_dbf`` writes the same layout independently;
round-trip + truncation fuzz in tests.  A malformed file is a typed
``dbf_truncated``/``dbf_bad_header`` broken reason.
"""
from __future__ import annotations

import struct

_VERSIONS = frozenset({0x02, 0x03, 0x04, 0x05, 0x30, 0x31, 0x43,
                       0x83, 0x8B, 0x8E, 0xF5})


class DbfBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_dbf(data: bytes) -> bool:
    """Structural sniff (DBF has no fixed magic): known version byte,
    plausible last-update date, consistent header/record geometry, and
    the 0x0D descriptor terminator where the header says it ends."""
    if len(data) < 65 or data[0] not in _VERSIONS:
        return False
    mm, dd = data[2], data[3]
    if not (1 <= mm <= 12 and 1 <= dd <= 31):
        return False
    nrec, hsize, rsize = struct.unpack_from("<IHH", data, 4)
    if hsize < 65 or rsize < 1 or hsize > len(data):
        return False
    if (hsize - 33) % 32 != 0 and (hsize - 296) % 32 != 0:
        return False
    if data[hsize - 1] != 0x0D:
        return False
    # record area must roughly fit (allow the optional 0x1A EOF byte)
    return hsize + nrec * rsize <= len(data) + rsize


def _fields(data: bytes, hsize: int) -> list[tuple[str, str, int]]:
    out = []
    pos = 32
    while pos + 32 <= hsize and data[pos] != 0x0D:
        name = data[pos:pos + 11].split(b"\x00", 1)[0].decode(
            "latin-1").strip()
        ftype = chr(data[pos + 11])
        flen = data[pos + 16]
        out.append((name, ftype, flen))
        pos += 32
    if pos >= hsize or data[pos] != 0x0D:
        raise DbfBroken("dbf_bad_header")
    return out


def _value(raw: bytes, ftype: str) -> str:
    if ftype == "L":
        c = raw[:1].decode("latin-1")
        if c in "TtYy":
            return "true"
        if c in "FfNn":
            return "false"
        return ""
    if ftype == "M":
        return ""
    return raw.decode("latin-1").strip()


def dbf_to_table(data: bytes) -> tuple[dict | None, list[tuple[str, str]]]:
    """(table-info, row children) — the csv/xls explode shape."""
    if len(data) < 33:
        raise DbfBroken("dbf_truncated")
    nrec, hsize, rsize = struct.unpack_from("<IHH", data, 4)
    if hsize > len(data) or hsize < 33:
        raise DbfBroken("dbf_truncated")
    fields = _fields(data, hsize)
    if not fields:
        raise DbfBroken("dbf_bad_header")
    if 1 + sum(f[2] for f in fields) != rsize:
        raise DbfBroken("dbf_bad_header")
    header = [f[0] for f in fields]
    rows: list[list[str]] = []
    pos = hsize
    for _ in range(nrec):
        if pos + rsize > len(data):
            raise DbfBroken("dbf_truncated")
        rec = data[pos:pos + rsize]
        pos += rsize
        if rec[0] == 0x2A:  # deleted
            continue
        vals = []
        off = 1
        for _name, ftype, flen in fields:
            vals.append(_value(rec[off:off + flen], ftype))
            off += flen
        rows.append(vals)

    info = {
        "table-columns": header,
        "table-row-count": len(rows) + 1,  # + header, csv parity
        "table-col-count": len(header),
    }
    from .tables import explode_row

    children = [
        (f"{i}.txt", explode_row(row, header))
        for i, row in enumerate(rows, 1)
    ]
    return info, children


def build_dbf(header: list[str], rows: list[list[str]],
              types: list[str] | None = None,
              deleted: set[int] | None = None) -> bytes:
    """Fixture writer: dBase III layout, field widths sized to content;
    ``deleted`` marks 0-based row indices with the 0x2A flag."""
    types = types or ["C"] * len(header)
    deleted = deleted or set()
    widths = []
    for c in range(len(header)):
        w = max([len(r[c]) for r in rows] + [1])
        widths.append(min(w, 254))
    rsize = 1 + sum(widths)
    hsize = 32 + 32 * len(header) + 1
    out = bytearray()
    out += struct.pack("<BBBBIHH20x", 0x03, 95, 7, 26,
                       len(rows), hsize, rsize)
    for name, ftype, w in zip(header, types, widths):
        desc = bytearray(32)
        nm = name.encode("latin-1")[:10]
        desc[: len(nm)] = nm
        desc[11] = ord(ftype)
        desc[16] = w
        out += desc
    out += b"\x0d"
    for i, row in enumerate(rows):
        out += b"\x2a" if i in deleted else b"\x20"
        for v, w in zip(row, widths):
            out += v.encode("latin-1")[:w].ljust(w, b" ")
    out += b"\x1a"
    return bytes(out)
