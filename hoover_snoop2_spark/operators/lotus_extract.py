"""Lotus 1-2-3 .wk1 worksheet extraction — the public Lotus record
format (the same u16-opcode/u16-length record stream the whole WKS/WK1
family shares).

The reference Tika-parses ``application/vnd.lotus-1-2-3``
(``snoop/data/analyzers/_tika_mime_types.py:452``).  A WK1 file is a
flat record stream:

    BOF      0x0000  len 2   u16 revision (0x0404/0x0405/0x0406)
    INTEGER  0x000D  len 7   fmt u8, col u16, row u16, i16 value
    NUMBER   0x000E  len 13  fmt u8, col u16, row u16, f64 value
    LABEL    0x000F  len var fmt u8, col u16, row u16, prefix char
                             (' left, " right, ^ center, \\ repeat),
                             NUL-terminated text
    FORMULA  0x0010          fmt, col, row, f64 cached value, code...
                             (the cached value is used, like every
                             spreadsheet importer)
    EOF      0x0001  len 0

Cells assemble into a grid and surface through the same
``table-columns`` / row-explode children contract as csv/xls/dbf.
Row 0 provides the header when fully labeled, else positional C1..Cn
names (the csv convention).

Self-verification: ``build_wk1`` emits the same records independently;
round-trip + truncation fuzz in tests.  Malformed streams are typed
``wk1_truncated`` broken reasons.
"""
from __future__ import annotations

import struct

_BOF = 0x0000
_EOF = 0x0001
_INTEGER = 0x000D
_NUMBER = 0x000E
_LABEL = 0x000F
_FORMULA = 0x0010

_REVISIONS = (0x0404, 0x0405, 0x0406)


class Wk1Broken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_wk1(data: bytes) -> bool:
    """BOF record with a known revision word right at offset 0."""
    if len(data) < 6:
        return False
    op, ln, rev = struct.unpack_from("<HHH", data)
    return op == _BOF and ln == 2 and rev in _REVISIONS


def _fmt_number(v: float) -> str:
    return f"{v:g}"


def wk1_to_table(data: bytes) -> tuple[dict | None, list[tuple[str, str]]]:
    """(table-info, row children) — the csv explode shape."""
    if not looks_like_wk1(data):
        raise Wk1Broken("wk1_truncated")
    cells: dict[tuple[int, int], str] = {}
    pos = 0
    closed = False
    while pos + 4 <= len(data):
        op, ln = struct.unpack_from("<HH", data, pos)
        pos += 4
        if pos + ln > len(data):
            raise Wk1Broken("wk1_truncated")
        payload = data[pos:pos + ln]
        pos += ln
        if op == _EOF:
            closed = True
            break
        try:
            if op == _INTEGER and ln >= 7:
                _fmt, col, row, v = struct.unpack_from("<BHHh", payload)
                cells[(row, col)] = str(v)
            elif op == _NUMBER and ln >= 13:
                _fmt, col, row = struct.unpack_from("<BHH", payload)
                (v,) = struct.unpack_from("<d", payload, 5)
                cells[(row, col)] = _fmt_number(v)
            elif op == _FORMULA and ln >= 13:
                _fmt, col, row = struct.unpack_from("<BHH", payload)
                (v,) = struct.unpack_from("<d", payload, 5)
                cells[(row, col)] = _fmt_number(v)
            elif op == _LABEL and ln >= 7:
                _fmt, col, row = struct.unpack_from("<BHH", payload)
                text = payload[5:].split(b"\x00", 1)[0]
                if text[:1] in (b"'", b'"', b"^", b"\\"):
                    text = text[1:]
                cells[(row, col)] = text.decode("latin-1")
        except struct.error:
            raise Wk1Broken("wk1_truncated")
    if not closed:
        raise Wk1Broken("wk1_truncated")
    if not cells:
        return None, []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    grid = [[cells.get((r, c), "") for c in range(n_cols)]
            for r in range(n_rows)]
    header = grid[0]
    info = {
        "table-columns": header,
        "table-row-count": n_rows,
        "table-col-count": n_cols,
    }
    from .tables import explode_row

    children = [
        (f"{i}.txt", explode_row(row, header))
        for i, row in enumerate(grid[1:], 1)
    ]
    return info, children


def build_wk1(header: list[str], rows: list[list[str]],
              revision: int = 0x0406) -> bytes:
    """Fixture writer: BOF + one LABEL/NUMBER record per cell + EOF.
    Numeric-looking cells emit NUMBER records, everything else LABEL
    with the left-align prefix (') — the independent emitter for the
    reader's round-trip check."""
    out = bytearray()
    out += struct.pack("<HHH", _BOF, 2, revision)
    for r, row in enumerate([header] + rows):
        for c, v in enumerate(row):
            try:
                num = float(v)
                is_num = v.strip() != "" and not v.startswith("'")
            except ValueError:
                is_num = False
            if is_num:
                out += struct.pack("<HHBHHd", _NUMBER, 13, 0xFF, c, r, num)
            else:
                text = b"'" + v.encode("latin-1") + b"\x00"
                out += struct.pack("<HHBHH", _LABEL, 5 + len(text), 0xFF,
                                   c, r) + text
    out += struct.pack("<HH", _EOF, 0)
    return bytes(out)
