"""Legacy Excel 97-2003 `.xls` (BIFF8) table extraction — public [MS-XLS]
spec, over the CFB reader.

Bounded scope: the SST shared-string table (simple strings, compressed or
UTF-16, no rich/phonetic runs across Continue records) and LABELSST cell
records — the text layer of typical legacy spreadsheets.  Output matches
the csv/xlsx path: table info + 'col = value' row children
(archives.py:206-234 analog).  Numeric cells (RK/NUMBER) are included as
their decimal renderings.
"""

from __future__ import annotations

import struct

from .cfb import CfbError, CompoundFile

_R_BOF = 0x0809
_R_SST = 0x00FC
_R_LABELSST = 0x00FD
_R_NUMBER = 0x0203
_R_RK = 0x027E
_R_CONTINUE = 0x003C


class XlsBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def is_xls(data: bytes) -> bool:
    try:
        cf = CompoundFile(data)
    except (CfbError, struct.error):
        return False
    paths = cf.paths()
    name = "Workbook" if "Workbook" in paths else ("Book" if "Book" in paths else None)
    if name is None:
        return False
    wb = cf.read(paths[name])
    return len(wb) >= 4 and struct.unpack_from("<H", wb, 0)[0] == _R_BOF


def _records(stream: bytes):
    i = 0
    while i + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, i)
        yield rid, stream[i + 4 : i + 4 + ln]
        i += 4 + ln


def _parse_sst(payload: bytes) -> list[str]:
    """XLUnicodeRichExtendedString entries (single-record SST)."""
    out: list[str] = []
    (total, unique) = struct.unpack_from("<II", payload, 0)
    _ = total
    i = 8
    for _n in range(unique):
        if i + 3 > len(payload):
            break
        (cch,) = struct.unpack_from("<H", payload, i)
        grbit = payload[i + 2]
        i += 3
        rich = grbit & 0x08
        ext = grbit & 0x04
        crun = 0
        cbext = 0
        if rich:
            (crun,) = struct.unpack_from("<H", payload, i)
            i += 2
        if ext:
            (cbext,) = struct.unpack_from("<i", payload, i)
            i += 4
        if grbit & 0x01:  # uncompressed UTF-16LE
            out.append(payload[i : i + 2 * cch].decode("utf-16-le", "replace"))
            i += 2 * cch
        else:  # compressed: high bytes are zero
            out.append(payload[i : i + cch].decode("latin-1"))
            i += cch
        i += crun * 4 + cbext
    return out


def _rk_value(rk: int) -> str:
    mult = 0.01 if rk & 0x01 else 1.0
    if rk & 0x02:  # 30-bit *signed* integer — sign-extend before scaling
        iv = rk >> 2
        if rk & 0x80000000:
            iv -= 1 << 30
        if not rk & 0x01:
            return str(iv)  # exact: %g would clip big ints to 6 sig figs
        v = iv * mult
    else:  # top 30 bits of an IEEE double
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0] * mult
    return f"{v:g}"


def xls_to_table(data: bytes) -> tuple[dict | None, list[tuple[str, str]]]:
    """(table-info, row children) — the csv explode shape."""
    try:
        cf = CompoundFile(data)
        paths = cf.paths()
        name = "Workbook" if "Workbook" in paths else "Book"
        wb = cf.read(paths[name])
    except (CfbError, struct.error, KeyError) as e:
        raise XlsBroken("xls_parse_error") from e

    # FILEPASS RC4 ([MS-XLS] §2.2.10): worker-local password first, then
    # Excel's well-known default VelvetSweatshop — the ladder Tika/POI
    # applies transparently.  decrypt_workbook_stream does its own
    # single-walk FILEPASS probe and returns plain streams unchanged.
    from ..functions.archive_crypto import default_archive_password
    from .xls_crypto import XlsCryptoBroken, decrypt_workbook_stream

    try:
        wb = decrypt_workbook_stream(wb, default_archive_password())
    except XlsCryptoBroken as e:
        raise XlsBroken(e.reason) from e

    sst: list[str] = []
    cells: dict[tuple[int, int], str] = {}
    for rid, payload in _records(wb):
        try:
            if rid == _R_SST:
                sst = _parse_sst(payload)
            elif rid == _R_LABELSST and len(payload) >= 10:
                row, col, _ixfe, isst = struct.unpack_from("<HHHI", payload, 0)
                if isst < len(sst):
                    cells[(row, col)] = sst[isst]
            elif rid == _R_NUMBER and len(payload) >= 14:
                row, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
                (v,) = struct.unpack_from("<d", payload, 6)
                cells[(row, col)] = f"{v:g}"
            elif rid == _R_RK and len(payload) >= 10:
                row, col, _ixfe = struct.unpack_from("<HHH", payload, 0)
                (rk,) = struct.unpack_from("<I", payload, 6)
                cells[(row, col)] = _rk_value(rk)
        except struct.error:
            continue

    if not cells:
        return None, []
    n_rows = max(r for r, _ in cells) + 1
    n_cols = max(c for _, c in cells) + 1
    grid = [[cells.get((r, c), "") for c in range(n_cols)] for r in range(n_rows)]
    header = grid[0]
    info = {
        "table-columns": header,
        "table-row-count": n_rows,
        "table-col-count": n_cols,
    }
    from .tables import explode_row

    children = [
        (f"{i}.txt", explode_row(row, header)) for i, row in enumerate(grid[1:], 1)
    ]
    return info, children


def build_xls(header: list[str], rows: list[list[str]]) -> bytes:
    """Deterministic BIFF8 fixture: BOF + SST + LABELSST cells + EOF inside
    a Workbook stream (strings only)."""
    strings: list[str] = []
    index: dict[str, int] = {}

    def sid(s: str) -> int:
        if s not in index:
            index[s] = len(strings)
            strings.append(s)
        return index[s]

    cell_recs = b""
    for r, row in enumerate([header] + rows):
        for c, v in enumerate(row):
            cell_recs += struct.pack("<HH", _R_LABELSST, 10)
            cell_recs += struct.pack("<HHHI", r, c, 0, sid(v))

    sst_body = struct.pack("<II", len(index), len(strings))
    for s in strings:
        try:
            raw = s.encode("latin-1")
            sst_body += struct.pack("<HB", len(s), 0) + raw
        except UnicodeEncodeError:
            raw = s.encode("utf-16-le")
            sst_body += struct.pack("<HB", len(s), 1) + raw

    bof = struct.pack("<HH", _R_BOF, 16) + struct.pack(
        "<HHHHIIH", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0, 0
    )[:16]
    sst = struct.pack("<HH", _R_SST, len(sst_body)) + sst_body
    eof = struct.pack("<HH", 0x000A, 0)
    workbook = bof + sst + cell_recs + eof

    from .doc_extract import _build_cfb

    return _build_cfb([("Workbook", workbook)])
