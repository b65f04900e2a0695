"""SQLite database extraction — the public SQLite file format
(https://www.sqlite.org/fileformat2.html), read natively: page-1 header,
table B-tree walk (interior + leaf pages), record serial-type decode,
and overflow-page chains.  No libsqlite — this runs inside an Arrow
batch like every other parser here.

The reference's Tika list predates its JDBC sqlite parser, so this is a
beyond-reference addition: investigation corpora are full of .db blobs
(browser history, message stores) and a 100-TB pipeline should explode
them like any other table container.  Each ordinary rowid table becomes
rows of ``<table>/<n>.txt`` children through ``tables.explode_row`` —
the same contract as csv/xls/dbf/wk1; the first table also fills the
digest's ``table-columns``/``table-row-count`` fields.

Covered: utf-8/utf-16 encodings, all serial types, INTEGER PRIMARY KEY
rowid aliasing, overflow chains, multi-page trees.  Skipped by design:
indexes/views/triggers (no row data), WITHOUT ROWID tables (index-tree
layout; surfaced in the schema scan but contribute no rows), WAL
side-files (separate blobs).

Self-verification: every test databases is CREATED with Python's
stdlib ``sqlite3`` (an independent C implementation) and read back with
this parser — byte-for-byte row agreement, including blobs, NULLs,
negative ints, floats, and >1-page overflow values.  Malformed files
are typed ``sqlite_*`` broken reasons.
"""
from __future__ import annotations

import re
import struct

MAGIC = b"SQLite format 3\x00"


class SqliteBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def _varint(data: bytes, pos: int) -> tuple[int, int]:
    """SQLite big-endian varint -> (value, next_pos)."""
    v = 0
    for i in range(8):
        if pos + i >= len(data):
            raise SqliteBroken("sqlite_truncated")
        b = data[pos + i]
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos + i + 1
    if pos + 8 >= len(data):
        raise SqliteBroken("sqlite_truncated")
    return (v << 8) | data[pos + 8], pos + 9


class _Db:
    def __init__(self, data: bytes):
        if data[:16] != MAGIC or len(data) < 100:
            raise SqliteBroken("sqlite_truncated")
        (ps,) = struct.unpack_from(">H", data, 16)
        self.page_size = 65536 if ps == 1 else ps
        if self.page_size < 512 or self.page_size & (self.page_size - 1):
            raise SqliteBroken("sqlite_bad_header")
        self.reserved = data[20]
        self.usable = self.page_size - self.reserved
        (enc,) = struct.unpack_from(">I", data, 56)
        self.encoding = {1: "utf-8", 2: "utf-16-le", 3: "utf-16-be"}.get(
            enc, "utf-8")
        self.data = data
        self.n_pages = len(data) // self.page_size

    def page(self, n: int) -> bytes:
        if n < 1 or n > self.n_pages:
            raise SqliteBroken("sqlite_truncated")
        off = (n - 1) * self.page_size
        return self.data[off:off + self.page_size]

    # ---- payload assembly (local + overflow chain) ----
    def _payload(self, page: bytes, pos: int, total: int) -> bytes:
        u = self.usable
        max_local = u - 35
        if total <= max_local:
            if pos + total > len(page):
                raise SqliteBroken("sqlite_truncated")
            return page[pos:pos + total]
        min_local = (u - 12) * 32 // 255 - 23
        local = min_local + (total - min_local) % (u - 4)
        if local > max_local:
            local = min_local
        if pos + local + 4 > len(page):
            raise SqliteBroken("sqlite_truncated")
        out = bytearray(page[pos:pos + local])
        (nxt,) = struct.unpack_from(">I", page, pos + local)
        remaining = total - local
        seen = set()
        while remaining > 0:
            if nxt == 0 or nxt in seen:
                raise SqliteBroken("sqlite_truncated")
            seen.add(nxt)
            p = self.page(nxt)
            (nxt,) = struct.unpack_from(">I", p, 0)
            chunk = p[4:4 + min(remaining, self.usable - 4)]
            out += chunk
            remaining -= len(chunk)
        return bytes(out)

    # ---- record decode ----
    def _record(self, payload: bytes) -> list:
        hlen, pos = _varint(payload, 0)
        types = []
        while pos < hlen:
            t, pos = _varint(payload, pos)
            types.append(t)
        vals = []
        body = hlen
        for t in types:
            if t == 0:
                vals.append(None)
            elif 1 <= t <= 6:
                size = {1: 1, 2: 2, 3: 3, 4: 4, 5: 6, 6: 8}[t]
                raw = payload[body:body + size]
                if len(raw) < size:
                    raise SqliteBroken("sqlite_truncated")
                vals.append(int.from_bytes(raw, "big", signed=True))
                body += size
            elif t == 7:
                (v,) = struct.unpack_from(">d", payload, body)
                vals.append(v)
                body += 8
            elif t == 8:
                vals.append(0)
            elif t == 9:
                vals.append(1)
            elif t >= 12 and t % 2 == 0:
                n = (t - 12) // 2
                vals.append(payload[body:body + n])
                body += n
            elif t >= 13:
                n = (t - 13) // 2
                vals.append(payload[body:body + n].decode(
                    self.encoding, "replace"))
                body += n
            else:
                raise SqliteBroken("sqlite_bad_record")
        return vals

    # ---- table b-tree walk ----
    def table_rows(self, rootpage: int):
        """Yield (rowid, values) for every leaf cell, tree order."""
        stack = [rootpage]
        seen = set()
        while stack:
            pno = stack.pop()
            if pno in seen:
                raise SqliteBroken("sqlite_bad_tree")
            seen.add(pno)
            page = self.page(pno)
            hdr = 100 if pno == 1 else 0
            ptype = page[hdr]
            (ncells,) = struct.unpack_from(">H", page, hdr + 3)
            if ptype == 0x05:  # interior table
                (right,) = struct.unpack_from(">I", page, hdr + 8)
                kids = []
                for i in range(ncells):
                    (cp,) = struct.unpack_from(">H", page, hdr + 12 + 2 * i)
                    (child,) = struct.unpack_from(">I", page, cp)
                    kids.append(child)
                kids.append(right)
                stack.extend(reversed(kids))
            elif ptype == 0x0D:  # leaf table
                for i in range(ncells):
                    (cp,) = struct.unpack_from(">H", page, hdr + 8 + 2 * i)
                    total, pos = _varint(page, cp)
                    rowid, pos = _varint(page, pos)
                    payload = self._payload(page, pos, total)
                    yield rowid, self._record(payload)
            else:
                raise SqliteBroken("sqlite_bad_tree")


_CONSTRAINT_KEYWORDS = frozenset(
    "primary unique check foreign constraint".split())


def _columns_from_sql(sql: str) -> tuple[list[str], int]:
    """CREATE TABLE sql -> (column names, INTEGER-PRIMARY-KEY index or
    -1).  Top-level comma split; quoted identifiers unwrapped."""
    m = re.search(r"\((.*)\)\s*(?:WITHOUT\s+ROWID\s*)?$", sql,
                  re.DOTALL | re.IGNORECASE)
    if not m:
        return [], -1
    inner = m.group(1)
    parts = []
    depth = 0
    cur = []
    in_q = None
    for ch in inner:
        if in_q:
            cur.append(ch)
            if ch == in_q:
                in_q = None
            continue
        if ch in "'\"`[":
            in_q = "]" if ch == "[" else ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    cols = []
    ipk = -1
    for part in parts:
        s = part.strip()
        if not s:
            continue
        first = s.split(None, 1)[0]
        if first.lower() in _CONSTRAINT_KEYWORDS:
            continue
        if first[0] in "'\"`[":
            name = re.match(r"""(['"`\[])((?:[^'"`\]])*)""", s).group(2)
        else:
            name = re.split(r"[\s(]", first)[0]
        cols.append(name)
        if re.match(r"""^['"`\[]?\w+['"`\]]?\s+INTEGER\s+PRIMARY\s+KEY""",
                    s, re.IGNORECASE):
            ipk = len(cols) - 1
    return cols, ipk


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, float):
        return f"{v:g}"
    return str(v)


def sqlite_to_tables(data: bytes) -> tuple[dict | None,
                                           list[tuple[str, str]]]:
    """(first-table info, row children across all rowid tables)."""
    db = _Db(data)
    # sqlite_master: root at page 1, schema (type,name,tbl_name,root,sql)
    tables: list[tuple[str, int, str]] = []
    for _rowid, rec in db.table_rows(1):
        if len(rec) >= 5 and rec[0] == "table" and rec[3]:
            sql = rec[4] or ""
            if re.search(r"WITHOUT\s+ROWID\s*$",
                         sql.strip().rstrip(";"), re.IGNORECASE):
                continue  # index-tree layout, no rowid cells
            tables.append((rec[1], int(rec[3]), sql))

    from .tables import explode_row

    info = None
    children: list[tuple[str, str]] = []
    for tname, root, sql in tables:
        cols, ipk = _columns_from_sql(sql)
        nrows = 0
        for rowid, rec in db.table_rows(root):
            if ipk >= 0 and ipk < len(rec) and rec[ipk] is None:
                rec = list(rec)
                rec[ipk] = rowid  # INTEGER PRIMARY KEY aliases the rowid
            row = [_fmt(v) for v in rec]
            nrows += 1
            children.append(
                (f"{tname}/{nrows}.txt", explode_row(row, cols or None))
            )
        if info is None:
            info = {
                "table-columns": cols,
                "table-row-count": nrows + 1,
                "table-col-count": len(cols),
            }
    return info, children
