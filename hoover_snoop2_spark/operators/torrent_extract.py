"""BitTorrent metainfo (.torrent) extraction — the public bencoding
grammar (BEP-3).

The reference Tika-accepts ``application/x-bittorrent``
(``snoop/data/analyzers/_tika_mime_types.py:842``).  A .torrent is one
bencoded dictionary; the interesting strings (name, announce, comment,
created by, per-file paths + lengths) become the digest text in a
stable ``key = value`` layout, and the creation date feeds
``date_created``.  The raw ``pieces`` hash blob is skipped — binary,
and per-spec opaque.

Self-verification: a from-scratch ``bencode`` encoder round-trips the
decoder (bencoding is canonical: one byte-exact encoding per value), so
decode(encode(x)) == x and encode(decode(b)) == b are both asserted in
tests.  Malformed input is a typed ``torrent_bad_bencode`` broken
reason.
"""
from __future__ import annotations

import datetime


class TorrentBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def bdecode(data: bytes) -> object:
    """Strict bencode decode of the WHOLE buffer."""
    val, pos = _bdecode(data, 0)
    if pos != len(data):
        raise TorrentBroken("torrent_bad_bencode")
    return val


def _bdecode(data: bytes, pos: int):
    if pos >= len(data):
        raise TorrentBroken("torrent_bad_bencode")
    c = data[pos:pos + 1]
    if c == b"i":
        end = data.find(b"e", pos)
        if end < 0:
            raise TorrentBroken("torrent_bad_bencode")
        body = data[pos + 1:end]
        if (not body or body == b"-"
                or (body[0:1] == b"0" and len(body) > 1)
                or (body[0:2] == b"-0")):
            raise TorrentBroken("torrent_bad_bencode")
        try:
            return int(body), end + 1
        except ValueError:
            raise TorrentBroken("torrent_bad_bencode")
    if c == b"l":
        out = []
        pos += 1
        while data[pos:pos + 1] != b"e":
            v, pos = _bdecode(data, pos)
            out.append(v)
        return out, pos + 1
    if c == b"d":
        out = {}
        pos += 1
        prev = None
        while data[pos:pos + 1] != b"e":
            k, pos = _bdecode(data, pos)
            if not isinstance(k, bytes) or (prev is not None and k <= prev):
                # keys must be byte strings in sorted order (BEP-3)
                raise TorrentBroken("torrent_bad_bencode")
            prev = k
            v, pos = _bdecode(data, pos)
            out[k] = v
        return out, pos + 1
    if c.isdigit():
        colon = data.find(b":", pos)
        if colon < 0:
            raise TorrentBroken("torrent_bad_bencode")
        ns = data[pos:colon]
        if (not ns.isdigit()
                or (ns[0:1] == b"0" and len(ns) > 1)):
            raise TorrentBroken("torrent_bad_bencode")
        n = int(ns)
        end = colon + 1 + n
        if end > len(data):
            raise TorrentBroken("torrent_bad_bencode")
        return data[colon + 1:end], end
    raise TorrentBroken("torrent_bad_bencode")


def bencode(val) -> bytes:
    """Canonical bencode (the independent round-trip check)."""
    if isinstance(val, int):
        return b"i%de" % val
    if isinstance(val, bytes):
        return b"%d:%s" % (len(val), val)
    if isinstance(val, str):
        raw = val.encode("utf-8")
        return b"%d:%s" % (len(raw), raw)
    if isinstance(val, list):
        return b"l" + b"".join(bencode(v) for v in val) + b"e"
    if isinstance(val, dict):
        items = sorted(
            (k if isinstance(k, bytes) else k.encode("utf-8"), v)
            for k, v in val.items()
        )
        return (b"d"
                + b"".join(bencode(k) + bencode(v) for k, v in items)
                + b"e")
    raise TypeError(type(val))


def looks_like_torrent(data: bytes) -> bool:
    """Full-parse gate: a top-level dict carrying info or announce."""
    if data[:1] != b"d":
        return False
    try:
        top = bdecode(data)
    except TorrentBroken:
        return False
    return isinstance(top, dict) and (b"info" in top or b"announce" in top)


def _dec(raw: bytes) -> str:
    return raw.decode("utf-8", "replace")


def torrent_to_text(data: bytes) -> tuple[str, str | None]:
    """(text, date_created) from the metainfo dict."""
    top = bdecode(data)
    if not isinstance(top, dict):
        raise TorrentBroken("torrent_bad_bencode")
    lines: list[str] = []
    info = top.get(b"info") if isinstance(top.get(b"info"), dict) else {}
    name = info.get(b"name")
    if isinstance(name, bytes):
        lines.append(f"name = {_dec(name)}")
    for key, label in ((b"announce", "announce"),
                       (b"comment", "comment"),
                       (b"created by", "created by")):
        v = top.get(key)
        if isinstance(v, bytes):
            lines.append(f"{label} = {_dec(v)}")
    if isinstance(info.get(b"length"), int):
        lines.append(f"length = {info[b'length']}")
    files = info.get(b"files")
    if isinstance(files, list):
        for f in files:
            if not isinstance(f, dict):
                continue
            path = f.get(b"path")
            length = f.get(b"length")
            if isinstance(path, list):
                p = "/".join(_dec(seg) for seg in path
                             if isinstance(seg, bytes))
                lines.append(f"file = {p} ({length})")
    date = None
    cd = top.get(b"creation date")
    if isinstance(cd, int) and 0 <= cd < 2**33:
        date = datetime.datetime.fromtimestamp(
            cd, datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    return "\n".join(lines), date
