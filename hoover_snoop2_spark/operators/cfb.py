"""Minimal Compound File Binary (OLE2) reader — public [MS-CFB] spec.

The reference leans on libmagic + external tools for OLE containers
(`msgconvert` for .msg, Tika for legacy office; magic.py:106-111 rewrites
OLE → ms-excel).  This reader gives us direct access to OLE streams so
Outlook .msg extraction (operators/msg_extract.py) runs in-process.

Supports: 512/4096-byte sectors, FAT + DIFAT chains, mini-FAT streams,
red-black directory tree flattened to (path, size, data) entries.
"""

from __future__ import annotations

import struct

MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"

_FREESECT = 0xFFFFFFFF
_ENDOFCHAIN = 0xFFFFFFFE
_MAX_CHAIN = 1 << 20  # cycle guard


class CfbError(Exception):
    pass


class CompoundFile:
    def __init__(self, data: bytes):
        if data[:8] != MAGIC:
            raise CfbError("not a compound file")
        self.data = data
        (self.sector_shift,) = struct.unpack_from("<H", data, 30)
        (self.mini_shift,) = struct.unpack_from("<H", data, 32)
        self.sector_size = 1 << self.sector_shift
        self.mini_size = 1 << self.mini_shift
        (self.n_fat_sectors,) = struct.unpack_from("<I", data, 44)
        (self.dir_start,) = struct.unpack_from("<I", data, 48)
        (self.mini_cutoff,) = struct.unpack_from("<I", data, 56)
        (self.minifat_start,) = struct.unpack_from("<I", data, 60)
        (self.n_minifat,) = struct.unpack_from("<I", data, 64)
        (self.difat_start,) = struct.unpack_from("<I", data, 68)
        (self.n_difat,) = struct.unpack_from("<I", data, 72)

        # DIFAT: first 109 entries in the header, then chained sectors
        difat = list(struct.unpack_from("<109I", data, 76))
        sid = self.difat_start
        for _ in range(self.n_difat):
            if sid in (_FREESECT, _ENDOFCHAIN):
                break
            sector = self._sector(sid)
            entries = struct.unpack(f"<{self.sector_size // 4}I", sector)
            difat.extend(entries[:-1])
            sid = entries[-1]
        self.fat: list[int] = []
        for fsid in difat:
            if fsid in (_FREESECT, _ENDOFCHAIN):
                continue
            self.fat.extend(
                struct.unpack(f"<{self.sector_size // 4}I", self._sector(fsid))
            )

        self.minifat: list[int] = []
        for sec in self._chain_sectors(self.minifat_start):
            self.minifat.extend(struct.unpack(f"<{self.sector_size // 4}I", sec))

        self.entries = self._read_directory()
        root = next((e for e in self.entries if e["type"] == 5), None)
        self.mini_stream = (
            self._read_chain(root["start"], root["size"]) if root else b""
        )

    def _sector(self, sid: int) -> bytes:
        off = (sid + 1) * self.sector_size
        sec = self.data[off : off + self.sector_size]
        if len(sec) < self.sector_size:
            sec = sec + b"\x00" * (self.sector_size - len(sec))
        return sec

    def _chain_sectors(self, start: int):
        sid, seen = start, 0
        while sid not in (_FREESECT, _ENDOFCHAIN) and sid < len(self.fat) + 2:
            yield self._sector(sid)
            if sid >= len(self.fat) or seen > _MAX_CHAIN:
                break
            sid = self.fat[sid]
            seen += 1

    def _read_chain(self, start: int, size: int) -> bytes:
        out = b"".join(self._chain_sectors(start))
        return out[:size]

    def _read_mini_chain(self, start: int, size: int) -> bytes:
        out = bytearray()
        sid, seen = start, 0
        while sid not in (_FREESECT, _ENDOFCHAIN) and sid < len(self.minifat):
            off = sid * self.mini_size
            out += self.mini_stream[off : off + self.mini_size]
            sid = self.minifat[sid]
            seen += 1
            if seen > _MAX_CHAIN:
                break
        return bytes(out[:size])

    def _read_directory(self) -> list[dict]:
        raw = b"".join(self._chain_sectors(self.dir_start))
        entries = []
        for i in range(len(raw) // 128):
            chunk = raw[i * 128 : (i + 1) * 128]
            (name_len,) = struct.unpack_from("<H", chunk, 64)
            if name_len < 2 or name_len > 64:
                continue
            name = chunk[: name_len - 2].decode("utf-16-le", errors="replace")
            obj_type = chunk[66]
            (start,) = struct.unpack_from("<I", chunk, 116)
            (size,) = struct.unpack_from("<Q", chunk, 120)
            if self.sector_shift == 9:
                size &= 0xFFFFFFFF  # v3 files: only the low 32 bits are valid
            left, right, child = struct.unpack_from("<3I", chunk, 68)
            entries.append(
                dict(index=i, name=name, type=obj_type, start=start,
                     size=size, left=left, right=right, child=child)
            )
        return entries

    # -- public API ---------------------------------------------------------

    def paths(self) -> dict[str, dict]:
        """Flatten the directory red-black tree into '/'-joined paths."""
        by_index = {e["index"]: e for e in self.entries}
        out: dict[str, dict] = {}

        def walk(idx: int, prefix: str, depth: int = 0):
            if idx == 0xFFFFFFFF or idx not in by_index or depth > 64:
                return
            e = by_index[idx]
            walk(e["left"], prefix, depth + 1)
            walk(e["right"], prefix, depth + 1)
            path = f"{prefix}{e['name']}"
            if e["type"] == 2:  # stream
                out[path] = e
            if e["type"] in (1, 5) and e["child"] != 0xFFFFFFFF:  # storage/root
                walk(e["child"], f"{path}/" if e["type"] == 1 else prefix,
                     depth + 1)

        root = next((e for e in self.entries if e["type"] == 5), None)
        if root is not None:
            walk(root["child"], "")
        return out

    def read(self, entry: dict) -> bytes:
        if entry["size"] < self.mini_cutoff and entry["type"] != 5:
            return self._read_mini_chain(entry["start"], entry["size"])
        return self._read_chain(entry["start"], entry["size"])


def is_cfb(data: bytes) -> bool:
    return data[:8] == MAGIC


# ---------------------------------------------------------------------------
# minimal CFB writer (fixture role) — factored out of msg_extract.build_msg
# so .msg and vbaProject.bin fixtures share one [MS-CFB] emitter
# ---------------------------------------------------------------------------


def build_cfb(streams: list[tuple[str, bytes]],
              storages: list[tuple[str, list[tuple[str, bytes]]]] | None = None,
              ) -> bytes:
    """Write a minimal valid CFB file: top-level ``streams`` plus
    one-level ``storages`` each holding substreams.  512-byte sectors;
    streams under the 4096-byte mini cutoff live in the mini stream,
    larger ones get regular FAT chains (so macro-sized vbaProject.bin
    module streams round-trip too); multiple FAT sectors are laid out
    through the header DIFAT (up to 109 — ~7 MB, ample for fixtures).
    """
    storages = storages or []
    SECT = 512
    MINI = 64
    CUTOFF = 4096

    mini_data = bytearray()
    mini_fat: list[int] = []
    big_payloads: list[bytes] = []  # regular-FAT streams, in layout order

    def add_mini(payload: bytes) -> tuple[int, int]:
        start = len(mini_fat)
        n = max(1, (len(payload) + MINI - 1) // MINI)
        mini_data.extend(payload)
        pad = (-len(payload)) % MINI
        mini_data.extend(b"\x00" * pad)
        for i in range(n - 1):
            mini_fat.append(start + i + 1)
        mini_fat.append(_ENDOFCHAIN)
        return start, len(payload)

    entries: list[dict] = []

    def entry(name, typ, start=_ENDOFCHAIN, size=0, child=0xFFFFFFFF):
        entries.append(dict(name=name, type=typ, start=start, size=size,
                            left=0xFFFFFFFF, right=0xFFFFFFFF, child=child))
        return len(entries) - 1

    def add_stream(name: str, payload: bytes) -> int:
        if not payload:
            # empty stream: no chain at all ([MS-CFB] start=ENDOFCHAIN)
            return entry(name, 2, _ENDOFCHAIN, 0)
        if len(payload) < CUTOFF:
            s, n = add_mini(payload)
            return entry(name, 2, s, n)
        idx = entry(name, 2, 0, len(payload))
        entries[idx]["big"] = len(big_payloads)  # resolved after layout
        big_payloads.append(payload)
        return idx

    root_idx = entry("Root Entry", 5)
    top_indices = []
    for name, payload in streams:
        top_indices.append(add_stream(name, payload))
    for sname, substreams in storages:
        st_idx = entry(sname, 1)
        sub_indices = [add_stream(n, p) for n, p in substreams]
        entries[st_idx]["child"] = sub_indices[0]
        for a, b in zip(sub_indices, sub_indices[1:]):
            entries[a]["right"] = b
        top_indices.append(st_idx)
    entries[root_idx]["child"] = top_indices[0]
    for a, b in zip(top_indices, top_indices[1:]):
        entries[a]["right"] = b

    mini_total = len(mini_data)
    n_dir_sectors = max(1, (len(entries) * 128 + SECT - 1) // SECT)
    minifat_raw = b"".join(struct.pack("<I", v) for v in mini_fat)
    n_minifat_sectors = max(1, (len(minifat_raw) + SECT - 1) // SECT)
    n_mini_sectors = max(1, (mini_total + SECT - 1) // SECT)
    big_sectors = [(len(p) + SECT - 1) // SECT for p in big_payloads]

    # solve the FAT-sector count: FAT sectors also occupy FAT slots
    non_fat = (n_dir_sectors + n_minifat_sectors + n_mini_sectors
               + sum(big_sectors))
    n_fat = 1
    while n_fat * (SECT // 4) < n_fat + non_fat:
        n_fat += 1
    if n_fat > 109:
        raise ValueError("build_cfb fixture too large for header DIFAT")

    fat_sid = 0  # FAT sectors first: sids [0, n_fat)
    dir_sid = n_fat
    minifat_sid = dir_sid + n_dir_sectors
    ministream_sid = minifat_sid + n_minifat_sectors
    big_sid = ministream_sid + n_mini_sectors
    starts = []
    pos = big_sid
    for n in big_sectors:
        starts.append(pos)
        pos += n
    total_sectors = pos

    entries[root_idx]["start"] = ministream_sid
    entries[root_idx]["size"] = mini_total
    for e in entries:
        if "big" in e:
            e["start"] = starts[e.pop("big")]

    dir_raw = bytearray()
    for e in entries:
        name_bytes = e["name"].encode("utf-16-le")[:62] + b"\x00\x00"
        chunk = bytearray(128)
        chunk[: len(name_bytes)] = name_bytes
        struct.pack_into("<H", chunk, 64, len(name_bytes))
        chunk[66] = e["type"]
        chunk[67] = 1  # black
        struct.pack_into("<3I", chunk, 68, e["left"], e["right"], e["child"])
        struct.pack_into("<I", chunk, 116,
                         e["start"] if e["start"] != _ENDOFCHAIN else _ENDOFCHAIN)
        struct.pack_into("<Q", chunk, 120, e["size"])
        dir_raw += chunk
    dir_raw += b"\x00" * ((-len(dir_raw)) % SECT)

    fat = [_FREESECT] * (n_fat * (SECT // 4))
    for i in range(n_fat):
        fat[fat_sid + i] = 0xFFFFFFFD  # FATSECT marker
    def chain(first: int, count: int) -> None:
        for i in range(count):
            fat[first + i] = first + i + 1 if i < count - 1 else _ENDOFCHAIN
    chain(dir_sid, n_dir_sectors)
    chain(minifat_sid, n_minifat_sectors)
    chain(ministream_sid, n_mini_sectors)
    for first, count in zip(starts, big_sectors):
        chain(first, count)

    header = bytearray(512)
    header[:8] = MAGIC
    struct.pack_into("<H", header, 26, 0x003E)  # minor version
    struct.pack_into("<H", header, 28, 0x0003)  # major version 3
    struct.pack_into("<H", header, 24, 0)
    struct.pack_into("<H", header, 30, 9)   # 512-byte sectors
    struct.pack_into("<H", header, 32, 6)   # 64-byte mini sectors
    struct.pack_into("<I", header, 44, n_fat)
    struct.pack_into("<I", header, 48, dir_sid)
    struct.pack_into("<I", header, 56, CUTOFF)
    struct.pack_into("<I", header, 60, minifat_sid)
    struct.pack_into("<I", header, 64, n_minifat_sectors)
    struct.pack_into("<I", header, 68, _ENDOFCHAIN)  # no DIFAT chain
    struct.pack_into("<I", header, 72, 0)
    difat = [fat_sid + i for i in range(n_fat)] + [_FREESECT] * (109 - n_fat)
    struct.pack_into("<109I", header, 76, *difat)

    out = bytearray(header)
    out += b"".join(struct.pack("<I", v) for v in fat)
    out += dir_raw
    out += minifat_raw.ljust(n_minifat_sectors * SECT, b"\x00")
    out += bytes(mini_data).ljust(n_mini_sectors * SECT, b"\x00")
    for p in big_payloads:
        out += p + b"\x00" * ((-len(p)) % SECT)
    assert len(out) == (total_sectors + 1) * SECT, (len(out), total_sectors)
    return bytes(out)
