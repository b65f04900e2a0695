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
