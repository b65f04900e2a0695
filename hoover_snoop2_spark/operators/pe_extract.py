"""PE executable metadata — the public PE/COFF layout.

The reference Tika-accepts ``application/x-msdownload`` (pe/pe32/pe64
variants, ``_tika_mime_types.py:939-942``) and reports executable
metadata.  Here the header walk is native: MZ stub -> e_lfanew ->
``PE\\0\\0`` -> COFF (machine, section count, link timestamp) ->
optional-header magic (PE32 vs PE32+) and subsystem.  The digest gets
the link timestamp as ``date_created`` — the only date a bare
executable carries.

Sniffing demands the full MZ -> PE chain, so random ``MZ``-leading
bytes don't match.
"""
from __future__ import annotations

import datetime
import struct

PE_MIME = "application/x-msdownload"

_MACHINES = {
    0x014C: "i386",
    0x0200: "ia64",
    0x8664: "x86-64",
    0x01C0: "arm",
    0xAA64: "arm64",
    0x01C4: "armnt",
}

_SUBSYSTEMS = {
    1: "native",
    2: "windows-gui",
    3: "windows-cui",
    5: "os2-cui",
    7: "posix-cui",
    9: "windows-ce-gui",
    10: "efi-application",
}


class PeBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_pe(data: bytes) -> bool:
    if data[:2] != b"MZ" or len(data) < 0x40:
        return False
    (e_lfanew,) = struct.unpack_from("<I", data, 0x3C)
    return (0x40 <= e_lfanew < len(data) - 4
            and data[e_lfanew:e_lfanew + 4] == b"PE\x00\x00")


def parse_pe(data: bytes) -> dict:
    """{machine, n_sections, timestamp, pe_format, subsystem}."""
    if not looks_like_pe(data):
        raise PeBroken("pe_truncated")
    (e_lfanew,) = struct.unpack_from("<I", data, 0x3C)
    coff = e_lfanew + 4
    if coff + 20 > len(data):
        raise PeBroken("pe_truncated")
    machine, n_sections, ts = struct.unpack_from("<HHI", data, coff)
    (opt_size,) = struct.unpack_from("<H", data, coff + 16)
    out = {
        "machine": _MACHINES.get(machine, f"0x{machine:04x}"),
        "n_sections": n_sections,
        "timestamp": None,
        "pe_format": None,
        "subsystem": None,
    }
    if 0 < ts < 2**32 - 1:
        out["timestamp"] = datetime.datetime.fromtimestamp(
            ts, datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    opt = coff + 20
    if opt_size >= 2 and opt + 2 <= len(data):
        (magic,) = struct.unpack_from("<H", data, opt)
        if magic == 0x10B:
            out["pe_format"] = "pe32"
        elif magic == 0x20B:
            out["pe_format"] = "pe32+"
    if opt_size >= 70 and opt + 70 <= len(data):
        (subsystem,) = struct.unpack_from("<H", data, opt + 68)
        out["subsystem"] = _SUBSYSTEMS.get(subsystem, str(subsystem))
    return out


def build_pe(machine: int = 0x8664, n_sections: int = 3,
             timestamp: int = 0, pe32plus: bool = True,
             subsystem: int = 3) -> bytes:
    """Minimal structurally-valid PE fixture."""
    e_lfanew = 0x80
    hdr = bytearray(e_lfanew)
    hdr[:2] = b"MZ"
    struct.pack_into("<I", hdr, 0x3C, e_lfanew)
    opt = bytearray(96 if pe32plus else 96)
    struct.pack_into("<H", opt, 0, 0x20B if pe32plus else 0x10B)
    struct.pack_into("<H", opt, 68, subsystem)
    coff = struct.pack("<4sHHIIIHH", b"PE\x00\x00", machine, n_sections,
                       timestamp, 0, 0, len(opt), 0x0102)
    return bytes(hdr) + coff + bytes(opt) + b"\x00" * 64
