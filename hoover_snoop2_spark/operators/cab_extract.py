"""Microsoft Cabinet (.cab) extraction — the public [MS-CAB] layout.

The reference Tika-accepts ``application/vnd.ms-cab-compressed``
(``snoop/data/analyzers/_tika_mime_types.py:496``) and lists ``.cab``
in its 7z extension set (``archives.py:43``).  Walked natively here:
CFHEADER (+optional reserve areas), CFFOLDER, CFFILE, and per-folder
CFDATA streams with the per-datablock checksum enforced ([MS-CAB]
CHECKSUM pseudo-code).

Compression types:
- 0 (none): concatenation,
- 1 (MSZIP): per-block ``CK`` + raw deflate, inflated by zlib (an
  independent C implementation — MSZIP fixtures are therefore
  cross-library validated) with the previous block's output as the
  dictionary, per spec,
- 3 | (window << 8) (LZX): one continuous stream per folder through
  the in-repo LZX codec; decoded plain first and retried with CAB's
  16-bit frame re-alignment for real-encoder streams,
- 2 (Quantum): proprietary arithmetic coder — typed
  ``cab_quantum_unsupported`` refusal.

Files slice the folder's uncompressed stream at uoffFolderStart.
Malformed cabinets are typed ``cab_*`` broken reasons.
"""
from __future__ import annotations

import struct
import zlib

from ..functions.lzx_codec import LzxError, lzx_compress, lzx_decompress

CAB_MIME = "application/vnd.ms-cab-compressed"


class CabBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_cab(data: bytes) -> bool:
    return data[:4] == b"MSCF"


def _checksum(data: bytes, seed: int = 0) -> int:
    """[MS-CAB] CHECKSUM: XOR of little-endian u32 words, trailing
    bytes folded high-to-low."""
    csum = seed
    n = len(data) // 4
    for i in range(n):
        (w,) = struct.unpack_from("<I", data, i * 4)
        csum ^= w
    rest = data[n * 4:]
    ul = 0
    for b in rest:
        ul = (ul << 8) | b
    return (csum ^ ul) & 0xFFFFFFFF


def parse_cab(data: bytes) -> list[tuple[str, bytes]]:
    """[(file_name, bytes)] in CFFILE order."""
    if not looks_like_cab(data) or len(data) < 36:
        raise CabBroken("cab_truncated")
    (cb_cabinet,) = struct.unpack_from("<I", data, 8)
    (coff_files,) = struct.unpack_from("<I", data, 16)
    version_minor, version_major = data[24], data[25]
    c_folders, c_files, flags = struct.unpack_from("<HHH", data, 26)
    _ = (cb_cabinet, version_minor, version_major)
    pos = 36
    cb_cfdata_reserve = 0
    if flags & 0x4:  # reserve areas present
        cb_header, cb_folder_reserve, cb_cfdata_reserve = struct.unpack_from(
            "<HBB", data, pos)
        pos += 4 + cb_header
        folder_reserve = cb_folder_reserve
    else:
        folder_reserve = 0
    if flags & 0x1:  # previous cabinet strings
        for _i in range(2):
            pos = data.index(b"\x00", pos) + 1
    if flags & 0x2:  # next cabinet strings
        for _i in range(2):
            pos = data.index(b"\x00", pos) + 1

    folders = []
    for _f in range(c_folders):
        if pos + 8 > len(data):
            raise CabBroken("cab_truncated")
        coff_start, c_cfdata, type_compress = struct.unpack_from(
            "<IHH", data, pos)
        pos += 8 + folder_reserve
        folders.append((coff_start, c_cfdata, type_compress))

    files = []
    pos = coff_files
    for _f in range(c_files):
        if pos + 16 > len(data):
            raise CabBroken("cab_truncated")
        cb_file, uoff, ifolder = struct.unpack_from("<IIH", data, pos)
        attribs = struct.unpack_from("<H", data, pos + 14)[0]
        pos += 16
        end = data.find(b"\x00", pos)
        if end < 0:
            raise CabBroken("cab_truncated")
        raw_name = data[pos:end]
        pos = end + 1
        enc = "utf-8" if attribs & 0x80 else "cp1252"
        name = raw_name.decode(enc, "replace")
        files.append((name, cb_file, uoff, ifolder))

    # decompress folders on demand
    cache: dict[int, bytes] = {}

    def folder_bytes(idx: int) -> bytes:
        if idx in cache:
            return cache[idx]
        if idx >= len(folders):
            raise CabBroken("cab_bad_folder")
        coff, c_cfdata, type_compress = folders[idx]
        method = type_compress & 0xF
        window_bits = (type_compress >> 8) & 0x1F
        blocks = []
        total_uncomp = 0
        pos = coff
        for _b in range(c_cfdata):
            if pos + 8 > len(data):
                raise CabBroken("cab_truncated")
            csum, cb_data, cb_uncomp = struct.unpack_from("<IHH", data, pos)
            payload = data[pos + 8 + cb_cfdata_reserve:
                           pos + 8 + cb_cfdata_reserve + cb_data]
            if len(payload) < cb_data:
                raise CabBroken("cab_truncated")
            if csum:
                expect = _checksum(payload,
                                   _checksum(data[pos + 4:pos + 8], 0))
                if expect != csum:
                    raise CabBroken("cab_checksum_mismatch")
            blocks.append((payload, cb_uncomp))
            total_uncomp += cb_uncomp
            pos += 8 + cb_cfdata_reserve + cb_data
        if method == 0:
            out = b"".join(p for p, _u in blocks)
        elif method == 1:  # MSZIP
            out_parts = []
            history = b""
            for payload, cb_uncomp in blocks:
                if payload[:2] != b"CK":
                    raise CabBroken("cab_bad_mszip")
                try:
                    dobj = zlib.decompressobj(-15, zdict=history)
                    part = dobj.decompress(payload[2:]) + dobj.flush()
                except zlib.error:
                    raise CabBroken("cab_bad_mszip")
                if len(part) != cb_uncomp:
                    raise CabBroken("cab_bad_mszip")
                out_parts.append(part)
                history = part[-32768:]
            out = b"".join(out_parts)
        elif method == 3:  # LZX
            stream = b"".join(p for p, _u in blocks)
            try:
                out = lzx_decompress(stream, total_uncomp,
                                     window_bits or 16)
            except LzxError:
                try:
                    out = lzx_decompress(stream, total_uncomp,
                                         window_bits or 16,
                                         frame_align=True)
                except LzxError as e:
                    raise CabBroken(e.reason)
        elif method == 2:
            raise CabBroken("cab_quantum_unsupported")
        else:
            raise CabBroken("cab_bad_method")
        cache[idx] = out
        return out

    out_files: list[tuple[str, bytes]] = []
    for name, cb_file, uoff, ifolder in files:
        # continuation markers (0xFFFD/0xFFFE/0xFFFF) span cabinets;
        # slice what this cabinet holds
        idx = ifolder if ifolder < 0xFFFD else 0
        stream = folder_bytes(idx)
        if uoff + cb_file > len(stream):
            raise CabBroken("cab_truncated")
        out_files.append((name, stream[uoff:uoff + cb_file]))
    return out_files


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def build_cab(members: list[tuple[str, bytes]],
              method: str = "mszip") -> bytes:
    """One-folder cabinet: ``method`` in none|mszip|lzx; CFDATA blocks
    of <= 0x8000 uncompressed bytes with real checksums (MSZIP blocks
    deflate via zlib — the independent validator for the reader)."""
    stream = bytearray()
    cffiles = []
    for name, payload in members:
        cffiles.append((name, len(payload), len(stream)))
        stream += payload
    total = bytes(stream)

    blocks: list[tuple[bytes, int]] = []
    if method == "none":
        type_compress = 0
        for i in range(0, max(len(total), 1), 0x8000):
            chunk = total[i:i + 0x8000]
            blocks.append((chunk, len(chunk)))
    elif method == "mszip":
        type_compress = 1
        history = b""
        for i in range(0, max(len(total), 1), 0x8000):
            chunk = total[i:i + 0x8000]
            cobj = zlib.compressobj(6, zlib.DEFLATED, -15,
                                    zdict=history) if history else \
                zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = b"CK" + cobj.compress(chunk) + cobj.flush()
            blocks.append((comp, len(chunk)))
            history = chunk[-32768:]
    elif method == "lzx":
        # single-block stream per folder (the in-repo compressor shape);
        # CFDATA carving is arbitrary for our continuous-stream reader
        type_compress = 3 | (16 << 8)
        comp = lzx_compress(total, 16)
        remaining_uncomp = len(total)
        pos = 0
        while pos < len(comp) or remaining_uncomp > 0:
            payload = comp[pos:pos + 0x7000]
            pos += len(payload)
            u = min(remaining_uncomp, 0x8000)
            remaining_uncomp -= u
            blocks.append((payload, u))
            if pos >= len(comp) and remaining_uncomp == 0:
                break
    else:
        raise ValueError(method)

    cfdata = bytearray()
    for payload, uncomp in blocks:
        hdr_tail = struct.pack("<HH", len(payload), uncomp)
        csum = _checksum(payload, _checksum(hdr_tail, 0))
        cfdata += struct.pack("<I", csum) + hdr_tail + payload

    cffile_raw = bytearray()
    for name, cb, uoff in cffiles:
        cffile_raw += struct.pack("<IIHHHH", cb, uoff, 0, 0x226C, 0x59BA,
                                  0x80)
        cffile_raw += name.encode("utf-8") + b"\x00"

    header_len = 36
    cffolder_off = header_len
    cffiles_off = cffolder_off + 8
    cfdata_off = cffiles_off + len(cffile_raw)
    total_len = cfdata_off + len(cfdata)

    hdr = struct.pack("<4sIIIIIBBHHHHH", b"MSCF", 0, total_len, 0,
                      cffiles_off, 0, 3, 1, 1, len(cffiles), 0, 0x1234, 0)
    assert len(hdr) == 36
    cffolder = struct.pack("<IHH", cfdata_off, len(blocks), type_compress)
    return hdr + cffolder + bytes(cffile_raw) + bytes(cfdata)
