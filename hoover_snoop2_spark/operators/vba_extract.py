"""VBA macro source extraction — public [MS-OVBA] spec.

Macro-enabled Office documents carry a ``vbaProject.bin`` OLE container
(OOXML: a zip member; legacy .doc/.xls: a ``Macros``/``_VBA_PROJECT_CUR``
storage inside the document's own OLE file).  The reference surfaces
macro text through Tika, which accepts every macro-enabled mime
(``snoop/data/analyzers/_tika_mime_types.py:499-532``, the
``*.macroenabled.12`` family).  Here the project is walked natively:

- the ``VBA/dir`` stream decompresses via the [MS-OVBA] §2.4.1
  CompressedContainer codec (4096-byte chunks; literal/copy tokens with
  a position-dependent offset/length bit split),
- its records yield each module's stream name + text offset
  (MODULENAME 0x0019 / MODULENAMEUNICODE 0x0047, MODULESTREAMNAME
  0x001A/0x0032, MODULEOFFSET 0x0031, PROJECTCODEPAGE 0x0003),
- each module stream's bytes past the offset decompress to the source.

Self-verification: the codec ships with a from-scratch COMPRESSOR
implementing the token grammar independently of the decompressor;
round-trip property tests over adversarial shapes (runs, periodic,
text, random) plus a hand-worked copy-token example pin both
directions.  A malformed container is a typed ``vba_*`` broken reason,
never wrong bytes.
"""
from __future__ import annotations

import struct

from .cfb import CfbError, CompoundFile, is_cfb


class VbaBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


# ---------------------------------------------------------------------------
# [MS-OVBA] §2.4.1 compression
# ---------------------------------------------------------------------------


def _copy_token_bits(pos_in_chunk: int) -> int:
    """Offset bit count for a copy token at this position: smallest
    bitCount >= 4 with 2^bitCount >= position ([MS-OVBA] 2.4.1.3.19.3)."""
    bits = 4
    while (1 << bits) < pos_in_chunk:
        bits += 1
    return min(bits, 12)


def decompress_vba(data: bytes) -> bytes:
    """CompressedContainer -> bytes ([MS-OVBA] 2.4.1.2)."""
    if not data or data[0] != 0x01:
        raise VbaBroken("vba_bad_signature")
    out = bytearray()
    pos = 1
    while pos < len(data):
        if pos + 2 > len(data):
            raise VbaBroken("vba_truncated")
        (header,) = struct.unpack_from("<H", data, pos)
        pos += 2
        chunk_len = (header & 0x0FFF) + 3 - 2  # data bytes in this chunk
        if (header >> 12) & 0x7 != 0b011:
            raise VbaBroken("vba_bad_chunk_header")
        compressed = bool(header & 0x8000)
        chunk = data[pos:pos + chunk_len]
        if len(chunk) < chunk_len and compressed:
            raise VbaBroken("vba_truncated")
        pos += chunk_len
        chunk_start = len(out)
        if not compressed:
            # raw chunk: 4096 literal bytes (the final chunk may be short
            # only if the container ends here)
            out += chunk
            continue
        i = 0
        while i < len(chunk) and len(out) - chunk_start < 4096:
            flags = chunk[i]
            i += 1
            for bit in range(8):
                if i >= len(chunk) or len(out) - chunk_start >= 4096:
                    break
                if flags & (1 << bit):
                    if i + 2 > len(chunk):
                        raise VbaBroken("vba_truncated")
                    (token,) = struct.unpack_from("<H", chunk, i)
                    i += 2
                    bits = _copy_token_bits(len(out) - chunk_start)
                    length_mask = 0xFFFF >> bits
                    length = (token & length_mask) + 3
                    offset = (token >> (16 - bits)) + 1
                    if offset > len(out) - chunk_start:
                        raise VbaBroken("vba_bad_copy_token")
                    for _ in range(length):
                        out.append(out[-offset])
                else:
                    out.append(chunk[i])
                    i += 1
    return bytes(out)


def compress_vba(data: bytes) -> bytes:
    """From-scratch [MS-OVBA] compressor (fixture role + the round-trip
    check for the decompressor): greedy longest-match per chunk; falls
    back to a raw chunk when tokens don't win."""
    if not data:
        return b"\x01"
    out = bytearray(b"\x01")
    for cstart in range(0, len(data), 4096):
        chunk_src = data[cstart:cstart + 4096]
        body = bytearray()
        group = bytearray()
        flags = 0
        nbits = 0
        i = 0

        def flush():
            nonlocal flags, nbits
            if nbits:
                body.append(flags)
                body.extend(group)
                group.clear()
                flags = 0
                nbits = 0

        while i < len(chunk_src):
            bits = _copy_token_bits(i)
            length_mask = 0xFFFF >> bits
            max_len = min(length_mask + 3, len(chunk_src) - i)
            max_off = min(1 << bits, i)
            best_len = 0
            best_off = 0
            if max_len >= 3:
                for off in range(1, max_off + 1):
                    l = 0
                    while (l < max_len
                           and chunk_src[i - off + (l % off if off else 0)]
                           == chunk_src[i + l]):
                        # overlapping copies repeat the window
                        l += 1
                    if l > best_len:
                        best_len = l
                        best_off = off
                        if l == max_len:
                            break
            if best_len >= 3:
                token = ((best_off - 1) << (16 - bits)) | (best_len - 3)
                flags |= 1 << nbits
                group.extend(struct.pack("<H", token))
                i += best_len
            else:
                group.append(chunk_src[i])
                i += 1
            nbits += 1
            if nbits == 8:
                flush()
        flush()
        if len(body) < 4096:
            header = (len(body) + 2 - 3) | (0b011 << 12) | 0x8000
            out += struct.pack("<H", header) + bytes(body)
        else:
            # tokens didn't win: raw 4096-byte chunk
            raw = chunk_src.ljust(4096, b"\x00")
            header = (len(raw) + 2 - 3) | (0b011 << 12)
            out += struct.pack("<H", header) + raw
    return bytes(out)


# ---------------------------------------------------------------------------
# dir stream records + module walk
# ---------------------------------------------------------------------------

_REC_CODEPAGE = 0x0003
_REC_PROJECTVERSION = 0x0009
_REC_MODULENAME = 0x0019
_REC_MODULENAME_UNICODE = 0x0047
_REC_STREAMNAME = 0x001A
_REC_STREAMNAME_UNICODE = 0x0032
_REC_MODULEOFFSET = 0x0031
_REC_MODULE_END = 0x002B


def _parse_dir(dir_bytes: bytes) -> tuple[int, list[dict]]:
    """Decompressed dir stream -> (codepage, modules[{name, stream,
    offset}]) via a generic (id, size, data) record walk;
    PROJECTVERSION is the one fixed-width exception ([MS-OVBA] 2.3.4.2)."""
    codepage = 1252
    modules: list[dict] = []
    cur: dict | None = None
    pos = 0
    n = len(dir_bytes)

    def dec(raw: bytes) -> str:
        try:
            return raw.decode(f"cp{codepage}")
        except (UnicodeDecodeError, LookupError):
            return raw.decode("latin-1")

    while pos + 6 <= n:
        rec_id, size = struct.unpack_from("<HI", dir_bytes, pos)
        pos += 6
        if rec_id == _REC_PROJECTVERSION:
            # Reserved u32 read as `size`; payload is fixed 6 bytes
            pos += 6
            continue
        payload = dir_bytes[pos:pos + size]
        pos += size
        if rec_id == _REC_CODEPAGE and size >= 2:
            (codepage,) = struct.unpack_from("<H", payload)
        elif rec_id == _REC_MODULENAME:
            if cur is not None:
                modules.append(cur)
            cur = {"name": dec(payload), "stream": None, "offset": 0}
        elif rec_id == _REC_MODULENAME_UNICODE and cur is not None:
            cur["name"] = payload.decode("utf-16-le", "replace")
        elif rec_id == _REC_STREAMNAME and cur is not None:
            cur["stream"] = dec(payload)
        elif rec_id == _REC_STREAMNAME_UNICODE and cur is not None:
            cur["stream"] = payload.decode("utf-16-le", "replace")
        elif rec_id == _REC_MODULEOFFSET and cur is not None and size >= 4:
            (cur["offset"],) = struct.unpack_from("<I", payload)
        elif rec_id == _REC_MODULE_END and cur is not None:
            modules.append(cur)
            cur = None
    if cur is not None:
        modules.append(cur)
    return codepage, modules


def vba_modules_from_ole(data: bytes) -> list[tuple[str, str]]:
    """OLE container bytes -> [(module_name, source_text)].

    Finds any storage path ending in ``VBA/dir`` — covers standalone
    vbaProject.bin (``VBA/dir``), legacy .doc (``Macros/VBA/dir``) and
    legacy .xls (``_VBA_PROJECT_CUR/VBA/dir``).  Returns [] when the
    container has no VBA project at all; raises ``VbaBroken`` when a
    project exists but is malformed.
    """
    if not is_cfb(data):
        return []
    try:
        cf = CompoundFile(data)
        paths = cf.paths()
    except CfbError:
        return []
    dir_path = None
    for p in paths:
        if p.endswith("VBA/dir"):
            dir_path = p
            break
    if dir_path is None:
        return []
    prefix = dir_path[: -len("dir")]
    try:
        codepage, modules = _parse_dir(
            decompress_vba(cf.read(paths[dir_path]))
        )
    except CfbError:
        raise VbaBroken("vba_truncated")
    out: list[tuple[str, str]] = []
    for m in modules:
        stream = m.get("stream") or m["name"]
        entry = paths.get(prefix + stream)
        if entry is None:
            raise VbaBroken("vba_missing_module_stream")
        raw = cf.read(entry)
        off = m.get("offset", 0)
        if off > len(raw):
            raise VbaBroken("vba_truncated")
        src = decompress_vba(raw[off:])
        try:
            text = src.decode(f"cp{codepage}")
        except (UnicodeDecodeError, LookupError):
            text = src.decode("latin-1", "replace")
        out.append((m["name"], text))
    return out


def vba_modules_from_zip(zip_bytes: bytes) -> list[tuple[str, str]]:
    """OOXML zip -> macro modules from its */vbaProject.bin member
    (docm/xlsm/pptm layout); [] when absent."""
    import io
    import zipfile

    try:
        with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf:
            for name in zf.namelist():
                if name.rsplit("/", 1)[-1] == "vbaProject.bin":
                    return vba_modules_from_ole(zf.read(name))
    except (OSError, zipfile.BadZipFile, KeyError):
        return []
    return []


def zip_has_vba(zip_bytes: bytes) -> bool:
    import io
    import zipfile

    try:
        with zipfile.ZipFile(io.BytesIO(zip_bytes)) as zf:
            return any(n.rsplit("/", 1)[-1] == "vbaProject.bin"
                       for n in zf.namelist())
    except (OSError, zipfile.BadZipFile):
        return False


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def build_vba_project(modules: list[tuple[str, str]],
                      codepage: int = 1252) -> bytes:
    """A minimal conformant vbaProject.bin: VBA storage with dir +
    _VBA_PROJECT + one stream per module (empty performance cache,
    source at offset 0), plus the PROJECT text stream."""
    from .cfb import build_cfb

    def rec(rid: int, payload: bytes) -> bytes:
        return struct.pack("<HI", rid, len(payload)) + payload

    dir_raw = bytearray()
    dir_raw += rec(_REC_CODEPAGE, struct.pack("<H", codepage))
    for name, _src in modules:
        nm = name.encode(f"cp{codepage}")
        dir_raw += rec(_REC_MODULENAME, nm)
        dir_raw += rec(_REC_MODULENAME_UNICODE, name.encode("utf-16-le"))
        dir_raw += rec(_REC_STREAMNAME, nm)
        dir_raw += rec(_REC_STREAMNAME_UNICODE, name.encode("utf-16-le"))
        dir_raw += rec(_REC_MODULEOFFSET, struct.pack("<I", 0))
        dir_raw += rec(_REC_MODULE_END, b"")

    vba_streams = [
        ("dir", compress_vba(bytes(dir_raw))),
        ("_VBA_PROJECT", b"\xcc\x61\xff\xff\x00\x00\x00"),
    ]
    for name, src in modules:
        vba_streams.append(
            (name, compress_vba(src.encode(f"cp{codepage}")))
        )
    project_txt = "".join(
        f"Module={name}\r\n" for name, _ in modules
    ).encode("ascii")
    return build_cfb([("PROJECT", project_txt)], [("VBA", vba_streams)])
