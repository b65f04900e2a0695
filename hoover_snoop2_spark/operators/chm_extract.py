"""CHM (Compiled HTML Help / ITSS) extraction — the public ITSF/ITSP
container layout with LZXC-compressed content sections, decoded by the
in-repo LZX codec (functions/lzx_codec.py).

The reference Tika-parses ``application/vnd.ms-htmlhelp``
(``snoop/data/analyzers/_tika_mime_types.py:509``).  Layout walked
here:

- ITSF header (v3): header-section table + content offset,
- ITSP directory: PMGL listing chunks with ENCINT-coded entries
  (name, content-section, offset, length),
- section 0 files read directly at content_offset + offset,
- section 1 (``MSCompressed``): the ``Content`` blob decompresses via
  LZX using ``ControlData`` (LZXC version/window/reset interval) and
  the ``ResetTable`` (compressed offset per 0x8000 frame; a fresh LZX
  stream begins every reset interval) — entries then slice the
  uncompressed stream.

Every HTML/text member becomes a child row and recurses through the
normal dispatch (the html extractor pulls the text), mirroring how the
reference's Tika emits CHM members as embedded documents.

Self-verification: ``build_chm`` writes the same container
independently (sorted PMGL entries, ENCINTs, LZXC control data, per-
frame reset table) over the in-repo LZX COMPRESSOR; round-trip +
truncation fuzz in tests.  Malformed files are typed ``chm_*`` broken
reasons.
"""
from __future__ import annotations

import struct

from ..functions.lzx_codec import LzxError, lzx_compress, lzx_decompress

CHM_MIME = "application/vnd.ms-htmlhelp"
_FRAME = 0x8000

_RESET_TABLE = ("::DataSpace/Storage/MSCompressed/Transform/"
                "{7FC28940-9D31-11D0-9B27-00A0C91E9C7C}/"
                "InstanceData/ResetTable")
_CONTENT = "::DataSpace/Storage/MSCompressed/Content"
_CONTROL = "::DataSpace/Storage/MSCompressed/ControlData"
_SPANINFO = "::DataSpace/Storage/MSCompressed/SpanInfo"


class ChmBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def looks_like_chm(data: bytes) -> bool:
    return data[:8] == b"ITSF\x03\x00\x00\x00"


# ---------------------------------------------------------------------------
# ENCINT (7-bit big-endian varint)
# ---------------------------------------------------------------------------


def _encint(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    for _ in range(9):
        if pos >= len(data):
            raise ChmBroken("chm_truncated")
        b = data[pos]
        pos += 1
        v = (v << 7) | (b & 0x7F)
        if not b & 0x80:
            return v, pos
    raise ChmBroken("chm_truncated")


def _enc(v: int) -> bytes:
    out = bytearray([v & 0x7F])
    v >>= 7
    while v:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    return bytes(reversed(out))


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


def parse_chm(data: bytes) -> dict[str, bytes]:
    """{entry_name: bytes} for every directory entry (metadata ``::``
    names included; callers filter)."""
    if not looks_like_chm(data) or len(data) < 0x60:
        raise ChmBroken("chm_truncated")
    (hdr_len,) = struct.unpack_from("<I", data, 8)
    # header-section table: entry 0 (file-size section) at 0x38,
    # entry 1 (the ITSP directory) at 0x48, content offset at 0x58
    dir_off, dir_len = struct.unpack_from("<QQ", data, 0x48)
    (content_off,) = struct.unpack_from("<Q", data, 0x58)
    if dir_off + dir_len > len(data):
        raise ChmBroken("chm_truncated")
    _ = hdr_len

    # ITSP
    if data[dir_off:dir_off + 4] != b"ITSP":
        raise ChmBroken("chm_bad_directory")
    (chunk_size,) = struct.unpack_from("<I", data, dir_off + 16)
    (num_chunks,) = struct.unpack_from("<I", data, dir_off + 44)
    (itsp_len,) = struct.unpack_from("<I", data, dir_off + 8)

    entries: dict[str, tuple[int, int, int]] = {}
    base = dir_off + itsp_len
    for ci in range(num_chunks):
        chunk = data[base + ci * chunk_size: base + (ci + 1) * chunk_size]
        if chunk[:4] != b"PMGL":
            continue  # PMGI index chunks are for seeking; we scan
        (quickref_len,) = struct.unpack_from("<I", chunk, 4)
        pos = 20
        end = chunk_size - quickref_len
        while pos < end:
            nlen, pos = _encint(chunk, pos)
            if nlen == 0 or pos + nlen > end:
                break
            name = chunk[pos:pos + nlen].decode("utf-8", "replace")
            pos += nlen
            section, pos = _encint(chunk, pos)
            offset, pos = _encint(chunk, pos)
            length, pos = _encint(chunk, pos)
            entries[name] = (section, offset, length)

    def read0(name: str) -> bytes | None:
        e = entries.get(name)
        if e is None or e[0] != 0:
            return None
        _s, off, ln = e
        if content_off + off + ln > len(data):
            raise ChmBroken("chm_truncated")
        return data[content_off + off: content_off + off + ln]

    # decompress section 1 when present
    section1 = b""
    if any(s == 1 for s, _o, _l in entries.values()):
        blob = read0(_CONTENT)
        control = read0(_CONTROL)
        reset = read0(_RESET_TABLE)
        span = read0(_SPANINFO)
        if blob is None or control is None or reset is None:
            raise ChmBroken("chm_missing_compression_metadata")
        if control[4:8] != b"LZXC":
            raise ChmBroken("chm_bad_control_data")
        version, reset_interval, window_size = struct.unpack_from(
            "<III", control, 8)
        if version == 2:
            # v2 stores interval/window in 0x8000 units
            window_bytes = window_size * _FRAME
            interval_frames = reset_interval
        else:
            window_bytes = window_size
            interval_frames = max(reset_interval // _FRAME, 1)
        window_bits = max(window_bytes.bit_length() - 1, 15)
        (rt_entries,) = struct.unpack_from("<I", reset, 4)
        (rt_hdr,) = struct.unpack_from("<I", reset, 12)
        (total_len,) = struct.unpack_from("<Q", reset, 16)
        if span is not None and len(span) >= 8:
            (total_len,) = struct.unpack_from("<Q", span, 0)
        # decompression-bomb guard: a corrupted length field must not
        # drive a giant decode loop (LZX tops out ~quadruple-digit
        # ratios on pathological input; 4096x is far beyond real data)
        if total_len > max(len(blob) * 4096, 1 << 20):
            raise ChmBroken("chm_bad_length")
        # a corrupted entry count must not drive a giant unpack loop;
        # entries can only be what the stream actually holds
        if rt_hdr > len(reset):
            raise ChmBroken("chm_truncated")
        rt_entries = min(rt_entries, (len(reset) - rt_hdr) // 8)
        offsets = [struct.unpack_from("<Q", reset, rt_hdr + 8 * i)[0]
                   for i in range(rt_entries)]
        out = bytearray()
        span_frames = max(interval_frames, 1)
        k = 0
        try:
            while len(out) < total_len and k * span_frames < max(
                    len(offsets), 1):
                idx = k * span_frames
                start = offsets[idx] if idx < len(offsets) else 0
                comp = blob[start:]
                need = min(span_frames * _FRAME, total_len - len(out))
                out += lzx_decompress(comp, need, window_bits)
                k += 1
        except LzxError as e:
            raise ChmBroken(e.reason)
        section1 = bytes(out)

    out_files: dict[str, bytes] = {}
    for name, (section, off, ln) in entries.items():
        if section == 0:
            blob = read0(name)
            if blob is not None:
                out_files[name] = blob
        elif section == 1:
            if off + ln > len(section1):
                raise ChmBroken("chm_truncated")
            out_files[name] = section1[off:off + ln]
    return out_files


def chm_children(data: bytes) -> list[tuple[str, bytes]]:
    """Content members only (no ``::`` metadata, no directories), name
    order, leading slash dropped — these recurse as child rows."""
    files = parse_chm(data)
    out = []
    for name in sorted(files):
        if name.startswith("::") or name.endswith("/") or name == "/":
            continue
        out.append((name.lstrip("/"), files[name]))
    return out


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def build_chm(members: list[tuple[str, bytes]],
              window_bits: int = 16) -> bytes:
    """Minimal conformant CHM: every member compressed into the LZXC
    section (one reset per 0x8000 frame), full metadata set."""
    # uncompressed stream + section-1 entry table
    stream = bytearray()
    sec1_entries = []
    for name, payload in members:
        sec1_entries.append((("/" + name.lstrip("/")), 1, len(stream),
                             len(payload)))
        stream += payload
    total_len = len(stream)

    # per-frame compression (reset interval = 1 frame)
    offsets = []
    comp = bytearray()
    for f in range(0, max(total_len, 1), _FRAME):
        offsets.append(len(comp))
        comp += lzx_compress(bytes(stream[f:f + _FRAME]), window_bits)

    control = struct.pack("<I4sIIIII", 6, b"LZXC", 2, 1,
                          (1 << window_bits) // _FRAME, 1, 0)
    reset = struct.pack("<IIII", 2, len(offsets), 8, 0x28)
    reset += struct.pack("<QQQ", total_len, len(comp), _FRAME)
    reset += b"".join(struct.pack("<Q", o) for o in offsets)
    span = struct.pack("<Q", total_len)
    namelist = struct.pack("<HH", 0, 2)
    for nm in ("Uncompressed", "MSCompressed"):
        namelist += struct.pack("<H", len(nm))
        namelist += nm.encode("utf-16-le") + b"\x00\x00"

    sec0_files = [
        ("::DataSpace/NameList", namelist),
        (_CONTROL, control),
        (_SPANINFO, span),
        (_RESET_TABLE, reset),
        (_CONTENT, bytes(comp)),
    ]
    # lay out section-0 content
    content = bytearray()
    entries: list[tuple[str, int, int, int]] = [("/", 0, 0, 0)]
    for name, payload in sec0_files:
        entries.append((name, 0, len(content), len(payload)))
        content += payload
    entries.extend(sec1_entries)
    entries.sort(key=lambda e: e[0].lower())

    # PMGL chunk
    chunk_size = 0x1000
    body = bytearray()
    for name, section, off, ln in entries:
        nm = name.encode("utf-8")
        body += _enc(len(nm)) + nm + _enc(section) + _enc(off) + _enc(ln)
    if 20 + len(body) + 2 > chunk_size:
        raise ChmBroken("chm_fixture_too_large")
    quickref_len = chunk_size - 20 - len(body)
    pmgl = bytearray(struct.pack("<4sIIii", b"PMGL", quickref_len, 0,
                                 -1, -1))
    pmgl += body
    pmgl += b"\x00" * (quickref_len - 2)
    pmgl += struct.pack("<H", len(entries))

    itsp = struct.pack("<4sIIIIIIiiiiII", b"ITSP", 1, 0x54, 10,
                       chunk_size, 2, 1, -1, 0, 0, -1, 1, 0x409)
    itsp += b"\x00" * 16  # GUID
    itsp += struct.pack("<Iiii", 0x54, -1, -1, -1)
    assert len(itsp) == 0x54
    directory = itsp + bytes(pmgl)

    hdr_len = 0x60
    sec0 = struct.pack("<IIQII", 0x01FE, 0, 0, 0, 0)  # size patched below
    dir_off = hdr_len + len(sec0)
    content_off = dir_off + len(directory)
    total_file = content_off + len(content)
    sec0 = struct.pack("<IIQII", 0x01FE, 0, total_file, 0, 0)

    hdr = struct.pack("<4sIIIII", b"ITSF", 3, hdr_len, 1, 0, 0x409)
    hdr += b"\x00" * 32  # two GUIDs
    hdr += struct.pack("<QQQQ", hdr_len, len(sec0), dir_off,
                       len(directory))
    hdr += struct.pack("<Q", content_off)
    assert len(hdr) == hdr_len, len(hdr)
    return bytes(hdr) + sec0 + directory + bytes(content)
