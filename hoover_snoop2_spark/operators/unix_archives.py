"""Native readers for the classic Unix container formats: cpio (newc /
odc / old-binary), ar (.ar / .deb / .a), RPM packages, and ``compress``
``.Z`` streams (LZW).

The reference unarchives all of these by shelling to ``7z x`` — they are
in its accepted-extension list (.cpio, .ar, .a, .deb, .rpm, .z;
reference snoop/data/analyzers/archives.py:41-55) — so a corpus that
contains a .deb or an initramfs fans out children there.  Here each
format is a pure-bytes parser (public format specs: POSIX.1 pax/cpio
interchange formats, the Debian deb(5) / ar(5) layout, Fedora's RPM
package format description, and the LZW semantics of gzip's unlzw.c),
usable inside an Arrow batch with no subprocess.

Nesting composes with the existing machinery: a .deb is an ar archive
whose members are tarballs — the pipeline's container recursion unpacks
those on the next round; an RPM's payload is a compressed cpio which
this module explodes inline (mirroring how archive_unpack recurses
.tar.gz immediately).
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import struct

MAX_MEMBERS = 10_000


class UnixArchiveBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


# ---------------------------------------------------------------------------
# cpio — POSIX.1 interchange formats
# ---------------------------------------------------------------------------

_CPIO_REG = 0o100000
_CPIO_FMT_MASK = 0o170000


def _cpio_newc(data: bytes) -> list[tuple[str, bytes]]:
    """New ASCII format (magic 070701; 070702 adds a CRC field that shares
    the layout): 110-byte header of 8-hex-digit fields, name and data each
    padded to 4 bytes (pad measured from the start of the archive)."""
    out: list[tuple[str, bytes]] = []
    pos = 0
    while pos + 110 <= len(data) and len(out) < MAX_MEMBERS:
        magic = data[pos : pos + 6]
        if magic not in (b"070701", b"070702"):
            raise UnixArchiveBroken("cpio_bad_header")
        try:
            fields = [
                int(data[pos + 6 + 8 * i : pos + 14 + 8 * i], 16)
                for i in range(13)
            ]
        except ValueError as e:
            raise UnixArchiveBroken("cpio_bad_header") from e
        mode, filesize, namesize = fields[1], fields[6], fields[11]
        name_start = pos + 110
        name = data[name_start : name_start + namesize].rstrip(b"\x00")
        data_start = name_start + namesize
        data_start += (-data_start) % 4
        body = data[data_start : data_start + filesize]
        if name == b"TRAILER!!!":
            return out
        if len(body) < filesize:
            raise UnixArchiveBroken("cpio_truncated")
        if (mode & _CPIO_FMT_MASK) == _CPIO_REG:
            out.append((name.decode("utf-8", "surrogateescape"), bytes(body)))
        pos = data_start + filesize
        pos += (-pos) % 4
    raise UnixArchiveBroken("cpio_truncated")


def _cpio_odc(data: bytes) -> list[tuple[str, bytes]]:
    """Portable ASCII format (magic 070707): 76-byte header of octal
    fields, no padding anywhere."""
    out: list[tuple[str, bytes]] = []
    pos = 0
    # c_dev c_ino c_mode c_uid c_gid c_nlink c_rdev c_mtime c_namesize
    # c_filesize
    widths = (6, 6, 6, 6, 6, 6, 6, 11, 6, 11)
    while pos + 76 <= len(data) and len(out) < MAX_MEMBERS:
        if data[pos : pos + 6] != b"070707":
            raise UnixArchiveBroken("cpio_bad_header")
        vals = []
        off = pos + 6
        try:
            for w in widths:
                vals.append(int(data[off : off + w], 8))
                off += w
        except ValueError as e:
            raise UnixArchiveBroken("cpio_bad_header") from e
        mode, namesize, filesize = vals[2], vals[8], vals[9]
        name = data[off : off + namesize].rstrip(b"\x00")
        body_start = off + namesize
        body = data[body_start : body_start + filesize]
        if name == b"TRAILER!!!":
            return out
        if len(body) < filesize:
            raise UnixArchiveBroken("cpio_truncated")
        if (mode & _CPIO_FMT_MASK) == _CPIO_REG:
            out.append((name.decode("utf-8", "surrogateescape"), bytes(body)))
        pos = body_start + filesize
    raise UnixArchiveBroken("cpio_truncated")


def _cpio_bin(data: bytes) -> list[tuple[str, bytes]]:
    """Old binary format (magic 0o070707 as a native short; this reader
    takes the little-endian byte order, 0xC7 0x71): 26-byte header of
    2-byte shorts, 32-bit sizes split high-short-first, name and data
    padded to 2 bytes."""
    out: list[tuple[str, bytes]] = []
    pos = 0
    while pos + 26 <= len(data) and len(out) < MAX_MEMBERS:
        h = struct.unpack_from("<13H", data, pos)
        if h[0] != 0o070707:
            raise UnixArchiveBroken("cpio_bad_header")
        mode, namesize = h[3], h[10]
        filesize = (h[11] << 16) | h[12]
        name_start = pos + 26
        name = data[name_start : name_start + namesize].rstrip(b"\x00")
        body_start = name_start + namesize + (namesize & 1)
        body = data[body_start : body_start + filesize]
        if name == b"TRAILER!!!":
            return out
        if len(body) < filesize:
            raise UnixArchiveBroken("cpio_truncated")
        if (mode & _CPIO_FMT_MASK) == _CPIO_REG:
            out.append((name.decode("utf-8", "surrogateescape"), bytes(body)))
        pos = body_start + filesize + (filesize & 1)
    raise UnixArchiveBroken("cpio_truncated")


def unpack_cpio(data: bytes) -> list[tuple[str, bytes]]:
    if data[:6] in (b"070701", b"070702"):
        return _cpio_newc(data)
    if data[:6] == b"070707":
        return _cpio_odc(data)
    if data[:2] == b"\xc7\x71":
        return _cpio_bin(data)
    raise UnixArchiveBroken("cpio_bad_header")


# ---------------------------------------------------------------------------
# ar — ar(5) / deb(5) common archive format
# ---------------------------------------------------------------------------

AR_MAGIC = b"!<arch>\n"


def unpack_ar(data: bytes) -> list[tuple[str, bytes]]:
    """System V / GNU / BSD ar: 60-byte member headers after the 8-byte
    global magic; members padded to even offsets with a newline.  GNU long
    names live in the ``//`` string table (referenced as ``/<offset>``);
    BSD long names use ``#1/<len>`` with the name prepended to the data.
    The ``/`` symbol index and the name table itself are bookkeeping, not
    files, and are skipped."""
    if not data.startswith(AR_MAGIC):
        raise UnixArchiveBroken("ar_bad_magic")
    out: list[tuple[str, bytes]] = []
    longnames = b""
    pos = len(AR_MAGIC)
    while pos + 60 <= len(data) and len(out) < MAX_MEMBERS:
        hdr = data[pos : pos + 60]
        if hdr[58:60] != b"`\n":
            raise UnixArchiveBroken("ar_bad_header")
        rawname = hdr[0:16].rstrip()
        try:
            size = int(hdr[48:58].split()[0])
        except (ValueError, IndexError) as e:
            raise UnixArchiveBroken("ar_bad_header") from e
        body_start = pos + 60
        body = data[body_start : body_start + size]
        if len(body) < size:
            raise UnixArchiveBroken("ar_truncated")
        pos = body_start + size + (size & 1)
        if rawname in (b"/", b"__.SYMDEF", b"__.SYMDEF SORTED"):
            continue  # symbol index
        if rawname == b"//":
            longnames = bytes(body)
            continue
        if rawname.startswith(b"#1/"):  # BSD: name prepended to data
            try:
                nlen = int(rawname[3:])
            except ValueError as e:
                raise UnixArchiveBroken("ar_bad_header") from e
            name = body[:nlen].rstrip(b"\x00")
            body = body[nlen:]
        elif rawname.startswith(b"/") and rawname[1:].isdigit():
            off = int(rawname[1:])
            end = longnames.find(b"\n", off)
            name = longnames[off : end if end != -1 else len(longnames)]
            name = name.rstrip(b"/")
        else:
            name = rawname.rstrip(b"/")  # GNU terminates short names with /
        out.append((name.decode("utf-8", "surrogateescape"), bytes(body)))
    return out


# ---------------------------------------------------------------------------
# RPM — lead + signature header + main header + compressed cpio payload
# ---------------------------------------------------------------------------

RPM_LEAD_MAGIC = b"\xed\xab\xee\xdb"
_RPM_HDR_MAGIC = b"\x8e\xad\xe8\x01"


def _rpm_header_end(data: bytes, pos: int, align8: bool) -> int:
    """Skip one RPM header structure (magic+reserved, index, store); the
    signature header's store is padded to 8 bytes."""
    if data[pos : pos + 4] != _RPM_HDR_MAGIC:
        raise UnixArchiveBroken("rpm_bad_header")
    nindex, hsize = struct.unpack_from(">II", data, pos + 8)
    end = pos + 16 + 16 * nindex + hsize
    if align8:
        end += (-end) % 8
    if end > len(data):
        raise UnixArchiveBroken("rpm_truncated")
    return end


def unpack_rpm(data: bytes, max_bytes: int = 64 * 2**20) -> list[tuple[str, bytes]]:
    """Explode an RPM's payload files.  Layout: 96-byte lead, signature
    header (8-aligned), main header, then the payload — a gzip/xz/lzma/
    bzip2/zstd-compressed cpio whose compressor is sniffed from its own
    magic (robust across PAYLOADCOMPRESSOR tag values); zstd is the
    Fedora/RHEL9 default and decodes via the in-repo RFC 8878 codec."""
    from ..functions.zstd_codec import ZstdError, zstd_decompress

    if not data.startswith(RPM_LEAD_MAGIC) or len(data) < 96:
        raise UnixArchiveBroken("rpm_bad_magic")
    pos = _rpm_header_end(data, 96, align8=True)
    pos = _rpm_header_end(data, pos, align8=False)
    payload = data[pos:]
    try:
        if payload[:2] == b"\x1f\x8b":
            inner = gzip.decompress(payload)
        elif payload[:6] == b"\xfd7zXZ\x00":
            inner = lzma.decompress(payload)
        elif payload[:3] == b"\x5d\x00\x00":
            inner = lzma.decompress(payload, format=lzma.FORMAT_ALONE)
        elif payload[:3] == b"BZh":
            inner = bz2.decompress(payload)
        elif payload[:4] == b"\x28\xb5\x2f\xfd":
            inner = zstd_decompress(payload, max_output=max_bytes)
        elif payload[:6] in (b"070701", b"070702", b"070707"):
            inner = payload  # uncompressed cpio
        else:
            raise UnixArchiveBroken("rpm_payload_unsupported")
    except ZstdError as e:
        raise UnixArchiveBroken("rpm_payload_corrupt") from e
    except (OSError, EOFError, lzma.LZMAError, ValueError) as e:
        if isinstance(e, UnixArchiveBroken):
            raise
        raise UnixArchiveBroken("rpm_payload_corrupt") from e
    if len(inner) > max_bytes:
        raise UnixArchiveBroken("archive_too_big")
    # rpm payload member names carry a ./ prefix; strip for child urls
    return [
        (n[2:] if n.startswith("./") else n, b)
        for n, b in unpack_cpio(inner)
    ]


# ---------------------------------------------------------------------------
# compress(1) .Z — LZW with the ncompress bit-group alignment
# ---------------------------------------------------------------------------

Z_MAGIC = b"\x1f\x9d"
_Z_CLEAR = 256
_Z_FIRST = 257
_Z_INIT_BITS = 9


def _z_align(posbits: int, seg_start: int, n_bits: int) -> int:
    """Round a bit position up to the next n_bits-byte group boundary,
    measured FROM THE CURRENT WIDTH SEGMENT'S START — compress(1) flushes
    its output in groups of 8 codes and starts a fresh group after every
    width change and clear (gzip unlzw.c re-zeroes its bit origin with
    ``goto resetbuf`` at exactly those points, which makes its absolute
    modulo arithmetic segment-relative)."""
    group = n_bits << 3
    rel = posbits - seg_start
    if rel % group:
        rel += group - rel % group
    return seg_start + rel


def _z_peek(data: bytes, posbits: int, n_bits: int) -> int:
    byte = posbits >> 3
    chunk = int.from_bytes(data[byte : byte + 4], "little")
    return (chunk >> (posbits & 7)) & ((1 << n_bits) - 1)


def decompress_z(data: bytes, max_bytes: int = 64 * 2**20) -> bytes:
    """Decode a .Z stream (LZW, 9→maxbits growing codes, LSB-first bit
    packing, block mode CLEAR code).  Follows the public unlzw semantics
    including the 8-code group realignment on width change and clear."""
    if data[:2] != Z_MAGIC or len(data) < 3:
        raise UnixArchiveBroken("z_bad_magic")
    flags = data[2]
    maxbits = flags & 0x1F
    block_mode = bool(flags & 0x80)
    if not 9 <= maxbits <= 16:
        raise UnixArchiveBroken("z_bad_maxbits")
    total_bits = len(data) << 3

    prefix = [0] * (1 << maxbits)
    suffix = bytearray(1 << maxbits)
    for i in range(256):
        suffix[i] = i
    free_ent = _Z_FIRST if block_mode else 256
    n_bits = _Z_INIT_BITS
    maxcode = (1 << n_bits) - 1
    posbits = 3 << 3
    seg_start = posbits  # width segments begin after header/widen/clear
    out = bytearray()
    oldcode = -1
    finchar = 0
    while True:
        if free_ent > maxcode and n_bits < maxbits:
            posbits = _z_align(posbits, seg_start, n_bits)
            seg_start = posbits
            n_bits += 1
            maxcode = (1 << maxbits) if n_bits == maxbits else (1 << n_bits) - 1
        if posbits + n_bits > total_bits:
            break
        code = _z_peek(data, posbits, n_bits)
        posbits += n_bits
        if oldcode == -1:
            if code >= 256:
                raise UnixArchiveBroken("z_corrupt")
            oldcode = code
            finchar = code
            out.append(code)
            continue
        if code == _Z_CLEAR and block_mode:
            # ncompress resets free_ent to FIRST-1 (256): the very next
            # add burns the CLEAR slot with a never-referenced entry,
            # keeping the table numbering in step with the encoder's
            # post-clear FIRST (257)
            posbits = _z_align(posbits, seg_start, n_bits)
            seg_start = posbits
            free_ent = _Z_FIRST - 1
            n_bits = _Z_INIT_BITS
            maxcode = (1 << n_bits) - 1
            continue
        incode = code
        stack = bytearray()
        if code >= free_ent:  # KwKwK
            if code > free_ent:
                raise UnixArchiveBroken("z_corrupt")
            stack.append(finchar)
            code = oldcode
        while code >= 256:
            stack.append(suffix[code])
            code = prefix[code]
        finchar = suffix[code]
        stack.append(finchar)
        out.extend(reversed(stack))
        if len(out) > max_bytes:
            raise UnixArchiveBroken("archive_too_big")
        if free_ent < (1 << maxbits):
            prefix[free_ent] = oldcode
            suffix[free_ent] = finchar
            free_ent += 1
        oldcode = incode
    return bytes(out)


def compress_z(raw: bytes, maxbits: int = 16) -> bytes:
    """LZW encoder producing streams :func:`decompress_z` (and unlzw)
    accept: block-mode header, growing code widths with the same 8-code
    group padding, no CLEAR emission (the table simply stops growing when
    full, which every decoder accepts).  Fixture/corpus writer — the
    production path only decodes."""
    out = bytearray(Z_MAGIC + bytes([0x80 | maxbits]))
    if not raw:
        return bytes(out)
    table: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    free_ent = _Z_FIRST
    n_bits = _Z_INIT_BITS
    maxcode = (1 << n_bits) - 1
    bitbuf = 0
    posbits = 0  # bit position within the code stream
    seg_start = 0

    def emit(code: int):
        nonlocal bitbuf, posbits
        bitbuf |= code << posbits
        posbits += n_bits

    w = raw[:1]
    for i in range(1, len(raw)):
        c = raw[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w])
        # compress(1) widens inside output(), AFTER writing the code and
        # BEFORE this iteration's table add — the pre-add free_ent is the
        # widen trigger, which is exactly what keeps the decoder (whose
        # table lags one code) changing width at the same stream offset
        if free_ent > maxcode and n_bits < maxbits:
            posbits = _z_align(posbits, seg_start, n_bits)
            seg_start = posbits
            n_bits += 1
            maxcode = (
                (1 << maxbits) if n_bits == maxbits else (1 << n_bits) - 1
            )
        if free_ent < (1 << maxbits):
            table[wc] = free_ent
            free_ent += 1
        w = c
    emit(table[w])
    nbytes = (posbits + 7) >> 3
    out += bitbuf.to_bytes(nbytes, "little")
    return bytes(out)


# ---------------------------------------------------------------------------
# fixture writers (deterministic; corpus + tests only — production decodes)
# ---------------------------------------------------------------------------


def build_cpio(members: list[tuple[str, bytes]], fmt: str = "newc") -> bytes:
    """Deterministic cpio archive in any of the three dialects."""
    out = bytearray()

    def _newc_rec(name: bytes, body: bytes, mode: int, nlink: int):
        fields = [1, mode, 0, 0, nlink, 0, len(body), 0, 0, 0, 0,
                  len(name) + 1, 0]
        out.extend(b"070701" + b"".join(b"%08X" % f for f in fields))
        out.extend(name + b"\x00")
        out.extend(b"\x00" * ((-len(out)) % 4))
        out.extend(body)
        out.extend(b"\x00" * ((-len(out)) % 4))

    def _odc_rec(name: bytes, body: bytes, mode: int, nlink: int):
        out.extend(b"070707")
        for width, val in (
            (6, 0), (6, 1), (6, mode), (6, 0), (6, 0), (6, nlink),
            (6, 0), (11, 0), (6, len(name) + 1), (11, len(body)),
        ):
            out.extend(b"%0*o" % (width, val))
        out.extend(name + b"\x00")
        out.extend(body)

    def _bin_rec(name: bytes, body: bytes, mode: int, nlink: int):
        out.extend(struct.pack(
            "<13H", 0o070707, 0, 1, mode, 0, 0, nlink, 0, 0, 0,
            len(name) + 1, len(body) >> 16, len(body) & 0xFFFF,
        ))
        out.extend(name + b"\x00")
        if (len(name) + 1) & 1:
            out.extend(b"\x00")
        out.extend(body)
        if len(body) & 1:
            out.extend(b"\x00")

    rec = {"newc": _newc_rec, "odc": _odc_rec, "bin": _bin_rec}[fmt]
    for name, body in members:
        rec(name.encode("utf-8"), body, 0o100644, 1)
    rec(b"TRAILER!!!", b"", 0, 1)
    return bytes(out)


def build_ar(members: list[tuple[str, bytes]]) -> bytes:
    """Deterministic ar archive; names longer than 15 chars go through a
    GNU ``//`` long-name table (the .deb convention keeps names short,
    but real .a archives need the table)."""
    longnames = bytearray()
    resolved: list[tuple[bytes, bytes]] = []
    for name, body in members:
        nb = name.encode("utf-8")
        if len(nb) + 1 > 16:
            ref = b"/%d" % len(longnames)
            longnames.extend(nb + b"/\n")
            resolved.append((ref, body))
        else:
            resolved.append((nb + b"/", body))
    out = bytearray(AR_MAGIC)

    def _member(name: bytes, body: bytes):
        hdr = b"%-16s%-12d%-6d%-6d%-8o%-10d`\n" % (
            name, 0, 0, 0, 0o644, len(body)
        )
        assert len(hdr) == 60
        out.extend(hdr)
        out.extend(body)
        if len(body) & 1:
            out.extend(b"\n")

    if longnames:
        _member(b"//", bytes(longnames))
    for name, body in resolved:
        _member(name, body)
    return bytes(out)


def build_rpm(
    members: list[tuple[str, bytes]], compressor: str = "gzip"
) -> bytes:
    """Deterministic minimal RPM: valid lead, an empty-but-well-formed
    signature header and main header, then a compressed newc cpio payload
    with the conventional ``./`` name prefix."""
    # magic(4) major minor type(2) archnum(2) name(66) osnum(2)
    # sigtype(2) reserved(16) = 96
    lead = RPM_LEAD_MAGIC + bytes([3, 0]) + struct.pack(">hh", 0, 1)
    lead += b"fixture".ljust(66, b"\x00")
    lead += struct.pack(">hh", 1, 5) + b"\x00" * 16
    assert len(lead) == 96

    def _header(pad8: bool) -> bytes:
        # one NULL-ish index entry pointing at a 4-byte store
        h = _RPM_HDR_MAGIC + b"\x00" * 4
        h += struct.pack(">II", 1, 4)
        h += struct.pack(">iiii", 100, 4, 0, 1)  # tag/type INT32/off/count
        h += b"\x00" * 4
        if pad8:
            h += b"\x00" * ((-len(h)) % 8)
        return h

    cpio = build_cpio([("./" + n, b) for n, b in members], "newc")
    if compressor == "gzip":
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(cpio)
        payload = buf.getvalue()
    elif compressor == "xz":
        payload = lzma.compress(cpio)
    elif compressor == "bzip2":
        payload = bz2.compress(cpio)
    elif compressor == "zstd":
        from ..functions.zstd_codec import zstd_compress_store

        payload = zstd_compress_store(cpio)
    elif compressor == "none":
        payload = cpio
    else:
        raise ValueError(compressor)
    return lead + _header(True) + _header(False) + payload
