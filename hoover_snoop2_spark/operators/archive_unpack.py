"""Container fan-out: unpack archives / mailboxes / email attachments into
child documents.

The reference's ``archives.unarchive`` task (snoop/data/analyzers/
archives.py:574-634) shells out to 7z / readpst / pdfimages and emits a
recursive listing JSON that ``create_archive_files`` re-walks into File/
Directory rows (filesystem.py:355-416).  Here the deterministic, in-process
subset (zip, tar, tar.gz, gzip, bzip2, xz, mbox — Python stdlib) is a pure
kernel ``unpack_bytes``; the Spark side is an ``applyInPandas`` flatMap that
emits one child row per contained file, with the ``parent//child`` path
convention (digests.py:726-738) and the self-containment recursion guard
(archives.py:531-540) handled by the bounded driver loop in plans/pipeline.

External-tool formats (PST via readpst, RAR, 7z proper) are recognized by
the sniffer but marked ``broken = 'archive_tool_missing'`` — mirroring the
reference's SnoopTaskBroken reason strings (tasks.py:671-682).
"""

from __future__ import annotations

import bz2
import gzip
import io
import lzma
import struct
import tarfile
import zipfile
import zlib

from ..functions.magic import sniff_bytes
from .email_parse import attachments_of, parse_email_bytes

#: formats we unpack in-process (stdlib, deterministic)
UNPACK_MIME_TYPES = frozenset(
    {
        "application/zip",
        "application/x-tar",
        "application/gzip",
        "application/x-bzip2",
        "application/x-xz",
        "application/mbox",
        "application/x-hoover-pst",
        "application/x-7z-compressed",
        "application/x-rar",
        "application/x-cpio",
        "application/x-archive",
        "application/x-rpm",
        "application/x-compress",
        "application/zstd",
        "application/x-lz4",
        "application/x-snappy-framed",
    }
)

#: recognized container formats requiring external tools — marked broken.
#: Empty since the native RAR container reader landed (stored members
#: and RAR5-compressed members extract; RAR4-compressed ones surface
#: rar_method_unsupported) — kept as a set so a future
#: genuinely-external format slots back in.
BROKEN_ARCHIVE_MIME_TYPES = frozenset()

#: path separator marking "inside a container" (reference digests.py:726-738)
CONTAINER_SEP = "//"

#: guard rails against decompression bombs (reference splits tables at
#: 20k rows and PDFs at 150 pages for the same reason, defaultsettings.py:383)
MAX_CHILDREN = 10_000
MAX_CHILD_BYTES = 64 * 2**20


def safe_member_name(name: str) -> str:
    """Archive member names that didn't decode cleanly arrive as
    surrogate-escaped strs (tarfile's default; the reference keeps the
    original bytes in File.name_bytes, models.py:516-526, for the same
    reason).  Lone surrogates are not valid UTF-8, so Arrow/parquet would
    reject the row — percent-escape the raw bytes losslessly instead
    (printable ASCII except '%' kept verbatim)."""
    try:
        name.encode("utf-8")
        return name
    except UnicodeEncodeError:
        raw = name.encode("utf-8", "surrogateescape")
        return "".join(
            chr(b) if 32 <= b < 127 and b != 0x25 else f"%{b:02X}"
            for b in raw
        )


class UnpackBroken(Exception):
    """Unpack failed; .reason mirrors snoop2's broken-reason strings."""

    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def _zip_raw_entry(zf: zipfile.ZipFile, info: zipfile.ZipInfo) -> bytes:
    """Stored bytes of one entry straight from the local header (zipfile
    has no public raw access, and refuses method-99 entries outright)."""
    fp = zf.fp
    fp.seek(info.header_offset)
    hdr = fp.read(30)
    n_name, n_extra = struct.unpack("<HH", hdr[26:30])
    fp.seek(info.header_offset + 30 + n_name + n_extra)
    return fp.read(info.compress_size)


def _zip_aes_read(zf: zipfile.ZipFile, info: zipfile.ZipInfo,
                  password: str) -> bytes:
    """WinZip-AES entry (method 99) → plaintext: strength + the REAL
    compression method come from the 0x9901 extra field; payload is
    salt ‖ verifier ‖ ciphertext ‖ HMAC (functions/archive_crypto)."""
    from ..functions.archive_crypto import winzip_aes_decrypt_entry

    strength = method = None
    extra, pos = info.extra, 0
    while pos + 4 <= len(extra):
        eid, sz = struct.unpack("<HH", extra[pos:pos + 4])
        if eid == 0x9901 and sz >= 7:
            _, _, strength, method = struct.unpack(
                "<H2sBH", extra[pos + 4:pos + 11])
        pos += 4 + sz
    if strength is None:
        raise UnpackBroken("zip_aes_header")
    comp = winzip_aes_decrypt_entry(
        _zip_raw_entry(zf, info), password, strength)
    if method == zipfile.ZIP_STORED:
        return comp
    if method == zipfile.ZIP_DEFLATED:
        return zlib.decompress(comp, -15)
    if method == zipfile.ZIP_BZIP2:
        return bz2.decompress(comp)
    if method == zipfile.ZIP_LZMA:
        raise UnpackBroken("zip_method_unsupported")
    raise UnpackBroken("zip_method_unsupported")


def _unpack_zip(data: bytes) -> list[tuple[str, bytes]]:
    from ..functions.archive_crypto import ZipAesError, default_archive_password

    out = []
    password = default_archive_password()
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            for info in zf.infolist():
                if info.is_dir():
                    continue
                if len(out) >= MAX_CHILDREN:
                    break
                if info.file_size > MAX_CHILD_BYTES:
                    continue
                if info.flag_bits & 0x1:
                    # encrypted entry: the reference's no-password 7z
                    # call breaks here; with a configured worker-local
                    # password we decrypt (ZipCrypto via stdlib,
                    # WinZip AES via archive_crypto)
                    if password is None:
                        raise UnpackBroken("zip_encrypted")
                    if info.compress_type == 99:
                        out.append((info.filename,
                                    _zip_aes_read(zf, info, password)))
                    else:
                        out.append((info.filename,
                                    zf.read(info, pwd=password.encode())))
                    continue
                out.append((info.filename, zf.read(info)))
    except ZipAesError as e:
        raise UnpackBroken(e.reason) from e
    except RuntimeError as e:
        if "password" in str(e).lower():
            raise UnpackBroken("zip_bad_password") from e
        raise UnpackBroken("7z_error") from e
    except (zipfile.BadZipFile, OSError, EOFError, zlib.error) as e:
        raise UnpackBroken("7z_error") from e  # reference reason string
    return out


def _unpack_tar(data: bytes, mode: str = "r:*") -> list[tuple[str, bytes]]:
    out = []
    try:
        with tarfile.open(fileobj=io.BytesIO(data), mode=mode) as tf:
            for member in tf:
                if not member.isfile():
                    continue
                if len(out) >= MAX_CHILDREN:
                    break
                if member.size > MAX_CHILD_BYTES:
                    continue
                f = tf.extractfile(member)
                if f is not None:
                    out.append((member.name, f.read()))
    except (tarfile.TarError, OSError, EOFError) as e:
        raise UnpackBroken("7z_error") from e
    return out


def _unpack_stream(data: bytes, opener, name_hint: str) -> list[tuple[str, bytes]]:
    """Single-member compressors (gz/bz2/xz): decompress; if the payload is
    a tar, recurse into it immediately (the common .tar.gz case)."""
    try:
        inner = opener(io.BytesIO(data)).read(MAX_CHILD_BYTES + 1)
    except (OSError, EOFError, lzma.LZMAError) as e:
        raise UnpackBroken("7z_error") from e
    if len(inner) > MAX_CHILD_BYTES:
        raise UnpackBroken("archive_too_big")
    if inner[257 : 257 + 5] == b"ustar":
        return _unpack_tar(inner)
    return [(name_hint, inner)]


def _unpack_mbox(data: bytes) -> list[tuple[str, bytes]]:
    """Split an mbox into individual RFC-822 messages (the reference uses
    Python's mailbox module over a temp file, archives.py:477-488).  Message
    boundaries are 'From ' lines at the start of a line."""
    messages: list[list[bytes]] = []
    current: list[bytes] | None = None
    for line in data.split(b"\n"):
        if line.startswith(b"From "):
            if current is not None:
                messages.append(current)
            current = []  # the "From " envelope line itself is dropped
        elif current is not None:
            current.append(line)
    if current is not None:
        messages.append(current)
    out: list[tuple[str, bytes]] = []
    for i, msg_lines in enumerate(messages[:MAX_CHILDREN], start=1):
        body = b"\n".join(msg_lines).strip(b"\n") + b"\n"
        if body.strip():
            out.append((f"{i}.eml", body))
    return out


def unpack_bytes(data: bytes, mime_type: str) -> list[tuple[str, bytes]]:
    """Dispatch: bytes + sniffed mime → list of (child_name, child_bytes).

    Raises UnpackBroken with a snoop2-style reason for recognized-but-
    unsupported formats.
    """
    if mime_type == "application/zip":
        return _unpack_zip(data)
    if mime_type == "application/x-tar":
        return _unpack_tar(data)
    if mime_type == "application/gzip":
        return _unpack_stream(data, lambda b: gzip.GzipFile(fileobj=b), "data")
    if mime_type == "application/x-bzip2":
        return _unpack_stream(data, bz2.BZ2File, "data")
    if mime_type == "application/x-xz":
        return _unpack_stream(data, lzma.LZMAFile, "data")
    if mime_type == "application/zstd":
        # RFC 8878 stream via the in-repo pure-Python codec; recurses
        # into tar for the .tar.zst case exactly like .gz/.Z
        from ..functions.zstd_codec import ZstdError, zstd_decompress

        try:
            inner = zstd_decompress(data, max_output=MAX_CHILD_BYTES)
        except ZstdError as e:
            raise UnpackBroken(str(e)) from e
        if inner[257 : 257 + 5] == b"ustar":
            return _unpack_tar(inner)
        return [("data", inner)]
    if mime_type == "application/x-lz4":
        # lz4 frame via the in-repo pure-Python codec (CLI-cross-pinned);
        # recurses into tar for the .tar.lz4 case exactly like .zst
        from ..functions.lz4_codec import Lz4Error, lz4_decompress

        try:
            inner = lz4_decompress(data, max_output=MAX_CHILD_BYTES)
        except Lz4Error as e:
            raise UnpackBroken(e.reason) from e
        if inner[257 : 257 + 5] == b"ustar":
            return _unpack_tar(inner)
        return [("data", inner)]
    if mime_type == "application/x-snappy-framed":
        # framing format via the in-repo pure-Python codec (CRC-32C
        # verified per chunk); recurses into tar for .tar.sz
        from ..functions.snappy_codec import SnappyError, snappy_decompress_framed

        try:
            inner = snappy_decompress_framed(data, max_output=MAX_CHILD_BYTES)
        except SnappyError as e:
            raise UnpackBroken(e.reason) from e
        if inner[257 : 257 + 5] == b"ustar":
            return _unpack_tar(inner)
        return [("data", inner)]
    if mime_type == "application/mbox":
        return _unpack_mbox(data)
    if mime_type == "application/x-7z-compressed":
        # native 7z container parse (replaces the reference's `7z x`
        # subprocess, archives.py:173-203)
        from .sevenzip_extract import SevenZipBroken, unpack_7z

        try:
            return [
                (n, b) for n, b in unpack_7z(data, MAX_CHILD_BYTES)
                if len(b) <= MAX_CHILD_BYTES
            ][:MAX_CHILDREN]
        except SevenZipBroken as e:
            raise UnpackBroken(e.reason) from e
    if mime_type == "application/x-hoover-pst":
        # native [MS-PST] walk (replaces the reference's readpst
        # subprocess, archives.py:155-170)
        from .pst_extract import PstBroken, unpack_pst

        try:
            return unpack_pst(data)[:MAX_CHILDREN]
        except PstBroken as e:
            raise UnpackBroken(e.reason) from e
    if mime_type == "application/x-rar":
        # native RAR4/RAR5 parse — stored AND RAR5-compressed members
        # extract (rar5_codec.py, CRC-verified); RAR4 compression
        # surfaces rar_method_unsupported (the reference shells to
        # `7z x`, archives.py:173-203)
        from .rar_extract import RarBroken, unpack_rar

        try:
            return [
                (n, b) for n, b in unpack_rar(data, MAX_CHILD_BYTES)
                if len(b) <= MAX_CHILD_BYTES
            ][:MAX_CHILDREN]
        except RarBroken as e:
            raise UnpackBroken(e.reason) from e
    if mime_type in (
        "application/x-cpio",
        "application/x-archive",
        "application/x-rpm",
        "application/x-compress",
    ):
        # classic Unix containers (reference: 7z-accepted extensions,
        # archives.py:41-55) — native parsers, no subprocess
        from .unix_archives import (
            UnixArchiveBroken,
            decompress_z,
            unpack_ar,
            unpack_cpio,
            unpack_rpm,
        )

        try:
            if mime_type == "application/x-cpio":
                pairs = unpack_cpio(data)
            elif mime_type == "application/x-archive":
                pairs = unpack_ar(data)
            elif mime_type == "application/x-rpm":
                pairs = unpack_rpm(data, MAX_CHILD_BYTES)
            else:  # .Z stream: decompress; recurse into tar like .gz
                inner = decompress_z(data, MAX_CHILD_BYTES)
                if inner[257 : 257 + 5] == b"ustar":
                    return _unpack_tar(inner)
                return [("data", inner)]
        except UnixArchiveBroken as e:
            raise UnpackBroken(e.reason) from e
        return [
            (n, b) for n, b in pairs if len(b) <= MAX_CHILD_BYTES
        ][:MAX_CHILDREN]
    if mime_type in BROKEN_ARCHIVE_MIME_TYPES:
        raise UnpackBroken("archive_tool_missing")
    return []


def unpack_children(
    url: str, data: bytes, mime_type: str
) -> tuple[list[tuple[str, bytes]], str | None]:
    """Children of one container doc, with child urls in the
    ``parent//name`` convention.  Returns (children, broken_reason).

    Emails fan out their attachments here too (the reference's
    ``create_attachment_files``, filesystem.py:441-478).
    """
    try:
        if mime_type in ("message/rfc822", "message/x-emlx"):
            email_data = parse_email_bytes(
                emlx_strip(data) if mime_type == "message/x-emlx" else data
            )
            pairs = attachments_of(email_data)
        else:
            pairs = unpack_bytes(data, mime_type)
    except UnpackBroken as e:
        return [], e.reason
    children = [
        (f"{url}{CONTAINER_SEP}{name}", child_bytes)
        for name, child_bytes in pairs
    ]
    return children, None


def emlx_strip(data: bytes) -> bytes:
    """Apple .emlx: a decimal byte-count line, the RFC-822 message, then a
    plist.  Strip prefix line and trailing plist (reference emlx.py:14-58,
    regex emlx.py:33)."""
    head, _, rest = data.partition(b"\n")
    if not head.strip().isdigit():
        return data
    try:
        n = int(head.strip())
    except ValueError:
        return data
    return rest[:n]


def is_unpackable(mime_type: str) -> bool:
    return (
        mime_type in UNPACK_MIME_TYPES
        or mime_type in BROKEN_ARCHIVE_MIME_TYPES
        or mime_type in ("message/rfc822", "message/x-emlx")
    )
