"""Legacy PowerPoint (.ppt) text extraction — [MS-PPT] record walk over
the CFB reader.

The reference extracts .ppt text by shelling the blob to Apache Tika
(tika.py:137-145; application/vnd.ms-powerpoint in _tika_mime_types.py).
Here the binary format is parsed directly from the public [MS-PPT] spec:
the "PowerPoint Document" stream is a tree of 8-byte-headed records
(recVerAndInstance uint16, recType uint16, recLen uint32, little-endian);
a record whose recVer nibble is 0xF is a container holding child records.
Text lives in TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8,
one byte per character, high byte implicitly zero) atoms, emitted in
stream order — the same block order Tika reports.
"""

from __future__ import annotations

import struct
from typing import Iterator

from ..functions.textutils import normalize_text
from .cfb import CfbError, CompoundFile

PPT_MIME = "application/vnd.ms-powerpoint"

RT_DOCUMENT = 0x03E8
RT_TEXT_CHARS = 0x0FA0
RT_TEXT_BYTES = 0x0FA8
#: DocumentEncryptionAtom ([MS-PPT] §2.3.5.1) — CryptoAPI RC4 keyed per
#: persist object; needs the persist directory walk we don't do → typed
RT_DOC_ENCRYPTION = 0x2F14

_PPT_STREAM = "PowerPoint Document"


class PptBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def is_ppt(data: bytes) -> bool:
    """OLE container with a PowerPoint Document stream (the role
    `file(1)` + extension rewriting plays in the reference, magic.py)."""
    try:
        cf = CompoundFile(data)
        return _PPT_STREAM in cf.paths()
    except (CfbError, struct.error):
        return False


def _records(data: bytes, start: int = 0, end: int | None = None,
             depth: int = 0) -> Iterator[tuple[int, bytes]]:
    """Flatten the record tree into (recType, payload) leaves in stream
    order; malformed/truncated records end the walk instead of raising."""
    i = start
    end = len(data) if end is None else end
    while i + 8 <= end:
        ver_inst, rtype, rlen = struct.unpack_from("<HHI", data, i)
        i += 8
        if rlen > end - i:
            break
        if (ver_inst & 0x000F) == 0x000F and depth < 32:  # container
            # surface the container's own type too (payload elided):
            # DocumentEncryptionAtom is container-shaped (recVer 0xF,
            # [MS-PPT] §2.3.5.1) and must be detectable without
            # recursing into its CryptoAPI header bytes as records
            yield rtype, b""
            if rtype != RT_DOC_ENCRYPTION:
                yield from _records(data, i, i + rlen, depth + 1)
        else:
            yield rtype, data[i : i + rlen]
        i += rlen


def ppt_to_text(data: bytes) -> str:
    """Text blocks from every TextCharsAtom/TextBytesAtom, joined with
    blank lines and normalized like every other extractor."""
    try:
        cf = CompoundFile(data)
        paths = cf.paths()
        stream = cf.read(paths[_PPT_STREAM])
    except (CfbError, struct.error, KeyError) as e:
        raise PptBroken("ppt_parse_error") from e

    if "Current User" in paths:
        from .ppt_crypto import (
            PptCryptoBroken,
            decrypt_ppt_stream,
            ppt_is_encrypted,
        )

        cu = cf.read(paths["Current User"])
        if ppt_is_encrypted(cu):
            # [MS-PPT] §2.3.5 persist-object CryptoAPI RC4: worker-local
            # password first, then the VelvetSweatshop default
            from ..functions.archive_crypto import default_archive_password

            try:
                stream = decrypt_ppt_stream(
                    stream, cu, default_archive_password())
            except PptCryptoBroken as err:
                raise PptBroken(err.reason) from err

    blocks: list[str] = []
    for rtype, payload in _records(stream):
        if rtype == RT_DOC_ENCRYPTION:
            raise PptBroken("ppt_encrypted")
        if rtype == RT_TEXT_CHARS:
            blocks.append(payload.decode("utf-16-le", "replace"))
        elif rtype == RT_TEXT_BYTES:
            blocks.append(payload.decode("latin-1"))
    return normalize_text("\n\n".join(b for b in blocks if b.strip())) or ""


def build_ppt(blocks: list[str]) -> bytes:
    """Deterministic .ppt fixture: a Document container of text atoms
    inside a PowerPoint Document stream.  ASCII-safe blocks become
    TextBytesAtom; anything else TextCharsAtom (both paths exercised)."""
    from .doc_extract import _build_cfb

    recs = b""
    for block in blocks:
        try:
            payload = block.encode("latin-1")
            rtype = RT_TEXT_BYTES
        except UnicodeEncodeError:
            payload = block.encode("utf-16-le")
            rtype = RT_TEXT_CHARS
        recs += struct.pack("<HHI", 0x0000, rtype, len(payload)) + payload
    doc = struct.pack("<HHI", 0x000F, RT_DOCUMENT, len(recs)) + recs
    return _build_cfb([(_PPT_STREAM, doc)])
