"""Encrypted legacy PowerPoint (.ppt) — [MS-PPT] §2.3.5 CryptoAPI RC4
over the persist-object model, completing the legacy-Office crypto
triad (xls_crypto, doc_crypto).

Model: an encrypted deck marks the "Current User" stream's
CurrentUserAtom with headerToken 0xF3D1C4DF (plain decks use
0xE391C05F).  The "PowerPoint Document" stream is a chain of user
edits; each UserEditAtom (0x0FF5) points at a PersistDirectoryAtom
(0x1772) mapping persist object ids → stream offsets, and at the
DocumentEncryptionAtom (0x2F14) — itself a persist object, stored
PLAINTEXT, carrying the [MS-OFFCRYPTO] §2.3.5 RC4 CryptoAPI header
(same EncryptionVersionInfo wire shape as the .xls FILEPASS CryptoAPI
payload).  Every OTHER persist object is RC4-encrypted with the
SHA-1 ladder keyed by **block number = its persist object id** and no
intra-object re-keying (unlike the 512/1024-byte stream cadence of
.doc/.xls) — so each object's record header AND payload decrypt as
one continuous keystream.  UserEditAtom and PersistDirectoryAtom
records are never encrypted.

Persist-directory precedence: walk user edits newest → oldest via
offsetLastEdit; the first (most recent) mapping of an id wins.

The reference routes encrypted .ppt to Tika/POI
(snoop/data/analyzers/tika.py); the password ladder here matches the
rest of the suite: worker-local archive password, then the well-known
VelvetSweatshop default.
"""

from __future__ import annotations

import hashlib
import struct

from .xls_crypto import (
    XlsCryptoBroken,
    _RC4,
    _verify,
    build_rc4_header,
    parse_rc4_header,
)

RT_USER_EDIT = 0x0FF5
RT_CURRENT_USER = 0x0FF6
RT_PERSIST_DIRECTORY = 0x1772
RT_DOC_ENCRYPTION = 0x2F14

#: CurrentUserAtom headerToken values ([MS-PPT] §2.3.2)
TOKEN_PLAIN = 0xE391C05F
TOKEN_ENCRYPTED = 0xF3D1C4DF

_CURRENT_USER_STREAM = "Current User"


class PptCryptoBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def current_user_token(cu_stream: bytes) -> int | None:
    """headerToken of the CurrentUserAtom (None if malformed)."""
    if len(cu_stream) < 20:
        return None
    _vi, rtype, _rlen = struct.unpack_from("<HHI", cu_stream, 0)
    if rtype != RT_CURRENT_USER:
        return None
    (token,) = struct.unpack_from("<I", cu_stream, 12)
    return token


def ppt_is_encrypted(cu_stream: bytes) -> bool:
    return current_user_token(cu_stream) == TOKEN_ENCRYPTED


def _parse_persist_directory(stream: bytes, off: int) -> dict[int, int]:
    """PersistDirectoryAtom at `off` → {persist id: stream offset}."""
    if off + 8 > len(stream):
        raise PptCryptoBroken("ppt_crypt_malformed")
    _vi, rtype, rlen = struct.unpack_from("<HHI", stream, off)
    if rtype != RT_PERSIST_DIRECTORY or off + 8 + rlen > len(stream):
        raise PptCryptoBroken("ppt_crypt_malformed")
    out: dict[int, int] = {}
    i = off + 8
    end = i + rlen
    while i + 4 <= end:
        (word,) = struct.unpack_from("<I", stream, i)
        first_id = word & 0xFFFFF
        count = word >> 20
        i += 4
        if i + 4 * count > end:
            raise PptCryptoBroken("ppt_crypt_malformed")
        for k in range(count):
            out[first_id + k] = struct.unpack_from("<I", stream, i + 4 * k)[0]
        i += 4 * count
    return out


def decrypt_ppt_stream(
    ppt_stream: bytes,
    cu_stream: bytes,
    password: str | None = None,
) -> bytes:
    """Encrypted "PowerPoint Document" stream → plaintext stream (the
    DocumentEncryptionAtom's record type is blanked so flat record
    walkers skip it).  Tries `password` then VelvetSweatshop."""
    if not ppt_is_encrypted(cu_stream):
        return ppt_stream
    (offset_current_edit,) = struct.unpack_from("<I", cu_stream, 16)

    # newest → oldest user edits; first mapping of a persist id wins
    persist: dict[int, int] = {}
    enc_pid = None
    off = offset_current_edit
    seen = set()
    while off and off not in seen:
        seen.add(off)
        if off + 8 + 28 > len(ppt_stream):
            raise PptCryptoBroken("ppt_crypt_malformed")
        _vi, rtype, rlen = struct.unpack_from("<HHI", ppt_stream, off)
        if rtype != RT_USER_EDIT:
            raise PptCryptoBroken("ppt_crypt_malformed")
        (offset_last_edit, offset_dir) = struct.unpack_from(
            "<II", ppt_stream, off + 8 + 8)
        if rlen >= 32:
            if off + 8 + 32 > len(ppt_stream):
                raise PptCryptoBroken("ppt_crypt_malformed")
            (epid,) = struct.unpack_from("<I", ppt_stream, off + 8 + 28)
            if enc_pid is None:
                enc_pid = epid
        for pid, poff in _parse_persist_directory(ppt_stream, offset_dir).items():
            persist.setdefault(pid, poff)
        off = offset_last_edit
    if enc_pid is None or enc_pid not in persist:
        raise PptCryptoBroken("ppt_crypt_malformed")

    # the DocumentEncryptionAtom persist object is stored plaintext
    ea_off = persist[enc_pid]
    if ea_off + 8 > len(ppt_stream):
        raise PptCryptoBroken("ppt_crypt_malformed")
    _vi, rtype, rlen = struct.unpack_from("<HHI", ppt_stream, ea_off)
    if rtype != RT_DOC_ENCRYPTION:
        raise PptCryptoBroken("ppt_crypt_malformed")
    try:
        fp = parse_rc4_header(ppt_stream[ea_off + 8:ea_off + 8 + rlen], "ppt")
    except XlsCryptoBroken as e:
        raise PptCryptoBroken(e.reason) from e
    if fp["variant"] != "capi":
        raise PptCryptoBroken("ppt_cipher_unsupported")
    block_key = None
    for cand in (password, "VelvetSweatshop"):
        if cand is None:
            continue
        block_key = _verify(fp, cand)
        if block_key is not None:
            break
    if block_key is None:
        raise PptCryptoBroken("ppt_bad_password")

    out = bytearray(ppt_stream)
    for pid, poff in persist.items():
        if pid == enc_pid:
            continue
        if poff + 8 > len(ppt_stream):
            raise PptCryptoBroken("ppt_crypt_malformed")
        # one continuous keystream per object: header first (for the
        # length), then the payload
        rc4 = _RC4(block_key(pid))
        hdr = rc4.crypt(ppt_stream[poff:poff + 8])
        _vi, _rt, rlen = struct.unpack("<HHI", hdr)
        if poff + 8 + rlen > len(ppt_stream):
            # password already verifier-checked: an overrun means the
            # persist layout is corrupt, not that the key is wrong
            raise PptCryptoBroken("ppt_crypt_malformed")
        out[poff:poff + 8] = hdr
        out[poff + 8:poff + 8 + rlen] = rc4.crypt(
            ppt_stream[poff + 8:poff + 8 + rlen])
    # blank the encryption atom's type so flat walkers skip it
    struct.pack_into("<HH", out, ea_off, 0, 0xFFFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------

def build_encrypted_ppt(blocks: list[str],
                        password: str = "VelvetSweatshop", *,
                        key_bits: int = 128) -> bytes:
    """Encrypted .ppt fixture: the build_ppt Document container as
    persist object 1 (RC4 block=1), DocumentEncryptionAtom as persist
    object 2 (plaintext), persist directory + UserEditAtom + marked
    Current User stream."""
    from .doc_extract import _build_cfb
    from .ppt_extract import RT_TEXT_BYTES, RT_TEXT_CHARS, RT_DOCUMENT

    recs = b""
    for block in blocks:
        try:
            payload = block.encode("latin-1")
            rtype = RT_TEXT_BYTES
        except UnicodeEncodeError:
            payload = block.encode("utf-16-le")
            rtype = RT_TEXT_CHARS
        recs += struct.pack("<HHI", 0x0000, rtype, len(payload)) + payload
    doc_plain = struct.pack("<HHI", 0x000F, RT_DOCUMENT, len(recs)) + recs

    seed = b"".join(b.encode("utf-8", "replace") for b in blocks)
    salt = hashlib.blake2b(b"psalt" + seed, digest_size=16).digest()
    verifier = hashlib.blake2b(b"pver" + seed, digest_size=16).digest()
    hdr, block_key = build_rc4_header(password, salt, verifier,
                                      variant="capi", key_bits=key_bits)

    doc_off = 0
    doc_enc = _RC4(block_key(1)).crypt(doc_plain)
    ea_off = doc_off + len(doc_enc)
    # recVer 0xF: DocumentEncryptionAtom is container-shaped per
    # [MS-PPT] §2.3.5.1
    enc_atom = struct.pack("<HHI", 0x000F, RT_DOC_ENCRYPTION, len(hdr)) + hdr
    dir_off = ea_off + len(enc_atom)
    entries = struct.pack("<I", 1 | (2 << 20)) + struct.pack(
        "<II", doc_off, ea_off)
    pdir = struct.pack("<HHI", 0x0000, RT_PERSIST_DIRECTORY,
                       len(entries)) + entries
    ue_off = dir_off + len(pdir)
    ue_payload = struct.pack(
        "<IHBBIIIIHHI",
        0,          # lastSlideIdRef
        0, 0, 3,    # version, minorVersion, majorVersion
        0,          # offsetLastEdit (0 = oldest edit)
        dir_off,    # offsetPersistDirectory
        1,          # docPersistIdRef
        3,          # persistIdSeed
        0, 0,       # lastView, unused
        2,          # encryptSessionPersistIdRef
    )
    user_edit = struct.pack("<HHI", 0x0000, RT_USER_EDIT,
                            len(ue_payload)) + ue_payload
    stream = doc_enc + enc_atom + pdir + user_edit

    cu_payload = struct.pack(
        "<IIIHHBBH",
        0x14,               # size
        TOKEN_ENCRYPTED,    # headerToken
        ue_off,             # offsetToCurrentEdit
        0,                  # lenUserName
        0x03F4,             # docFileVersion
        3, 0,               # majorVersion, minorVersion
        0,                  # unused
    )
    cu = struct.pack("<HHI", 0x0000, RT_CURRENT_USER, len(cu_payload)) \
        + cu_payload
    return _build_cfb([("PowerPoint Document", stream),
                       (_CURRENT_USER_STREAM, cu)])
