"""Encrypted legacy Word (.doc) — [MS-DOC] §2.2.6.2/§2.2.6.3 RC4
decryption over the CFB reader, sharing xls_crypto's key ladders.

Model ([MS-DOC] "Office Binary Document RC4 Encryption" and "RC4
CryptoAPI Encryption"): FibBase.fEncrypted (bit 0x0100 of the flag
word at WordDocument offset 0x0A) marks the document; FibBase.lKey
(offset 0x0E) is the byte size of the EncryptionHeader stored at the
START of the Table stream.  The EncryptionHeader is the same
EncryptionVersionInfo-led RC4 wire shape as the .xls FILEPASS payload
(1.1 = MD5-ladder standard, x.2 = SHA-1 CryptoAPI) — parsed by
``xls_crypto.parse_rc4_header``.

Encrypted regions, each stream keyed positionally from ITS OWN offset
0 with **512-byte** block re-keying (Word's cadence per [MS-OFFCRYPTO]
§2.3.6.2, vs BIFF8's 1024):

- WordDocument: everything past the 68-byte plaintext FibBase (the
  plaintext prefix still consumes keystream);
- Table stream: everything past the plaintext lKey-byte header;
- Data stream: entirely encrypted (decrypted when present; the text
  path doesn't read it).

fObfuscated (bit 0x8000: XOR obfuscation) refuses typed
(``doc_xor_unsupported``) — same CreateXorKey_Method1 table gap as
.xls.  The reference routes encrypted .doc to Tika/POI
(snoop/data/analyzers/tika.py), which applies the same ladders.
"""

from __future__ import annotations

import hashlib
import struct

from .xls_crypto import (
    XlsCryptoBroken,
    _PositionalRC4,
    _verify,
    build_rc4_header,
    parse_rc4_header,
)

_OFF_FLAGS = 0x0A
_OFF_LKEY = 0x0E
_F_ENCRYPTED = 0x0100
_F_OBFUSCATED = 0x8000
_F_WHICH_TBL_STM = 0x0200
_FIB_BASE = 68   # plaintext FibBase prefix of WordDocument
_WORD_BLOCK = 512


class DocCryptoBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def doc_is_encrypted(word_stream: bytes) -> bool:
    if len(word_stream) < _FIB_BASE:
        return False
    (flags,) = struct.unpack_from("<H", word_stream, _OFF_FLAGS)
    return bool(flags & _F_ENCRYPTED)


def decrypt_doc_streams(
    word_stream: bytes,
    table_stream: bytes,
    password: str | None = None,
    data_stream: bytes | None = None,
) -> tuple[bytes, bytes, bytes | None]:
    """(WordDocument, Table[, Data]) plaintext streams; tries `password`
    then Excel/Word's well-known default VelvetSweatshop."""
    (flags,) = struct.unpack_from("<H", word_stream, _OFF_FLAGS)
    if not flags & _F_ENCRYPTED:
        return word_stream, table_stream, data_stream
    if flags & _F_OBFUSCATED:
        raise DocCryptoBroken("doc_xor_unsupported")
    (lkey,) = struct.unpack_from("<I", word_stream, _OFF_LKEY)
    if not 4 <= lkey <= len(table_stream):
        raise DocCryptoBroken("doc_crypt_malformed")
    try:
        fp = parse_rc4_header(table_stream[:lkey], "doc")
    except XlsCryptoBroken as e:
        raise DocCryptoBroken(e.reason) from e
    block_key = None
    for cand in (password, "VelvetSweatshop"):
        if cand is None:
            continue
        block_key = _verify(fp, cand)
        if block_key is not None:
            break
    if block_key is None:
        raise DocCryptoBroken("doc_bad_password")

    def stream_decrypt(stream: bytes, plain_prefix: int) -> bytes:
        ks = _PositionalRC4(block_key, block=_WORD_BLOCK)
        return stream[:plain_prefix] + ks.crypt_at(
            plain_prefix, stream[plain_prefix:])

    wd = bytearray(stream_decrypt(word_stream, _FIB_BASE))
    # the decrypted copy is a plain document: clear fEncrypted + lKey so
    # downstream offsets/readers treat it uniformly
    struct.pack_into("<H", wd, _OFF_FLAGS, flags & ~_F_ENCRYPTED)
    struct.pack_into("<I", wd, _OFF_LKEY, 0)
    table = stream_decrypt(table_stream, lkey)
    data = (stream_decrypt(data_stream, 0)
            if data_stream is not None else None)
    return bytes(wd), table, data


# ---------------------------------------------------------------------------
# Fixture writer
# ---------------------------------------------------------------------------

def encrypt_doc(data: bytes, password: str = "VelvetSweatshop", *,
                variant: str = "rc4", key_bits: int = 128) -> bytes:
    """Encrypt a plain fixture .doc (CFB): prepend the EncryptionHeader
    to the Table stream (shifting FIB table offsets), set fEncrypted +
    lKey, RC4 the encryptable spans — round-trip validator."""
    from .cfb import CompoundFile
    from .doc_extract import _OFF_FCCLX, _build_cfb

    cf = CompoundFile(data)
    paths = cf.paths()
    wd = bytearray(cf.read(paths["WordDocument"]))
    (flags,) = struct.unpack_from("<H", wd, _OFF_FLAGS)
    table_name = "1Table" if flags & _F_WHICH_TBL_STM else "0Table"
    table = cf.read(paths[table_name])

    salt = hashlib.blake2b(b"dsalt" + data, digest_size=16).digest()
    verifier = hashlib.blake2b(b"dver" + data, digest_size=16).digest()
    hdr, block_key = build_rc4_header(password, salt, verifier,
                                      variant=variant, key_bits=key_bits)

    # shift the Clx pointer for the prepended header (the fixture's only
    # table-stream offset), then mark encryption in the FibBase
    (fc_clx,) = struct.unpack_from("<I", wd, _OFF_FCCLX)
    struct.pack_into("<I", wd, _OFF_FCCLX, fc_clx + len(hdr))
    struct.pack_into("<H", wd, _OFF_FLAGS, flags | _F_ENCRYPTED)
    struct.pack_into("<I", wd, _OFF_LKEY, len(hdr))

    def stream_encrypt(stream: bytes, plain_prefix: int) -> bytes:
        ks = _PositionalRC4(block_key, block=_WORD_BLOCK)
        return stream[:plain_prefix] + ks.crypt_at(
            plain_prefix, stream[plain_prefix:])

    enc_wd = stream_encrypt(bytes(wd), _FIB_BASE)
    enc_table = stream_encrypt(hdr + table, len(hdr))
    return _build_cfb([("WordDocument", enc_wd), (table_name, enc_table)])
