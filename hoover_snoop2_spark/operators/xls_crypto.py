"""Encrypted legacy Excel (.xls BIFF8 FILEPASS) — RC4 decryption from the
public specs, no external tools.

Two publicly-specified RC4 variants live behind the FILEPASS record
([MS-XLS] §2.4.117, [MS-OFFCRYPTO]):

- **RC4 standard** (EncryptionVersionInfo 1.1, [MS-OFFCRYPTO] §2.3.6
  "Office Binary Document RC4 Encryption"): MD5 key ladder —
  ``MD5((MD5(pw_utf16)[:5] + salt) * 16)[:5]`` truncated key material,
  re-keyed per 1024-byte block as ``MD5(material + block_le32)``.
- **RC4 CryptoAPI** (EncryptionVersionInfo x.2, [MS-OFFCRYPTO] §2.3.5):
  SHA-1 ladder — ``SHA1(SHA1(salt + pw_utf16) + block_le32)`` truncated
  to the header's key size (40-bit keys are zero-padded to 128 bits),
  same 1024-byte block cadence for BIFF streams.

Both XOR the workbook stream with a positional keystream: record
type/length headers are stored plaintext but still consume keystream,
a short list of records is never encrypted ([MS-XLS] §2.2.10 — BOF,
FILEPASS, UsrExcl, FileLock, InterfaceHdr, RRDInfo, RRDHead), and
BoundSheet8 keeps its 4-byte ``lbPlyPos`` in the clear.

The reference pipes .xls through Tika/POI (snoop/data/analyzers/
tika.py), which auto-tries Excel's well-known default password
``VelvetSweatshop`` — workbooks saved with "encrypt with default"
open transparently; we replicate that ladder (worker-local password
first, then the default).  XOR obfuscation (wEncryptionType 0) is a
16-bit-checksum scheme predating RC4; refused typed
(``xls_xor_unsupported``) like the reference's tika-error surface.
"""

from __future__ import annotations

import hashlib
import struct

_R_BOF = 0x0809
_R_FILEPASS = 0x002F
_R_BOUNDSHEET = 0x0085
# [MS-XLS] §2.2.10: records stored plaintext even in encrypted streams
_PLAINTEXT_RECORDS = {
    _R_BOF, _R_FILEPASS, 0x0194, 0x0195, 0x00E1, 0x0196, 0x0138,
}
_BLOCK = 1024  # BIFF8 RC4 re-key cadence (both variants)
_DEFAULT_PASSWORD = "VelvetSweatshop"


class XlsCryptoBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


class _RC4:
    """Plain RC4 keystream (symmetric: decrypt == encrypt)."""

    def __init__(self, key: bytes):
        s = list(range(256))
        j = 0
        for i in range(256):
            j = (j + s[i] + key[i % len(key)]) & 0xFF
            s[i], s[j] = s[j], s[i]
        self._s = s
        self._i = 0
        self._j = 0

    def keystream(self, n: int) -> bytes:
        s, i, j = self._s, self._i, self._j
        out = bytearray(n)
        for k in range(n):
            i = (i + 1) & 0xFF
            j = (j + s[i]) & 0xFF
            s[i], s[j] = s[j], s[i]
            out[k] = s[(s[i] + s[j]) & 0xFF]
        self._i, self._j = i, j
        return bytes(out)

    def crypt(self, data: bytes) -> bytes:
        ks = self.keystream(len(data))
        return bytes(a ^ b for a, b in zip(data, ks))


class _PositionalRC4:
    """RC4 keystream addressed by absolute stream offset with per-block
    re-keying — the Office binary model where plaintext spans still
    consume keystream.  BIFF8 re-keys every 1024 bytes ([MS-XLS]
    §2.2.10); Word binary every 512 ([MS-OFFCRYPTO] §2.3.6.2)."""

    def __init__(self, block_key, block: int = _BLOCK):
        self._block_key = block_key  # int block -> bytes key
        self._block = block
        self._pos = 0
        self._rc4 = _RC4(block_key(0))

    def _rekey(self) -> None:
        if self._pos % self._block == 0:
            self._rc4 = _RC4(self._block_key(self._pos // self._block))

    def _advance_to(self, pos: int) -> None:
        if pos < self._pos:
            raise ValueError("positional keystream cannot rewind")
        while self._pos < pos:
            block_end = (self._pos // self._block + 1) * self._block
            n = min(pos, block_end) - self._pos
            self._rc4.keystream(n)
            self._pos += n
            self._rekey()

    def crypt_at(self, pos: int, data: bytes) -> bytes:
        self._advance_to(pos)
        out = bytearray()
        i = 0
        while i < len(data):
            block_end = (self._pos // self._block + 1) * self._block
            n = min(len(data) - i, block_end - self._pos)
            out += self._rc4.crypt(data[i:i + n])
            i += n
            self._pos += n
            self._rekey()
        return bytes(out)


# ---------------------------------------------------------------------------
# Key ladders
# ---------------------------------------------------------------------------

def _std_key_material(password: str, salt: bytes) -> bytes:
    """[MS-OFFCRYPTO] §2.3.6.2: 5-byte truncated-MD5 ladder."""
    h0 = hashlib.md5(password.encode("utf-16-le")).digest()
    return hashlib.md5((h0[:5] + salt) * 16).digest()[:5]


def _std_block_key(material: bytes):
    def key(block: int) -> bytes:
        return hashlib.md5(material + struct.pack("<I", block)).digest()
    return key


def _capi_block_key(password: str, salt: bytes, key_bits: int):
    """[MS-OFFCRYPTO] §2.3.5.2: SHA-1 ladder; 40-bit keys zero-pad to
    128 bits (the CryptoAPI convention)."""
    h0 = hashlib.sha1(salt + password.encode("utf-16-le")).digest()

    def key(block: int) -> bytes:
        hfinal = hashlib.sha1(h0 + struct.pack("<I", block)).digest()
        if key_bits == 40:
            return hfinal[:5] + b"\x00" * 11
        return hfinal[:key_bits // 8]
    return key


# ---------------------------------------------------------------------------
# FILEPASS parse + verify
# ---------------------------------------------------------------------------

def parse_rc4_header(data: bytes, prefix: str = "xls") -> dict:
    """EncryptionVersionInfo-led RC4 header (the FILEPASS payload past
    wEncryptionType; the same wire shape starts Word's Table-stream
    EncryptionHeader, [MS-DOC] §2.2.6.2-6.3) →
    {variant, salt, enc_verifier, enc_vhash, key_bits}."""
    if len(data) < 4:
        raise XlsCryptoBroken(f"{prefix}_crypt_malformed")
    vmaj, vmin = struct.unpack_from("<HH", data, 0)
    if (vmaj, vmin) == (1, 1):
        if len(data) < 4 + 48:
            raise XlsCryptoBroken(f"{prefix}_crypt_malformed")
        return {
            "variant": "rc4",
            "salt": data[4:20],
            "enc_verifier": data[20:36],
            "enc_vhash": data[36:52],
            "key_bits": 128,
        }
    if vmin == 2 and vmaj in (2, 3, 4):
        # CryptoAPI: flags(4) headerSize(4) EncryptionHeader then verifier
        if len(data) < 12:
            raise XlsCryptoBroken(f"{prefix}_crypt_malformed")
        (hdr_size,) = struct.unpack_from("<I", data, 8)
        hdr = data[12:12 + hdr_size]
        ver = data[12 + hdr_size:]
        if len(hdr) < 20 or len(ver) < 4 + 16 + 16 + 4 + 20:
            raise XlsCryptoBroken(f"{prefix}_crypt_malformed")
        alg_id, _alg_hash, key_bits = struct.unpack_from("<III", hdr, 8)
        if alg_id not in (0x6801, 0):  # CALG_RC4 (0 = "determine by flags")
            raise XlsCryptoBroken(f"{prefix}_cipher_unsupported")
        key_bits = key_bits or 40
        if key_bits not in (40, 56, 64, 128):
            raise XlsCryptoBroken(f"{prefix}_cipher_unsupported")
        (salt_size,) = struct.unpack_from("<I", ver, 0)
        if salt_size != 16:
            raise XlsCryptoBroken(f"{prefix}_crypt_malformed")
        return {
            "variant": "capi",
            "salt": ver[4:20],
            "enc_verifier": ver[20:36],
            "enc_vhash": ver[40:60],
            "key_bits": key_bits,
        }
    raise XlsCryptoBroken(f"{prefix}_crypt_unsupported")


def parse_filepass(payload: bytes) -> dict:
    """FILEPASS → {variant, salt, enc_verifier, enc_vhash, key_bits}."""
    if len(payload) < 2:
        raise XlsCryptoBroken("xls_crypt_malformed")
    (enc_type,) = struct.unpack_from("<H", payload, 0)
    if enc_type == 0:
        raise XlsCryptoBroken("xls_xor_unsupported")
    return parse_rc4_header(payload[2:], "xls")


def _verify(fp: dict, password: str):
    """Password check per variant; returns the block-key fn or None."""
    if fp["variant"] == "rc4":
        block_key = _std_block_key(_std_key_material(password, fp["salt"]))
        rc4 = _RC4(block_key(0))
        verifier = rc4.crypt(fp["enc_verifier"])
        vhash = rc4.crypt(fp["enc_vhash"])
        if hashlib.md5(verifier).digest() != vhash:
            return None
        return block_key
    block_key = _capi_block_key(password, fp["salt"], fp["key_bits"])
    rc4 = _RC4(block_key(0))
    verifier = rc4.crypt(fp["enc_verifier"])
    vhash = rc4.crypt(fp["enc_vhash"])
    if hashlib.sha1(verifier).digest() != vhash:
        return None
    return block_key


# ---------------------------------------------------------------------------
# Workbook stream transform (decrypt and encrypt share it: RC4 is XOR)
# ---------------------------------------------------------------------------

def _transform_stream(stream: bytes, block_key) -> bytes:
    """XOR the encryptable byte ranges of a BIFF8 stream with the
    positional keystream; headers/exempt records pass through (but
    consume keystream)."""
    ks = _PositionalRC4(block_key)
    out = bytearray(stream)
    i = 0
    while i + 4 <= len(stream):
        rid, ln = struct.unpack_from("<HH", stream, i)
        body = i + 4
        if rid not in _PLAINTEXT_RECORDS and ln:
            start = body
            if rid == _R_BOUNDSHEET:
                start += 4  # lbPlyPos stays plaintext
            if start < body + ln:
                out[start:body + ln] = ks.crypt_at(
                    start, bytes(stream[start:body + ln]))
        i = body + ln
    return bytes(out)


def decrypt_workbook_stream(wb: bytes, password: str | None = None) -> bytes:
    """Encrypted Workbook stream → plaintext stream (FILEPASS record kept;
    the parser ignores it).  Tries `password` then VelvetSweatshop."""
    # record type/length headers are stored plaintext even in encrypted
    # streams, so walking every record is safe — robust to the benign
    # records real writers put between BOF and FILEPASS (WRITEPROT,
    # CODEPAGE, FILESHARING, ...)
    fp_payload = None
    i = 0
    while i + 4 <= len(wb):
        rid, ln = struct.unpack_from("<HH", wb, i)
        if rid == _R_FILEPASS:
            fp_payload = wb[i + 4:i + 4 + ln]
            break
        i += 4 + ln
    if fp_payload is None:
        return wb
    fp = parse_filepass(fp_payload)
    candidates = [p for p in (password, _DEFAULT_PASSWORD) if p is not None]
    block_key = None
    for cand in candidates:
        block_key = _verify(fp, cand)
        if block_key is not None:
            break
    if block_key is None:
        raise XlsCryptoBroken("xls_bad_password")
    return _transform_stream(wb, block_key)


def has_filepass(wb: bytes) -> bool:
    i = 0
    while i + 4 <= len(wb):
        rid, ln = struct.unpack_from("<HH", wb, i)
        if rid == _R_FILEPASS:
            return True
        i += 4 + ln
    return False


# ---------------------------------------------------------------------------
# Fixture writers
# ---------------------------------------------------------------------------

def build_rc4_header(password: str, salt: bytes, verifier: bytes, *,
                     variant: str = "rc4", key_bits: int = 128):
    """(EncryptionVersionInfo-led header bytes, block-key fn) — the
    FILEPASS payload past wEncryptionType / Word's EncryptionHeader."""
    if variant == "rc4":
        block_key = _std_block_key(_std_key_material(password, salt))
        rc4 = _RC4(block_key(0))
        enc_verifier = rc4.crypt(verifier)
        enc_vhash = rc4.crypt(hashlib.md5(verifier).digest())
        return (struct.pack("<HH", 1, 1) + salt + enc_verifier + enc_vhash,
                block_key)
    if variant == "capi":
        block_key = _capi_block_key(password, salt, key_bits)
        rc4 = _RC4(block_key(0))
        enc_verifier = rc4.crypt(verifier)
        enc_vhash = rc4.crypt(hashlib.sha1(verifier).digest())
        csp = "Microsoft Base Cryptographic Provider v1.0\x00" \
            .encode("utf-16-le")
        hdr = struct.pack("<IIIIIIII", 0x4, 0, 0x6801, 0x8004, key_bits,
                          0x18, 0, 0) + csp
        ver = (struct.pack("<I", 16) + salt + enc_verifier
               + struct.pack("<I", 20) + enc_vhash)
        return (struct.pack("<HH", 2, 2) + struct.pack(
            "<II", 0x4, len(hdr)) + hdr + ver, block_key)
    raise ValueError(variant)


def encrypt_xls(data: bytes, password: str = _DEFAULT_PASSWORD, *,
                variant: str = "rc4", key_bits: int = 128) -> bytes:
    """Encrypt a plain fixture .xls (CFB) with a FILEPASS record inserted
    after BOF — round-trip validator for the decryptor."""
    from .cfb import CompoundFile
    from .doc_extract import _build_cfb

    cf = CompoundFile(data)
    paths = cf.paths()
    name = "Workbook" if "Workbook" in paths else "Book"
    wb = cf.read(paths[name])

    (bof_id, bof_len) = struct.unpack_from("<HH", wb, 0)
    if bof_id != _R_BOF:
        raise XlsCryptoBroken("xls_crypt_malformed")
    bof_end = 4 + bof_len

    salt = hashlib.blake2b(b"xsalt" + data, digest_size=16).digest()
    verifier = hashlib.blake2b(b"xver" + data, digest_size=16).digest()
    hdr, block_key = build_rc4_header(password, salt, verifier,
                                      variant=variant, key_bits=key_bits)
    payload = struct.pack("<H", 1) + hdr  # wEncryptionType=1 (RC4)
    filepass = struct.pack("<HH", _R_FILEPASS, len(payload)) + payload
    plain = wb[:bof_end] + filepass + wb[bof_end:]
    enc = _transform_stream(plain, block_key)
    return _build_cfb([(name, enc)])
