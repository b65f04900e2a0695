"""[MS-OFFCRYPTO] Agile-encrypted OOXML documents (password-protected
.docx/.xlsx/.pptx — Office 2010+ default).

A password-protected OOXML file is NOT a zip: it is an OLE/CFB
container holding ``EncryptionInfo`` (version 4.4 header + an XML
encryption descriptor) and ``EncryptedPackage`` (8-byte plaintext size
+ AES-CBC ciphertext in 4096-byte segments).  The reference's Tika call
fails on these (encrypted docs surface as broken); with the
worker-local archive password (functions/archive_crypto — the same
channel the 7z/zip unpackers use) this module decrypts the inner OOXML
zip so the normal office extractors run on it.

Agile algorithm ([MS-OFFCRYPTO] §2.3.4.11-13, widely reimplemented in
public tooling):

- password key: ``H0 = H(saltValue + UTF-16LE(password))`` then
  ``Hi = H(LE32(i) + Hi-1)`` for ``spinCount`` rounds;
- per-purpose keys: ``H(Hfinal + blockKey)`` truncated/zero-padded to
  ``keyBits/8``, with the three fixed 8-byte block keys for verifier
  input / verifier hash / key value;
- verifier: decrypt ``encryptedVerifierHashInput``/``...HashValue``
  (AES-CBC, IV = the password salt) and require
  ``H(input) == value`` — a wrong password (or a wrong KDF) can never
  yield wrong bytes, only the typed ``office_bad_password``;
- the intermediate key decrypts ``encryptedKeyValue`` → the package
  key; segment ``i`` of ``EncryptedPackage`` decrypts with
  ``IV = H(keyData.saltValue + LE32(i))`` truncated to the block size.

SHA-1/SHA-256/SHA-384/SHA-512 hashes and AES-128/192/256 CBC are
supported; anything else — including the pre-2010 binary "Standard"
descriptor (version 3.2/4.2) — refuses with a typed reason.

A deterministic WRITER (:func:`encrypt_office`) exists for fixtures and
pipeline tests: decoder and writer are independent enough that the
verifier chain, not shared code, carries the round-trip, and a wrong
implementation on REAL files degrades to a typed broken (the inner
bytes must still parse as a zip), never silent garbage.
"""

from __future__ import annotations

import hashlib
import struct
import xml.etree.ElementTree as ET

from ..functions.archive_crypto import aes_cbc_decrypt, aes_cbc_encrypt
from .cfb import CfbError, CompoundFile, is_cfb

__all__ = [
    "OfficeCryptoBroken",
    "is_encrypted_office",
    "decrypt_office",
    "encrypt_office",
]

#: fixed block keys ([MS-OFFCRYPTO] §2.3.4.13)
_BK_VERIFIER_INPUT = bytes.fromhex("fea7d2763b4b9e79")
_BK_VERIFIER_VALUE = bytes.fromhex("d7aa0f6d3061344e")
_BK_KEY_VALUE = bytes.fromhex("146e0be7abacd0d6")

_NS = "{http://schemas.microsoft.com/office/2006/encryption}"
_NS_P = "{http://schemas.microsoft.com/office/2006/keyEncryptor/password}"

_HASHES = {"SHA1": "sha1", "SHA256": "sha256", "SHA384": "sha384",
           "SHA512": "sha512", "SHA-1": "sha1", "SHA-512": "sha512"}


class OfficeCryptoBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def _streams(data: bytes) -> dict | None:
    if not is_cfb(data):
        return None
    try:
        cf = CompoundFile(data)
        paths = cf.paths()
    except (CfbError, struct.error, IndexError):
        return None
    out = {}
    for name in ("EncryptionInfo", "EncryptedPackage"):
        hit = next((p for p in paths if p.split("/")[-1] == name), None)
        if hit is None:
            return None
        out[name] = cf.read(paths[hit])
    return out


def is_encrypted_office(data: bytes) -> bool:
    """CFB container with the EncryptionInfo + EncryptedPackage pair."""
    return _streams(data) is not None


def _pw_hash(password: str, salt: bytes, spin: int, halg: str) -> bytes:
    h = hashlib.new(halg, salt + password.encode("utf-16-le")).digest()
    for i in range(spin):
        h = hashlib.new(halg, struct.pack("<I", i) + h).digest()
    return h


def _derive(pw_hash: bytes, block_key: bytes, keylen: int,
            halg: str) -> bytes:
    k = hashlib.new(halg, pw_hash + block_key).digest()
    return (k + b"\x00" * keylen)[:keylen]


def decrypt_office(data: bytes, password: str) -> bytes:
    """Encrypted OOXML CFB → the inner OOXML zip bytes."""
    st = _streams(data)
    if st is None:
        raise OfficeCryptoBroken("office_not_encrypted")
    info = st["EncryptionInfo"]
    if len(info) < 8:
        raise OfficeCryptoBroken("office_crypt_malformed")
    vmajor, vminor = struct.unpack_from("<HH", info, 0)
    if vminor == 2 and vmajor in (2, 3, 4):
        # Office-2007 binary "Standard" descriptor (AES-ECB CryptoAPI)
        return _decrypt_standard(info, st["EncryptedPackage"], password)
    if (vmajor, vminor) != (4, 4):
        raise OfficeCryptoBroken("office_crypt_unsupported")
    try:
        # tolerate sector/NUL padding after the XML (fixture CFBs pad
        # streams past the mini-FAT cutoff; real streams are exact)
        root = ET.fromstring(
            info[8:].rstrip(b"\x00").decode("utf-8", errors="strict"))
    except Exception as e:
        raise OfficeCryptoBroken("office_crypt_malformed") from e
    kd = root.find(f"{_NS}keyData")
    enc_key = root.find(f"{_NS}keyEncryptors/{_NS}keyEncryptor/"
                        f"{_NS_P}encryptedKey")
    if kd is None or enc_key is None:
        raise OfficeCryptoBroken("office_crypt_malformed")
    if (kd.get("cipherAlgorithm") != "AES"
            or kd.get("cipherChaining") != "ChainingModeCBC"
            or enc_key.get("cipherAlgorithm") != "AES"):
        raise OfficeCryptoBroken("office_cipher_unsupported")
    halg = _HASHES.get(enc_key.get("hashAlgorithm", ""))
    kd_halg = _HASHES.get(kd.get("hashAlgorithm", ""))
    if halg is None or kd_halg is None:
        raise OfficeCryptoBroken("office_cipher_unsupported")
    import base64

    pw_salt = base64.b64decode(enc_key.get("saltValue", ""))
    kd_salt = base64.b64decode(kd.get("saltValue", ""))
    spin = int(enc_key.get("spinCount", "100000"))
    key_bits = int(enc_key.get("keyBits", "256"))
    kd_bits = int(kd.get("keyBits", "256"))
    block = int(kd.get("blockSize", "16"))
    if block != 16:
        raise OfficeCryptoBroken("office_cipher_unsupported")

    pwh = _pw_hash(password, pw_salt, spin, halg)
    k_in = _derive(pwh, _BK_VERIFIER_INPUT, key_bits // 8, halg)
    k_val = _derive(pwh, _BK_VERIFIER_VALUE, key_bits // 8, halg)
    k_key = _derive(pwh, _BK_KEY_VALUE, key_bits // 8, halg)
    iv = (pw_salt + b"\x00" * 16)[:16]

    ev_in = base64.b64decode(enc_key.get("encryptedVerifierHashInput", ""))
    ev_val = base64.b64decode(enc_key.get("encryptedVerifierHashValue", ""))
    ek_val = base64.b64decode(enc_key.get("encryptedKeyValue", ""))
    try:
        verifier = aes_cbc_decrypt(k_in, iv, ev_in)[:len(pw_salt)]
        want = aes_cbc_decrypt(k_val, iv, ev_val)
        have = hashlib.new(halg, verifier).digest()
        if want[:len(have)] != have:
            raise OfficeCryptoBroken("office_bad_password")
        secret = aes_cbc_decrypt(k_key, iv, ek_val)[:kd_bits // 8]
    except ValueError as e:
        raise OfficeCryptoBroken("office_crypt_malformed") from e

    pkg = st["EncryptedPackage"]
    if len(pkg) < 8:
        raise OfficeCryptoBroken("office_crypt_malformed")
    (total,) = struct.unpack_from("<Q", pkg, 0)
    # ciphertext length = total rounded up to the block (only the final
    # segment rounds); anything past it is stream padding
    ct = pkg[8:8 + ((total + 15) // 16) * 16]
    if len(ct) < ((total + 15) // 16) * 16:
        raise OfficeCryptoBroken("office_crypt_malformed")
    out = bytearray()
    seg = 4096
    for i in range(0, len(ct), seg):
        seg_iv = hashlib.new(
            kd_halg, kd_salt + struct.pack("<I", i // seg)).digest()[:16]
        out += aes_cbc_decrypt(secret, seg_iv, ct[i:i + seg])
    if total > len(out):
        raise OfficeCryptoBroken("office_crypt_malformed")
    inner = bytes(out[:total])
    if inner[:2] != b"PK":
        # structurally impossible for a correct decrypt of real OOXML —
        # catches any residual KDF divergence as a typed reason
        raise OfficeCryptoBroken("office_bad_password")
    return inner


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def _build_cfb(streams: list[tuple[str, bytes]]) -> bytes:
    """Minimal CFB writer: version 3 (512-byte sectors), every stream
    forced to the regular-sector path (padded past the 4096-byte mini
    cutoff), flat directory under Root."""
    sect = 512
    # force regular sectors: CFB routes streams < 4096 through the mini
    # FAT, which this writer does not emit
    blobs = [(n, s + b"\x00" * 0) for n, s in streams]
    for n, s in blobs:
        if len(s) < 4096:
            raise ValueError("stream too small for the no-miniFAT writer")
    chains = []
    data_area = bytearray()
    for _, s in blobs:
        start = len(data_area) // sect
        ns = (len(s) + sect - 1) // sect
        data_area += s + b"\x00" * (ns * sect - len(s))
        chains.append((start, ns))
    n_data = len(data_area) // sect
    # directory: root + streams, 4 entries per sector
    n_dir_entries = 1 + len(blobs)
    n_dir_sect = (n_dir_entries + 3) // 4
    # FAT: data sectors + dir sectors + the FAT sectors themselves
    total_payload = n_data + n_dir_sect
    n_fat = 1
    while (total_payload + n_fat + 127) // 128 > n_fat:
        n_fat += 1
    fat = []
    for start, ns in chains:
        for k in range(ns - 1):
            fat.append(start + k + 1)
        fat.append(0xFFFFFFFE)  # ENDOFCHAIN
    dir_start = n_data
    for k in range(n_dir_sect - 1):
        fat.append(dir_start + k + 1)
    fat.append(0xFFFFFFFE)
    for k in range(n_fat):
        fat.append(0xFFFFFFFD)  # FATSECT marker
    while len(fat) % 128:
        fat.append(0xFFFFFFFF)

    def dirent(name, etype, start=0xFFFFFFFE, size=0,
               child=0xFFFFFFFF, left=0xFFFFFFFF, right=0xFFFFFFFF):
        nm = name.encode("utf-16-le") + b"\x00\x00"
        e = bytearray(128)
        e[0:len(nm)] = nm
        struct.pack_into("<H", e, 64, len(nm))
        e[66] = etype  # 5 root, 2 stream
        e[67] = 1  # black
        struct.pack_into("<III", e, 68, left, right, child)
        struct.pack_into("<I", e, 116, start)
        struct.pack_into("<Q", e, 120, size)
        return bytes(e)

    # simple left-spine red-black-ish tree: root's child = entry 1,
    # entry i's right sibling = i+1
    entries = [dirent("Root Entry", 5, child=1)]
    for i, ((name, s), (start, _)) in enumerate(zip(blobs, chains)):
        right = i + 2 if i + 1 < len(blobs) else 0xFFFFFFFF
        entries.append(dirent(name, 2, start=start, size=len(s),
                              right=right))
    while len(entries) % 4:
        entries.append(bytes(128))
    dir_area = b"".join(entries)

    hdr = bytearray(512)
    hdr[0:8] = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    struct.pack_into("<H", hdr, 24, 0x003E)  # minor
    struct.pack_into("<H", hdr, 26, 3)  # major version 3
    struct.pack_into("<H", hdr, 28, 0xFFFE)  # little-endian
    struct.pack_into("<H", hdr, 30, 9)  # sector shift 512
    struct.pack_into("<H", hdr, 32, 6)  # mini sector shift
    struct.pack_into("<I", hdr, 44, n_fat)
    struct.pack_into("<I", hdr, 48, dir_start)
    struct.pack_into("<I", hdr, 56, 4096)  # mini cutoff
    struct.pack_into("<I", hdr, 60, 0xFFFFFFFE)  # no mini FAT
    struct.pack_into("<I", hdr, 64, 0)
    struct.pack_into("<I", hdr, 68, 0xFFFFFFFE)  # no DIFAT chain
    struct.pack_into("<I", hdr, 72, 0)
    fat_start = n_data + n_dir_sect
    if n_fat > 109:
        raise ValueError("fixture too large for header DIFAT")
    for k in range(109):
        struct.pack_into("<I", hdr, 76 + 4 * k,
                         fat_start + k if k < n_fat else 0xFFFFFFFF)
    body = bytes(data_area) + dir_area
    fat_area = b"".join(struct.pack("<I", v) for v in fat)
    return bytes(hdr) + body + fat_area


def encrypt_office(package: bytes, password: str, *,
                   key_bits: int = 256, spin: int = 1000,
                   hash_alg: str = "SHA512") -> bytes:
    """OOXML zip bytes → Agile-encrypted CFB (deterministic salts from
    the content; low default spinCount keeps fixtures fast — the format
    carries the count, so the decoder path is identical)."""
    import base64

    halg = _HASHES[hash_alg]
    pw_salt = hashlib.blake2b(b"pws" + package, digest_size=16).digest()
    kd_salt = hashlib.blake2b(b"kds" + package, digest_size=16).digest()
    verifier = hashlib.blake2b(b"ver" + package, digest_size=16).digest()
    secret = hashlib.blake2b(b"key" + package,
                             digest_size=key_bits // 8).digest()

    pwh = _pw_hash(password, pw_salt, spin, halg)
    k_in = _derive(pwh, _BK_VERIFIER_INPUT, key_bits // 8, halg)
    k_val = _derive(pwh, _BK_VERIFIER_VALUE, key_bits // 8, halg)
    k_key = _derive(pwh, _BK_KEY_VALUE, key_bits // 8, halg)
    iv = (pw_salt + b"\x00" * 16)[:16]
    vh = hashlib.new(halg, verifier).digest()
    ev_in = aes_cbc_encrypt(k_in, iv, verifier)
    ev_val = aes_cbc_encrypt(k_val, iv, vh)
    ek_val = aes_cbc_encrypt(k_key, iv, secret)

    b64 = lambda b: base64.b64encode(b).decode()
    hash_size = hashlib.new(halg).digest_size
    xml = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<encryption xmlns="http://schemas.microsoft.com/office/2006/'
        'encryption" xmlns:p="http://schemas.microsoft.com/office/2006/'
        'keyEncryptor/password">'
        f'<keyData saltSize="{len(kd_salt)}" blockSize="16" '
        f'keyBits="{key_bits}" hashSize="{hash_size}" '
        f'cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" '
        f'hashAlgorithm="{hash_alg}" saltValue="{b64(kd_salt)}"/>'
        '<keyEncryptors><keyEncryptor uri="http://schemas.microsoft.com/'
        'office/2006/keyEncryptor/password">'
        f'<p:encryptedKey spinCount="{spin}" saltSize="{len(pw_salt)}" '
        f'blockSize="16" keyBits="{key_bits}" hashSize="{hash_size}" '
        f'cipherAlgorithm="AES" cipherChaining="ChainingModeCBC" '
        f'hashAlgorithm="{hash_alg}" saltValue="{b64(pw_salt)}" '
        f'encryptedVerifierHashInput="{b64(ev_in)}" '
        f'encryptedVerifierHashValue="{b64(ev_val)}" '
        f'encryptedKeyValue="{b64(ek_val)}"/>'
        '</keyEncryptor></keyEncryptors></encryption>'
    )
    info = struct.pack("<HHI", 4, 4, 0x40) + xml.encode("utf-8")

    ct = bytearray()
    seg = 4096
    for i in range(0, len(package), seg):
        seg_iv = hashlib.new(
            halg, kd_salt + struct.pack("<I", i // seg)).digest()[:16]
        ct += aes_cbc_encrypt(secret, seg_iv, package[i:i + seg])
    pkg = struct.pack("<Q", len(package)) + bytes(ct)

    # pad streams past the 4096-byte mini cutoff for the simple writer
    info_p = info + b"\x00" * max(0, 4096 - len(info))
    pkg_p = pkg if len(pkg) >= 4096 else pkg + b"\x00" * (4096 - len(pkg))
    return _build_cfb([("EncryptionInfo", info_p),
                       ("EncryptedPackage", pkg_p)])


# ---------------------------------------------------------------------------
# Standard (binary) encryption — Office 2007, EncryptionInfo v3.2/4.2
# ([MS-OFFCRYPTO] §2.3.4.5-2.3.4.9: CryptoAPI binary header + verifier,
# SHA-1 x50000 key derivation, AES-ECB package)
# ---------------------------------------------------------------------------

_ALG_AES = {0x660E: 16, 0x660F: 24, 0x6610: 32}


def _standard_key(password: str, salt: bytes, keylen: int) -> bytes:
    h = hashlib.sha1(salt + password.encode("utf-16-le")).digest()
    for i in range(50000):
        h = hashlib.sha1(struct.pack("<I", i) + h).digest()
    h = hashlib.sha1(h + struct.pack("<I", 0)).digest()
    x1 = hashlib.sha1(bytes(0x36 ^ b for b in (h + b"\x00" * 64)[:64]))
    key = x1.digest()
    if keylen > 20:
        x2 = hashlib.sha1(bytes(0x5C ^ b for b in (h + b"\x00" * 64)[:64]))
        key += x2.digest()
    return key[:keylen]


def _aes_ecb(key: bytes, data: bytes, *, decrypt: bool) -> bytes:
    from ..functions.pgp_codec import (
        aes_decrypt_block,
        aes_encrypt_block,
        expand_key,
        expand_key_dec,
    )

    if len(data) % 16:
        data += b"\x00" * (16 - len(data) % 16)
    if decrypt:
        rk = expand_key_dec(key)
        f = aes_decrypt_block
    else:
        rk = expand_key(key)
        f = aes_encrypt_block
    return b"".join(f(rk, data[i:i + 16]) for i in range(0, len(data), 16))


def _decrypt_standard(info: bytes, pkg: bytes, password: str) -> bytes:
    if len(info) < 12:
        raise OfficeCryptoBroken("office_crypt_malformed")
    (hdr_size,) = struct.unpack_from("<I", info, 8)
    hdr = info[12:12 + hdr_size]
    ver = info[12 + hdr_size:]
    if len(hdr) < 24 or len(ver) < 4:
        raise OfficeCryptoBroken("office_crypt_malformed")
    alg_id, _alg_hash, key_size = struct.unpack_from("<III", hdr, 8)
    keylen = _ALG_AES.get(alg_id)
    if keylen is None:
        # the CryptoAPI RC4 variant (0x6801) keys per 512-byte block
        # with MD5 — a different machine; refused typed
        raise OfficeCryptoBroken("office_cipher_unsupported")
    if key_size and key_size // 8 != keylen:
        raise OfficeCryptoBroken("office_crypt_malformed")
    (salt_size,) = struct.unpack_from("<I", ver, 0)
    if salt_size != 16 or len(ver) < 4 + 16 + 16 + 4 + 32:
        raise OfficeCryptoBroken("office_crypt_malformed")
    salt = ver[4:20]
    enc_verifier = ver[20:36]
    (vh_size,) = struct.unpack_from("<I", ver, 36)
    enc_vhash = ver[40:72]
    key = _standard_key(password, salt, keylen)
    verifier = _aes_ecb(key, enc_verifier, decrypt=True)
    vhash = _aes_ecb(key, enc_vhash, decrypt=True)
    if hashlib.sha1(verifier).digest() != vhash[:min(vh_size, 20)]:
        raise OfficeCryptoBroken("office_bad_password")
    if len(pkg) < 8:
        raise OfficeCryptoBroken("office_crypt_malformed")
    (total,) = struct.unpack_from("<Q", pkg, 0)
    ct = pkg[8:8 + ((total + 15) // 16) * 16]
    if len(ct) < ((total + 15) // 16) * 16:
        raise OfficeCryptoBroken("office_crypt_malformed")
    inner = _aes_ecb(key, ct, decrypt=True)[:total]
    if inner[:2] != b"PK":
        raise OfficeCryptoBroken("office_bad_password")
    return inner


def encrypt_office_standard(package: bytes, password: str, *,
                            key_bits: int = 128) -> bytes:
    """Office-2007-style Standard-encrypted CFB fixture writer."""
    keylen = key_bits // 8
    alg_id = {16: 0x660E, 24: 0x660F, 32: 0x6610}[keylen]
    salt = hashlib.blake2b(b"stds" + package, digest_size=16).digest()
    verifier = hashlib.blake2b(b"stdv" + package, digest_size=16).digest()
    key = _standard_key(password, salt, keylen)
    enc_verifier = _aes_ecb(key, verifier, decrypt=False)
    vhash = hashlib.sha1(verifier).digest()
    enc_vhash = _aes_ecb(key, vhash + b"\x00" * 12, decrypt=False)
    csp = "Microsoft Enhanced RSA and AES Cryptographic Provider\x00" \
        .encode("utf-16-le")
    hdr = struct.pack("<IIIIIIII", 0x24, 0, alg_id, 0x8004, key_bits,
                      0x18, 0, 0) + csp
    ver = (struct.pack("<I", 16) + salt + enc_verifier
           + struct.pack("<I", 20) + enc_vhash)
    info = struct.pack("<HHI", 4, 2, 0x24) \
        + struct.pack("<I", len(hdr)) + hdr + ver
    pkg = struct.pack("<Q", len(package)) \
        + _aes_ecb(key, package, decrypt=False)
    info_p = info + b"\x00" * max(0, 4096 - len(info))
    pkg_p = pkg if len(pkg) >= 4096 else pkg + b"\x00" * (4096 - len(pkg))
    return _build_cfb([("EncryptionInfo", info_p),
                       ("EncryptedPackage", pkg_p)])
