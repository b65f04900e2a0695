"""Password-protected archive crypto — 7z AES-256 and WinZip AES.

The reference shells encrypted archives to ``7z x`` with no password, so
they surface as broken (archives.py:155-203); real corpora carry known
passwords, so this engine goes one step further: a worker-local default
archive password (the exact analog of the PGP keyring in
:mod:`.pgp_codec` — the pipeline closure carries it, each Python worker
reads it lazily) unlocks

- **7z AES-256** folders (coder 06F10701): properties layout and the
  iterated-SHA-256 key derivation from the public 7zFormat.txt /
  7zAes.cpp description — ``2^numCyclesPower`` rounds over
  ``salt + UTF-16LE(password) + counter(8, LE)`` — then AES-256-CBC
  over the packed stream;
- **WinZip AES** zip entries (method 99, extra field 0x9901, the
  published AE-1/AE-2 spec): PBKDF2-HMAC-SHA1 (1000 rounds) →
  enc key ‖ mac key ‖ 2-byte verifier, AES-CTR with a little-endian
  counter starting at 1 and no nonce, HMAC-SHA1/80 authentication;
- **ZipCrypto** entries are delegated to :mod:`zipfile` (stdlib
  implements the traditional PKWARE cipher) by the zip unpacker.

The AES block cores live in :mod:`.pgp_codec` (generated tables, pinned
to FIPS-197).  Fixtures are cross-validated against libarchive
(``bsdtar``): it WRITES the encrypted-zip fixtures this module reads,
and READS the AES-7z fixtures the in-repo 7z writer produces.
"""

from __future__ import annotations

import hashlib
import hmac
import struct

from .pgp_codec import (
    aes_decrypt_block,
    aes_encrypt_block,
    expand_key,
    expand_key_dec,
)

__all__ = [
    "set_archive_password",
    "default_archive_password",
    "sevenzip_aes_key",
    "sevenzip_aes_props",
    "aes_cbc_decrypt",
    "aes_cbc_encrypt",
    "winzip_aes_decrypt_entry",
    "winzip_aes_encrypt_entry",
    "build_winzip_aes_zip",
    "ZipAesError",
]


# ---------------------------------------------------------------------------
# Worker-local default password (analog of pgp_codec.set_default_keyring)
# ---------------------------------------------------------------------------

_DEFAULT: dict = {"password": None}


def set_archive_password(password: str | None) -> None:
    _DEFAULT["password"] = password


def default_archive_password() -> str | None:
    return _DEFAULT["password"]


# ---------------------------------------------------------------------------
# 7z AES-256 (coder 06F10701)
# ---------------------------------------------------------------------------

def sevenzip_aes_props(props: bytes) -> tuple[int, bytes, bytes]:
    """Coder-properties → (numCyclesPower, salt, iv).

    Layout (7zAes.cpp SetDecoderProperties2): byte 0 carries the cycles
    power in bits 0..5 and one extra salt/iv length bit each in bits
    7/6; byte 1 (present iff either high bit is set) carries four more
    length bits per field in its high/low nibble."""
    if not props:
        raise ValueError("7z AES: empty properties")
    b0 = props[0]
    cycles = b0 & 0x3F
    salt_size = iv_size = 0
    pos = 1
    if b0 & 0xC0:
        if len(props) < 2:
            raise ValueError("7z AES: truncated properties")
        b1 = props[1]
        salt_size = ((b0 >> 7) & 1) + (b1 >> 4)
        iv_size = ((b0 >> 6) & 1) + (b1 & 0x0F)
        pos = 2
    if len(props) < pos + salt_size + iv_size:
        raise ValueError("7z AES: truncated salt/iv")
    salt = props[pos:pos + salt_size]
    iv = props[pos + salt_size:pos + salt_size + iv_size]
    return cycles, salt, iv


def sevenzip_aes_key(password: str, cycles: int, salt: bytes) -> bytes:
    """7z key derivation: 2^cycles chained SHA-256 updates of
    ``salt + UTF-16LE(password) + round counter`` (one running digest,
    not per-round re-hash); cycles == 0x3F means the raw
    ``salt+password`` IS the key (zero-padded)."""
    pw = password.encode("utf-16-le")
    if cycles == 0x3F:
        return (salt + pw + b"\x00" * 32)[:32]
    ctx = hashlib.sha256()
    for i in range(1 << cycles):
        ctx.update(salt)
        ctx.update(pw)
        ctx.update(struct.pack("<Q", i))
    return ctx.digest()


def aes_cbc_decrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("CBC data not block-aligned")
    iv = (iv + b"\x00" * 16)[:16]
    dk = expand_key_dec(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = data[off:off + 16]
        pt = aes_decrypt_block(dk, blk)
        out += bytes(a ^ b for a, b in zip(pt, prev))
        prev = blk
    return bytes(out)


def aes_cbc_encrypt(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Fixture-writer side (zero padding to the block, 7z convention:
    the folder's unpack size carries the true length)."""
    if len(data) % 16:
        data = data + b"\x00" * (16 - len(data) % 16)
    iv = (iv + b"\x00" * 16)[:16]
    rk = expand_key(key)
    out = bytearray()
    prev = iv
    for off in range(0, len(data), 16):
        blk = bytes(a ^ b for a, b in zip(data[off:off + 16], prev))
        ct = aes_encrypt_block(rk, blk)
        out += ct
        prev = ct
    return bytes(out)


# ---------------------------------------------------------------------------
# WinZip AES (AE-1/AE-2): method 99, extra field 0x9901
# ---------------------------------------------------------------------------

class ZipAesError(ValueError):
    """Typed WinZip-AES failure; .reason mirrors broken-reason strings."""

    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


_AES_KEYLEN = {1: 16, 2: 24, 3: 32}
_AES_SALTLEN = {1: 8, 2: 12, 3: 16}


def _aes_ctr(key: bytes, data: bytes) -> bytes:
    """WinZip-AES CTR: 16-byte little-endian counter starting at 1, no
    nonce (the per-entry salt already uniquifies the key)."""
    rk = expand_key(key)
    out = bytearray(len(data))
    for i in range(0, len(data), 16):
        ks = aes_encrypt_block(rk, struct.pack("<QQ", i // 16 + 1, 0))
        chunk = data[i:i + 16]
        out[i:i + len(chunk)] = bytes(
            a ^ b for a, b in zip(chunk, ks)
        )
    return bytes(out)


def _derive(password: str | bytes, salt: bytes,
            keylen: int) -> tuple[bytes, bytes, bytes]:
    if isinstance(password, str):
        password = password.encode("utf-8")
    dk = hashlib.pbkdf2_hmac("sha1", password, salt, 1000, 2 * keylen + 2)
    return dk[:keylen], dk[keylen:2 * keylen], dk[2 * keylen:]


def winzip_aes_decrypt_entry(raw: bytes, password: str | bytes,
                             strength: int) -> bytes:
    """Encrypted entry payload (salt ‖ verifier ‖ ciphertext ‖ auth) →
    the still-COMPRESSED data; the caller decompresses with the actual
    method from the 0x9901 extra field."""
    keylen = _AES_KEYLEN.get(strength)
    if keylen is None:
        raise ZipAesError("zip_aes_strength")
    saltlen = _AES_SALTLEN[strength]
    if len(raw) < saltlen + 2 + 10:
        raise ZipAesError("zip_aes_truncated")
    salt = raw[:saltlen]
    verifier = raw[saltlen:saltlen + 2]
    ct = raw[saltlen + 2:-10]
    auth = raw[-10:]
    enc_key, mac_key, check = _derive(password, salt, keylen)
    if check != verifier:
        raise ZipAesError("zip_bad_password")
    if hmac.new(mac_key, ct, hashlib.sha1).digest()[:10] != auth:
        raise ZipAesError("zip_aes_auth")
    return _aes_ctr(enc_key, ct)


def winzip_aes_encrypt_entry(compressed: bytes, password: str | bytes,
                             strength: int, salt: bytes) -> bytes:
    """Fixture-writer inverse of :func:`winzip_aes_decrypt_entry`
    (deterministic: the caller supplies the salt)."""
    keylen = _AES_KEYLEN[strength]
    if len(salt) != _AES_SALTLEN[strength]:
        raise ZipAesError("zip_aes_salt")
    enc_key, mac_key, check = _derive(password, salt, keylen)
    ct = _aes_ctr(enc_key, compressed)
    auth = hmac.new(mac_key, ct, hashlib.sha1).digest()[:10]
    return salt + check + ct + auth


def build_winzip_aes_zip(members: list[tuple[str, bytes]], password: str,
                         strength: int = 3) -> bytes:
    """Deterministic WinZip-AES zip fixture (method 99, 0x9901 extra,
    AE-2 so no plain CRC leaks): salt derived from the member bytes.
    Cross-validated by libarchive (``bsdtar --passphrase`` reads these)
    and by :func:`winzip_aes_decrypt_entry` via the zip unpacker."""
    import zlib

    out = bytearray()
    central = bytearray()
    offsets = []
    extra = struct.pack("<HHH2sBH", 0x9901, 7, 2, b"AE", strength, 8)
    for name, payload in members:
        comp_obj = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = comp_obj.compress(payload) + comp_obj.flush()
        salt = hashlib.blake2b(b"zipsalt" + payload,
                               digest_size=_AES_SALTLEN[strength]).digest()
        enc = winzip_aes_encrypt_entry(comp, password, strength, salt)
        nb = name.encode("utf-8")
        offsets.append(len(out))
        # AE-2: CRC field MUST be 0
        out += struct.pack("<IHHHHHIIIHH", 0x04034B50, 51, 1, 99, 0, 0x21,
                           0, len(enc), len(payload), len(nb), len(extra))
        out += nb + extra + enc
    for (name, payload), off in zip(members, offsets):
        nb = name.encode("utf-8")
        enc_len = None  # recomputed below from the local header
        comp_obj = zlib.compressobj(6, zlib.DEFLATED, -15)
        comp = comp_obj.compress(payload) + comp_obj.flush()
        enc_len = len(comp) + _AES_SALTLEN[strength] + 2 + 10
        central += struct.pack(
            "<IHHHHHHIIIHHHHHII", 0x02014B50, 51, 51, 1, 99, 0, 0x21,
            0, enc_len, len(payload), len(nb), len(extra), 0, 0, 0, 0, off)
        central += nb + extra
    cd_off = len(out)
    out += central
    out += struct.pack("<IHHHHIIH", 0x06054B50, 0, 0, len(members),
                       len(members), len(central), cd_off, 0)
    return bytes(out)
