"""Pure-Python OpenPGP (RFC 4880) decryption — closes the PGP gap.

The reference decrypts ``-----BEGIN PGP MESSAGE-----`` email parts by
shelling to ``gpg --decrypt`` against a per-collection keyring with the
passphrase removed (``analyzers/pgp.py:23-46``, used from
``analyzers/email.py:134-136``); imports happen via ``gpg --import``
(``pgp.py:49-62``).  A 1000-executor cluster cannot fork a gpg binary
per message, so this module implements the message formats gpg actually
emits, from the public spec, as a batch-friendly kernel:

- ASCII armor (RFC 4880 §6) with CRC-24, and binary messages;
- old- and new-format packet headers including partial body lengths
  (§4.2.2.4 — gpg streams literal/compressed packets this way);
- SKESK v4 (tag 3) with S2K simple/salted/iterated-salted (§3.7) over
  any hashlib digest, with and without an encrypted session key;
- PKESK v3 (tag 1) for RSA (algo 1/2): EME-PKCS1-v1_5 decode plus the
  OpenPGP session-key checksum, keys taken from a parsed transferable
  secret key (tags 5/7/6/14) — unprotected exports (s2k_usage 0,
  "passphrase removed", the reference's stated contract) and CFB-
  protected exports (usage 254/255) when a key passphrase is given;
- SEIPD v1 (tag 18) AES-CFB with the random-prefix quick check and
  SHA-1 MDC verification, and the legacy tag-9 packet with the
  OpenPGP CFB resynchronization (§13.9);
- nested compressed packets (none/zip/zlib/bzip2 — all stdlib) down
  to the literal packet.

AES-128/192/256 is implemented here (encrypt-only core: CFB needs only
the forward cipher) with T-tables *generated* from the GF(2^8) field
arithmetic at import — no transcribed constant blocks — and pinned to
the FIPS-197 Appendix C vectors in ``tests/test_pgp.py``.  Ciphers gpg
no longer defaults to (3DES/CAST5/Twofish/Camellia) are refused with a
typed reason rather than mis-decrypted.

A deterministic *writer* (``encrypt_symmetric`` / ``encrypt_rsa`` with
an injectable RNG) exists for fixtures and for the driver-certified
round-trip query: ``tests/test_pgp.py`` pins the decoder bit-exactly
against real ``gpg`` CLI output across a cipher × S2K × compression ×
armor matrix, and pins the writer by feeding its output back through
``gpg --decrypt``.

Every failure raises :class:`PgpError` with a typed ``reason`` so the
Arrow-batched email kernel maps it to a per-row broken reason instead
of failing a whole Spark task.
"""

from __future__ import annotations

import base64
import bz2
import hashlib
import os
import struct
import zlib
from typing import Callable, Iterator

__all__ = [
    "PgpError",
    "Keyring",
    "RsaKey",
    "is_encrypted",
    "decrypt",
    "load_keyring",
    "encrypt_symmetric",
    "encrypt_rsa",
    "armor_encode",
    "armor_decode",
    "set_default_keyring",
    "default_keyring",
    "aes_encrypt_block",
    "aes_decrypt_block",
    "expand_key",
    "expand_key_dec",
]


class PgpError(ValueError):
    """Malformed/unsupported OpenPGP input; ``reason`` is the typed tag."""

    def __init__(self, reason: str, detail: str = ""):
        super().__init__(f"{reason}: {detail}" if detail else reason)
        self.reason = reason


# ---------------------------------------------------------------------------
# AES (FIPS-197), encrypt-only.  Tables generated from the field, not
# transcribed: GF(2^8) exp/log with generator 3, S-box = affine(inverse).
# ---------------------------------------------------------------------------


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gen_tables():
    exp = [1] * 256
    log = [0] * 256
    for i in range(1, 255):
        p = exp[i - 1]
        exp[i] = _xtime(p) ^ p  # multiply by generator 0x03
        log[exp[i]] = i
    sbox = [0] * 256
    for a in range(256):
        inv = exp[255 - log[a]] if a else 0
        s = inv
        for _ in range(4):
            inv = ((inv << 1) | (inv >> 7)) & 0xFF
            s ^= inv
        sbox[a] = s ^ 0x63
    # sanity: FIPS-197 figure 7 spot values
    assert sbox[0x00] == 0x63 and sbox[0x01] == 0x7C and sbox[0x53] == 0xED
    t0 = [0] * 256
    for a in range(256):
        s = sbox[a]
        t0[a] = (_xtime(s) << 24) | (s << 16) | (s << 8) | (_xtime(s) ^ s)
    t1 = [((v >> 8) | (v << 24)) & 0xFFFFFFFF for v in t0]
    t2 = [((v >> 16) | (v << 16)) & 0xFFFFFFFF for v in t0]
    t3 = [((v >> 24) | (v << 8)) & 0xFFFFFFFF for v in t0]
    return sbox, t0, t1, t2, t3


_SBOX, _T0, _T1, _T2, _T3 = _gen_tables()


def expand_key(key: bytes) -> list[int]:
    """Key schedule → list of 4*(rounds+1) big-endian 32-bit words."""
    nk = len(key) // 4
    if nk not in (4, 6, 8):
        raise PgpError("pgp_malformed", f"bad AES key size {len(key)}")
    rounds = nk + 6
    w = list(struct.unpack(">%dI" % nk, key))
    rcon = 1
    for i in range(nk, 4 * (rounds + 1)):
        t = w[i - 1]
        if i % nk == 0:
            t = ((t << 8) | (t >> 24)) & 0xFFFFFFFF  # RotWord
            t = (
                (_SBOX[(t >> 24) & 255] << 24)
                | (_SBOX[(t >> 16) & 255] << 16)
                | (_SBOX[(t >> 8) & 255] << 8)
                | _SBOX[t & 255]
            )
            t ^= rcon << 24
            rcon = _xtime(rcon)
        elif nk == 8 and i % nk == 4:
            t = (
                (_SBOX[(t >> 24) & 255] << 24)
                | (_SBOX[(t >> 16) & 255] << 16)
                | (_SBOX[(t >> 8) & 255] << 8)
                | _SBOX[t & 255]
            )
        w.append(w[i - nk] ^ t)
    return w


def aes_encrypt_block(rk: list[int], block: bytes) -> bytes:
    """Encrypt one 16-byte block with an expanded key (T-table rounds)."""
    rounds = len(rk) // 4 - 1
    s0, s1, s2, s3 = struct.unpack(">4I", block)
    s0 ^= rk[0]
    s1 ^= rk[1]
    s2 ^= rk[2]
    s3 ^= rk[3]
    T0, T1, T2, T3 = _T0, _T1, _T2, _T3
    k = 4
    for _ in range(rounds - 1):
        t0 = T0[s0 >> 24] ^ T1[(s1 >> 16) & 255] ^ T2[(s2 >> 8) & 255] ^ T3[s3 & 255] ^ rk[k]
        t1 = T0[s1 >> 24] ^ T1[(s2 >> 16) & 255] ^ T2[(s3 >> 8) & 255] ^ T3[s0 & 255] ^ rk[k + 1]
        t2 = T0[s2 >> 24] ^ T1[(s3 >> 16) & 255] ^ T2[(s0 >> 8) & 255] ^ T3[s1 & 255] ^ rk[k + 2]
        t3 = T0[s3 >> 24] ^ T1[(s0 >> 16) & 255] ^ T2[(s1 >> 8) & 255] ^ T3[s2 & 255] ^ rk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    S = _SBOX
    out = bytearray(16)
    for i, (a, b, c, d) in enumerate(
        ((s0, s1, s2, s3), (s1, s2, s3, s0), (s2, s3, s0, s1), (s3, s0, s1, s2))
    ):
        w = rk[k + i]
        out[4 * i] = S[a >> 24] ^ (w >> 24) & 255
        out[4 * i + 1] = S[(b >> 16) & 255] ^ (w >> 16) & 255
        out[4 * i + 2] = S[(c >> 8) & 255] ^ (w >> 8) & 255
        out[4 * i + 3] = S[d & 255] ^ w & 255
    return bytes(out)


def _gen_inv_tables():
    """Equivalent-inverse-cipher tables (FIPS-197 §5.3.5), generated from
    the forward S-box and GF(2^8) arithmetic like the forward tables —
    no transcribed constant blocks.  Needed by the CBC consumers (7z AES
    folders); OpenPGP's CFB mode only ever runs the forward cipher."""
    inv_sbox = [0] * 256
    for a, s in enumerate(_SBOX):
        inv_sbox[s] = a

    def gmul(a):
        m2 = _xtime(a)
        m4 = _xtime(m2)
        m8 = _xtime(m4)
        return m8 ^ m4 ^ m2, m8 ^ a, m8 ^ m4 ^ a, m8 ^ m2 ^ a  # 14,9,13,11

    td0 = [0] * 256
    u0 = [0] * 256
    for a in range(256):
        e, n9, d, b = gmul(inv_sbox[a])
        td0[a] = (e << 24) | (n9 << 16) | (d << 8) | b
        e, n9, d, b = gmul(a)
        u0[a] = (e << 24) | (n9 << 16) | (d << 8) | b
    rot = lambda t, n: [((v >> n) | (v << (32 - n))) & 0xFFFFFFFF for v in t]
    return (inv_sbox, td0, rot(td0, 8), rot(td0, 16), rot(td0, 24),
            u0, rot(u0, 8), rot(u0, 16), rot(u0, 24))


(_INV_SBOX, _TD0, _TD1, _TD2, _TD3,
 _U0, _U1, _U2, _U3) = _gen_inv_tables()


def expand_key_dec(key: bytes) -> list[int]:
    """Decryption key schedule for the equivalent inverse cipher: the
    forward schedule reversed per-round, with InvMixColumns applied to
    the middle-round words."""
    ek = expand_key(key)
    rounds = len(ek) // 4 - 1
    dk = []
    for r in range(rounds + 1):
        words = ek[4 * (rounds - r):4 * (rounds - r) + 4]
        if 0 < r < rounds:
            words = [
                _U0[(w >> 24) & 255] ^ _U1[(w >> 16) & 255]
                ^ _U2[(w >> 8) & 255] ^ _U3[w & 255]
                for w in words
            ]
        dk.extend(words)
    return dk


def aes_decrypt_block(dk: list[int], block: bytes) -> bytes:
    """Decrypt one 16-byte block with an expand_key_dec schedule."""
    rounds = len(dk) // 4 - 1
    s0, s1, s2, s3 = struct.unpack(">4I", block)
    s0 ^= dk[0]
    s1 ^= dk[1]
    s2 ^= dk[2]
    s3 ^= dk[3]
    T0, T1, T2, T3 = _TD0, _TD1, _TD2, _TD3
    k = 4
    for _ in range(rounds - 1):
        t0 = T0[s0 >> 24] ^ T1[(s3 >> 16) & 255] ^ T2[(s2 >> 8) & 255] ^ T3[s1 & 255] ^ dk[k]
        t1 = T0[s1 >> 24] ^ T1[(s0 >> 16) & 255] ^ T2[(s3 >> 8) & 255] ^ T3[s2 & 255] ^ dk[k + 1]
        t2 = T0[s2 >> 24] ^ T1[(s1 >> 16) & 255] ^ T2[(s0 >> 8) & 255] ^ T3[s3 & 255] ^ dk[k + 2]
        t3 = T0[s3 >> 24] ^ T1[(s2 >> 16) & 255] ^ T2[(s1 >> 8) & 255] ^ T3[s0 & 255] ^ dk[k + 3]
        s0, s1, s2, s3 = t0, t1, t2, t3
        k += 4
    S = _INV_SBOX
    out = bytearray(16)
    for i, (a, b, c, d) in enumerate(
        ((s0, s3, s2, s1), (s1, s0, s3, s2), (s2, s1, s0, s3), (s3, s2, s1, s0))
    ):
        w = dk[k + i]
        out[4 * i] = S[a >> 24] ^ (w >> 24) & 255
        out[4 * i + 1] = S[(b >> 16) & 255] ^ (w >> 16) & 255
        out[4 * i + 2] = S[(c >> 8) & 255] ^ (w >> 8) & 255
        out[4 * i + 3] = S[d & 255] ^ w & 255
    return bytes(out)


_BS = 16  # AES block size; all supported ciphers are AES variants

#: symmetric algo id → key length (RFC 4880 §9.2); AES family only
_CIPHER_KEYLEN = {7: 16, 8: 24, 9: 32}
_CIPHER_NAMES = {2: "3DES", 3: "CAST5", 4: "Blowfish", 10: "Twofish",
                 11: "Camellia128", 12: "Camellia192", 13: "Camellia256"}

#: hash algo id → hashlib name (§9.4)
_HASHES = {1: "md5", 2: "sha1", 3: "ripemd160", 8: "sha256", 9: "sha384",
           10: "sha512", 11: "sha224"}


def _cipher_rk(algo: int, key: bytes) -> list[int]:
    if algo not in _CIPHER_KEYLEN:
        raise PgpError(
            "pgp_cipher_unsupported",
            _CIPHER_NAMES.get(algo, f"algo {algo}"),
        )
    if len(key) != _CIPHER_KEYLEN[algo]:
        raise PgpError("pgp_malformed", "session key length mismatch")
    return expand_key(key)


def _cfb_decrypt(rk: list[int], iv: bytes, data: bytes) -> bytes:
    """Standard CFB-128 (full-block feedback), given IV."""
    out = bytearray(len(data))
    fr = iv
    for i in range(0, len(data), _BS):
        fre = aes_encrypt_block(rk, fr)
        chunk = data[i:i + _BS]
        for j, c in enumerate(chunk):
            out[i + j] = c ^ fre[j]
        fr = chunk if len(chunk) == _BS else fr
    return bytes(out)


def _cfb_encrypt(rk: list[int], iv: bytes, data: bytes) -> bytes:
    out = bytearray(len(data))
    fr = iv
    for i in range(0, len(data), _BS):
        fre = aes_encrypt_block(rk, fr)
        chunk = data[i:i + _BS]
        for j, p in enumerate(chunk):
            out[i + j] = p ^ fre[j]
        fr = bytes(out[i:i + _BS]) if len(chunk) == _BS else fr
    return bytes(out)


# ---------------------------------------------------------------------------
# S2K (§3.7)
# ---------------------------------------------------------------------------


def _s2k_key(s2k: dict, passphrase: bytes, keylen: int) -> bytes:
    try:
        hname = _HASHES[s2k["hash"]]
        hashlib.new(hname)
    except (KeyError, ValueError):
        raise PgpError("pgp_malformed", f"s2k hash {s2k.get('hash')}")
    out = b""
    instance = 0
    while len(out) < keylen:
        h = hashlib.new(hname)
        h.update(b"\x00" * instance)
        if s2k["type"] == 0:
            h.update(passphrase)
        elif s2k["type"] == 1:
            h.update(s2k["salt"] + passphrase)
        elif s2k["type"] == 3:
            block = s2k["salt"] + passphrase
            count = max(s2k["count"], len(block))
            full, rem = divmod(count, len(block)) if block else (0, 0)
            h.update(block * full + block[:rem])
        else:
            raise PgpError("pgp_malformed", f"s2k type {s2k['type']}")
        out += h.digest()
        instance += 1
    return out[:keylen]


def _parse_s2k(body: bytes, pos: int) -> tuple[dict, int]:
    t = body[pos]
    s2k: dict = {"type": t, "hash": body[pos + 1]}
    pos += 2
    if t in (1, 3):
        s2k["salt"] = body[pos:pos + 8]
        pos += 8
    if t == 3:
        c = body[pos]
        pos += 1
        s2k["count"] = (16 + (c & 15)) << ((c >> 4) + 6)
        s2k["count_byte"] = c
    return s2k, pos


# ---------------------------------------------------------------------------
# Packet framing (§4.2) — old + new formats, partial body lengths
# ---------------------------------------------------------------------------


def iter_packets(data: bytes) -> Iterator[tuple[int, bytes]]:
    """Yield (tag, body) pairs; partial-length bodies are assembled."""
    pos = 0
    n = len(data)
    while pos < n:
        hdr = data[pos]
        if not hdr & 0x80:
            raise PgpError("pgp_malformed", f"bad packet header 0x{hdr:02x}")
        pos += 1
        if hdr & 0x40:  # new format
            tag = hdr & 0x3F
            chunks = []
            while True:
                if pos >= n:
                    raise PgpError("pgp_malformed", "truncated length")
                o = data[pos]
                pos += 1
                if o < 192:
                    length, partial = o, False
                elif o < 224:
                    length = ((o - 192) << 8) + data[pos] + 192
                    pos += 1
                    partial = False
                elif o == 255:
                    length = struct.unpack(">I", data[pos:pos + 4])[0]
                    pos += 4
                    partial = False
                else:
                    length, partial = 1 << (o & 0x1F), True
                if pos + length > n:
                    raise PgpError("pgp_malformed", "truncated packet body")
                chunks.append(data[pos:pos + length])
                pos += length
                if not partial:
                    break
            yield tag, b"".join(chunks)
        else:  # old format
            tag = (hdr >> 2) & 0x0F
            lt = hdr & 0x03
            if lt == 0:
                length = data[pos]
                pos += 1
            elif lt == 1:
                length = struct.unpack(">H", data[pos:pos + 2])[0]
                pos += 2
            elif lt == 2:
                length = struct.unpack(">I", data[pos:pos + 4])[0]
                pos += 4
            else:  # indeterminate: to end of input
                length = n - pos
            if pos + length > n:
                raise PgpError("pgp_malformed", "truncated packet body")
            yield tag, data[pos:pos + length]
            pos += length


def _new_header(tag: int, length: int) -> bytes:
    first = bytes([0xC0 | tag])
    if length < 192:
        return first + bytes([length])
    if length < 8384:
        length -= 192
        return first + bytes([(length >> 8) + 192, length & 0xFF])
    return first + b"\xff" + struct.pack(">I", length)


def _read_mpi(body: bytes, pos: int) -> tuple[int, int]:
    bits = struct.unpack(">H", body[pos:pos + 2])[0]
    nbytes = (bits + 7) // 8
    pos += 2
    if pos + nbytes > len(body):
        raise PgpError("pgp_malformed", "truncated MPI")
    return int.from_bytes(body[pos:pos + nbytes], "big"), pos + nbytes


def _write_mpi(v: int) -> bytes:
    if v == 0:
        return b"\x00\x00"
    nbytes = (v.bit_length() + 7) // 8
    return struct.pack(">H", v.bit_length()) + v.to_bytes(nbytes, "big")


# ---------------------------------------------------------------------------
# ASCII armor (§6)
# ---------------------------------------------------------------------------

_CRC24_INIT = 0xB704CE
_CRC24_POLY = 0x1864CFB


def _crc24(data: bytes) -> int:
    crc = _CRC24_INIT
    for b in data:
        crc ^= b << 16
        for _ in range(8):
            crc <<= 1
            if crc & 0x1000000:
                crc ^= _CRC24_POLY
    return crc & 0xFFFFFF


def armor_decode(data: bytes) -> bytes:
    """Armored block → binary payload (CRC-24 verified when present)."""
    text = data.decode("latin-1")
    lines = text.splitlines()
    try:
        start = next(i for i, ln in enumerate(lines)
                     if ln.strip().startswith("-----BEGIN PGP"))
    except StopIteration:
        raise PgpError("pgp_malformed", "no armor header")
    i = start + 1
    while i < len(lines) and lines[i].strip():  # armor headers
        if ":" not in lines[i]:
            break
        i += 1
    b64: list[str] = []
    crc = None
    for ln in lines[i:]:
        s = ln.strip()
        if not s:
            continue
        if s.startswith("-----END PGP"):
            break
        if s.startswith("="):
            crc = s[1:5]
            continue
        b64.append(s)
    try:
        raw = base64.b64decode("".join(b64), validate=True)
    except Exception as exc:
        raise PgpError("pgp_malformed", f"armor base64: {exc}")
    if crc is not None:
        want = int.from_bytes(base64.b64decode(crc + "="), "big") \
            if len(crc) == 4 else None
        if want is not None and _crc24(raw) != want:
            raise PgpError("pgp_armor_crc", "armor CRC-24 mismatch")
    return raw


def armor_encode(raw: bytes, kind: str = "MESSAGE") -> bytes:
    b64 = base64.b64encode(raw).decode()
    body = "\n".join(b64[i:i + 64] for i in range(0, len(b64), 64))
    crc = base64.b64encode(_crc24(raw).to_bytes(3, "big")).decode()
    return (
        f"-----BEGIN PGP {kind}-----\n\n{body}\n={crc}\n"
        f"-----END PGP {kind}-----\n"
    ).encode()


def _maybe_dearmor(data: bytes) -> bytes:
    if b"-----BEGIN PGP" in data[:4096] or b"-----BEGIN PGP" in data:
        return armor_decode(data)
    return data


# ---------------------------------------------------------------------------
# Keys (tags 5/6/7/14)
# ---------------------------------------------------------------------------


class RsaKey:
    """One (sub)key: public (n, e) always; d present for secret keys."""

    __slots__ = ("n", "e", "d", "p", "q", "key_id", "fingerprint", "is_sub",
                 "algo")

    def __init__(self, n, e, d=None, p=None, q=None, key_id=b"",
                 fingerprint=b"", is_sub=False, algo=1):
        self.n, self.e, self.d, self.p, self.q = n, e, d, p, q
        self.key_id, self.fingerprint, self.is_sub = key_id, fingerprint, is_sub
        self.algo = algo

    def decrypt_int(self, c: int) -> int:
        if self.d is None:
            raise PgpError("pgp_no_key", "public key only")
        if self.p and self.q:
            # CRT (OpenPGP stores p < q and u = p^-1 mod q)
            dp = self.d % (self.p - 1)
            dq = self.d % (self.q - 1)
            qinv = pow(self.q, -1, self.p)
            mp = pow(c % self.p, dp, self.p)
            mq = pow(c % self.q, dq, self.q)
            h = (qinv * (mp - mq)) % self.p
            return mq + h * self.q
        return pow(c, self.d, self.n)


class Keyring:
    def __init__(self, keys: list[RsaKey] | None = None,
                 passphrase: bytes | str | None = None):
        self.keys = keys or []
        if isinstance(passphrase, str):
            passphrase = passphrase.encode()
        self.passphrase = passphrase

    def find(self, key_id: bytes) -> list[RsaKey]:
        if key_id == b"\x00" * 8:  # hidden recipient: try everything
            return [k for k in self.keys if k.d is not None]
        return [k for k in self.keys
                if k.key_id == key_id and k.d is not None]


def _pubkey_fields(body: bytes) -> tuple[dict | None, int]:
    """Parse the public portion of a tag 5/6/7/14 body.

    Returns (info, end_of_public) — info is None for non-RSA algos
    (the key is skipped, not an error: modern gpg primaries are often
    EdDSA with an RSA encryption subkey)."""
    if body[0] != 4:
        raise PgpError("pgp_version_unsupported", f"key version {body[0]}")
    algo = body[5]
    pos = 6
    if algo not in (1, 2, 3):
        return None, -1
    n, pos = _read_mpi(body, pos)
    e, pos = _read_mpi(body, pos)
    return {"algo": algo, "n": n, "e": e}, pos


def _fingerprint(public_body: bytes) -> bytes:
    h = hashlib.sha1()
    h.update(b"\x99" + struct.pack(">H", len(public_body)) + public_body)
    return h.digest()


def _secret_mpis(body: bytes, pub_end: int, passphrase: bytes | None):
    """Decode the secret portion of a tag 5/7 body (after the public part)."""
    usage = body[pub_end]
    pos = pub_end + 1
    if usage == 0:
        secret = body[pos:-2]
        if (sum(secret) & 0xFFFF) != struct.unpack(">H", body[-2:])[0]:
            raise PgpError("pgp_malformed", "secret key checksum")
    elif usage in (254, 255):
        if passphrase is None:
            raise PgpError("pgp_key_protected", "secret key needs passphrase")
        calgo = body[pos]
        pos += 1
        s2k, pos = _parse_s2k(body, pos)
        iv = body[pos:pos + _BS]
        pos += _BS
        key = _s2k_key(s2k, passphrase, _CIPHER_KEYLEN.get(calgo, 0) or 16)
        rk = _cipher_rk(calgo, key)
        plain = _cfb_decrypt(rk, iv, body[pos:])
        if usage == 254:
            secret, ck = plain[:-20], plain[-20:]
            if hashlib.sha1(secret).digest() != ck:
                raise PgpError("pgp_no_key", "wrong key passphrase")
        else:
            secret, ck = plain[:-2], plain[-2:]
            if (sum(secret) & 0xFFFF) != struct.unpack(">H", ck)[0]:
                raise PgpError("pgp_no_key", "wrong key passphrase")
    else:
        # gnu-dummy / AEAD-protected exports
        raise PgpError("pgp_key_protected", f"s2k usage {usage}")
    d, spos = _read_mpi(secret, 0)
    p, spos = _read_mpi(secret, spos)
    q, spos = _read_mpi(secret, spos)
    return d, p, q


def load_keyring(data: bytes, passphrase: bytes | str | None = None) -> Keyring:
    """Parse a transferable (secret or public) key blob, armored or not.

    The reference imports keys "with passphrase removed" (pgp.py:49-57);
    ``passphrase`` additionally unlocks CFB-protected exports."""
    if isinstance(passphrase, str):
        passphrase = passphrase.encode()
    data = _maybe_dearmor(data)
    keys: list[RsaKey] = []
    for tag, body in iter_packets(data):
        if tag not in (5, 6, 7, 14):
            continue
        info, pub_end = _pubkey_fields(body)
        if info is None:
            continue
        fp = _fingerprint(body[:pub_end] if tag in (5, 7) else body)
        key = RsaKey(info["n"], info["e"], key_id=fp[-8:], fingerprint=fp,
                     is_sub=tag in (7, 14), algo=info["algo"])
        if tag in (5, 7):
            key.d, key.p, key.q = _secret_mpis(body, pub_end, passphrase)
        keys.append(key)
    return Keyring(keys, passphrase)


# ---------------------------------------------------------------------------
# Message decryption
# ---------------------------------------------------------------------------


def is_encrypted(data: bytes) -> bool:
    """Reference parity: armored detection only (pgp.py:13-20)."""
    return b"-----BEGIN PGP MESSAGE-----" in data


def _session_from_skesk(body: bytes, passphrase: bytes) -> tuple[int, bytes]:
    if body[0] != 4:
        raise PgpError("pgp_version_unsupported", f"SKESK v{body[0]}")
    calgo = body[1]
    s2k, pos = _parse_s2k(body, 2)
    key = _s2k_key(s2k, passphrase, _CIPHER_KEYLEN.get(calgo, 0) or 16)
    esk = body[pos:]
    if not esk:
        return calgo, key
    rk = _cipher_rk(calgo, key)
    plain = _cfb_decrypt(rk, b"\x00" * _BS, esk)
    inner_algo = plain[0]
    if inner_algo not in _CIPHER_KEYLEN:
        raise PgpError("pgp_cipher_unsupported",
                       _CIPHER_NAMES.get(inner_algo, f"algo {inner_algo}"))
    return inner_algo, plain[1:1 + _CIPHER_KEYLEN[inner_algo]]


def _session_from_pkesk(body: bytes, keyring: Keyring) -> tuple[int, bytes]:
    if body[0] != 3:
        raise PgpError("pgp_version_unsupported", f"PKESK v{body[0]}")
    key_id = body[1:9]
    algo = body[9]
    if algo not in (1, 2):
        raise PgpError("pgp_pubkey_unsupported", f"pubkey algo {algo}")
    c, _ = _read_mpi(body, 10)
    last: PgpError | None = None
    for key in keyring.find(key_id):
        m = key.decrypt_int(c)
        em = m.to_bytes((key.n.bit_length() + 7) // 8 - 1, "big")
        # EME-PKCS1-v1_5: 0x02 || PS || 0x00 || M (leading 0x00 eaten
        # by the integer conversion)
        if em[0] != 0x02:
            last = PgpError("pgp_no_key", "PKCS#1 padding")
            continue
        sep = em.find(b"\x00", 1)
        if sep < 9:
            last = PgpError("pgp_no_key", "PKCS#1 padding")
            continue
        msg = em[sep + 1:]
        calgo, sk, ck = msg[0], msg[1:-2], msg[-2:]
        if (sum(sk) & 0xFFFF) != struct.unpack(">H", ck)[0]:
            last = PgpError("pgp_no_key", "session key checksum")
            continue
        if calgo not in _CIPHER_KEYLEN:
            raise PgpError("pgp_cipher_unsupported",
                           _CIPHER_NAMES.get(calgo, f"algo {calgo}"))
        return calgo, sk
    raise last or PgpError("pgp_no_key", "no matching secret key")


def _decrypt_seipd(calgo: int, key: bytes, body: bytes) -> bytes:
    if body[0] != 1:
        raise PgpError("pgp_version_unsupported", f"SEIPD v{body[0]}")
    rk = _cipher_rk(calgo, key)
    plain = _cfb_decrypt(rk, b"\x00" * _BS, body[1:])
    if len(plain) < _BS + 2 + 22:
        raise PgpError("pgp_malformed", "SEIPD too short")
    if plain[_BS - 2:_BS] != plain[_BS:_BS + 2]:
        raise PgpError("pgp_no_key", "session key quick check")
    if plain[-22:-20] != b"\xd3\x14":
        raise PgpError("pgp_mdc_mismatch", "missing MDC trailer")
    if hashlib.sha1(plain[:-20]).digest() != plain[-20:]:
        raise PgpError("pgp_mdc_mismatch", "MDC SHA-1 mismatch")
    return plain[_BS + 2:-22]


def _decrypt_tag9(calgo: int, key: bytes, body: bytes) -> bytes:
    """Legacy symmetrically-encrypted packet with CFB resync (§13.9)."""
    rk = _cipher_rk(calgo, key)
    if len(body) < _BS + 2:
        raise PgpError("pgp_malformed", "tag 9 too short")
    prefix = _cfb_decrypt(rk, b"\x00" * _BS, body[:_BS + 2])
    if prefix[_BS - 2:_BS] != prefix[_BS:_BS + 2]:
        raise PgpError("pgp_no_key", "session key quick check")
    # resynchronize: IV for the data = ciphertext bytes [2, BS+2)
    return _cfb_decrypt(rk, body[2:_BS + 2], body[_BS + 2:])


def _find_literal(data: bytes) -> dict:
    """Walk decrypted packets (skipping signatures/markers) to the literal."""
    for tag, body in iter_packets(data):
        if tag == 11:
            fmt = chr(body[0])
            fn_len = body[1]
            filename = body[2:2 + fn_len]
            mtime = struct.unpack(">I", body[2 + fn_len:6 + fn_len])[0]
            return {"format": fmt, "filename": filename, "mtime": mtime,
                    "data": body[6 + fn_len:]}
        if tag == 8:
            algo = body[0]
            if algo == 0:
                inner = body[1:]
            elif algo == 1:
                inner = zlib.decompress(body[1:], wbits=-15)
            elif algo == 2:
                inner = zlib.decompress(body[1:])
            elif algo == 3:
                inner = bz2.decompress(body[1:])
            else:
                raise PgpError("pgp_compression_unsupported", f"algo {algo}")
            return _find_literal(inner)
        # tags 4 (one-pass sig), 2 (signature), 10 (marker): skip
    raise PgpError("pgp_malformed", "no literal packet in message")


def decrypt(data: bytes, keyring: Keyring | None = None,
            passphrase: bytes | str | None = None) -> dict:
    """``gpg --decrypt`` analog (reference pgp.py:23-46).

    Returns ``{"data", "filename", "mtime", "format", "cipher"}``.
    ``passphrase`` (or ``keyring.passphrase``) unlocks SKESK messages;
    ``keyring`` secret keys unlock PKESK messages.  MDC is enforced for
    SEIPD packets — tampering raises ``pgp_mdc_mismatch``."""
    if isinstance(passphrase, str):
        passphrase = passphrase.encode()
    if passphrase is None and keyring is not None:
        passphrase = keyring.passphrase
    raw = _maybe_dearmor(data)
    skesks: list[bytes] = []
    pkesks: list[bytes] = []
    last: PgpError | None = None
    for tag, body in iter_packets(raw):
        if tag == 3:
            skesks.append(body)
        elif tag == 1:
            pkesks.append(body)
        elif tag in (18, 9):
            candidates: list[tuple[int, bytes]] = []
            for pk in pkesks:
                if keyring is None:
                    last = PgpError("pgp_no_key", "no keyring configured")
                    continue
                try:
                    candidates.append(_session_from_pkesk(pk, keyring))
                except PgpError as exc:
                    last = exc
            for sk in skesks:
                if passphrase is None:
                    last = PgpError("pgp_no_key", "no passphrase")
                    continue
                try:
                    candidates.append(_session_from_skesk(sk, passphrase))
                except PgpError as exc:
                    last = exc
            if not skesks and not pkesks:
                last = PgpError("pgp_malformed", "no ESK packet")
            for calgo, key in candidates:
                try:
                    plain = (_decrypt_seipd if tag == 18 else _decrypt_tag9)(
                        calgo, key, body)
                except PgpError as exc:
                    if exc.reason == "pgp_mdc_mismatch":
                        raise
                    last = exc
                    continue
                out = _find_literal(plain)
                out["cipher"] = calgo
                return out
            raise last or PgpError("pgp_no_key", "no usable session key")
    raise last or PgpError("pgp_malformed", "no encrypted data packet")


# ---------------------------------------------------------------------------
# Writers (fixtures + driver certification; deterministic via rng arg)
# ---------------------------------------------------------------------------


def _literal_packet(data: bytes, filename: bytes, mtime: int) -> bytes:
    body = b"b" + bytes([len(filename)]) + filename + struct.pack(">I", mtime) + data
    return _new_header(11, len(body)) + body


def _compress_packet(inner: bytes, algo: int) -> bytes:
    if algo == 1:
        comp = zlib.compressobj(6, zlib.DEFLATED, -15)
        payload = comp.compress(inner) + comp.flush()
    elif algo == 2:
        payload = zlib.compress(inner)
    elif algo == 3:
        payload = bz2.compress(inner)
    else:
        raise PgpError("pgp_compression_unsupported", f"algo {algo}")
    body = bytes([algo]) + payload
    return _new_header(8, len(body)) + body


def _seipd_packet(calgo: int, key: bytes, inner: bytes,
                  rng: Callable[[int], bytes]) -> bytes:
    rk = _cipher_rk(calgo, key)
    pre = rng(_BS)
    prefix = pre + pre[-2:]
    payload = prefix + inner + b"\xd3\x14"
    payload += hashlib.sha1(payload).digest()
    body = b"\x01" + _cfb_encrypt(rk, b"\x00" * _BS, payload)
    return _new_header(18, len(body)) + body


def encrypt_symmetric(data: bytes, passphrase: bytes | str, *,
                      cipher: int = 9, compress: int = 0,
                      armored: bool = False, filename: bytes = b"",
                      mtime: int = 0, s2k_hash: int = 8,
                      s2k_count_byte: int = 0x60,
                      rng: Callable[[int], bytes] = os.urandom) -> bytes:
    """SKESK(v4, iterated-salted S2K) + SEIPD(v1, MDC) message."""
    if isinstance(passphrase, str):
        passphrase = passphrase.encode()
    salt = rng(8)
    count = (16 + (s2k_count_byte & 15)) << ((s2k_count_byte >> 4) + 6)
    s2k = {"type": 3, "hash": s2k_hash, "salt": salt, "count": count}
    key = _s2k_key(s2k, passphrase, _CIPHER_KEYLEN[cipher])
    skesk_body = bytes([4, cipher, 3, s2k_hash]) + salt + bytes([s2k_count_byte])
    inner = _literal_packet(data, filename, mtime)
    if compress:
        inner = _compress_packet(inner, compress)
    msg = _new_header(3, len(skesk_body)) + skesk_body
    msg += _seipd_packet(cipher, key, inner, rng)
    return armor_encode(msg) if armored else msg


def encrypt_rsa(data: bytes, key: RsaKey, *, cipher: int = 9,
                compress: int = 0, armored: bool = False,
                filename: bytes = b"", mtime: int = 0,
                rng: Callable[[int], bytes] = os.urandom) -> bytes:
    """PKESK(v3, RSA EME-PKCS1-v1_5) + SEIPD(v1, MDC) message."""
    sk = rng(_CIPHER_KEYLEN[cipher])
    ck = struct.pack(">H", sum(sk) & 0xFFFF)
    m = bytes([cipher]) + sk + ck
    k = (key.n.bit_length() + 7) // 8
    ps_len = k - 3 - len(m)
    if ps_len < 8:
        raise PgpError("pgp_malformed", "RSA modulus too small")
    ps = bytes((b % 255) + 1 for b in rng(ps_len))  # nonzero padding
    em = b"\x00\x02" + ps + b"\x00" + m
    c = pow(int.from_bytes(em, "big"), key.e, key.n)
    pkesk_body = b"\x03" + key.key_id + bytes([key.algo]) + _write_mpi(c)
    inner = _literal_packet(data, filename, mtime)
    if compress:
        inner = _compress_packet(inner, compress)
    msg = _new_header(1, len(pkesk_body)) + pkesk_body
    msg += _seipd_packet(cipher, sk, inner, rng)
    return armor_encode(msg) if armored else msg


# ---------------------------------------------------------------------------
# Worker-local default keyring (the Spark analog of the reference's
# per-collection gpghome, collections.py mount_gpghome): the pipeline
# closure carries raw key bytes + passphrase; each Python worker parses
# them once, lazily.
# ---------------------------------------------------------------------------

_DEFAULT: dict = {"raw": None, "passphrase": None, "keyring": None}


def set_default_keyring(keydata: bytes | None,
                        passphrase: bytes | str | None = None) -> None:
    if isinstance(passphrase, str):
        passphrase = passphrase.encode()
    if (_DEFAULT["raw"] == keydata
            and _DEFAULT["passphrase"] == passphrase):
        return
    _DEFAULT.update(raw=keydata, passphrase=passphrase, keyring=None)


def default_keyring() -> Keyring | None:
    """Parsed view of the configured key material (None if unconfigured)."""
    if _DEFAULT["raw"] is None and _DEFAULT["passphrase"] is None:
        return None
    if _DEFAULT["keyring"] is None:
        if _DEFAULT["raw"] is not None:
            kr = load_keyring(_DEFAULT["raw"], _DEFAULT["passphrase"])
        else:
            kr = Keyring([], _DEFAULT["passphrase"])
        _DEFAULT["keyring"] = kr
    return _DEFAULT["keyring"]
