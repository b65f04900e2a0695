"""RAR archive reading — a pure-Python container parser for the public
RAR 4.x and RAR 5.0 block formats (the technote shipped with unrar and
the rarfile project's format documentation).

The reference shells RARs to ``7z x`` (archives.py:173-203).  This
module decodes what has a public, deterministic definition:

- the container structure of both generations (RAR4 7-byte signature,
  CRC'd block chain; RAR5 8-byte signature, vint-framed blocks);
- STORED members (RAR4 method 0x30 / RAR5 compression method 0) extract
  byte-exactly;
- RAR5 COMPRESSED members (methods 1-5 all share one LZ+Huffman
  scheme — RAR5 dropped PPMd) decode natively via
  ``functions/rar5_codec.py``, with the FILE header's unpacked-data
  CRC32 verified so a wrong decode surfaces as ``rar_crc_mismatch``,
  never as silently-wrong text; solid members (window carry-over from
  the previous member) → ``rar_solid_unsupported``; RAR7 "v1"
  algorithm variants → ``rar_method_unsupported``;
- RAR4 compressed members (methods 0x31-0x35, unp_ver 29) decode
  natively via ``functions/rar29_codec.py`` — the LZSS half of RAR29;
  PPMd blocks → ``rar_ppmd_unsupported`` and RarVM filter programs →
  ``rar_filter_unsupported`` (both typed, both CRC-backstopped);
  RAR 1.5/2.0 schemes → ``rar_method_unsupported``;
- RAR5 ENCRYPTED members decrypt with the worker-local archive
  password: the extra-record 0x01 AES-256-CBC scheme with the
  continued-PBKDF2 key schedule (base key at 2^count HMAC-SHA256
  iterations, checksum-MAC key at +16, folded password check at +16
  more) — wrong password → ``rar_bad_password``, no password →
  ``rar_encrypted``, and the MAC'd checksum still gates the decode;
  encrypted HEADERS (the block-level ENCRYPTION record, the ``-hp``
  layout) decrypt too: every subsequent block is a 16-byte IV +
  AES-256-CBC ciphertext under the same KDF, walked transparently;
- RAR4 (RAR 2.9+ salted) ENCRYPTED members decrypt too: the RAR3
  AES-128 scheme — one continued SHA-1 over 2^18 rounds of
  UTF-16LE-password+salt+counter, IV bytes tapped from the running
  digest every 2^14 rounds, word-swapped final digest as the key.
  RAR3 crypto has NO password-check value, so a wrong key is caught by
  the CRC (stored) or the decoder's structure checks (compressed), both
  reported ``rar_bad_password``; saltless pre-2.9 crypto stays
  ``rar_encrypted``.

A deterministic fixture writer (both generations, correct header CRCs,
really-compressed RAR5 members) backs the tests and the golden corpus.
"""

from __future__ import annotations

import struct
import zlib

RAR_MIME = "application/x-rar"

_SIG4 = b"Rar!\x1a\x07\x00"
_SIG5 = b"Rar!\x1a\x07\x01\x00"

# RAR4 block types
_R4_MAIN = 0x73
_R4_FILE = 0x74
_R4_END = 0x7B

_R4_FLAG_ADD_SIZE = 0x8000
_R4_FLAG_PASSWORD = 0x0004      # file block: encrypted payload
_R4_MAIN_FLAG_ENC = 0x0080      # main block: encrypted block headers
_R4_FLAG_LARGE = 0x0100
_R4_FLAG_UNICODE = 0x0200
_R4_FLAG_SALT = 0x0400          # 8-byte salt after the name (RAR 2.9+)
_R4_METHOD_STORE = 0x30


from functools import lru_cache


@lru_cache(maxsize=256)
def _rar3_keys(password: str, salt: bytes) -> tuple[bytes, bytes]:
    """RAR 2.9/3.x AES-128 KDF: ONE continued SHA-1 over 2^18 rounds of
    (UTF-16LE password + salt + 3-byte LE round counter); every 2^14
    rounds the last byte of the running (non-finalized) digest becomes
    the next IV byte; the key is the final running digest's first 16
    bytes with each 32-bit word byte-swapped.  hashlib's ``copy()``
    gives the mid-stream digests without a from-scratch SHA-1."""
    import hashlib

    raw = password.encode("utf-16-le") + salt
    ctx = hashlib.sha1()
    iv = bytearray(16)
    rounds = 1 << 18
    step = rounds >> 4
    for i in range(rounds):
        ctx.update(raw)
        ctx.update(bytes((i & 0xFF, (i >> 8) & 0xFF, (i >> 16) & 0xFF)))
        if i % step == 0:
            iv[i // step] = ctx.copy().digest()[19]
    digest = ctx.copy().digest()
    key = bytearray(16)
    for w in range(4):
        for j in range(4):
            key[w * 4 + j] = digest[w * 4 + (3 - j)]
    return bytes(key), bytes(iv)


def _rar3_decrypt(payload: bytes, salt: bytes) -> bytes:
    from ..functions.archive_crypto import (
        aes_cbc_decrypt,
        default_archive_password,
    )

    password = default_archive_password()
    if password is None:
        raise RarBroken("rar_encrypted")
    if len(payload) % 16:
        raise RarBroken("rar_error")
    key, iv = _rar3_keys(password, salt)
    return aes_cbc_decrypt(key, iv, payload)

# RAR5 header types
_R5_MAIN = 1
_R5_FILE = 2
_R5_SERVICE = 3
_R5_ENCRYPTION = 4
_R5_END = 5


class RarBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def is_rar(data: bytes) -> bool:
    return data.startswith(_SIG4) or data.startswith(_SIG5)


def unpack_rar(data: bytes, max_bytes: int = 256 * 2**20) -> list[tuple[str, bytes]]:
    """RAR bytes → [(member name, member bytes)]: stored, RAR5-LZ and
    RAR29-LZSS compressed, and password-channel-decrypted members all
    extract (module docstring has the full matrix); the typed refusals
    are RarBroken('rar_method_unsupported' | 'rar_ppmd_unsupported' |
    'rar_filter_unsupported' | 'rar_solid_unsupported' |
    'rar_encrypted' | 'rar_bad_password' | 'rar_crc_mismatch' |
    'rar_error' | 'archive_too_big')."""
    if data.startswith(_SIG5):
        return _unpack_rar5(data, max_bytes)
    if data.startswith(_SIG4):
        return _unpack_rar4(data, max_bytes)
    raise RarBroken("rar_error")


# ---------------------------------------------------------------------------
# RAR 4.x
# ---------------------------------------------------------------------------


def _unpack_rar4(data: bytes, max_bytes: int) -> list[tuple[str, bytes]]:
    pos = len(_SIG4)
    out: list[tuple[str, bytes]] = []
    budget = max_bytes
    while pos + 7 <= len(data):
        _crc, btype, flags, size = struct.unpack_from("<HBHH", data, pos)
        if size < 7:
            raise RarBroken("rar_error")
        if btype == _R4_END:
            break
        if btype == _R4_MAIN:
            if flags & _R4_MAIN_FLAG_ENC:
                raise RarBroken("rar_encrypted")
            pos += size
            continue
        if btype != _R4_FILE:
            # any other block: generic skip, honoring ADD_SIZE payloads
            add = 0
            if flags & _R4_FLAG_ADD_SIZE and pos + 11 <= len(data):
                (add,) = struct.unpack_from("<I", data, pos + 7)
            pos += size + add
            continue
        # FILE block: fixed part after the 7-byte block header
        if pos + 32 > len(data):
            raise RarBroken("rar_error")
        (pack_size, unp_size, _host_os, _fcrc, _ftime, _unp_ver, method,
         name_size, _attr) = struct.unpack_from("<IIBIIBBHI", data, pos + 7)
        name_off = pos + 32
        if flags & _R4_FLAG_LARGE:
            if name_off + 8 > len(data):
                raise RarBroken("rar_error")
            high_pack, high_unp = struct.unpack_from("<II", data, name_off)
            pack_size |= high_pack << 32
            unp_size |= high_unp << 32
            name_off += 8
        raw_name = data[name_off:name_off + name_size]
        salt = None
        if flags & _R4_FLAG_SALT:
            salt_off = name_off + name_size
            if salt_off + 8 > len(data):
                raise RarBroken("rar_error")
            salt = data[salt_off:salt_off + 8]
        if flags & _R4_FLAG_UNICODE:
            # name\0<packed unicode>: keep the plain 8-bit part
            raw_name = raw_name.split(b"\x00")[0]
        name = raw_name.decode("utf-8", "replace").replace("\\", "/")
        is_dir = (flags & 0xE0) == 0xE0
        payload = data[pos + size:pos + size + pack_size]
        if len(payload) != pack_size:
            raise RarBroken("rar_error")
        if flags & _R4_FLAG_PASSWORD and not is_dir:
            if salt is None:
                # pre-2.9 saltless crypto (the old RAR13/15/20 ciphers)
                raise RarBroken("rar_encrypted")
            payload = _rar3_decrypt(payload, salt)
        if not is_dir:
            budget -= unp_size
            if budget < 0:
                raise RarBroken("archive_too_big")
            if method == _R4_METHOD_STORE:
                member = payload[:unp_size]
            elif 0x31 <= method <= 0x35:
                if flags & 0x0010:
                    # solid: the LZ window starts inside the previous
                    # member — standalone decode would be silently wrong
                    raise RarBroken("rar_solid_unsupported")
                if _unp_ver != 29:
                    # RAR 1.5/2.0 schemes (unp_ver 15/20/26) and newer
                    # variants stay typed-refused
                    raise RarBroken("rar_method_unsupported")
                from ..functions.rar5_codec import Rar5Error
                from ..functions.rar29_codec import rar29_decompress

                try:
                    member = rar29_decompress(
                        payload, unp_size, max_bytes=max_bytes)
                except Rar5Error as e:  # Rar29Error subclasses it; the
                    # shared Huffman machinery raises the base class
                    # RAR3 crypto has no password-check value: a wrong
                    # key turns the stream into noise, so on an
                    # encrypted member ANY structural decode error is
                    # indistinguishable from a bad password (unrar
                    # reports "CRC failed (password incorrect?)" for
                    # the same reason) — report it as such
                    raise RarBroken(
                        "rar_bad_password"
                        if flags & _R4_FLAG_PASSWORD else e.reason
                    ) from e
                except (IndexError, ValueError, OverflowError) as e:
                    raise RarBroken("rar_error") from e
            else:
                raise RarBroken("rar_method_unsupported")
            if (method != _R4_METHOD_STORE
                    or flags & _R4_FLAG_PASSWORD) and \
                    zlib.crc32(member) & 0xFFFFFFFF != _fcrc:
                # never surface a wrong decode/decrypt as member bytes
                # (RAR3 crypto has no password check value — a wrong
                # password IS a CRC mismatch, reported as bad password)
                raise RarBroken(
                    "rar_bad_password" if flags & _R4_FLAG_PASSWORD
                    else "rar_crc_mismatch")
            out.append((name, member))
        pos += size + pack_size
    return out


# ---------------------------------------------------------------------------
# RAR 5.0
# ---------------------------------------------------------------------------


def _read_vint(data: bytes, pos: int) -> tuple[int, int]:
    """Little-endian base-128 varint (high bit = continuation)."""
    value = 0
    shift = 0
    while True:
        if pos >= len(data) or shift > 63:
            raise RarBroken("rar_error")
        b = data[pos]
        pos += 1
        value |= (b & 0x7F) << shift
        if not b & 0x80:
            return value, pos
        shift += 7


# RAR5 file-data encryption (extra record 0x01): AES-256-CBC with a
# PBKDF2-HMAC-SHA256 key schedule.  unrar derives three values from ONE
# continued PBKDF2 block: the running XOR at 2^count iterations is the
# AES key, at +16 more the checksum-MAC key, at +16 more the password
# check value (folded to 8 bytes).  A failed check is typed
# ``rar_bad_password`` (7z convention); decrypted data still passes the
# CRC/MAC gate, so a wrong key can never surface as member bytes.
_R5X_ENCRYPTION = 0x01


@lru_cache(maxsize=256)
def _rar5_kdf(password: str, salt: bytes,
              count_log2: int) -> tuple[bytes, bytes, bytes]:
    import hashlib
    import hmac as hmac_mod

    if count_log2 > 24:
        raise RarBroken("rar_error")
    inner = hmac_mod.new(password.encode("utf-8"), digestmod=hashlib.sha256)

    def prf(msg: bytes) -> bytes:
        m = inner.copy()
        m.update(msg)
        return m.digest()

    u = prf(salt + b"\x00\x00\x00\x01")
    acc = bytearray(u)
    outputs = []
    total = 1 << count_log2
    for target in (total, 16, 16):
        for _ in range(target - 1 if not outputs else target):
            u = prf(u)
            for i in range(32):
                acc[i] ^= u[i]
        outputs.append(bytes(acc))
    key, hash_key, check_full = outputs
    return key, hash_key, check_full


def _fold_psw_check(check_full: bytes) -> bytes:
    out = bytearray(8)
    for i, b in enumerate(check_full):
        out[i % 8] ^= b
    return bytes(out)


def _crc_to_mac(crc: int, hash_key: bytes) -> int:
    import hashlib
    import hmac as hmac_mod

    digest = hmac_mod.new(hash_key, struct.pack("<I", crc),
                          hashlib.sha256).digest()
    out = 0
    for i, b in enumerate(digest):
        out ^= b << ((i & 3) * 8)
    return out & 0xFFFFFFFF


def _parse_file_encryption(data: bytes, start: int, end: int):
    """Walk the FILE header's extra area; return the encryption record
    as a dict, or None if absent."""
    if start < 0 or end > len(data) or start > end:
        # corrupted extra_size (negative start would wrap via Python's
        # negative indexing and dodge the normal bounds guards)
        raise RarBroken("rar_error")
    p = start
    while p < end:
        rec_size, p2 = _read_vint(data, p)
        rec_end = p2 + rec_size
        if rec_end > end:
            raise RarBroken("rar_error")
        rtype, p3 = _read_vint(data, p2)
        if rtype == _R5X_ENCRYPTION:
            version, p4 = _read_vint(data, p3)
            if version != 0:  # 0 = AES-256
                raise RarBroken("rar_encrypted")
            eflags, p4 = _read_vint(data, p4)
            if p4 + 33 > rec_end:
                raise RarBroken("rar_error")
            count_log2 = data[p4]
            salt = data[p4 + 1:p4 + 17]
            iv = data[p4 + 17:p4 + 33]
            psw_check = None
            if eflags & 0x01:
                if p4 + 45 > rec_end:
                    raise RarBroken("rar_error")
                psw_check = data[p4 + 33:p4 + 41]
            return {
                "count_log2": count_log2,
                "salt": salt,
                "iv": iv,
                "psw_check": psw_check,
                "tweaked": bool(eflags & 0x02),
            }
        p = rec_end
    return None


def _decrypt_file_data(payload: bytes, enc: dict) -> tuple[bytes, bytes]:
    from ..functions.archive_crypto import (
        aes_cbc_decrypt,
        default_archive_password,
    )

    password = default_archive_password()
    if password is None:
        raise RarBroken("rar_encrypted")
    key, hash_key, check_full = _rar5_kdf(
        password, enc["salt"], enc["count_log2"])
    if enc["psw_check"] is not None and \
            _fold_psw_check(check_full) != enc["psw_check"]:
        raise RarBroken("rar_bad_password")
    if len(payload) % 16:
        raise RarBroken("rar_error")
    return aes_cbc_decrypt(key, enc["iv"], payload), hash_key


def _read_header_encryption(hdr: bytes, p: int, head_end: int) -> bytes:
    """ENCRYPTION block (type 4) body → the header AES key, password
    check verified when present."""
    from ..functions.archive_crypto import default_archive_password

    version, p = _read_vint(hdr, p)
    if version != 0:  # 0 = AES-256
        raise RarBroken("rar_encrypted")
    eflags, p = _read_vint(hdr, p)
    if p + 17 > head_end:
        raise RarBroken("rar_error")
    count_log2 = hdr[p]
    salt = hdr[p + 1:p + 17]
    p += 17
    password = default_archive_password()
    if password is None:
        raise RarBroken("rar_encrypted")
    key, _hash_key, check_full = _rar5_kdf(password, salt, count_log2)
    if eflags & 0x01:
        if p + 8 > head_end:
            raise RarBroken("rar_error")
        if _fold_psw_check(check_full) != hdr[p:p + 8]:
            raise RarBroken("rar_bad_password")
    return key


def _decrypt_header_block(data: bytes, pos: int, hdr_key: bytes):
    """Header-encrypted archives store each block as 16-byte IV +
    AES-256-CBC(crc32 + vint head_size + header), padded to 16.
    Returns (header_plain, data_area_start) — the data area follows the
    ciphertext raw (its own encryption is announced inside the header)."""
    from ..functions.archive_crypto import aes_cbc_decrypt

    if pos + 32 > len(data):
        raise RarBroken("rar_error")
    iv = data[pos:pos + 16]
    first = aes_cbc_decrypt(hdr_key, iv, data[pos + 16:pos + 32])
    head_size, vp = _read_vint(first, 4)
    total = vp + head_size  # crc32(4) + head_size vint + header bytes
    enc_len = (total + 15) & ~15
    if pos + 16 + enc_len > len(data):
        raise RarBroken("rar_error")
    plain = aes_cbc_decrypt(hdr_key, iv,
                            data[pos + 16:pos + 16 + enc_len])[:total]
    return plain, pos + 16 + enc_len


def _unpack_rar5(data: bytes, max_bytes: int) -> list[tuple[str, bytes]]:
    pos = len(_SIG5)
    out: list[tuple[str, bytes]] = []
    budget = max_bytes
    hdr_key = None  # set after an ENCRYPTION block (header crypto)
    while pos + 5 <= len(data):
        if hdr_key is None:
            # block: crc32(4) + vint head_size + header [+ data area]
            hdr = data
            head_size, hdr_pos = _read_vint(data, pos + 4)
            head_end = hdr_pos + head_size
            if head_end > len(data):
                raise RarBroken("rar_error")
            area_start = head_end
        else:
            hdr, area_start = _decrypt_header_block(data, pos, hdr_key)
            head_size, hdr_pos = _read_vint(hdr, 4)
            head_end = hdr_pos + head_size
            if head_end > len(hdr):
                raise RarBroken("rar_error")
        htype, p = _read_vint(hdr, hdr_pos)
        hflags, p = _read_vint(hdr, p)
        extra_size = 0
        if hflags & 0x0001:  # extra area (the LAST extra_size header bytes)
            extra_size, p = _read_vint(hdr, p)
        data_size = 0
        if hflags & 0x0002:  # data area
            data_size, p = _read_vint(hdr, p)
        if htype == _R5_END:
            break
        if htype == _R5_ENCRYPTION:
            # header encryption: every subsequent block is stored as a
            # 16-byte IV + AES-256-CBC ciphertext under the archive
            # password (same continued-PBKDF2 schedule as file data)
            hdr_key = _read_header_encryption(hdr, p, head_end)
            pos = area_start + data_size
            continue
        if htype == _R5_FILE:
            file_flags, p = _read_vint(hdr, p)
            unp_size, p = _read_vint(hdr, p)
            _attr, p = _read_vint(hdr, p)
            if file_flags & 0x0002:  # mtime
                p += 4
            data_crc = None
            if file_flags & 0x0004:  # crc32 of the UNPACKED bytes
                (data_crc,) = struct.unpack_from("<I", hdr, p)
                p += 4
            comp_info, p = _read_vint(hdr, p)
            _host_os, p = _read_vint(hdr, p)
            name_len, p = _read_vint(hdr, p)
            if p + name_len > len(hdr):
                raise RarBroken("rar_error")
            name = hdr[p:p + name_len].decode("utf-8", "replace")
            is_dir = bool(file_flags & 0x0001)
            payload = data[area_start:area_start + data_size]
            if len(payload) != data_size:
                raise RarBroken("rar_error")
            enc = None
            if extra_size:
                enc = _parse_file_encryption(
                    hdr, head_end - extra_size, head_end)
            crc_mac_key = None
            if enc is not None and not is_dir:
                payload, crc_mac_key = _decrypt_file_data(payload, enc)
            if not is_dir:
                version = comp_info & 0x3F
                solid = bool(comp_info & 0x40)
                method = (comp_info >> 7) & 0x7
                if file_flags & 0x0008:  # unpacked size unknown
                    raise RarBroken("rar_method_unsupported")
                budget -= unp_size
                if budget < 0:
                    raise RarBroken("archive_too_big")
                if method == 0:
                    member = payload[:unp_size]
                elif version != 0:
                    # RAR7 "v1" algorithm variants (larger dicts etc.)
                    raise RarBroken("rar_method_unsupported")
                elif solid:
                    # a solid member's LZ window starts inside the
                    # previous member — decoding it standalone would be
                    # silently wrong, so refuse typed
                    raise RarBroken("rar_solid_unsupported")
                else:
                    from ..functions.rar5_codec import (
                        Rar5Error,
                        rar5_decompress,
                    )

                    try:
                        member = rar5_decompress(
                            payload, unp_size, max_bytes=max_bytes)
                    except Rar5Error as e:
                        raise RarBroken(e.reason) from e
                    except (IndexError, ValueError, OverflowError) as e:
                        raise RarBroken("rar_error") from e
                if data_crc is not None:
                    actual = zlib.crc32(member) & 0xFFFFFFFF
                    if enc is not None and enc["tweaked"]:
                        # encrypted files store the MAC'd checksum
                        actual = _crc_to_mac(actual, crc_mac_key)
                    if actual != data_crc:
                        # never surface a wrong decode as text
                        raise RarBroken("rar_crc_mismatch")
                out.append((name.replace("\\", "/"), member))
        pos = area_start + data_size
    return out


# ---------------------------------------------------------------------------
# fixture writers (stored members, correct header CRCs)
# ---------------------------------------------------------------------------


def _r4_block(btype: int, flags: int, body: bytes) -> bytes:
    size = 7 + len(body)
    head = struct.pack("<BHH", btype, flags, size) + body
    crc = zlib.crc32(head) & 0xFFFF
    return struct.pack("<H", crc) + head


def build_rar4(members: list[tuple[str, bytes]], method: int = _R4_METHOD_STORE,
               unp_ver: int = 29, password: str | None = None) -> bytes:
    """Deterministic RAR 4.x fixture.  Methods 0x31-0x35 REALLY compress
    with the in-repo RAR29 coder; any other non-store method writes a
    compressed-claiming header (payload kept raw) for broken-reason
    tests, as does an ``unp_ver`` other than 29.  ``password`` encrypts
    each data area with the RAR3 AES-128 scheme (salted, deterministic
    per member)."""
    out = bytearray(_SIG4)
    out += _r4_block(_R4_MAIN, 0, bytes(6))  # HighPosAv+PosAv reserved
    for idx, (name, payload) in enumerate(members):
        raw_name = name.encode("utf-8")
        if 0x31 <= method <= 0x35 and unp_ver == 29:
            from ..functions.rar29_codec import rar29_compress

            data_area = rar29_compress(payload)
        else:
            data_area = payload
        flags = _R4_FLAG_ADD_SIZE
        tail = b""
        if password is not None:
            import hashlib

            from ..functions.archive_crypto import aes_cbc_encrypt

            salt = hashlib.sha256(
                b"rar3-fixture-salt" + raw_name + bytes([idx])).digest()[:8]
            key, iv = _rar3_keys(password, salt)
            pad = (-len(data_area)) % 16
            data_area = aes_cbc_encrypt(key, iv,
                                        data_area + b"\x00" * pad)
            flags |= _R4_FLAG_PASSWORD | _R4_FLAG_SALT
            tail = salt
        body = struct.pack(
            "<IIBIIBBHI",
            len(data_area), len(payload), 0,
            zlib.crc32(payload) & 0xFFFFFFFF, 0, unp_ver, method,
            len(raw_name), 0x20,
        ) + raw_name + tail
        out += _r4_block(_R4_FILE, flags, body)
        out += data_area
    out += _r4_block(_R4_END, 0, b"")
    return bytes(out)


def _vint(value: int) -> bytes:
    out = bytearray()
    while True:
        b = value & 0x7F
        value >>= 7
        if value:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _r5_block(htype: int, hflags: int, body: bytes, data: bytes = b"",
              extra: bytes = b"", data_size: int | None = None) -> bytes:
    if extra:
        hflags |= 0x0001
    hdr = _vint(htype) + _vint(hflags)
    if extra:
        hdr += _vint(len(extra))
    if hflags & 0x0002:
        hdr += _vint(len(data) if data_size is None else data_size)
    hdr += body + extra
    head = _vint(len(hdr)) + hdr
    # RAR5 header CRC covers head_size + header bytes
    crc = zlib.crc32(head) & 0xFFFFFFFF
    return struct.pack("<I", crc) + head + data


def build_rar5(members: list[tuple[str, bytes]], method: int = 0,
               raw_claim: bool = False,
               password: str | None = None,
               kdf_log2: int = 14,
               encrypt_headers: bool = False) -> bytes:
    """Deterministic RAR 5.0 fixture (vint framing).  ``method`` 0
    writes stored members; 1-5 REALLY compresses them with the in-repo
    RAR5 coder (functions/rar5_codec.py).  ``raw_claim=True`` keeps the
    payload raw under a compressed-claiming header (corrupt-stream
    tests).  ``password`` encrypts each member's data area (AES-256-CBC,
    extra record 0x01 with password-check + MAC'd checksum, deterministic
    salt/iv per member); ``encrypt_headers`` additionally writes an
    ENCRYPTION block and wraps every subsequent block header as
    IV + AES-256-CBC (the -hp layout)."""
    hdr_key = None
    out = bytearray(_SIG5)
    if encrypt_headers:
        if password is None:
            raise ValueError("encrypt_headers requires a password")
        import hashlib

        hsalt = hashlib.sha256(b"rar5-fixture-hdr-salt").digest()[:16]
        hdr_key, _hk, check_full = _rar5_kdf(password, hsalt, kdf_log2)
        psw_check = _fold_psw_check(check_full)
        body = (_vint(0) + _vint(0x01) + bytes([kdf_log2]) + hsalt
                + psw_check + hashlib.sha256(psw_check).digest()[:4])
        out += _r5_block(_R5_ENCRYPTION, 0, body)

    def emit(block: bytes) -> bytes:
        """Wrap one full block (crc+vint+header, NO data area) when
        header crypto is on: deterministic IV + AES over padded bytes."""
        if hdr_key is None:
            return block
        import hashlib

        from ..functions.archive_crypto import aes_cbc_encrypt

        iv = hashlib.sha256(b"rar5-hdr-iv" + bytes([len(out) % 251])
                            + block[:8]).digest()[:16]
        pad = (-len(block)) % 16
        return iv + aes_cbc_encrypt(hdr_key, iv, block + b"\x00" * pad)

    out += emit(_r5_block(_R5_MAIN, 0, _vint(0)))  # archive flags = 0
    for idx, (name, payload) in enumerate(members):
        raw_name = name.encode("utf-8")
        if method and not raw_claim:
            from ..functions.rar5_codec import rar5_compress

            data_area = rar5_compress(payload)
        else:
            data_area = payload
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        extra = b""
        if password is not None:
            import hashlib

            from ..functions.archive_crypto import aes_cbc_encrypt

            salt = hashlib.sha256(
                b"rar5-fixture-salt" + raw_name + bytes([idx])).digest()[:16]
            iv = hashlib.sha256(
                b"rar5-fixture-iv" + raw_name + bytes([idx])).digest()[:16]
            key, hash_key, check_full = _rar5_kdf(password, salt, kdf_log2)
            pad = (-len(data_area)) % 16
            data_area = aes_cbc_encrypt(key, iv,
                                        data_area + b"\x00" * pad)
            crc = _crc_to_mac(crc, hash_key)
            psw_check = _fold_psw_check(check_full)
            rec = (_vint(_R5X_ENCRYPTION) + _vint(0)  # AES-256
                   + _vint(0x01 | 0x02)               # check + MAC'd csum
                   + bytes([kdf_log2]) + salt + iv
                   + psw_check
                   + hashlib.sha256(psw_check).digest()[:4])
            extra = _vint(len(rec)) + rec
        body = (
            _vint(0x0004)                       # file flags: crc present
            + _vint(len(payload))               # unpacked size
            + _vint(0)                          # attributes
            + struct.pack("<I", crc)
            # dict-size bits only for compressed members, so stored
            # fixtures keep the exact v19 golden-corpus byte layout
            + _vint(((method & 0x7) << 7) | ((5 << 10) if method else 0))
            + _vint(0)                          # host os
            + _vint(len(raw_name))
            + raw_name
        )
        head = _r5_block(_R5_FILE, 0x0002, body, b"", extra=extra,
                         data_size=len(data_area))
        out += emit(head) + data_area
    out += emit(_r5_block(_R5_END, 0, _vint(0)))
    return bytes(out)
