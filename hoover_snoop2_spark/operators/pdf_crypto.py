"""PDF standard security handler — encrypted-PDF text extraction.

Owner-password-only PDFs (empty USER password: readable by any viewer,
restrictions on print/copy) are extremely common, and the reference's
``pdftotext`` opens them transparently — so must this engine.  This
module implements the standard security handler from the public PDF
spec (ISO 32000-1 §7.6 / the PDF 1.7 reference Algorithms 2-13,
ISO 32000-2 for R6):

- R2/R3 (RC4 40/128-bit): the padded-password MD5 key derivation with
  the 50-fold rehash, per-object keys ``MD5(key + obj + gen)``, and
  the U-entry verification that gates every decode;
- R4: crypt filters — /V2 (RC4) and /AESV2 (AES-128-CBC with a 16-byte
  IV prefix and PKCS#5 padding, per-object key with the ``sAlT``
  suffix);
- R5/R6 (/AESV3, AES-256): SHA-256 validation-salt check (R6 via the
  Algorithm-2.B iterated SHA-256/384/512 + AES-CBC hardening loop),
  file key unwrapped from /UE (or /OE for the owner password), used
  directly for all objects;
- the owner-password path for R2-R4 (RC4-unwrap /O into the user
  password) so a configured password works whichever slot it fills.

RC4 is implemented here (public algorithm, a dozen lines); AES comes
from :mod:`..functions.pgp_codec` via the CBC helpers in
:mod:`..functions.archive_crypto`.

Verification is structural, like the office/7z paths: a wrong password
or a KDF divergence fails the U-entry check (typed ``pdf_encrypted`` /
``pdf_bad_password``) and decrypted streams must still inflate — never
silent garbage.  The fixture WRITER (:func:`encrypt_pdf`) encrypts the
in-repo corpus PDFs for R3/R4-RC4/R4-AES/R6 so the whole span pipeline
is tested over encrypted inputs.
"""

from __future__ import annotations

import hashlib
import re
import struct

from ..functions.archive_crypto import aes_cbc_decrypt, aes_cbc_encrypt

__all__ = ["PdfCryptoBroken", "PdfDecryptor", "rc4", "encrypt_pdf"]

#: Algorithm 2 padding string (PDF 1.7 §7.6.3.3)
_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


class PdfCryptoBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (public algorithm; encrypt == decrypt)."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for n, c in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[n] = c ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


def _pad_pw(pw: bytes) -> bytes:
    return (pw + _PAD)[:32]


# ---------------------------------------------------------------------------
# encrypt-dict discovery and PDF micro-parsing
# ---------------------------------------------------------------------------

_ENC_REF_RE = re.compile(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R")
_ID_RE = re.compile(rb"/ID\s*\[\s*<([0-9A-Fa-f]*)>")


def _obj_body(data: bytes, num: int, gen: int) -> bytes | None:
    m = re.search(rb"(?<![0-9])%d\s+%d\s+obj\b" % (num, gen), data)
    if not m:
        return None
    end = data.find(b"endobj", m.end())
    return data[m.end():end if end >= 0 else len(data)]


def _dict_int(d: bytes, key: bytes, default: int | None = None) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(-?\d+)", d)
    return int(m.group(1)) if m else default


def _dict_name(d: bytes, key: bytes) -> bytes | None:
    m = re.search(rb"/" + key + rb"\s*/([A-Za-z0-9]+)", d)
    return m.group(1) if m else None


def _dict_string(d: bytes, key: bytes) -> bytes | None:
    """PDF string value: literal ``(...)`` with escapes or hex ``<...>``."""
    m = re.search(rb"/" + key + rb"\s*", d)
    if not m:
        return None
    pos = m.end()
    if pos >= len(d):
        return None
    if d[pos:pos + 1] == b"<":
        end = d.find(b">", pos)
        hexs = re.sub(rb"\s", b"", d[pos + 1:end])
        if len(hexs) % 2:
            hexs += b"0"
        return bytes.fromhex(hexs.decode("ascii"))
    if d[pos:pos + 1] != b"(":
        return None
    out = bytearray()
    depth = 1
    i = pos + 1
    while i < len(d) and depth:
        c = d[i]
        if c == 0x5C:  # backslash
            i += 1
            e = d[i:i + 1]
            esc = {b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
                   b"(": 40, b")": 41, b"\\": 92}
            if e in esc:
                out.append(esc[e])
                i += 1
            elif e.isdigit():
                oct_s = b""
                while len(oct_s) < 3 and d[i:i + 1].isdigit():
                    oct_s += d[i:i + 1]
                    i += 1
                out.append(int(oct_s, 8) & 0xFF)
            else:
                i += 1  # line continuation / unknown escape
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth:
                out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# R6 Algorithm 2.B
# ---------------------------------------------------------------------------

def _hash_r6(password: bytes, salt: bytes, udata: bytes) -> bytes:
    k = hashlib.sha256(password + salt + udata).digest()
    i = 0
    e = b"\x00"
    while i < 64 or e[-1] > i - 32:
        k1 = (password + k + udata) * 64
        e = aes_cbc_encrypt(k[:16], k[16:32], k1)
        k = (hashlib.sha256, hashlib.sha384,
             hashlib.sha512)[sum(e[:16]) % 3](e).digest()
        i += 1
    return k[:32]


class PdfDecryptor:
    """Per-document decryptor; construct via :meth:`from_pdf`."""

    def __init__(self, rev: int, key: bytes, aes: bool):
        self.rev = rev
        self.key = key
        self.aes = aes

    # -- construction -------------------------------------------------

    @staticmethod
    def from_pdf(data: bytes, password: str | bytes | None = None
                 ) -> "PdfDecryptor | None":
        """None when the PDF has no /Encrypt; raises typed otherwise.

        Tries the empty user password first (owner-protected documents —
        the overwhelmingly common case), then ``password`` as user and
        as owner password."""
        body = None
        # scan all /Encrypt refs, last wins (incremental updates append);
        # refs that resolve to nothing or to a non-security dict are body
        # text coincidences ("/Encrypt 5 0 R" inside a page stream), not
        # an encrypted document
        for m in _ENC_REF_RE.finditer(data):
            cand = _obj_body(data, int(m.group(1)), int(m.group(2)))
            if cand is not None and _dict_name(cand, b"Filter"):
                body = cand
        if body is None:
            return None
        filt = _dict_name(body, b"Filter")
        if filt != b"Standard":
            raise PdfCryptoBroken("pdf_crypt_unsupported")
        rev = _dict_int(body, b"R")
        v = _dict_int(body, b"V", 0)
        o = _dict_string(body, b"O")
        u = _dict_string(body, b"U")
        p = _dict_int(body, b"P", -1)
        if rev is None or o is None or u is None:
            raise PdfCryptoBroken("pdf_encrypt_malformed")
        if isinstance(password, str):
            password = password.encode("utf-8")
        candidates: list[tuple[bytes, str]] = [(b"", "user")]
        if password:
            candidates += [(password, "user"), (password, "owner")]

        if rev in (2, 3) or (rev == 4 and v == 4):
            idm = _ID_RE.search(data)
            id0 = bytes.fromhex(idm.group(1).decode()) if idm else b""
            nbits = _dict_int(body, b"Length", 40 if rev == 2 else 128)
            aes = False
            if rev == 4:
                cfm = _dict_name(body, b"CFM")
                if cfm == b"AESV2":
                    aes = True
                elif cfm not in (b"V2", None):
                    raise PdfCryptoBroken("pdf_crypt_unsupported")
                if _dict_int(body, b"EncryptMetadata") is not None:
                    pass  # only affects metadata streams, not content
            for pw, slot in candidates:
                if slot == "owner":
                    pw2 = PdfDecryptor._owner_to_user(pw, o, rev, nbits)
                else:
                    pw2 = pw
                key = PdfDecryptor._key_r234(pw2, o, p, id0, rev, nbits)
                if PdfDecryptor._check_u(key, u, id0, rev):
                    return PdfDecryptor(rev, key, aes)
            raise PdfCryptoBroken(
                "pdf_encrypted" if not password else "pdf_bad_password")

        if rev in (5, 6):
            ue = _dict_string(body, b"UE")
            oe = _dict_string(body, b"OE")
            if len(u) < 48 or ue is None or oe is None or len(o) < 48:
                raise PdfCryptoBroken("pdf_encrypt_malformed")
            h = (lambda pw, salt, ud: _hash_r6(pw, salt, ud)) if rev == 6 \
                else (lambda pw, salt, ud:
                      hashlib.sha256(pw + salt + ud).digest())
            for pw, slot in candidates:
                if slot == "user":
                    if h(pw, u[32:40], b"") == u[:32]:
                        ik = h(pw, u[40:48], b"")
                        key = aes_cbc_decrypt(ik, b"\x00" * 16, ue)
                        return PdfDecryptor(rev, key[:32], True)
                else:
                    if h(pw, o[32:40], u[:48]) == o[:32]:
                        ik = h(pw, o[40:48], u[:48])
                        key = aes_cbc_decrypt(ik, b"\x00" * 16, oe)
                        return PdfDecryptor(rev, key[:32], True)
            raise PdfCryptoBroken(
                "pdf_encrypted" if not password else "pdf_bad_password")

        raise PdfCryptoBroken("pdf_crypt_unsupported")

    # -- R2-R4 key machinery ------------------------------------------

    @staticmethod
    def _key_r234(pw: bytes, o: bytes, p: int, id0: bytes, rev: int,
                  nbits: int) -> bytes:
        n = nbits // 8
        h = hashlib.md5(_pad_pw(pw) + o[:32]
                        + struct.pack("<i", p) + id0)
        key = h.digest()
        if rev >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        return key[:n]

    @staticmethod
    def _check_u(key: bytes, u: bytes, id0: bytes, rev: int) -> bool:
        if rev == 2:
            return rc4(key, _PAD) == u[:32]
        x = hashlib.md5(_PAD + id0).digest()
        x = rc4(key, x)
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in key), x)
        return x == u[:16]

    @staticmethod
    def _owner_to_user(owner_pw: bytes, o: bytes, rev: int,
                       nbits: int) -> bytes:
        n = nbits // 8
        key = hashlib.md5(_pad_pw(owner_pw)).digest()
        if rev >= 3:
            for _ in range(50):
                key = hashlib.md5(key[:n]).digest()
        key = key[:n]
        data = o[:32]
        if rev == 2:
            data = rc4(key, data)
        else:
            for i in range(19, -1, -1):
                data = rc4(bytes(b ^ i for b in key), data)
        return data.rstrip(b"\x00")  # padded user pw; _pad_pw re-pads

    # -- per-object decryption -----------------------------------------

    def _obj_key(self, num: int, gen: int) -> bytes:
        if self.rev >= 5:
            return self.key
        ext = struct.pack("<I", num)[:3] + struct.pack("<I", gen)[:2]
        salt = b"sAlT" if self.aes else b""
        k = hashlib.md5(self.key + ext + salt).digest()
        return k[:min(len(self.key) + 5, 16)]

    def decrypt_stream(self, raw: bytes, num: int, gen: int) -> bytes:
        key = self._obj_key(num, gen)
        if not self.aes:
            return rc4(key, raw)
        # the scan-based reader slices `stream\n ... \nendstream`, so the
        # EOL before `endstream` rides along; trim to block alignment
        while (len(raw) - 16) % 16 and raw[-1:] in (b"\n", b"\r"):
            raw = raw[:-1]
        if len(raw) < 16 or (len(raw) - 16) % 16:
            raise PdfCryptoBroken("pdf_crypt_malformed")
        plain = aes_cbc_decrypt(key, raw[:16], raw[16:])
        pad = plain[-1] if plain else 0
        if not 1 <= pad <= 16:
            raise PdfCryptoBroken("pdf_crypt_malformed")
        return plain[:-pad]

    def encrypt_stream(self, raw: bytes, num: int, gen: int,
                       iv: bytes = b"\x00" * 16) -> bytes:
        """Fixture-writer inverse (deterministic IV injectable)."""
        key = self._obj_key(num, gen)
        if not self.aes:
            return rc4(key, raw)
        pad = 16 - len(raw) % 16
        return iv + aes_cbc_encrypt(key, iv, raw + bytes([pad]) * pad)


# ---------------------------------------------------------------------------
# fixture writer: encrypt an in-repo corpus PDF in place
# ---------------------------------------------------------------------------

def encrypt_pdf(data: bytes, user_pw: str = "", owner_pw: str = "owner",
                rev: int = 3, aes: bool = False) -> bytes:
    """Encrypt every stream of a simple (xref-table) PDF and append the
    /Encrypt dict + /ID to the trailer.  R3 (RC4-128), R4 (/V2 RC4 or
    /AESV2), R6 (/AESV3).  Deterministic: salts/IVs derive from content.
    The xref table is NOT rewritten — the reader here scans objects by
    pattern, and stream lengths are preserved for RC4 (AES grows
    streams, so /Length is patched per object)."""
    upw = user_pw.encode()
    opw = owner_pw.encode()
    id0 = hashlib.md5(b"id" + data).digest()

    if rev in (3, 4):
        nbits = 128
        n = nbits // 8
        okey = hashlib.md5(_pad_pw(opw)).digest()
        for _ in range(50):
            okey = hashlib.md5(okey[:n]).digest()
        okey = okey[:n]
        o = _pad_pw(upw)
        for i in range(20):
            o = rc4(bytes(b ^ i for b in okey), o)
        p = -3904  # typical restrictive permissions
        key = PdfDecryptor._key_r234(upw, o, p, id0, rev, nbits)
        x = hashlib.md5(_PAD + id0).digest()
        x = rc4(key, x)
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in key), x)
        u = x + b"\x00" * 16
        dec = PdfDecryptor(rev, key, aes)
        extra = b""
        if rev == 4:
            cfm = b"AESV2" if aes else b"V2"
            extra = (b" /CF << /StdCF << /CFM /" + cfm
                     + b" /Length " + str(n).encode()
                     + b" >> >> /StmF /StdCF /StrF /StdCF")
        enc_dict = (
            b"<< /Filter /Standard /V " + (b"4" if rev == 4 else b"2")
            + b" /R " + str(rev).encode()
            + b" /Length " + str(nbits).encode()
            + b" /P " + str(p).encode()
            + b" /O <" + o.hex().encode() + b">"
            + b" /U <" + u.hex().encode() + b">" + extra + b" >>"
        )
    elif rev == 6:
        filekey = hashlib.blake2b(b"fk" + data, digest_size=32).digest()
        uvs = hashlib.blake2b(b"uvs" + data, digest_size=8).digest()
        uks = hashlib.blake2b(b"uks" + data, digest_size=8).digest()
        ovs = hashlib.blake2b(b"ovs" + data, digest_size=8).digest()
        oks = hashlib.blake2b(b"oks" + data, digest_size=8).digest()
        u = _hash_r6(upw, uvs, b"") + uvs + uks
        ue = aes_cbc_encrypt(_hash_r6(upw, uks, b""), b"\x00" * 16,
                             filekey)
        o = _hash_r6(opw, ovs, u) + ovs + oks
        oe = aes_cbc_encrypt(_hash_r6(opw, oks, u), b"\x00" * 16,
                             filekey)
        dec = PdfDecryptor(6, filekey, True)
        enc_dict = (
            b"<< /Filter /Standard /V 5 /R 6 /Length 256 /P -3904"
            b" /CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
            b" /StmF /StdCF /StrF /StdCF"
            + b" /O <" + o.hex().encode() + b">"
            + b" /U <" + u.hex().encode() + b">"
            + b" /OE <" + oe.hex().encode() + b">"
            + b" /UE <" + ue.hex().encode() + b">"
            b" >>"
        )
    else:
        raise ValueError(f"writer rev {rev}")

    stream_re = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)

    def owner_ids(pos: int) -> tuple[int, int]:
        head = data[max(0, pos - 65536):pos]
        oi = head.rfind(b" obj")
        m2 = re.search(rb"(\d+)\s+(\d+)\s+obj",
                       head[max(0, oi - 32):oi + 4]) if oi >= 0 else None
        return (int(m2.group(1)), int(m2.group(2))) if m2 else (0, 0)

    pieces = []
    last = 0
    for m in stream_re.finditer(data):
        num, gen = owner_ids(m.start())
        body = m.group(1)
        iv = hashlib.blake2b(b"iv%d" % num + data, digest_size=16).digest()
        enc = dec.encrypt_stream(body, num, gen, iv=iv)
        seg = data[last:m.start()]
        if len(enc) != len(body):
            # patch the owning dict's /Length (the last one before `stream`)
            lens = list(re.finditer(rb"/Length\s+\d+", seg))
            if lens:
                lm = lens[-1]
                seg = (seg[:lm.start()] + b"/Length "
                       + str(len(enc)).encode() + seg[lm.end():])
        pieces.append(seg)
        pieces.append(b"stream\n" + enc + b"\nendstream")
        last = m.end()
    pieces.append(data[last:])
    out = b"".join(pieces)
    # append /Encrypt + /ID into the trailer dict
    tpos = out.rfind(b"trailer")
    if tpos < 0:
        raise ValueError("no trailer")
    dpos = out.find(b"<<", tpos)
    enc_obj_num = 900
    inject = (b"<< /Encrypt " + str(enc_obj_num).encode() + b" 0 R /ID [<"
              + id0.hex().encode() + b"> <" + id0.hex().encode() + b">] ")
    out = out[:dpos] + inject + out[dpos + 2:]
    # append the encrypt object itself (never xref'd; the reader scans)
    out += (b"\n" + str(enc_obj_num).encode() + b" 0 obj\n"
            + enc_dict + b"\nendobj\n")
    return out
