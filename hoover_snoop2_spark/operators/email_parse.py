"""RFC-822 email parsing — from-scratch re-expression of the reference's
``email.parse`` task and ``email_meta`` field builder
(snoop/data/analyzers/email.py:105-278).

Semantics preserved:

- BOM strip before parse (email.py:192-195, BYTE_ORDER_MARK),
- multi-encoding header decode via email.header.make_header/decode_header
  with UnicodeDecodeError fallback to the raw string (email.py:69-90),
- headers dict keyed by ``key.title()`` collecting all values
  (email.py:93-102),
- text/plain parts decoded with detected charset, errors='replace'
  (email.py:138-146; chardet replaced by our deterministic ladder),
- text/html parts → tag-strip (reference uses Tika+bleach,
  email.py:148-169; we use our own extractor),
- attachments = parts with a content-disposition and filename
  (email.py:171-183),
- ``email_meta``: to/cc/bcc/from recipient folding with order-preserving
  dedup, Date → zulu, @domain regex extraction, subject, text =
  '\\n\\n'.join(part texts).strip(), email-header dump, delete-empty-keys
  (email.py:204-278).
"""

from __future__ import annotations

import email
import email.header
import email.utils
import re
from collections import defaultdict
from typing import Any

from ..functions import pgp_codec
from ..functions.magic import detect_mime_encoding
from ..functions.mime_boundary import install as _install_boundary_fastpath
from ..functions.textutils import zulu
from .html_extract import strip_tags

# per-message boundary-regex compile was ~25% of rfc822 parse CPU —
# replace it with a startswith + shared tail regex (see mime_boundary)
_install_boundary_fastpath()

BYTE_ORDER_MARK = b"\xef\xbb\xbf"

#: reference email.py:30
EMAIL_DOMAIN_EXP = re.compile(r"@([\w.-]+)")

_HTML_MIME_TYPES = {"text/html"}

#: reference email.py:232-241
_CONVERT = {
    "to": ["To", "Cc", "Bcc", "Resent-To", "Resent-Cc", "Resent-Bcc"],
    "to-direct": ["To", "Resent-To"],
    "cc": ["Cc", "Resent-Cc"],
    "bcc": ["Bcc", "Resent-Bcc"],
    "from": ["From", "Resent-From"],
    "message-id": ["Message-Id"],
    "thread-index": ["Thread-Index"],
    "in-reply-to": ["In-Reply-To", "References", "Original-Message-ID",
                    "Resent-Message-Id"],
}


def _extract_domain(text: str) -> str | None:
    m = EMAIL_DOMAIN_EXP.search(text)
    return m[1] if m else None


def read_header(raw_header: Any) -> str:
    """Multi-encoding header decode (email.py:69-90)."""
    if isinstance(raw_header, str) and "=?" not in raw_header:
        # no RFC 2047 encoded word can exist without "=?", so
        # decode_header returns the single chunk [(raw, None)] and
        # str(make_header(...)) of a single chunk is the string itself
        # (Header.__str__ only inserts spaces BETWEEN chunks) — skip the
        # three-object round-trip for the overwhelmingly common plain
        # header.  Differential-pinned by test_email.py.
        return raw_header
    try:
        return str(email.header.make_header(email.header.decode_header(raw_header)))
    except UnicodeDecodeError:
        return str(raw_header)


def get_headers(message: email.message.Message) -> dict[str, list[str]]:
    """All headers, keys title-cased, every occurrence kept (email.py:93-102)."""
    rv: dict[str, list[str]] = defaultdict(list)
    for key in message.keys():
        for raw_header in message.get_all(key):
            rv[key.title()].append(read_header(raw_header))
    return dict(rv)


def _decode_text_part(payload: bytes, declared_charset: str | None) -> str:
    if declared_charset:
        try:
            return payload.decode(declared_charset, errors="replace")
        except LookupError:
            pass
    enc = detect_mime_encoding(payload)
    charset = {"binary": "latin-1", "us-ascii": "ascii", "utf-16": "utf-16"}.get(enc, enc)
    return payload.decode(charset, errors="replace")


def dump_part(message: email.message.Message) -> dict[str, Any]:
    """Recursive part walk (email.py:105-184).  Attachment bytes come back
    inline (``data``) instead of as a blob PK — the pipeline turns them into
    child rows."""
    rv: dict[str, Any] = {"headers": get_headers(message)}

    if message.is_multipart():
        rv["parts"] = [dump_part(part) for part in message.get_payload()]
        return rv

    content_type = message.get_content_type()
    try:
        payload_bytes = message.get_payload(decode=True)
    except Exception:
        rv["broken"] = "email_get_payload"
        return rv
    if payload_bytes is None:
        payload_bytes = b""

    if b"-----BEGIN PGP MESSAGE-----" in payload_bytes:
        # PGP armor (reference pgp.py:13-46 + email.py:133-136): decrypt
        # in place when a keyring is configured — the reference swaps
        # payload_bytes for the plaintext and lets the normal content-type
        # handling continue.  No keyring / wrong key → the reference's
        # typed broken reasons, and the armor never leaks into `text`.
        rv["pgp"] = True
        keyring = pgp_codec.default_keyring()
        if keyring is None:
            rv["broken"] = "gpg_not_configured"
            return rv
        try:
            payload_bytes = pgp_codec.decrypt(
                payload_bytes, keyring=keyring)["data"]
        except pgp_codec.PgpError:
            rv["broken"] = "gpg_decrypt_failed"
            return rv
        # RFC 3156 PGP/MIME: the octet-stream payload of a
        # multipart/encrypted decrypts to a full MIME entity —
        # re-explode it into parts so bodies and attachments inside
        # encrypted mail surface like plain mail
        head = payload_bytes[:1024].lower()
        if head.startswith(b"content-") or b"\ncontent-type:" in head:
            sub = email.message_from_bytes(payload_bytes)
            rv["parts"] = [dump_part(sub)]
            return rv
    if rv.get("pgp") and content_type not in ("text/plain", *_HTML_MIME_TYPES):
        # gpg output of an inline-armored part is plaintext regardless of
        # the (now-stale) declared type
        rv["text"] = _decode_text_part(payload_bytes, None)
    elif content_type == "text/plain":
        rv["text"] = _decode_text_part(payload_bytes, message.get_content_charset())
    elif content_type in _HTML_MIME_TYPES:
        html_text = _decode_text_part(payload_bytes, message.get_content_charset())
        rv["text"] = strip_tags(html_text)

    if message.get_content_disposition():
        raw_filename = message.get_filename()
        if raw_filename:
            rv["attachment"] = {
                "name": read_header(raw_filename),
                "data": payload_bytes,
            }
    return rv


def parse_email_bytes(message_bytes: bytes) -> dict[str, Any]:
    """email.parse task analog (email.py:187-201)."""
    if message_bytes[:3] == BYTE_ORDER_MARK:
        message_bytes = message_bytes[3:]
    message = email.message_from_bytes(message_bytes)
    return dump_part(message)


def iter_parts(email_data: dict[str, Any]):
    yield email_data
    for part in email_data.get("parts") or []:
        yield from iter_parts(part)


def email_meta(email_data: dict[str, Any]) -> dict[str, Any]:
    """Ready-to-index fields (email.py:204-278), minus PGP (out of scope)."""
    if not email_data:
        return {}
    headers = email_data["headers"]

    text_bits = [p["text"] for p in iter_parts(email_data) if p.get("text")]
    pgp = any(p.get("pgp") for p in iter_parts(email_data))

    ret: dict[str, Any] = {}
    for target_field, sources in _CONVERT.items():
        all_values: list[str] = []
        for header in sources:
            for val in headers.get(header, []):
                for line in val.strip().splitlines():
                    line = line.strip()
                    if line and line not in all_values:
                        all_values.append(line)
        ret[target_field] = all_values

    message_date = None
    message_raw_date = headers.get("Date", [None])[0]
    if message_raw_date:
        try:
            parsed = email.utils.parsedate_to_datetime(message_raw_date)
            message_date = zulu(parsed)
        except (TypeError, ValueError):
            message_date = None

    to_domains = [_extract_domain(t) for t in ret["to"]]
    from_domains = [_extract_domain(f) for f in ret["from"]]
    email_domains = list(set(to_domains + from_domains))

    ret.update(
        {
            "email-domains": sorted(d.lower() for d in email_domains if d),
            "subject": headers.get("Subject", [""])[0],
            "text": "\n\n".join(text_bits).strip(),
            "pgp": pgp,
            "date": message_date,
            "email-header-key": sorted(set(headers.keys())),
            "email-header": sum(
                ([k + "=" + v for v in headers[k]] for k in headers), start=[]
            ),
        }
    )

    for k in list(ret.keys()):
        if not ret[k]:
            del ret[k]
    return ret


def attachments_of(email_data: dict[str, Any]) -> list[tuple[str, bytes]]:
    """(name, bytes) for each attachment part, in tree order."""
    out = []
    for part in iter_parts(email_data):
        att = part.get("attachment")
        if att:
            out.append((att["name"], att["data"]))
    return out
