"""Text decode / normalize primitives.

Reproduces (bit-exactly where the dependency set allows):

- ``read_text`` — raw-text fallback read with encoding detection and a
  20 MiB cap (reference digests.py:171-200, cap indexing.py:29),
- ``zulu`` — ISO-8601 Z-suffix timestamp format (utils/__init__.py:54-61),
- NFC + whitespace-fold normalization (the north_rule's "language-aware
  text normalization" step),
- HTML meta-charset probing (browsers' first-1024-bytes rule), used before
  the byte-level encoding ladder for text/html blobs.
"""

from __future__ import annotations

import re
import unicodedata
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from .magic import detect_mime_encoding

#: reference: snoop/data/indexing.py:29 (MAX_TEXT_FIELD_SIZE = 20 MiB)
MAX_TEXT_FIELD_SIZE = 20 * 2**20

_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)

_WS_RUN = re.compile(r"[ \t\r\n\f\v   ]+")


def zulu(t: datetime | None) -> str | None:
    """ISO format with Z suffix (reference utils/__init__.py:54-61)."""
    if not t:
        return None
    txt = t.astimezone(timezone.utc).isoformat()
    assert txt.endswith("+00:00")
    return txt.replace("+00:00", "Z")


def html_charset(data: bytes) -> str | None:
    """Probe the first 1024 bytes for a <meta charset=...> declaration."""
    m = _META_CHARSET.search(data[:1024])
    if not m:
        return None
    name = m.group(1).decode("ascii", errors="replace").lower()
    try:
        b"x".decode(name)
    except (LookupError, UnicodeDecodeError):
        return None
    return name


def decode_html(data: bytes) -> str:
    """Decode HTML bytes: meta charset wins, else the encoding ladder."""
    cs = html_charset(data)
    if cs:
        return data[:MAX_TEXT_FIELD_SIZE].decode(cs, errors="replace")
    enc = detect_mime_encoding(data)
    if enc == "binary":
        enc = "iso-8859-1"  # html declared by tag structure; decode anyway
    if enc == "us-ascii":
        enc = "ascii"
    elif enc == "utf-8":
        # utf-8-sig strips a leading BOM (and is a no-op without one) —
        # U+FEFF must never leak into extracted text; the utf-16 codec
        # already consumes its BOM, this keeps the two rungs consistent
        enc = "utf-8-sig"
    return data[:MAX_TEXT_FIELD_SIZE].decode(enc, errors="replace")


def read_text(data: bytes, mime_encoding: str | None) -> str | None:
    """Raw-text fallback read (digests.py:171-200): use the sniffed
    encoding; binary → probe again; cap at MAX_TEXT_FIELD_SIZE **bytes**
    before decoding, exactly like the reference's read_exactly + decode."""
    enc = mime_encoding
    if not enc or enc == "binary":
        enc = detect_mime_encoding(data)
    if enc == "binary":
        return None
    if enc == "us-ascii":
        enc = "ascii"
    elif enc == "utf-8":
        enc = "utf-8-sig"  # strip a leading BOM, no-op otherwise
    try:
        return data[:MAX_TEXT_FIELD_SIZE].decode(enc, errors="replace")
    except LookupError:
        enc = detect_mime_encoding(data)
        if enc == "binary":
            return None
        if enc == "us-ascii":
            enc = "ascii"
        return data[:MAX_TEXT_FIELD_SIZE].decode(enc, errors="replace")


def fold_ws(text: str) -> str:
    """Collapse whitespace runs to single spaces and strip."""
    return _WS_RUN.sub(" ", text).strip()


def normalize_text(text: str | None) -> str | None:
    """NFC + per-line whitespace fold; blank-line paragraph breaks become
    exactly one empty line (text blocks joined by \\n\\n)."""
    if text is None:
        return None
    text = unicodedata.normalize("NFC", text)
    blocks = [fold_ws(b) for b in re.split(r"\n\s*\n", text)]
    return "\n\n".join(b for b in blocks if b)


@F.pandas_udf(StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda t: normalize_text(t) if t is not None else None)
