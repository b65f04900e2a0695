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
    """Collapse whitespace runs to single spaces and strip.

    Fast path (r6): when the text contains no fold-class character other
    than single spaces, the regex substitution is the identity, so only
    ``strip()`` applies.  The 9 C-level scans cost ~0.7 µs vs ~8 µs for
    the regex pass — and ~100% of real block-scorer inputs are already
    clean (measured on the bench corpus).  Equivalence: a run of two or
    more class chars requires one of the checked substrings ("  " covers
    multi-space runs; every non-space class char is checked directly),
    so the fallback fires for exactly the inputs the regex would alter.
    """
    if ("\n" not in text and "  " not in text and "\t" not in text
            and "\r" not in text and "\f" not in text and "\v" not in text
            and "\xa0" not in text and "\u2028" not in text
            and "\u2029" not in text):
        return text.strip()
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


#: UTF-8-bytes-misdecoded-as-latin-1 signature: the misread lead byte of
#: a 2/3/4-byte UTF-8 sequence becomes U+00C2-U+00F4 and every
#: continuation byte becomes U+0080-U+00BF — a two-to-four char shape
#: ordinary Western text essentially never produces on purpose.
MOJIBAKE_RE = (
    "([\u00c2-\u00df][\u0080-\u00bf])"
    "|([\u00e0-\u00ef][\u0080-\u00bf]{2})"
    "|([\u00f0-\u00f4][\u0080-\u00bf]{3})"
)


def mojibake_score(col) -> F.Column:
    """Count of mojibake signatures in the column — a pure JVM
    ``regexp_count`` gate, so scoring the whole corpus costs one
    codegen'd Project and only flagged rows matter downstream."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(MOJIBAKE_RE))


@F.pandas_udf(StringType())
def fix_mojibake_udf(s: pd.Series) -> pd.Series:
    """Repair UTF-8-as-latin-1 mojibake ("CafÃ©" →
    "Café") by reversing the misdecode: re-encode as iso-8859-1
    and re-decode as UTF-8, keeping the original unless the WHOLE
    string survives both hops (ftfy's core transform, restricted to
    the lossless case).  This must be an Arrow UDF, not
    ``decode(encode(..))``: Spark 4's codecs raise
    MALFORMED_CHARACTER_CODING on any row that is not pure latin-1 /
    valid UTF-8, and a repair pass that can kill the job on one weird
    row is unusable at crawl scale — here those rows just pass through
    unchanged."""

    def fix(t):
        if t is None:
            return None
        try:
            b = t.encode("iso-8859-1")
        except UnicodeEncodeError:
            return t  # chars beyond U+00FF: not a latin-1 misdecode
        try:
            return b.decode("utf-8")
        except UnicodeDecodeError:
            return t  # not valid UTF-8 underneath: leave it alone

    return s.map(fix)


def repair_mojibake(col) -> F.Column:
    """``fix_mojibake_udf`` gated on ``mojibake_score > 0`` so a wrong
    repair can never touch a string carrying no mojibake signature;
    the gate is JVM-side, the UDF only decides flagged rows."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(mojibake_score(c) > 0, fix_mojibake_udf(c)).otherwise(c)
