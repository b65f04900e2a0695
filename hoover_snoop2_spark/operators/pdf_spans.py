"""PDF text extraction into reading-order spans.

The reference splits PDFs with qpdf (150-page chunks, 6-way xargs,
pdf-tools/run.sh:5-15) and extracts text per page with pdf.js
``getTextContent()``, joining items with ``' '`` and turning EOLs into
spaces (pdf-tools/extract-text.js:28-42), emitting ``{pageNum, text}``
records.

This module is a from-scratch parser: it tokenizes content streams for the text operators
(BT/ET, Td/TD/Tm, Tj/TJ/'), tracks the text cursor, then orders spans into
reading order — columns detected by x-clustering, top-to-bottom within a
column — and joins items with single spaces exactly like the reference's
pdf.js rule.  Filtered (FlateDecode etc.) streams are reported as
``broken='pdf_filter_unsupported'``; on a cluster the decode would be the
same kernel after a zlib pass.

Page-chunk parallelism (the reference's 150-page qpdf split) is expressed
as Spark partitioning: large PDFs expand to one row per page-chunk before
the UDF (plans/skew.py), so no single task holds a giant document.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

#: pdf.js joins text items with this (extract-text.js:28-42)
ITEM_JOIN = " "

#: x-gap (in PDF user units) that separates two columns
COLUMN_GAP = 72.0

#: y-gap under which two spans are "the same line"
LINE_TOLERANCE = 2.0

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.DOTALL)
_FILTER_RE = re.compile(rb"/Filter")
_PAGE_RE = re.compile(rb"/Type\s*/Page(?![a-zA-Z])")

#: how far back from `stream` to search for the owning object dict.  Object
#: dicts with ICC color-space arrays or long DecodeParms routinely exceed a
#: few hundred bytes; a short window misclassifies those streams.  64 KiB
#: covers any realistic dict while keeping the rfind cost bounded per
#: stream (a whole-prefix search would be O(n²) over many streams).
_DICT_LOOKBACK = 64 * 1024


def _stream_dict(data: bytes, stream_start: int) -> bytes:
    """Bytes of the object dict owning the stream at ``stream_start``:
    everything from the nearest preceding `obj` keyword (within the
    lookback window) to the `stream` keyword."""
    head = data[max(0, stream_start - _DICT_LOOKBACK): stream_start]
    oi = head.rfind(b" obj")
    return head[oi:] if oi >= 0 else head


@dataclass
class Span:
    page: int
    x: float
    y: float
    text: str
    #: current font size when the span was shown (Tf operand); 0.0 when
    #: the stream never set one before showing text
    size: float = 0.0


class PdfBroken(Exception):
    def __init__(self, reason: str):
        super().__init__(reason)
        self.reason = reason


def _decode_pdf_string(raw: bytes) -> str:
    """Literal string decode: backslash escapes + octal, PDFDocEncoding
    approximated by latin-1 (exact for ASCII)."""
    out = bytearray()
    i = 0
    while i < len(raw):
        b = raw[i]
        if b == 0x5C and i + 1 < len(raw):  # backslash
            nxt = raw[i + 1]
            simple = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                      0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
            if nxt in simple:
                out.append(simple[nxt])
                i += 2
                continue
            if 0x30 <= nxt <= 0x37:  # octal, up to 3 digits
                j = i + 1
                digits = b""
                while j < len(raw) and len(digits) < 3 and 0x30 <= raw[j] <= 0x37:
                    digits += bytes([raw[j]])
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            i += 1  # line continuation / unknown escape: drop backslash
            continue
        out.append(b)
        i += 1
    return out.decode("latin-1")


_TOKEN_RE = re.compile(
    rb"\((?:[^()\\]|\\.)*\)"      # literal string
    rb"|<[0-9A-Fa-f\s]*>"          # hex string
    rb"|\[|\]"
    rb"|[-+]?\d*\.?\d+"            # number
    rb"|/[A-Za-z0-9#]+"            # name
    rb"|[A-Za-z'\"*]+"             # operator
)


def _spans_from_stream(stream: bytes, page: int) -> list[Span]:
    spans: list[Span] = []
    x = y = 0.0
    lx = ly = 0.0  # line start (Td is relative to line start)
    fs = 0.0  # current font size (/Name size Tf); graphics state, so it
    # persists across BT/ET within the stream
    stack: list[bytes | float | str | list] = []
    in_text = False

    def shown(items) -> str:
        parts = []
        for it in items:
            if isinstance(it, str):
                parts.append(it)
        return "".join(parts)

    for m in _TOKEN_RE.finditer(stream):
        tok = m.group(0)
        if tok.startswith(b"("):
            stack.append(_decode_pdf_string(tok[1:-1]))
        elif tok.startswith(b"<") and tok.endswith(b">"):
            hexs = re.sub(rb"\s", b"", tok[1:-1])
            if len(hexs) % 2:
                hexs += b"0"
            stack.append(bytes.fromhex(hexs.decode("ascii")).decode("latin-1"))
        elif tok in (b"[", b"]"):
            stack.append(tok)
        elif re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
            stack.append(float(tok))
        elif tok.startswith(b"/"):
            stack.append(tok)
        else:
            op = tok
            if op == b"BT":
                in_text = True
                x = y = lx = ly = 0.0
                stack.clear()
            elif op == b"ET":
                in_text = False
                stack.clear()
            elif not in_text:
                if op == b"Tf" and stack and isinstance(stack[-1], float):
                    fs = stack[-1]
                stack.clear()
            elif op in (b"Td", b"TD"):
                if len(stack) >= 2 and isinstance(stack[-1], float) and isinstance(stack[-2], float):
                    lx, ly = lx + stack[-2], ly + stack[-1]
                    x, y = lx, ly
                stack.clear()
            elif op == b"Tm":
                if len(stack) >= 6:
                    try:
                        e, f = float(stack[-2]), float(stack[-1])
                        lx, ly = e, f
                        x, y = e, f
                    except (TypeError, ValueError):
                        pass
                stack.clear()
            elif op == b"T*":
                x, y = lx, ly
                stack.clear()
            elif op == b"Tf":
                if stack and isinstance(stack[-1], float):
                    fs = stack[-1]
                stack.clear()
            elif op == b"Tj" or op == b"'":
                text = shown(stack[-1:])
                if text:
                    spans.append(Span(page, x, y, text, fs))
                stack.clear()
            elif op == b"TJ":
                # array of strings and kerning numbers between [ ... ]
                try:
                    lb = len(stack) - 1 - stack[::-1].index(b"[")
                except ValueError:
                    lb = 0
                text = shown(stack[lb:])
                if text:
                    spans.append(Span(page, x, y, text, fs))
                stack.clear()
            else:
                stack.clear()
    return spans


def _reading_order(spans: list[Span]) -> list[Span]:
    """Column-major reading order: cluster span x-origins into columns
    (gap > COLUMN_GAP), left-to-right across columns, top-to-bottom (y
    descending — PDF origin is bottom-left) within a column."""
    if not spans:
        return []
    xs = sorted({s.x for s in spans})
    col_starts = [xs[0]]
    for a, b in zip(xs, xs[1:]):
        if b - a > COLUMN_GAP:
            col_starts.append(b)

    def col_of(s: Span) -> int:
        c = 0
        for i, start in enumerate(col_starts):
            if s.x >= start - 1e-6:
                c = i
        return c

    return sorted(spans, key=lambda s: (col_of(s), -s.y, s.x))


def _stream_obj_ids(data: bytes, stream_start: int) -> tuple[int, int]:
    """(object number, generation) of the object owning the stream —
    needed for per-object decryption keys in encrypted PDFs."""
    head = data[max(0, stream_start - _DICT_LOOKBACK): stream_start]
    oi = head.rfind(b" obj")
    if oi < 0:
        return 0, 0
    m = re.search(rb"(\d+)\s+(\d+)\s+obj", head[max(0, oi - 32):oi + 4])
    return (int(m.group(1)), int(m.group(2))) if m else (0, 0)


def _pdf_decryptor(data: bytes):
    """PdfDecryptor for encrypted documents (None when unencrypted);
    tries the empty user password (owner-protected docs — what the
    reference's pdftotext opens transparently) then the worker-local
    archive password.  Typed failures re-raise as PdfBroken."""
    if b"/Encrypt" not in data:
        return None
    from ..functions.archive_crypto import default_archive_password
    from .pdf_crypto import PdfCryptoBroken, PdfDecryptor

    try:
        return PdfDecryptor.from_pdf(data, default_archive_password())
    except PdfCryptoBroken as e:
        raise PdfBroken(e.reason)


def _maybe_inflate(stream: bytes) -> bytes:
    """FlateDecode streams (the overwhelmingly common filter) inflate with
    stdlib zlib; zlib's magic byte 0x78 gates the attempt so uncompressed
    streams pass through untouched."""
    if stream[:1] == b"\x78":
        import zlib

        try:
            return zlib.decompress(stream)
        except zlib.error:
            pass
    return stream


def extract_pdf_pages(data: bytes) -> list[dict]:
    """PDF bytes → [{'page': n, 'text': str}] in reading order; the
    per-page text joins items with ' ' (pdf.js rule)."""
    if not data.startswith(b"%PDF"):
        raise PdfBroken("pdf_not_pdf")
    decryptor = _pdf_decryptor(data)
    pages = []
    page_no = 0
    n_unsupported = 0
    for m in _STREAM_RE.finditer(data):
        stream = m.group(1)
        if decryptor is not None:
            num, gen = _stream_obj_ids(data, m.start())
            try:
                stream = decryptor.decrypt_stream(stream, num, gen)
            except Exception:
                n_unsupported += 1
                continue
        # per-stream filter check: look back at the stream object's dict
        # (`N 0 obj << /Length .. /Filter .. >> stream`); a declared filter
        # other than FlateDecode — or Flate bytes that fail to inflate —
        # SKIPS that stream (text from the decodable streams still comes
        # out); the document is only reported broken when nothing at all
        # could be extracted and at least one stream was undecodable.
        sdict = _stream_dict(data, m.start())
        if b"/Subtype" in sdict and b"/Image" in sdict:
            continue  # image XObject, not a content stream (see
            # pdf_image_children for the fan-out)
        if _FILTER_RE.search(sdict):
            if b"FlateDecode" not in sdict or stream[:1] != b"\x78":
                n_unsupported += 1
                continue
            import zlib

            try:
                stream = zlib.decompress(stream)
            except zlib.error:
                n_unsupported += 1
                continue
        else:
            stream = _maybe_inflate(stream)
        spans = _spans_from_stream(stream, page_no + 1)
        if not spans:
            continue
        page_no += 1
        ordered = _reading_order(spans)
        text = ITEM_JOIN.join(s.text for s in ordered)
        pages.append({"page": page_no, "text": text})
    if not pages and n_unsupported:
        raise PdfBroken("pdf_filter_unsupported")
    return pages


def pdf_image_children(data: bytes) -> list[tuple[str, bytes]]:
    """Embedded image XObjects → (name, bytes) children — the pdfimages
    fan-out that feeds the reference's OCR path (archives.py:491-528:
    `pdfimages -all` children named page-NNN-xxx).

    DCTDecode streams ARE raw JPEG bytes (emitted as .jpg, directly
    consumable by the multimodal/EXIF operators); FlateDecode raster data
    inflates to .raw; other image codecs (JBIG2, CCITT, JPX) are skipped —
    emitting bytes we can't decode would poison the OCR queue."""
    out: list[tuple[str, bytes]] = []
    if not data.startswith(b"%PDF"):
        return out
    try:
        decryptor = _pdf_decryptor(data)
    except PdfBroken:
        return out  # text path reports the typed reason; no children
    n = 0
    for m in _STREAM_RE.finditer(data):
        sdict = _stream_dict(data, m.start())
        if b"/Subtype" not in sdict or b"/Image" not in sdict:
            continue
        n += 1
        stream = m.group(1)
        if decryptor is not None:
            try:
                stream = decryptor.decrypt_stream(
                    stream, *_stream_obj_ids(data, m.start()))
            except Exception:
                continue
        if b"DCTDecode" in sdict:
            out.append((f"image-{n:03d}.jpg", stream))
        elif b"FlateDecode" in sdict or not _FILTER_RE.search(sdict):
            raw = _maybe_inflate(stream)
            out.append((f"image-{n:03d}.raw", raw))
    return out


def pdf_to_text(data: bytes) -> tuple[str | None, list[dict], str | None]:
    """Returns (joined_text, page_records, broken_reason)."""
    try:
        pages = extract_pdf_pages(data)
    except PdfBroken as e:
        return None, [], e.reason
    text = "\n\n".join(p["text"] for p in pages)
    return text, pages, None


def explode_pdf_pages(df, url_col: str = "url", data_col: str = "html"):
    """(url, pdf bytes) → one row per page: (url, page, page_text).

    The Spark expression of the reference's page-chunk parallelism
    (qpdf 150-page splits × 6-way xargs, pdf-tools/run.sh:5-15): page rows
    ARE the parallelism unit — downstream per-page work (OCR, NER,
    embedding) distributes without any single task holding a whole
    document.  mapInPandas so a giant PDF never materializes one huge
    pandas cell list.
    """
    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    def fn(batches):
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[data_col]):
                _text, pages, broken = pdf_to_text(data or b"")
                for p in pages:
                    rows.append({"url": url, "page": p["page"],
                                 "page_text": p["text"], "broken_reason": None})
                if broken:
                    rows.append({"url": url, "page": None, "page_text": None,
                                 "broken_reason": broken})
            yield pd.DataFrame(
                rows, columns=["url", "page", "page_text", "broken_reason"]
            )

    return df.select(url_col, data_col).mapInPandas(
        fn, schema="url string, page int, page_text string, broken_reason string"
    )


def extract_pdf_page_spans(data: bytes) -> list[dict]:
    """PDF bytes → one dict per text span in reading order:
    ``{'page', 'seq', 'x', 'y', 'size', 'text'}`` — the layout-level
    view under ``extract_pdf_pages`` (same stream walk, same column-
    major ordering, same filter-skip rules) with the Tf font size kept
    per span, so layout analysis (heading levels, body-size inference)
    can run relationally on top instead of inside the parser."""
    if not data.startswith(b"%PDF"):
        raise PdfBroken("pdf_not_pdf")
    decryptor = _pdf_decryptor(data)
    out = []
    page_no = 0
    n_unsupported = 0
    for m in _STREAM_RE.finditer(data):
        stream = m.group(1)
        if decryptor is not None:
            num, gen = _stream_obj_ids(data, m.start())
            try:
                stream = decryptor.decrypt_stream(stream, num, gen)
            except Exception:
                n_unsupported += 1
                continue
        sdict = _stream_dict(data, m.start())
        if b"/Subtype" in sdict and b"/Image" in sdict:
            continue
        if _FILTER_RE.search(sdict):
            if b"FlateDecode" not in sdict or stream[:1] != b"\x78":
                n_unsupported += 1
                continue
            import zlib

            try:
                stream = zlib.decompress(stream)
            except zlib.error:
                n_unsupported += 1
                continue
        else:
            stream = _maybe_inflate(stream)
        spans = _spans_from_stream(stream, page_no + 1)
        if not spans:
            continue
        page_no += 1
        for seq, s in enumerate(_reading_order(spans), 1):
            out.append({"page": page_no, "seq": seq, "x": s.x, "y": s.y,
                        "size": s.size, "text": s.text})
    if not out and n_unsupported:
        raise PdfBroken("pdf_filter_unsupported")
    return out


def explode_pdf_spans(df, url_col: str = "url", data_col: str = "html"):
    """(url, pdf bytes) → one row per span: (url, page, seq, x, y,
    size, span_text, broken_reason) in reading order.  Same
    mapInPandas shape as ``explode_pdf_pages`` — span rows are the
    parallelism unit, and the heading/body analysis that consumes
    them (see ``queries.q104_pdf_headings``) is pure DataFrame
    aggregation, so the Python side stays a tokenizer and nothing
    else."""
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[data_col]):
                try:
                    spans = extract_pdf_page_spans(data or b"")
                except PdfBroken as e:
                    rows.append({"url": url, "page": None, "seq": None,
                                 "x": None, "y": None, "size": None,
                                 "span_text": None, "broken_reason": e.reason})
                    continue
                for s in spans:
                    rows.append({"url": url, "page": s["page"],
                                 "seq": s["seq"], "x": s["x"], "y": s["y"],
                                 "size": s["size"], "span_text": s["text"],
                                 "broken_reason": None})
            yield pd.DataFrame(
                rows,
                columns=["url", "page", "seq", "x", "y", "size",
                         "span_text", "broken_reason"],
            )

    return df.select(url_col, data_col).mapInPandas(
        fn,
        schema=("url string, page int, seq int, x double, y double, "
                "size double, span_text string, broken_reason string"),
    )
