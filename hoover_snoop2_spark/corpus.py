"""Deterministic synthetic Common-Crawl-style corpus generator.

Produces the ``pages(url, warc_ts, html, text, lang)`` input table pinned by
BASELINE.json's ``input_hint`` plus an ``expected_digests`` golden table —
the role the hoover-testdata fixture corpus plays for the reference
(testsuite/test_blobs.py:31-124, hash-pinned assertions test_blobs.py:8-28).

Everything derives from ``doc_id`` alone (seeded per-doc RNG), so any scale
regenerates bit-identically and golden values are computed at generation
time, independent of the extraction operators:

- html-article golden = the known paragraphs, NFC + whitespace-folded,
  joined \\n\\n (the extractor must *recover* them from boilerplate);
- html-bad-encoding golden = paragraphs mapped through the pinned decode
  rule (meta charset honored; otherwise cp1252 bytes read as iso-8859-1 —
  computed here by direct byte transcoding, not by running the extractor);
- eml golden = '\\n\\n'.join(part texts).strip() (reference email.py:267);
- containers (zip/tar.gz/mbox/csv) golden = '' for the parent and one
  golden row per child url using the ``parent//name`` convention
  (digests.py:726-738);
- pdf golden = per-page span texts joined ' ' in reading order, pages
  joined \\n\\n (pdf.js item-join rule, pdf-tools/extract-text.js:28-42).

Category mix follows FIXTURES.md §1 (shares via doc_id % 1000).
"""

from __future__ import annotations

import hashlib
import io
import random
import tarfile
import unicodedata
import zipfile
from datetime import datetime, timedelta, timezone

import pyarrow as pa
import pyarrow.parquet as pq

from .functions.textutils import fold_ws

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
    "sunt culpa qui officia deserunt mollit anim id est laborum"
).split()

# function words sprinkled in so language id has signal (langid.py stopwords)
_LANG_WORDS = {
    "en": "the and of to in is that it was for".split(),
    "de": "der die und in den von zu das mit auf".split(),
    "fr": "de la le et les des en un du que".split(),
    "ro": "de la în și care pe este cu mai pentru".split(),
    "es": "de la que el en y los del se las".split(),
}
_LANGS = list(_LANG_WORDS)

#: bump when generation rules change — invalidates bench corpus caches
CORPUS_VERSION = 19

CATEGORIES = [
    # (threshold on scrambled doc_id % 1000, category)
    (510, "html-article"),
    (520, "ppt-legacy"),
    (530, "doc-legacy"),
    (540, "msg"),
    (570, "docx"),
    (580, "odt"),
    (590, "pptx"),
    (600, "xlsx"),
    (650, "html-bad-encoding"),
    (750, "plain-text"),
    (840, "eml"),
    (850, "pst"),
    (880, "mbox"),
    (930, "csv-table"),
    (945, "zip"),
    (950, "sevenzip"),
    (970, "targz"),
    (985, "pdf-minimal"),
    (995, "binary-skip"),
    (1000, "oversized-html"),
]


def category_of(doc_id: int) -> str:
    # 101 is coprime with 1000 and sweeps the whole [0,1000) range within
    # any ~10 consecutive ids, so even tiny corpora get every category
    r = (doc_id * 101) % 1000
    for threshold, cat in CATEGORIES:
        if r < threshold:
            return cat
    return "html-article"


#: duplicate-payload twin pool: small ids that are html-article (so a dup
#: always clones an article page); rule only fires for doc_id >= 40, so
#: twins never recurse
_TWINS = [i for i in range(60) if ((i * 101) % 1000) < 510][:17]
assert len(_TWINS) == 17


def _rng(doc_id: int, salt: int = 0) -> random.Random:
    return random.Random((doc_id * 2654435761 + salt * 97531) % 2**63)


def lang_of(doc_id: int) -> str:
    return _LANGS[_rng(doc_id, 7).randrange(len(_LANGS))]


def _sentence(rng: random.Random, lang: str) -> str:
    n = rng.randint(8, 16)
    words = []
    lang_pool = _LANG_WORDS[lang]
    for i in range(n):
        if rng.random() < 0.35:
            words.append(rng.choice(lang_pool))
        else:
            words.append(rng.choice(_WORDS))
    s = " ".join(words)
    return s[0].upper() + s[1:] + "."


def paragraphs_of(doc_id: int, lang: str, k: int | None = None) -> list[str]:
    rng = _rng(doc_id, 1)
    k = k if k is not None else rng.randint(2, 6)
    return [" ".join(_sentence(rng, lang) for _ in range(rng.randint(2, 5)))
            for _ in range(k)]


def _golden_from_paragraphs(paras: list[str]) -> str:
    return "\n\n".join(fold_ws(unicodedata.normalize("NFC", p)) for p in paras)


# ---------------------------------------------------------------------------
# HTML rendering (boilerplate template)
# ---------------------------------------------------------------------------

_NAV_LINKS = ["Home", "About", "Products", "Blog", "Contact", "Login",
              "Careers", "Press", "Support", "Terms"]


def render_html(doc_id: int, paras: list[str], charset: str | None = "utf-8",
                sidebar: bool = False, repeat: int = 1) -> str:
    rng = _rng(doc_id, 2)
    nav = " | ".join(
        f'<a href="/{w.lower()}">{w}</a>' for w in rng.sample(_NAV_LINKS, 6)
    )
    meta = f'<meta charset="{charset}">' if charset else ""
    side = ""
    if sidebar:
        items = "".join(
            f'<li><a href="/tag/{i}">tag {i} link {rng.randrange(100)}</a></li>'
            for i in range(12)
        )
        side = f'<div class="sidebar"><ul>{items}</ul></div>'
    body_paras = "".join(f"<p>{p}</p>" for p in paras) * repeat
    # low-link-density boilerplate that only the class/id "unlikely
    # candidates" heuristic can reject (cookie banners, comments, promos)
    cookie = (
        '<div class="cookie-consent"><p>We use cookies to improve your '
        "experience on this site. By continuing you agree to our policy."
        "</p><button>Accept</button></div>"
    ) if doc_id % 2 == 0 else ""
    comments = (
        '<section id="comments"><h3>Comments</h3>'
        + "".join(
            f"<p>visitor {rng.randrange(999)} says: nice article "
            f"number {rng.randrange(99)}!</p>" for _ in range(3)
        )
        + "</section>"
    ) if doc_id % 3 == 0 else ""
    related = (
        '<div class="related-promo"><p>You may also like these stories '
        "from our archive, hand picked by the editorial team.</p></div>"
    ) if doc_id % 5 == 0 else ""
    return (
        f"<!DOCTYPE html><html><head>{meta}<title>Doc {doc_id}</title>"
        f"<style>body{{margin:0}}</style></head><body>"
        f"<nav>{nav}</nav>"
        f"<header><h1>Site {doc_id % 97} news</h1>"
        f'<a href="/">back to index</a></header>'
        f"{side}{cookie}"
        f"<article>{body_paras}</article>"
        f"{comments}{related}"
        f'<footer><a href="/privacy">Privacy</a> · <a href="/imprint">'
        f"Imprint</a> · © 2024 site{doc_id % 97}</footer>"
        f"</body></html>"
    )


# ---------------------------------------------------------------------------
# eml / mbox rendering
# ---------------------------------------------------------------------------


def render_eml(doc_id: int, lang: str) -> tuple[bytes, str, list[tuple[str, bytes, str]]]:
    """Returns (eml_bytes, golden_text, attachments[(name, bytes, child_golden)])."""
    rng = _rng(doc_id, 3)
    plain = " ".join(_sentence(rng, lang) for _ in range(rng.randint(2, 4)))
    html_para = " ".join(_sentence(rng, lang) for _ in range(2))
    subj = f"Report {doc_id} " + " ".join(rng.sample(_WORDS, 3))
    sender = f"user{doc_id % 53}@mail{doc_id % 11}.example"
    rcpt = f"team{doc_id % 29}@corp{doc_id % 7}.example"
    date = (EPOCH + timedelta(seconds=doc_id * 137)).strftime(
        "%a, %d %b %Y %H:%M:%S +0000"
    )
    atts: list[tuple[str, bytes, str]] = []
    n_att = rng.randint(0, 2)
    for i in range(n_att):
        att_text = " ".join(_sentence(rng, lang) for _ in range(2))
        atts.append((f"attach{i}.txt", att_text.encode("utf-8"), _golden_from_paragraphs([att_text])))

    boundary = f"b{doc_id:08d}x"
    lines = [
        f"From: {sender}",
        f"To: {rcpt}",
        f"Subject: {subj}",
        f"Date: {date}",
        f"Message-Id: <m{doc_id}@mail{doc_id % 11}.example>",
        "MIME-Version: 1.0",
        f'Content-Type: multipart/mixed; boundary="{boundary}"',
        "",
        f"--{boundary}",
        'Content-Type: text/plain; charset="utf-8"',
        "",
        plain,
        f"--{boundary}",
        'Content-Type: text/html; charset="utf-8"',
        "",
        f"<html><body><p>{html_para}</p></body></html>",
    ]
    for name, data, _ in atts:
        lines += [
            f"--{boundary}",
            "Content-Type: application/octet-stream",
            f'Content-Disposition: attachment; filename="{name}"',
            "Content-Transfer-Encoding: 8bit",
            "",
            data.decode("utf-8"),
        ]
    lines.append(f"--{boundary}--")
    eml = "\r\n".join(lines).encode("utf-8")
    golden = "\n\n".join([plain, html_para]).strip()
    return eml, golden, atts


def render_mbox(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """>= 3 messages (mbox detection needs 3, magic.py:163).  Children are
    simple single-part messages; returns (bytes, [(child_name, golden)])."""
    rng = _rng(doc_id, 4)
    n = rng.randint(3, 5)
    chunks = []
    children = []
    for i in range(1, n + 1):
        body = " ".join(_sentence(rng, lang) for _ in range(2))
        msg = (
            f"From sender@example Mon Jan  1 00:00:{i:02d} 2024\n"
            f"From: user{i}@mail.example\n"
            f"To: list@mail.example\n"
            f"Subject: msg {doc_id}-{i}\n"
            f"Date: Mon, 01 Jan 2024 00:00:{i:02d} +0000\n"
            "\n"
            f"{body}\n"
        )
        chunks.append(msg)
        children.append((f"{i}.eml", body.strip()))
    return "".join(chunks).encode("utf-8"), children


# ---------------------------------------------------------------------------
# csv rendering
# ---------------------------------------------------------------------------

_CSV_DELIMS = [",", "\t", ";", "|", ":"]


def render_csv(doc_id: int) -> tuple[bytes, list[tuple[str, str]], dict]:
    rng = _rng(doc_id, 5)
    delim = _CSV_DELIMS[doc_id % len(_CSV_DELIMS)]
    ncols = rng.randint(3, 6)
    nrows = rng.randint(5, 30)
    cols = [f"col_{c}" for c in range(1, ncols + 1)]
    rows = [
        [f"v{doc_id % 100}r{r}c{c}" for c in range(1, ncols + 1)]
        for r in range(1, nrows + 1)
    ]
    body = delim.join(cols) + "\n" + "\n".join(delim.join(r) for r in rows) + "\n"
    # child golden is the normalize_text fixpoint of the exploded
    # "col = value" lines (single lines fold to one spaced block)
    children = [
        (f"{i}.txt", " ".join(f"{k} = {v}" for k, v in zip(cols, row)))
        for i, row in enumerate(rows, start=1)
    ]
    info = {
        "table-columns": cols,
        "table-row-count": nrows + 1,
        "table-col-count": ncols,
    }
    return body.encode("utf-8"), children, info


def render_dbf(doc_id: int) -> tuple[bytes, list[tuple[str, str]], dict]:
    """dBase fixed-width table — same golden contract as render_csv."""
    from .operators.dbf_extract import build_dbf

    rng = _rng(doc_id, 28)
    ncols = rng.randint(2, 5)
    nrows = rng.randint(3, 20)
    cols = [f"F{c}" for c in range(1, ncols + 1)]
    rows = [
        [f"d{doc_id % 100}r{r}c{c}" for c in range(1, ncols + 1)]
        for r in range(1, nrows + 1)
    ]
    children = [
        (f"{i}.txt", " ".join(f"{k} = {v}" for k, v in zip(cols, row)))
        for i, row in enumerate(rows, start=1)
    ]
    info = {
        "table-columns": cols,
        "table-row-count": nrows + 1,
        "table-col-count": ncols,
    }
    return build_dbf(cols, rows), children, info


def render_sqlite(doc_id: int) -> tuple[bytes, list[tuple[str, str]], dict]:
    """SQLite database via the stdlib sqlite3 writer (the independent
    emitter for our native B-tree reader); one ``items`` table of text
    cells, same golden contract as render_csv."""
    import os
    import sqlite3
    import tempfile

    rng = _rng(doc_id, 31)
    ncols = rng.randint(2, 4)
    nrows = rng.randint(3, 15)
    cols = [f"c{c}" for c in range(1, ncols + 1)]
    rows = [
        [f"s{doc_id % 100}r{r}c{c}" for c in range(1, ncols + 1)]
        for r in range(1, nrows + 1)
    ]
    path = tempfile.mktemp(suffix=".db")
    try:
        con = sqlite3.connect(path)
        con.execute(f"CREATE TABLE items ({', '.join(c + ' TEXT' for c in cols)})")
        for row in rows:
            con.execute(
                f"INSERT INTO items VALUES ({', '.join('?' * ncols)})", row)
        con.commit()
        con.close()
        blob = open(path, "rb").read()
    finally:
        if os.path.exists(path):
            os.unlink(path)
    children = [
        (f"items/{i}.txt", " ".join(f"{k} = {v}" for k, v in zip(cols, row)))
        for i, row in enumerate(rows, start=1)
    ]
    info = {
        "table-columns": cols,
        "table-row-count": nrows + 1,
        "table-col-count": ncols,
    }
    return blob, children, info


def render_wk1(doc_id: int) -> tuple[bytes, list[tuple[str, str]], dict]:
    """Lotus 1-2-3 WK1 — same golden contract as render_csv; cells mix
    labels and numbers (numbers round-trip through the f64 record)."""
    from .operators.lotus_extract import build_wk1

    rng = _rng(doc_id, 29)
    ncols = rng.randint(2, 4)
    nrows = rng.randint(3, 12)
    cols = [f"L{c}" for c in range(1, ncols + 1)]
    rows = []
    for r in range(1, nrows + 1):
        row = []
        for c in range(1, ncols + 1):
            if (r + c + doc_id) % 3 == 0:
                row.append(str((doc_id * r + c) % 10000))
            else:
                row.append(f"w{doc_id % 100}r{r}c{c}")
        rows.append(row)
    children = [
        (f"{i}.txt", " ".join(f"{k} = {v}" for k, v in zip(cols, row)))
        for i, row in enumerate(rows, start=1)
    ]
    info = {
        "table-columns": cols,
        "table-row-count": nrows + 1,
        "table-col-count": ncols,
    }
    return build_wk1(cols, rows), children, info


# ---------------------------------------------------------------------------
# minimal-PDF rendering (uncompressed, valid xref)
# ---------------------------------------------------------------------------


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _tiny_jpeg(w: int, h: int) -> bytes:
    """Minimal deterministic JPEG (SOI + JFIF APP0 + SOF0 dims + EOI)."""
    import struct as _s

    return (
        b"\xff\xd8"
        + b"\xff\xe0" + _s.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        + b"\xff\xc0" + _s.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
        + b"\xff\xd9"
    )


def render_pdf(doc_id: int, lang: str) -> tuple[bytes, str, list[tuple[str, str]]]:
    """1-3 pages of spans; ~1 in 3 docs gets a two-column page; ~1 in 3
    embeds a JPEG image XObject (the pdfimages fan-out child).  Golden =
    per page, spans joined ' ' in reading order; pages joined \\n\\n."""
    rng = _rng(doc_id, 6)
    n_pages = rng.randint(1, 3)
    page_contents: list[bytes] = []
    page_goldens: list[str] = []
    for p in range(n_pages):
        two_col = p == 1 or (n_pages == 1 and doc_id % 3 == 0)
        lines = [" ".join(rng.sample(_WORDS, rng.randint(3, 6)))
                 for _ in range(rng.randint(3, 6))]
        ops = ["BT", "/F1 12 Tf"]
        if two_col:
            half = (len(lines) + 1) // 2
            left, right = lines[:half], lines[half:]
            emit = []  # interleave emission to force reordering
            for i in range(max(len(left), len(right))):
                if i < len(left):
                    emit.append((72.0, 720.0 - 14 * i, left[i]))
                if i < len(right):
                    emit.append((330.0, 720.0 - 14 * i, right[i]))
            for x, y, t in emit:
                ops.append(f"1 0 0 1 {x:.1f} {y:.1f} Tm ({_pdf_escape(t)}) Tj")
            golden = " ".join(left + right)
        else:
            for i, t in enumerate(lines):
                ops.append(f"1 0 0 1 72.0 {720.0 - 14 * i:.1f} Tm ({_pdf_escape(t)}) Tj")
            golden = " ".join(lines)
        ops.append("ET")
        page_contents.append("\n".join(ops).encode("latin-1"))
        page_goldens.append(golden)

    # object layout: 1 catalog, 2 pages, 3 font, then per page (page, content)
    objects: list[bytes] = []
    kids = []
    next_id = 4
    page_objs = []
    for content in page_contents:
        page_id, content_id = next_id, next_id + 1
        next_id += 2
        kids.append(f"{page_id} 0 R")
        page_objs.append(
            (
                page_id,
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {content_id} 0 R /Resources << /Font << /F1 3 0 R >> >> >>".encode(),
            )
        )
        page_objs.append(
            (
                content_id,
                b"<< /Length "
                + str(len(content)).encode()
                + b" >>\nstream\n"
                + content
                + b"\nendstream",
            )
        )
    header = b"%PDF-1.4\n"
    objs: list[tuple[int, bytes]] = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, f"<< /Type /Pages /Kids [{' '.join(kids)}] /Count {len(kids)} >>".encode()),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ] + page_objs

    children: list[tuple[str, str]] = []
    if doc_id % 3 == 1:
        jpg = _tiny_jpeg(4 + doc_id % 13, 6 + doc_id % 7)
        objs.append((
            next_id,
            b"<< /Type /XObject /Subtype /Image /Width 4 /Height 6 "
            b"/ColorSpace /DeviceRGB /BitsPerComponent 8 /Filter "
            b"/DCTDecode /Length " + str(len(jpg)).encode()
            + b" >>\nstream\n" + jpg + b"\nendstream",
        ))
        children.append(("image-001.jpg", ""))  # binary child: no text

    out = io.BytesIO()
    out.write(header)
    offsets = {}
    for oid, body in objs:
        offsets[oid] = out.tell()
        out.write(f"{oid} 0 obj\n".encode() + body + b"\nendobj\n")
    xref_pos = out.tell()
    n = len(objs) + 1
    out.write(f"xref\n0 {n}\n".encode())
    out.write(b"0000000000 65535 f \n")
    for oid in range(1, n):
        out.write(f"{offsets[oid]:010d} 00000 n \n".encode())
    out.write(
        f"trailer\n<< /Size {n} /Root 1 0 R >>\nstartxref\n{xref_pos}\n%%EOF\n".encode()
    )
    return out.getvalue(), "\n\n".join(page_goldens), children


def render_tnef(doc_id: int, lang: str) -> tuple[bytes, str, list[tuple[str, str]]]:
    """winmail.dat via the [MS-OXTNEF] fixture writer; same golden
    contract as render_msg — body text is the digest text, attachments
    become children (the reference Tika-parses application/vnd.ms-tnef,
    _tika_mime_types.py:526)."""
    from .operators.tnef_extract import build_tnef

    rng = _rng(doc_id, 23)
    body = " ".join(_sentence(rng, lang) for _ in range(rng.randint(2, 4)))
    subject = f"Winmail {doc_id} " + " ".join(rng.sample(_WORDS, 2))
    sender = f"relay{doc_id % 17}@corp{doc_id % 5}.example"
    atts = []
    kids: list[tuple[str, str]] = []
    if doc_id % 2 == 0:
        att_text = " ".join(_sentence(rng, lang) for _ in range(2))
        atts.append((f"brief{doc_id % 7}.txt", att_text.encode("utf-8")))
        kids.append((f"brief{doc_id % 7}.txt", _golden_from_paragraphs([att_text])))
    body_mode = ("plain", "html", "rtf")[doc_id % 3]
    data = build_tnef(subject=subject, body=body, sender=sender,
                      attachments=atts, body_mode=body_mode,
                      date=(2019, 1 + doc_id % 12, 1 + doc_id % 28,
                            doc_id % 24, doc_id % 60, (doc_id * 7) % 60))
    return data, _golden_from_paragraphs([body]), kids


def render_msg(doc_id: int, lang: str) -> tuple[bytes, str, list[tuple[str, str]]]:
    """Outlook .msg via the from-scratch CFB writer; golden text is the
    normalize_text fixpoint of the body, attachments become children."""
    from .operators.msg_extract import build_msg

    rng = _rng(doc_id, 13)
    body = " ".join(_sentence(rng, lang) for _ in range(rng.randint(2, 4)))
    subject = f"Memo {doc_id} " + " ".join(rng.sample(_WORDS, 2))
    sender = f"boss{doc_id % 31}@corp{doc_id % 5}.example"
    to = [f"team{doc_id % 11}@corp{doc_id % 5}.example"]
    atts = []
    kids: list[tuple[str, str]] = []
    if doc_id % 3 == 0:
        att_text = " ".join(_sentence(rng, lang) for _ in range(2))
        atts.append((f"note{doc_id % 7}.txt", att_text.encode("utf-8")))
        kids.append((f"note{doc_id % 7}.txt", _golden_from_paragraphs([att_text])))
    # cycle the body storage Outlook actually uses: plain PidTagBody,
    # PidTagHtml, LZFu-compressed PidTagRtfCompressed — same golden text
    # whichever stream carries it
    body_mode = ("plain", "html", "rtf")[doc_id % 3]
    data = build_msg(subject=subject, body=body, sender=sender, to=to,
                     attachments=atts, body_mode=body_mode)
    return data, _golden_from_paragraphs([body]), kids


# ---------------------------------------------------------------------------
# office-document rendering (minimal OOXML / ODF containers)
# ---------------------------------------------------------------------------

_CONTENT_TYPES_DOCX = (
    '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/'
    'package/2006/content-types"><Default Extension="xml" ContentType="'
    'application/xml"/></Types>'
)


def _zip_bytes_of(members: list[tuple[str, bytes]]) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(zipfile.ZipInfo(name), data)
    return buf.getvalue()


def _xml_escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def office_dates_of(doc_id: int) -> tuple[str, str]:
    """Deterministic (created, modified) zulu strings for office docs."""
    created = EPOCH + timedelta(seconds=doc_id * 137)
    modified = created + timedelta(hours=1)
    fmt = "%Y-%m-%dT%H:%M:%SZ"
    return created.strftime(fmt), modified.strftime(fmt)


def _core_props_xml(doc_id: int) -> bytes:
    c, m = office_dates_of(doc_id)
    return (
        '<?xml version="1.0"?><cp:coreProperties xmlns:cp="http://schemas.'
        'openxmlformats.org/package/2006/metadata/core-properties" '
        'xmlns:dcterms="http://purl.org/dc/terms/" xmlns:xsi="http://www.'
        'w3.org/2001/XMLSchema-instance">'
        f'<dcterms:created xsi:type="dcterms:W3CDTF">{c}</dcterms:created>'
        f'<dcterms:modified xsi:type="dcterms:W3CDTF">{m}</dcterms:modified>'
        "</cp:coreProperties>"
    ).encode("utf-8")


def _odf_meta_xml(doc_id: int) -> bytes:
    c, m = office_dates_of(doc_id)
    return (
        '<?xml version="1.0"?><office:document-meta xmlns:office='
        '"urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:meta='
        '"urn:oasis:names:tc:opendocument:xmlns:meta:1.0" xmlns:dc='
        '"http://purl.org/dc/elements/1.1/"><office:meta>'
        f"<meta:creation-date>{c}</meta:creation-date><dc:date>{m}</dc:date>"
        "</office:meta></office:document-meta>"
    ).encode("utf-8")


def render_docx(doc_id: int, lang: str) -> tuple[bytes, str]:
    paras = paragraphs_of(doc_id, lang, 3)
    body = "".join(
        f"<w:p><w:r><w:t>{_xml_escape(p)}</w:t></w:r></w:p>" for p in paras
    )
    doc = (
        '<?xml version="1.0"?><w:document xmlns:w="http://schemas.'
        'openxmlformats.org/wordprocessingml/2006/main"><w:body>'
        f"{body}</w:body></w:document>"
    )
    data = _zip_bytes_of(
        [("[Content_Types].xml", _CONTENT_TYPES_DOCX.encode()),
         ("docProps/core.xml", _core_props_xml(doc_id)),
         ("word/document.xml", doc.encode("utf-8"))]
    )
    return data, _golden_from_paragraphs(paras)


def render_odt(doc_id: int, lang: str) -> tuple[bytes, str]:
    paras = paragraphs_of(doc_id, lang, 2)
    body = "".join(f"<text:p>{_xml_escape(p)}</text:p>" for p in paras)
    content = (
        '<?xml version="1.0"?><office:document-content xmlns:office='
        '"urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text='
        '"urn:oasis:names:tc:opendocument:xmlns:text:1.0"><office:body>'
        f"<office:text>{body}</office:text></office:body>"
        "</office:document-content>"
    )
    data = _zip_bytes_of(
        [("mimetype", b"application/vnd.oasis.opendocument.text"),
         ("meta.xml", _odf_meta_xml(doc_id)),
         ("content.xml", content.encode("utf-8"))]
    )
    return data, _golden_from_paragraphs(paras)


def render_ods(doc_id: int, lang: str) -> tuple[bytes, str]:
    """ODF spreadsheet: cell grid in content.xml; golden text is one
    block per row (ods_to_text's reading order)."""
    rng = _rng(doc_id, 17)
    rows = [
        [" ".join(rng.sample(_WORDS, 2)) for _ in range(rng.randint(2, 3))]
        for _ in range(rng.randint(2, 4))
    ]
    body = "".join(
        "<table:table-row>"
        + "".join(
            f"<table:table-cell><text:p>{_xml_escape(c)}</text:p>"
            "</table:table-cell>"
            for c in cells
        )
        + "</table:table-row>"
        for cells in rows
    )
    content = (
        '<?xml version="1.0"?><office:document-content xmlns:office='
        '"urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text='
        '"urn:oasis:names:tc:opendocument:xmlns:text:1.0" xmlns:table='
        '"urn:oasis:names:tc:opendocument:xmlns:table:1.0"><office:body>'
        '<office:spreadsheet><table:table table:name="Sheet1">'
        f"{body}</table:table></office:spreadsheet></office:body>"
        "</office:document-content>"
    )
    data = _zip_bytes_of(
        [("mimetype", b"application/vnd.oasis.opendocument.spreadsheet"),
         ("meta.xml", _odf_meta_xml(doc_id)),
         ("content.xml", content.encode("utf-8"))]
    )
    return data, _golden_from_paragraphs([" ".join(c) for c in rows])


def render_odp(doc_id: int, lang: str) -> tuple[bytes, str]:
    """ODF presentation: draw:page slides with text frames; golden text
    is one block per text:p in page order (odp_to_text)."""
    rng = _rng(doc_id, 19)
    pages = []
    goldens = []
    for _ in range(rng.randint(1, 3)):
        lines = [_sentence(rng, lang) for _ in range(rng.randint(1, 2))]
        frames = "".join(
            "<draw:frame><draw:text-box>"
            f"<text:p>{_xml_escape(t)}</text:p>"
            "</draw:text-box></draw:frame>"
            for t in lines
        )
        pages.append(f"<draw:page>{frames}</draw:page>")
        goldens.extend(lines)
    content = (
        '<?xml version="1.0"?><office:document-content xmlns:office='
        '"urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text='
        '"urn:oasis:names:tc:opendocument:xmlns:text:1.0" xmlns:draw='
        '"urn:oasis:names:tc:opendocument:xmlns:drawing:1.0"><office:body>'
        f"<office:presentation>{''.join(pages)}</office:presentation>"
        "</office:body></office:document-content>"
    )
    data = _zip_bytes_of(
        [("mimetype", b"application/vnd.oasis.opendocument.presentation"),
         ("meta.xml", _odf_meta_xml(doc_id)),
         ("content.xml", content.encode("utf-8"))]
    )
    return data, _golden_from_paragraphs(goldens)


def _ics_fold(line: str, width: int = 70) -> str:
    """RFC 5545 §3.1 folding: break every ``width`` chars, continuation
    lines start with one space."""
    parts = [line[i : i + width] for i in range(0, len(line), width)] or [""]
    return "\r\n ".join(parts)


def render_ics(doc_id: int, lang: str) -> tuple[bytes, str]:
    """Deterministic iCalendar file + expected extracted text: two
    VEVENTs with a folded SUMMARY (exercises §3.1 unfolding), escaped
    commas in DESCRIPTION (§3.3.11 TEXT), CN'd mailto ORGANIZER/ATTENDEE
    and UTC DATE-TIMEs (calendar_extract renders Y-M-DTH:M:SZ); CREATED/
    LAST-MODIFIED feed the digest's date_created/date_modified."""
    rng = _rng(doc_id, 31)
    cal = f"Calendar {doc_id}"
    raw = [
        "BEGIN:VCALENDAR",
        "VERSION:2.0",
        "PRODID:-//synthetic//corpus//EN",
        f"X-WR-CALNAME:{cal}",
    ]
    blocks = [f"Calendar: {cal}"]
    y, mo, d = 2020 + doc_id % 5, 1 + doc_id % 12, 1 + doc_id % 27
    created, modified = office_dates_of(doc_id)
    for i in range(2):
        summary = _sentence(rng, lang)
        loc = f"Room {doc_id % 50}-{i}"
        n_org = (doc_id + i) % 23
        n_att = (doc_id + i + 7) % 23
        start = f"{y:04d}{mo:02d}{d:02d}T{9 + i:02d}0000Z"
        end = f"{y:04d}{mo:02d}{d:02d}T{10 + i:02d}3000Z"
        desc_head = _sentence(rng, lang)
        raw += [
            "BEGIN:VEVENT",
            f"UID:{doc_id}-{i}@corpus.example",
            f"DTSTAMP:{start}",
            f"CREATED:{created.replace('-', '').replace(':', '')}",
            f"LAST-MODIFIED:{modified.replace('-', '').replace(':', '')}",
            _ics_fold(f"SUMMARY:{summary}"),
            f"DTSTART:{start}",
            f"DTEND:{end}",
            f"LOCATION:{loc}",
            f"ORGANIZER;CN=Person {n_org}:mailto:person{n_org}@example.com",
            f"ATTENDEE;CN=Person {n_att};ROLE=REQ-PARTICIPANT:"
            f"mailto:person{n_att}@example.com",
            _ics_fold(f"DESCRIPTION:{desc_head} Agenda: one\\, two\\, three."),
            "END:VEVENT",
        ]
        blocks += [
            f"Summary: {summary}",
            f"Dtstart: {y:04d}-{mo:02d}-{d:02d}T{9 + i:02d}:00:00Z",
            f"Dtend: {y:04d}-{mo:02d}-{d:02d}T{10 + i:02d}:30:00Z",
            f"Location: {loc}",
            f"Organizer: Person {n_org} <person{n_org}@example.com>",
            f"Attendee: Person {n_att} <person{n_att}@example.com>",
            f"Description: {desc_head} Agenda: one, two, three.",
        ]
    raw.append("END:VCALENDAR")
    data = "\r\n".join(raw).encode("utf-8") + b"\r\n"
    return data, _golden_from_paragraphs(blocks)


def render_vcf(doc_id: int, lang: str) -> tuple[bytes, str]:
    """Deterministic vCard file + expected extracted text: a 3.0 card
    with compound N/ORG/ADR values (components join with a space) and a
    legacy 2.1-style QUOTED-PRINTABLE NOTE with a soft line break —
    the two grammar quirks calendar_extract must stitch and decode."""
    n = doc_id % 23
    unit = ["R&D", "Sales", "Ops"][doc_id % 3]
    note_head = f"Caf=C3=A9 notes for doc {doc_id} part one "
    raw = [
        "BEGIN:VCARD",
        "VERSION:3.0",
        f"FN:Person {n}",
        f"N:Last{n};First{n};;;",
        f"ORG:Acme {doc_id % 10};{unit}",
        f"TITLE:Engineer {doc_id % 5}",
        f"EMAIL;TYPE=WORK:person{n}@example.com",
        f"TEL;TYPE=CELL:+1-555-{doc_id % 10000:04d}",
        "ADR;TYPE=HOME:;;12 Main St;Springfield;;12345;US",
        f"NOTE;ENCODING=QUOTED-PRINTABLE:{note_head}=",
        "part two.",
        "END:VCARD",
    ]
    blocks = [
        f"Name: Person {n}",
        f"Structured name: Last{n} First{n}",
        f"Organization: Acme {doc_id % 10} {unit}",
        f"Title: Engineer {doc_id % 5}",
        f"Email (work): person{n}@example.com",
        f"Phone (cell): +1-555-{doc_id % 10000:04d}",
        "Address (home): 12 Main St Springfield 12345 US",
        f"Note: Café notes for doc {doc_id} part one part two.",
    ]
    data = "\r\n".join(raw).encode("utf-8") + b"\r\n"
    return data, _golden_from_paragraphs(blocks)


def render_epub(doc_id: int, lang: str) -> tuple[bytes, str]:
    """EPUB (OCF/OPF zip): container.xml → OPF manifest/spine → xhtml
    chapters; golden is the chapters' paragraph text in spine order
    (epub_to_text runs every chapter through the html block extractor,
    and plain <p> paragraphs survive block scoring verbatim)."""
    rng = _rng(doc_id, 23)
    n_chapters = rng.randint(1, 3)
    chapters = []
    chapter_paras = []
    for c in range(n_chapters):
        paras = [_sentence(rng, lang) for _ in range(rng.randint(1, 2))]
        body = "".join(f"<p>{_xml_escape(p)}</p>" for p in paras)
        chapters.append(
            f'<?xml version="1.0" encoding="utf-8"?>'
            f'<html xmlns="http://www.w3.org/1999/xhtml"><head>'
            f"<title>Chapter {c}</title></head><body>{body}</body></html>"
        )
        chapter_paras.append(paras)
    manifest = "".join(
        f'<item id="ch{c}" href="ch{c}.xhtml" '
        'media-type="application/xhtml+xml"/>'
        for c in range(n_chapters)
    )
    # spine order deliberately reversed for odd ids: extraction must
    # follow the SPINE, not the zip member order
    order = list(range(n_chapters))
    if doc_id % 2 == 1:
        order = order[::-1]
    spine = "".join(f'<itemref idref="ch{c}"/>' for c in order)
    goldens = [p for c in order for p in chapter_paras[c]]
    opf = (
        '<?xml version="1.0"?><package xmlns="http://www.idpf.org/2007/opf" '
        'version="3.0" unique-identifier="uid"><metadata xmlns:dc='
        '"http://purl.org/dc/elements/1.1/"><dc:title>'
        f"Book {doc_id}</dc:title><dc:date>"
        f"{office_dates_of(doc_id)[0]}</dc:date>"
        '<meta property="dcterms:modified">'
        f"{office_dates_of(doc_id)[1]}</meta></metadata>"
        f"<manifest>{manifest}</manifest><spine>{spine}</spine></package>"
    )
    container = (
        '<?xml version="1.0"?><container version="1.0" xmlns='
        '"urn:oasis:names:tc:opendocument:xmlns:container"><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/></rootfiles></container>'
    )
    members = [
        ("mimetype", b"application/epub+zip"),
        ("META-INF/container.xml", container.encode("utf-8")),
        ("OEBPS/content.opf", opf.encode("utf-8")),
    ] + [
        (f"OEBPS/ch{c}.xhtml", chapters[c].encode("utf-8"))
        for c in range(n_chapters)
    ]
    return _zip_bytes_of(members), _golden_from_paragraphs(goldens)


def render_pptx(doc_id: int, lang: str) -> tuple[bytes, str]:
    rng = _rng(doc_id, 11)
    slides = []
    goldens = []
    for s in range(rng.randint(1, 3)):
        lines = [" ".join(_sentence(rng, lang) for _ in range(1))
                 for _ in range(rng.randint(1, 3))]
        body = "".join(
            f"<a:p><a:r><a:t>{_xml_escape(t)}</a:t></a:r></a:p>" for t in lines
        )
        slides.append(
            '<?xml version="1.0"?><p:sld xmlns:p="http://schemas.'
            'openxmlformats.org/presentationml/2006/main" xmlns:a="http://'
            'schemas.openxmlformats.org/drawingml/2006/main">'
            f"<p:cSld>{body}</p:cSld></p:sld>"
        )
        goldens.extend(lines)
    members = [("[Content_Types].xml", _CONTENT_TYPES_DOCX.encode()),
               ("docProps/core.xml", _core_props_xml(doc_id)),
               ("ppt/presentation.xml", b'<?xml version="1.0"?><p/>')]
    for i, s in enumerate(slides, 1):
        members.append((f"ppt/slides/slide{i}.xml", s.encode("utf-8")))
    return _zip_bytes_of(members), _golden_from_paragraphs(goldens)


def _xlsx_table_data(doc_id: int) -> tuple[list, list, list, dict]:
    """(cols, rows, child goldens, table info) — shared by the xlsx
    renderer and the encrypted legacy-.xls slice so the two can never
    diverge."""
    rng = _rng(doc_id, 12)
    ncols, nrows = rng.randint(2, 4), rng.randint(3, 8)
    cols = [f"h{c}" for c in range(1, ncols + 1)]
    rows = [[f"x{doc_id % 50}r{r}c{c}" for c in range(1, ncols + 1)]
            for r in range(1, nrows + 1)]
    children = [
        (f"{i}.txt", " ".join(f"{k} = {v}" for k, v in zip(cols, row)))
        for i, row in enumerate(rows, start=1)
    ]
    info = {"table-columns": cols, "table-row-count": nrows + 1,
            "table-col-count": ncols}
    return cols, rows, children, info


def render_xlsx(doc_id: int) -> tuple[bytes, list[tuple[str, str]], dict]:
    cols, rows, children, info = _xlsx_table_data(doc_id)
    ncols, nrows = len(cols), len(rows)
    strings = cols + [v for row in rows for v in row]
    shared = "".join(f"<si><t>{_xml_escape(s)}</t></si>" for s in strings)
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/'
        f'spreadsheetml/2006/main">{shared}</sst>'
    )
    idx = 0
    sheet_rows = []
    for r in range(nrows + 1):
        cells = "".join(
            f'<c r="{chr(65 + c)}{r + 1}" t="s"><v>{idx + c}</v></c>'
            for c in range(ncols)
        )
        sheet_rows.append(f'<row r="{r + 1}">{cells}</row>')
        idx += ncols
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        f'{"".join(sheet_rows)}</sheetData></worksheet>'
    )
    data = _zip_bytes_of(
        [("[Content_Types].xml", _CONTENT_TYPES_DOCX.encode()),
         ("docProps/core.xml", _core_props_xml(doc_id)),
         ("xl/workbook.xml", b'<?xml version="1.0"?><workbook/>'),
         ("xl/sharedStrings.xml", sst.encode("utf-8")),
         ("xl/worksheets/sheet1.xml", sheet.encode("utf-8"))]
    )
    return data, children, info


# ---------------------------------------------------------------------------
# archive rendering
# ---------------------------------------------------------------------------


def render_zip(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """zip with 2-4 members (txt + html); ~1 in 4 contains a nested zip."""
    rng = _rng(doc_id, 8)
    members: list[tuple[str, bytes]] = []
    children: list[tuple[str, str]] = []
    for i in range(rng.randint(2, 3)):
        body = " ".join(_sentence(rng, lang) for _ in range(2))
        members.append((f"docs/file{i}.txt", body.encode("utf-8")))
        children.append((f"docs/file{i}.txt", _golden_from_paragraphs([body])))
    if doc_id % 4 == 0:
        inner_body = " ".join(_sentence(rng, lang) for _ in range(2))
        ibuf = io.BytesIO()
        with zipfile.ZipFile(ibuf, "w", zipfile.ZIP_STORED) as zi:
            zi.writestr(zipfile.ZipInfo("inner.txt"), inner_body.encode("utf-8"))
        members.append(("nested.zip", ibuf.getvalue()))
        children.append(("nested.zip", ""))  # container child: no own text
        children.append(("nested.zip//inner.txt", _golden_from_paragraphs([inner_body])))
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in members:
            zf.writestr(zipfile.ZipInfo(name), data)
    return buf.getvalue(), children


def _add_vba_project(docx_bytes: bytes, doc_id: int) -> tuple[bytes, list[tuple[str, str]]]:
    """docx -> docm: inject a deterministic vbaProject.bin; children are
    the macro module sources under the ``macros/<name>.bas`` convention."""
    import io as _io
    import zipfile as _zipfile

    from .functions.textutils import normalize_text
    from .operators.vba_extract import build_vba_project

    mods = []
    kids: list[tuple[str, str]] = []
    for i in range(1 + doc_id % 2):
        src = (f"Sub Auto{i}()\r\n    Total{i} = {doc_id * 3 + i}\r\n"
               f"End Sub\r\n")
        mods.append((f"Module{i}", src))
        kids.append((f"macros/Module{i}.bas", normalize_text(src) or ""))
    out = _io.BytesIO()
    with _zipfile.ZipFile(_io.BytesIO(docx_bytes)) as zin, \
         _zipfile.ZipFile(out, "w") as zout:
        for n in zin.namelist():
            zout.writestr(_zipfile.ZipInfo(n), zin.read(n))
        zout.writestr(_zipfile.ZipInfo("word/vbaProject.bin"),
                      build_vba_project(mods))
    return out.getvalue(), kids


def render_vsdx(doc_id: int, lang: str) -> tuple[bytes, str]:
    """Visio OPC drawing: 1-2 pages of shape texts; golden is the
    paragraphs (one per shape) in page order."""
    from .operators.visio_extract import build_vsdx

    rng = _rng(doc_id, 30)
    pages = []
    paras: list[str] = []
    for _p in range(1 + doc_id % 2):
        shapes = [
            " ".join(_sentence(rng, lang) for _ in range(1))
            for _ in range(rng.randint(1, 3))
        ]
        pages.append(shapes)
        paras.extend(shapes)
    blob = build_vsdx(
        pages,
        extra_members=[("docProps/core.xml", _core_props_xml(doc_id))],
    )
    return blob, _golden_from_paragraphs(paras)


def render_uuencode(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """uuencoded text payload(s); every third doc carries two blocks."""
    from .operators.legacy_encodings import build_uuencode

    rng = _rng(doc_id, 24)
    files = []
    children: list[tuple[str, str]] = []
    for i in range(2 if doc_id % 3 == 0 else 1):
        body = " ".join(_sentence(rng, lang) for _ in range(2))
        files.append((f"note{i}.txt", body.encode("utf-8")))
        children.append((f"note{i}.txt", _golden_from_paragraphs([body])))
    return build_uuencode(files), children


def render_binhex(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """BinHex 4.0 wrapping a text data fork (resource fork empty so the
    golden children stay text-only)."""
    from .operators.legacy_encodings import build_binhex

    rng = _rng(doc_id, 25)
    body = " ".join(_sentence(rng, lang) for _ in range(rng.randint(2, 3)))
    name = f"Classic Report {doc_id % 11}.txt"
    blob = build_binhex(name, body.encode("utf-8"),
                        ftype=b"TEXT", creator=b"ttxt")
    return blob, [(name, _golden_from_paragraphs([body]))]


def render_applefile(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """AppleSingle wrapping a text data fork with file dates."""
    from .operators.legacy_encodings import build_applefile

    rng = _rng(doc_id, 26)
    body = " ".join(_sentence(rng, lang) for _ in range(2))
    name = f"Mac Notes {doc_id % 13}.txt"
    blob = build_applefile(name, body.encode("utf-8"),
                           dates=(doc_id * 100, doc_id * 100 + 86400))
    return blob, [(name, _golden_from_paragraphs([body]))]


def render_onenote(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """OneNote section with 1-2 embedded text payloads
    ([MS-ONESTORE] FileDataStoreObject walk; children are positional)."""
    from .operators.onenote_extract import build_onenote

    rng = _rng(doc_id, 27)
    payloads = []
    children: list[tuple[str, str]] = []
    for i in range(1 + doc_id % 2):
        body = " ".join(_sentence(rng, lang) for _ in range(2))
        payloads.append(body.encode("utf-8"))
        children.append((f"embedded{i}", _golden_from_paragraphs([body])))
    blob = build_onenote(payloads, filler=bytes([doc_id % 256]) * (doc_id % 40))
    return blob, children


def render_chm(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """CHM compiled help with 1-2 text topics through the in-repo LZX
    compressor; member digests carry the topic text."""
    from .operators.chm_extract import build_chm

    rng = _rng(doc_id, 32)
    members = []
    children: list[tuple[str, str]] = []
    for i in range(1 + doc_id % 2):
        body = " ".join(_sentence(rng, lang) for _ in range(2))
        members.append((f"topic{i}.txt", body.encode("utf-8")))
        children.append((f"topic{i}.txt", _golden_from_paragraphs([body])))
    children.sort(key=lambda c: c[0])
    return build_chm(members), children


def render_cab(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """Cabinet with 1-3 text members; method cycles none/MSZIP/LZX."""
    from .operators.cab_extract import build_cab

    rng = _rng(doc_id, 33)
    members = []
    children: list[tuple[str, str]] = []
    for i in range(1 + doc_id % 3):
        body = " ".join(_sentence(rng, lang) for _ in range(2))
        members.append((f"files/doc{i}.txt", body.encode("utf-8")))
        children.append((f"files/doc{i}.txt",
                         _golden_from_paragraphs([body])))
    method = ("none", "mszip", "lzx")[doc_id % 3]
    return build_cab(members, method), children


def render_targz(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    rng = _rng(doc_id, 9)
    members = []
    children = []
    for i in range(rng.randint(2, 4)):
        body = " ".join(_sentence(rng, lang) for _ in range(2))
        members.append((f"data/part{i}.txt", body.encode("utf-8")))
        children.append((f"data/part{i}.txt", _golden_from_paragraphs([body])))
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 1704067200  # fixed for determinism
            tf.addfile(info, io.BytesIO(data))
    return buf.getvalue(), children


def _text_members(
    doc_id: int, lang: str, salt: int, prefix: str
) -> tuple[list[tuple[str, bytes]], list[tuple[str, str]]]:
    rng = _rng(doc_id, salt)
    members, children = [], []
    for i in range(rng.randint(2, 4)):
        body = " ".join(_sentence(rng, lang) for _ in range(2))
        members.append((f"{prefix}{i}.txt", body.encode("utf-8")))
        children.append((f"{prefix}{i}.txt", _golden_from_paragraphs([body])))
    return members, children


def render_cpio(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """cpio cycling the three dialects (newc/odc/old-binary) — the
    reference 7z-extracts .cpio (archives.py accepted extensions)."""
    from .operators.unix_archives import build_cpio

    members, children = _text_members(doc_id, lang, 23, "files/entry")
    fmt = ("newc", "odc", "bin")[doc_id % 3]
    return build_cpio(members, fmt), children


def render_deb(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """Debian package shape: ar(debian-binary, control.tar.gz,
    data.tar.gz) — the nested tars are containers the pipeline recurses
    into on the next round."""
    from .operators.unix_archives import build_ar

    def _tgz(pairs):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w:gz") as tf:
            for name, data in pairs:
                info = tarfile.TarInfo(name)
                info.size = len(data)
                info.mtime = 1704067200
                tf.addfile(info, io.BytesIO(data))
        return buf.getvalue()

    rng = _rng(doc_id, 24)
    # colon-free on purpose: a "Package: x" line sniffs as a ':'-delimited
    # CSV (faithful to the reference, whose CSV_DELIMITER_LIST includes
    # ':') and would table-explode instead of extracting as text
    control = f"Package demo{doc_id} Version 1.{doc_id % 10}"
    body = " ".join(_sentence(rng, lang) for _ in range(2))
    data = build_ar([
        ("debian-binary", b"2.0"),
        ("control.tar.gz", _tgz([("control", control.encode("utf-8"))])),
        ("data.tar.gz", _tgz([("usr/doc/readme.txt", body.encode("utf-8"))])),
    ])
    children = [
        ("debian-binary", _golden_from_paragraphs(["2.0"])),
        ("control.tar.gz", ""),
        ("control.tar.gz//control", _golden_from_paragraphs([control])),
        ("data.tar.gz", ""),
        ("data.tar.gz//usr/doc/readme.txt", _golden_from_paragraphs([body])),
    ]
    return data, children


def render_rpm(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """RPM with a compressed-cpio payload; the payload compressor cycles
    gzip/xz/bzip2 (sniffed from the payload magic, as in production)."""
    from .operators.unix_archives import build_rpm

    members, children = _text_members(doc_id, lang, 25, "usr/share/note")
    comp = ("gzip", "xz", "bzip2")[doc_id % 3]
    return build_rpm(members, comp), children


def render_tarz(doc_id: int, lang: str) -> tuple[bytes, list[tuple[str, str]]]:
    """tar.Z — compress(1) LZW over a tar; the .Z dispatch recurses into
    the tar inline, like .tar.gz."""
    from .operators.unix_archives import compress_z

    members, children = _text_members(doc_id, lang, 26, "old/part")
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mtime = 1704067200
            tf.addfile(info, io.BytesIO(data))
    return compress_z(buf.getvalue()), children


# ---------------------------------------------------------------------------
# per-doc assembly
# ---------------------------------------------------------------------------


def build_doc(doc_id: int) -> dict:
    """One pages row + its expected digest rows (self + children)."""
    cat = category_of(doc_id)
    lang = lang_of(doc_id)
    ext = {
        "html-article": "html", "html-bad-encoding": "html",
        "oversized-html": "html", "plain-text": "txt", "eml": "eml",
        "mbox": "mbox", "csv-table": "csv", "zip": "zip",
        "targz": "tar.gz", "pdf-minimal": "pdf", "binary-skip": "bin",
        "docx": "docx", "odt": "odt", "pptx": "pptx", "xlsx": "xlsx",
        "msg": "msg", "doc-legacy": "doc", "ppt-legacy": "ppt",
        "pst": "pst", "sevenzip": "7z",
    }[cat]
    if cat == "xlsx" and doc_id % 4 == 3:
        ext = "xls"  # the encrypted legacy BIFF8 slice
    url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
    warc_ts = EPOCH + timedelta(seconds=doc_id * 137)
    children: list[tuple[str, str]] = []
    extra: dict = {}

    if cat in ("html-article", "oversized-html"):
        paras = paragraphs_of(doc_id, lang)
        sidebar = doc_id % 10 == 0
        repeat = 1
        if cat == "oversized-html":
            base = render_html(doc_id, paras, sidebar=sidebar, repeat=1)
            repeat = max(2, (2 * 2**20) // max(len(base), 1))
        html = render_html(doc_id, paras, sidebar=sidebar, repeat=repeat).encode("utf-8")
        golden = _golden_from_paragraphs(paras * repeat)
    elif cat == "html-bad-encoding":
        paras = ["Curly “quotes” and em—dash " + p for p in paragraphs_of(doc_id, lang, 2)]
        variant = doc_id % 3
        if variant == 0:  # correct meta tag
            html = render_html(doc_id, paras, charset="windows-1252").encode(
                "cp1252", errors="replace"
            )
            golden_paras = [
                p.encode("cp1252", errors="replace").decode("cp1252") for p in paras
            ]
        elif variant == 1:  # missing meta → bytes read as iso-8859-1
            html = render_html(doc_id, paras, charset=None).encode(
                "cp1252", errors="replace"
            )
            golden_paras = [
                p.encode("cp1252", errors="replace").decode("iso-8859-1") for p in paras
            ]
        else:  # wrong meta (claims utf-8, is cp1252) → mojibake via replace
            html = render_html(doc_id, paras, charset="utf-8").encode(
                "cp1252", errors="replace"
            )
            golden_paras = [
                p.encode("cp1252", errors="replace").decode("utf-8", errors="replace")
                for p in paras
            ]
        golden = _golden_from_paragraphs(golden_paras)
    elif cat == "plain-text":
        # the line-oriented text family cycles by doc_id: plain text /
        # iCalendar / vCard (the reference Tika-extracts text/calendar
        # and text/x-vcard, _tika_mime_types.py:1350,1469-1470)
        txt_kind = doc_id % 4
        if txt_kind == 1:
            html, golden = render_ics(doc_id, lang)
            ext = "ics"
        elif txt_kind == 2:
            html, golden = render_vcf(doc_id, lang)
            ext = "vcf"
        else:
            paras = paragraphs_of(doc_id, lang, 3)
            raw = "\n\n".join(paras)
            html = raw.encode("utf-8")
            golden = _golden_from_paragraphs(paras)
        url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
    elif cat == "eml":
        html, golden, atts = render_eml(doc_id, lang)
        children = [(name, g) for name, _, g in atts]
    elif cat == "mbox":
        html, kids = render_mbox(doc_id, lang)
        children = kids
        golden = ""
    elif cat == "csv-table":
        # table family: csv plus a dBase .dbf leg every 7th doc
        # (Tika-accepted application/x-dbf, _tika_mime_types.py:863)
        if doc_id % 7 == 3:
            html, kids, info = render_dbf(doc_id)
            ext = "dbf"
            url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
        elif doc_id % 7 == 5:
            html, kids, info = render_wk1(doc_id)
            ext = "wk1"
            url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
        elif doc_id % 7 == 1:
            html, kids, info = render_sqlite(doc_id)
            ext = "db"
            url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
        else:
            html, kids, info = render_csv(doc_id)
        children = kids
        extra.update(info)
        golden = ""
    elif cat == "zip":
        # container family cycles by doc_id: zip plus the three legacy
        # transfer encodings the reference Tika-accepts (uuencode :1465,
        # mac-binhex40 :86, applefile :7 in _tika_mime_types.py)
        arc_kind = doc_id % 8
        if arc_kind == 1:
            html, kids = render_uuencode(doc_id, lang)
            ext = "uu"
        elif arc_kind == 2:
            html, kids = render_binhex(doc_id, lang)
            ext = "hqx"
        elif arc_kind == 5:
            html, kids = render_applefile(doc_id, lang)
            ext = "as"
        elif arc_kind == 6:
            html, kids = render_onenote(doc_id, lang)
            ext = "one"
        elif arc_kind == 3:
            html, kids = render_chm(doc_id, lang)
            ext = "chm"
        elif arc_kind == 7:
            html, kids = render_cab(doc_id, lang)
            ext = "cab"
        else:
            html, kids = render_zip(doc_id, lang)
        children = kids
        golden = ""
        url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
    elif cat == "targz":
        # Unix-container family cycles by doc_id: tar.gz plus the four
        # formats the reference 7z-extracts (archives.py:41-55) that
        # operators/unix_archives reads natively
        arc_kind = doc_id % 5
        if arc_kind == 1:
            html, kids = render_cpio(doc_id, lang)
            ext = "cpio"
        elif arc_kind == 2:
            html, kids = render_deb(doc_id, lang)
            ext = "deb"
        elif arc_kind == 3:
            html, kids = render_rpm(doc_id, lang)
            ext = "rpm"
        elif arc_kind == 4:
            html, kids = render_tarz(doc_id, lang)
            ext = "tar.Z"
        else:
            html, kids = render_targz(doc_id, lang)
        children = kids
        golden = ""
        url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
    elif cat == "pdf-minimal":
        html, golden, children = render_pdf(doc_id, lang)
    elif cat == "docx":
        html, golden = render_docx(doc_id, lang)
        if doc_id % 6 == 5:
            # macro-enabled variant: same document body plus a
            # vbaProject.bin whose module sources fan out as children
            # ([MS-OVBA]; reference Tika list :499-532)
            html, kids = _add_vba_project(html, doc_id)
            children = kids
            ext = "docm"
            url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
    elif cat == "odt":
        # the zip-of-XML document family under one category: ODF text /
        # spreadsheet / presentation + EPUB cycle by doc_id (reference
        # covers all four via Tika's mime list, _tika_mime_types.py;
        # epub also in its archive extension set, archives.py:54)
        odf_kind = doc_id % 8
        if odf_kind in (1, 5):
            html, golden = render_ods(doc_id, lang)
            ext = "ods"
        elif odf_kind in (2, 6):
            html, golden = render_odp(doc_id, lang)
            ext = "odp"
        elif odf_kind in (3, 7):
            html, golden = render_epub(doc_id, lang)
            ext = "epub"
        elif odf_kind == 4:
            # Visio OPC drawing (Tika :527) joins the zip-of-XML family
            html, golden = render_vsdx(doc_id, lang)
            ext = "vsdx"
        else:
            html, golden = render_odt(doc_id, lang)
        url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
    elif cat == "pptx":
        html, golden = render_pptx(doc_id, lang)
    elif cat == "xlsx":
        if doc_id % 4 == 3:
            # every fourth spreadsheet is a LEGACY BIFF8 .xls sealed with
            # the FILEPASS RC4 VelvetSweatshop default — same table
            # content (shared generator), decryption transparent e2e
            from .operators.xls_crypto import encrypt_xls
            from .operators.xls_extract import build_xls

            cols, rows, children, info = _xlsx_table_data(doc_id)
            html = encrypt_xls(
                build_xls(cols, rows), "VelvetSweatshop",
                variant=("rc4" if doc_id % 2 == 0 else "capi"),
                key_bits=(40, 128)[(doc_id // 2) % 2])
            extra.update(info)
        else:
            html, kids, info = render_xlsx(doc_id)
            children = kids
            extra.update(info)
        golden = ""
    elif cat == "msg":
        # Outlook family cycles by doc_id: native .msg plus the TNEF
        # winmail.dat encapsulation every fourth doc
        if doc_id % 4 == 3:
            html, golden, kids = render_tnef(doc_id, lang)
            ext = "dat"
            url = f"https://site{doc_id % 97}.example/{cat}/{doc_id}.{ext}"
        else:
            html, golden, kids = render_msg(doc_id, lang)
        children = kids
    elif cat == "doc-legacy":
        from .operators.doc_extract import build_doc_file

        paras = paragraphs_of(doc_id, lang, 3)
        # compressed pieces are cp1252; only use them when lossless
        try:
            "\r".join(paras).encode("cp1252")
            compressed = doc_id % 2 == 0
        except UnicodeEncodeError:
            compressed = False
        html = build_doc_file(paras, compressed=compressed)
        if doc_id % 3 == 2:
            # every third legacy doc is RC4-encrypted with the
            # VelvetSweatshop default ([MS-DOC] §2.2.6) — decryption must
            # be transparent end-to-end, so the golden text is unchanged
            from .operators.doc_crypto import encrypt_doc

            html = encrypt_doc(
                html, "VelvetSweatshop",
                variant=("rc4" if doc_id % 2 == 0 else "capi"),
                key_bits=(40, 128)[(doc_id // 2) % 2])
        golden = _golden_from_paragraphs(paras)
    elif cat == "sevenzip":
        from .operators.sevenzip_extract import build_7z

        rng = _rng(doc_id, 14)
        members = []
        children = []
        for i in range(rng.randint(2, 4)):
            body = " ".join(_sentence(rng, lang) for _ in range(2))
            members.append((f"docs/file{i}.txt", body.encode("utf-8")))
            children.append((f"docs/file{i}.txt",
                             _golden_from_paragraphs([body])))
        # rotate containers/codecs so the golden corpus exercises plain,
        # LZMA2 and BCJ 7z folders plus both RAR generations end-to-end
        if doc_id % 5 == 4:
            from .operators.rar_extract import build_rar4, build_rar5

            build_rar = build_rar5 if doc_id % 2 else build_rar4
            html = build_rar(members)
        else:
            codec = ("lzma2", "copy", "bcj_lzma2", "bcj2_lzma2")[doc_id % 4]
            html = build_7z(members, codec=codec)
        golden = ""
    elif cat == "pst":
        from .operators.pst_extract import build_pst

        rng = _rng(doc_id, 13)
        msgs = []
        children = []
        for i in range(rng.randint(1, 3)):
            body_paras = [_sentence(rng, lang) for _ in range(2)]
            msg = {
                "subject": f"Msg {doc_id}-{i}",
                "body": "\n\n".join(body_paras),
                "sender_name": f"user{doc_id % 7}",
                "sender_email": f"user{doc_id % 7}@host{doc_id % 3}.example",
                "to": f"dest{i}@recv{doc_id % 5}.example",
                "when": EPOCH + timedelta(seconds=doc_id * 137 + i * 3600),
            }
            # first message of every third pst carries an attachment —
            # exercises the NID_TYPE_ATTACHMENT walk + email re-explode.
            # A text/plain part contributes to the .eml's own text too
            # (email_meta joins every text part, like the reference).
            eml_paras = list(body_paras)
            if i == 0 and doc_id % 3 == 0:
                att_text = " ".join(_sentence(rng, lang) for _ in range(2))
                msg["attachments"] = [{
                    "name": f"att{doc_id % 5}.txt",
                    "mime": "text/plain",
                    "data": att_text.encode("utf-8"),
                }]
                eml_paras.append(att_text)
                children.append((
                    f"Inbox/{i + 1}.eml//att{doc_id % 5}.txt",
                    _golden_from_paragraphs([att_text]),
                ))
            children.append((f"Inbox/{i + 1}.eml",
                             _golden_from_paragraphs(eml_paras)))
            msgs.append(msg)
        # odd docs write NDB_CRYPT_PERMUTE (Outlook's real-world default)
        # and every fifth-ish PST is the 32-bit ANSI format, so the golden
        # corpus exercises the §5.1 decode and both NDB layouts end-to-end
        html = build_pst({"Inbox": msgs}, crypt=doc_id % 2,
                         ansi=doc_id % 5 == 2)
        golden = ""
    elif cat == "ppt-legacy":
        from .operators.ppt_extract import build_ppt

        paras = paragraphs_of(doc_id, lang, 3)
        if doc_id % 3 == 2:
            # every third legacy deck is persist-object-RC4 encrypted
            # with the VelvetSweatshop default ([MS-PPT] §2.3.5)
            from .operators.ppt_crypto import build_encrypted_ppt

            html = build_encrypted_ppt(
                paras, "VelvetSweatshop", key_bits=(40, 128)[doc_id % 2])
        else:
            html = build_ppt(paras)
        golden = _golden_from_paragraphs(paras)
    elif cat == "binary-skip":
        rng = _rng(doc_id, 10)
        html = bytes([0]) + rng.randbytes(256) + bytes([0])
        golden = ""
    else:  # pragma: no cover
        raise AssertionError(cat)

    # ~5% duplicate payloads: reuse a canonical small doc's bytes
    # (reference duplicates/ fixtures, test_blobs.py:69-72)
    if cat == "html-article" and doc_id % 20 == 19 and doc_id >= 40:
        twin = build_doc(_TWINS[doc_id % 17])
        html, golden, lang = twin["html"], twin["text"], twin["lang"]

    date_created = date_modified = None
    # legacy BIFF8 .xls (the doc_id % 4 == 3 slice) carries no docProps
    if cat in ("docx", "odt", "pptx") or (cat == "xlsx" and doc_id % 4 != 3):
        date_created, date_modified = office_dates_of(doc_id)

    return {
        "doc_id": doc_id,
        "url": url,
        "warc_ts": warc_ts,
        "html": html,
        "text": golden,
        "lang": lang,
        "category": cat,
        "children": children,
        "extra": extra,
        "date_created": date_created,
        "date_modified": date_modified,
    }


def golden_rows(doc: dict) -> list[dict]:
    """expected_digests rows for a doc: itself + its direct/nested children."""
    rows = [
        {
            "url": doc["url"],
            "sha3_256": hashlib.sha3_256(doc["html"]).hexdigest(),
            "md5": hashlib.md5(doc["html"]).hexdigest(),
            "text": doc["text"],
            "lang": doc["lang"],
            "category": doc["category"],
            "is_container": bool(doc["children"]),
            "parent_url": None,
            "date_created": doc["date_created"],
            "date_modified": doc["date_modified"],
        }
    ]
    for name, child_golden in doc["children"]:
        rows.append(
            {
                "url": f"{doc['url']}//{name}",
                "sha3_256": None,  # child bytes hashed by the pipeline
                "md5": None,
                "text": child_golden,
                "lang": doc["lang"],
                "category": doc["category"] + "-child",
                "is_container": name.endswith((".zip", ".tar.gz")),
                "parent_url": doc["url"],
                "date_created": None,
                "date_modified": None,
            }
        )
    return rows


PAGES_PA_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def generate_pages_spark(spark, n_docs: int, out_dir: str) -> str:
    """Distributed corpus generation for bench scale: build_doc is pure
    per-id, so spark.range → mapInPandas parallelizes it perfectly.
    Writes pages.parquet (no golden table — bench only) and returns its path.
    """
    import os

    import pandas as pd

    out = os.path.join(out_dir, "pages.parquet")
    if os.path.exists(out):
        return out

    def gen(batches):
        for pdf in batches:
            rows = [build_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame(
                {
                    "url": [d["url"] for d in rows],
                    "warc_ts": [d["warc_ts"] for d in rows],
                    "html": [d["html"] for d in rows],
                    "text": [d["text"] for d in rows],
                    "lang": [d["lang"] for d in rows],
                }
            )

    parallelism = spark.sparkContext.defaultParallelism
    (
        spark.range(n_docs)
        .repartition(parallelism * 2)
        .mapInPandas(
            gen,
            schema="url string, warc_ts timestamp, html binary, "
                   "text string, lang string",
        )
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def generate_pages(n_docs: int, out_dir: str, start_id: int = 0) -> tuple[str, str]:
    """Write pages.parquet + expected_digests.parquet under out_dir.

    Returns (pages_path, golden_path).  Deterministic for any (n, start).
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    docs = [build_doc(i) for i in range(start_id, start_id + n_docs)]

    pages = pa.Table.from_pydict(
        {
            "url": [d["url"] for d in docs],
            "warc_ts": [d["warc_ts"] for d in docs],
            "html": [d["html"] for d in docs],
            "text": [d["text"] for d in docs],
            "lang": [d["lang"] for d in docs],
        },
        schema=PAGES_PA_SCHEMA,
    )
    pages_path = os.path.join(out_dir, "pages.parquet")
    pq.write_table(pages, pages_path)

    grows = [r for d in docs for r in golden_rows(d)]
    golden = pa.Table.from_pylist(grows)
    golden_path = os.path.join(out_dir, "expected_digests.parquet")
    pq.write_table(golden, golden_path)
    return pages_path, golden_path
