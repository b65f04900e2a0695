"""Office-document text extraction (docx / odt / pptx / xlsx-lite).

The reference sends these to Apache Tika over HTTP (tika.py:137-145,
mime list _tika_mime_types.py).  OOXML and ODF are zip-of-XML formats
(public ECMA-376 / OASIS ODF specs), so the text layer is extractable with
the stdlib: unzip in memory, parse the body XML, walk paragraph/run/cell
elements.  This covers the reference's `doc`/`ppt`/`xls` filetype classes
without the Tika service.

Extraction rules (pinned; the regression oracle is the synthetic corpus):

- docx: one block per <w:p>, runs <w:t> concatenated, tabs→space;
  blocks joined '\\n\\n' then normalized (NFC + fold),
- odt:  one block per <text:p>/<text:h> in content.xml,
- pptx: one block per <a:p> across slide*.xml in document order,
- xlsx: sheet1 cells resolved against sharedStrings; emits the same
  table-info + 'col = value' row children as the csv path
  (archives.py:206-234 analog).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

from ..functions.textutils import normalize_text

#: zip-member fingerprints → OOXML/ODF mime types (sniff layer)
OOXML_DOCX = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
OOXML_XLSX = "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet"
OOXML_PPTX = "application/vnd.openxmlformats-officedocument.presentationml.presentation"
ODF_ODT = "application/vnd.oasis.opendocument.text"
EPUB_MIME = "application/epub+zip"

# macro-enabled OOXML variants — all Tika-accepted in the reference
# (_tika_mime_types.py:499-532); same zip-of-XML body plus vbaProject.bin.
# Casing follows the reference's _file_types.py keys exactly (it mixes
# macroEnabled/macroenabled per type) so get_filetype hits
OOXML_DOCM = "application/vnd.ms-word.document.macroEnabled.12"
OOXML_XLSM = "application/vnd.ms-excel.sheet.macroenabled.12"
OOXML_PPTM = "application/vnd.ms-powerpoint.presentation.macroEnabled.12"

OFFICE_MIME_TYPES = frozenset(
    {OOXML_DOCX, OOXML_XLSX, OOXML_PPTX, ODF_ODT, EPUB_MIME,
     OOXML_DOCM, OOXML_XLSM, OOXML_PPTM}
)


def classify_zip_office(data: bytes) -> str | None:
    """Peek a zip's member names to recognize OOXML/ODF containers —
    the role `file` + extension plays in the reference (magic.py docstring:
    docx/xlsx 'are actually zips with XMLs inside')."""
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
            if "word/document.xml" in names:
                return OOXML_DOCM if "word/vbaProject.bin" in names else OOXML_DOCX
            if "xl/workbook.xml" in names:
                return OOXML_XLSM if "xl/vbaProject.bin" in names else OOXML_XLSX
            if "ppt/presentation.xml" in names:
                return OOXML_PPTM if "ppt/vbaProject.bin" in names else OOXML_PPTX
            if "visio/document.xml" in names:
                from .visio_extract import classify_zip_visio

                return classify_zip_visio(names)
            if "mimetype" in names and "content.xml" in names:
                mt = zf.read("mimetype").decode("ascii", "replace").strip()
                if mt.startswith("application/vnd.oasis.opendocument"):
                    return mt
                if mt.startswith("application/vnd.sun.xml"):
                    # StarOffice/OpenOffice 1.x — ODF's ancestor, same
                    # zip-of-XML layout (Tika list :712-721)
                    return mt
            if "mimetype" in names:
                mt = zf.read("mimetype").decode("ascii", "replace").strip()
                if mt == EPUB_MIME:
                    return EPUB_MIME
            if "META-INF/container.xml" in names and any(
                n.endswith(".opf") for n in names
            ):
                return EPUB_MIME
    except Exception:
        return None
    return None


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _read_xml(zf: zipfile.ZipFile, name: str) -> ET.Element | None:
    try:
        return ET.fromstring(zf.read(name))
    except (KeyError, ET.ParseError):
        return None


def docx_to_text(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = _read_xml(zf, "word/document.xml")
    if root is None:
        return ""
    blocks = []
    for p in root.iter():
        if _local(p.tag) != "p":
            continue
        parts = []
        for node in p.iter():
            ln = _local(node.tag)
            if ln == "t" and node.text:
                parts.append(node.text)
            elif ln in ("tab",):
                parts.append(" ")
        text = "".join(parts)
        if text.strip():
            blocks.append(text)
    return normalize_text("\n\n".join(blocks)) or ""


def odt_to_text(data: bytes) -> str:
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = _read_xml(zf, "content.xml")
    if root is None:
        return ""
    blocks = []
    for p in root.iter():
        if _local(p.tag) in ("p", "h"):
            text = "".join(p.itertext())
            if text.strip():
                blocks.append(text)
    return normalize_text("\n\n".join(blocks)) or ""


def ods_to_text(data: bytes) -> str:
    """ODF spreadsheet (.ods): one block per table row, cells joined by
    a single space — the same reading order Tika's ODF parser emits for
    the reference (_tika_mime_types.py lists the full ODF family).
    Covers table:number-columns-repeated for value cells."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = _read_xml(zf, "content.xml")
    if root is None:
        return ""
    blocks = []
    for row in root.iter():
        if _local(row.tag) != "table-row":
            continue
        cells = []
        for cell in row:
            if _local(cell.tag) != "table-cell":
                continue
            text = " ".join(
                "".join(p.itertext())
                for p in cell.iter()
                if _local(p.tag) == "p"
            ).strip()
            if not text:
                continue
            repeat = 1
            for k, v in cell.attrib.items():
                if _local(k) == "number-columns-repeated":
                    try:
                        repeat = min(int(v), 1000)
                    except ValueError:
                        pass
            cells.extend([text] * repeat)
        if cells:
            blocks.append(" ".join(cells))
    return normalize_text("\n\n".join(blocks)) or ""


def odp_to_text(data: bytes) -> str:
    """ODF presentation (.odp): slide text in draw:page document order —
    every text:p/text:h inside a page's frames becomes a block (titles,
    outlines, notes alike; same shape as pptx_to_text)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        root = _read_xml(zf, "content.xml")
    if root is None:
        return ""
    blocks = []
    for page in root.iter():
        if _local(page.tag) != "page":
            continue
        for p in page.iter():
            if _local(p.tag) in ("p", "h"):
                text = "".join(p.itertext())
                if text.strip():
                    blocks.append(text)
    return normalize_text("\n\n".join(blocks)) or ""


def pptx_to_text(data: bytes) -> str:
    blocks = []
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        slides = sorted(
            n for n in zf.namelist()
            if re.fullmatch(r"ppt/slides/slide\d+\.xml", n)
        )
        for name in slides:
            root = _read_xml(zf, name)
            if root is None:
                continue
            for p in root.iter():
                if _local(p.tag) == "p":
                    text = "".join(
                        node.text for node in p.iter()
                        if _local(node.tag) == "t" and node.text
                    )
                    if text.strip():
                        blocks.append(text)
    return normalize_text("\n\n".join(blocks)) or ""


_CELL_REF = re.compile(r"([A-Z]+)\d+")


def _col_index(letters: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 — base-26 bijective column letters."""
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def xlsx_to_table(data: bytes) -> tuple[dict | None, list[tuple[str, str]]]:
    """(table-info, row children) — the csv explode path for xlsx
    (get_table_info/unpack_table analog, archives.py:244-474)."""
    with zipfile.ZipFile(io.BytesIO(data)) as zf:
        shared: list[str] = []
        sroot = _read_xml(zf, "xl/sharedStrings.xml")
        if sroot is not None:
            for si in sroot:
                shared.append("".join(si.itertext()))
        sheet = None
        for name in ("xl/worksheets/sheet1.xml",):
            sheet = _read_xml(zf, name)
        if sheet is None:
            return None, []
        rows: list[list[str]] = []
        for row in sheet.iter():
            if _local(row.tag) != "row":
                continue
            # Excel omits empty cells; place each <c> at the index its r=
            # reference names (padding gaps) so sparse rows don't shift.
            cells: list[str] = []
            next_idx = 0
            for c in row:
                if _local(c.tag) != "c":
                    continue
                v = next((n.text or "" for n in c.iter() if _local(n.tag) == "v"), "")
                if c.get("t") == "s" and v.isdigit() and int(v) < len(shared):
                    v = shared[int(v)]
                ref = c.get("r") or ""
                m = _CELL_REF.fullmatch(ref)
                idx = _col_index(m.group(1)) if m else next_idx
                if idx >= len(cells):
                    cells.extend([""] * (idx - len(cells) + 1))
                cells[idx] = v
                next_idx = idx + 1
            rows.append(cells)
    if not rows:
        return None, []
    header = rows[0]
    info = {
        "table-columns": header,
        "table-row-count": len(rows),
        "table-col-count": len(header),
    }
    from .tables import explode_row

    children = [
        (f"{i}.txt", explode_row(row, header)) for i, row in enumerate(rows[1:], 1)
    ]
    return info, children


def _parse_iso_zulu(value: str | None) -> str | None:
    """Normalize an OOXML/ODF metadata timestamp to the reference's zulu
    format (tika.py:148-176 parses with dateutil then renders
    '%Y-%m-%dT%H:%M:%SZ', utils/__init__.py:54-61)."""
    if not value:
        return None
    from datetime import timezone

    from ..functions.textutils import zulu

    try:
        from datetime import datetime

        dt = datetime.fromisoformat(value.strip().replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return zulu(dt.astimezone(timezone.utc))
    except ValueError:
        return None


def office_doc_dates(data: bytes) -> tuple[str | None, str | None]:
    """(date_created, date_modified) from document metadata — the ES
    `date-created`/`date` fields the reference fills from Tika rmeta keys
    (Creation-Date/dcterms:created and Last-Modified/dcterms:modified,
    tika.py:148-176).  OOXML: docProps/core.xml; ODF: meta.xml."""
    created = modified = None
    try:
        with zipfile.ZipFile(io.BytesIO(data)) as zf:
            names = set(zf.namelist())
            if "docProps/core.xml" in names:
                root = _read_xml(zf, "docProps/core.xml")
                if root is not None:
                    for node in root.iter():
                        ln = _local(node.tag)
                        if ln == "created":
                            created = _parse_iso_zulu(node.text)
                        elif ln == "modified":
                            modified = _parse_iso_zulu(node.text)
            elif "meta.xml" in names:
                root = _read_xml(zf, "meta.xml")
                if root is not None:
                    for node in root.iter():
                        ln = _local(node.tag)
                        if ln == "creation-date":
                            created = _parse_iso_zulu(node.text)
                        elif ln == "date":
                            modified = _parse_iso_zulu(node.text)
    except Exception:
        return None, None
    return created, modified


def epub_to_text(data: bytes) -> str:
    """EPUB text extraction (IDPF OCF/OPF, zip-of-XHTML; in the
    reference's Tika mime list, ``_tika_mime_types.py:51``, and its
    archive-capable extension set, ``archives.py:54``).

    META-INF/container.xml names the OPF package file; the OPF manifest
    maps ids to hrefs and the spine fixes reading order.  Each spine
    chapter runs through the SAME block extractor as web pages
    (:func:`.html_extract.html_to_text`) so boilerplate scoring and
    whitespace folding match the HTML path; chapters join with a blank
    line."""
    import posixpath

    from .html_extract import html_to_text

    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
    except Exception:
        return ""
    opf_path = _epub_opf_path(zf)
    if not opf_path:
        return ""
    opf = _read_xml(zf, opf_path)
    if opf is None:
        return ""
    base = posixpath.dirname(opf_path)
    manifest: dict[str, str] = {}
    spine: list[str] = []
    for el in opf.iter():
        t = _local(el.tag)
        if t == "item" and el.get("id") and el.get("href"):
            manifest[el.get("id")] = el.get("href")
        elif t == "itemref" and el.get("idref"):
            spine.append(el.get("idref"))
    parts = []
    for idref in spine:
        href = manifest.get(idref)
        if not href:
            continue
        name = posixpath.normpath(posixpath.join(base, href)) if base else href
        try:
            chapter = zf.read(name)
        except KeyError:
            continue
        text = html_to_text(chapter)
        if text:
            parts.append(text)
    return "\n\n".join(parts)


def _epub_opf_path(zf: zipfile.ZipFile) -> str | None:
    """Resolve the package (OPF) path the OCF way: the rootfile in
    META-INF/container.xml; zip-order ``*.opf`` only as a fallback —
    an epub can carry secondary package files (renditions, backups)
    that must not shadow the declared one."""
    root = _read_xml(zf, "META-INF/container.xml")
    if root is not None:
        for el in root.iter():
            if _local(el.tag) == "rootfile" and el.get("full-path"):
                return el.get("full-path")
    return next((n for n in zf.namelist() if n.endswith(".opf")), None)


def epub_dates(data: bytes) -> tuple[str | None, str | None]:
    """(created, modified) from the OPF metadata, zulu-normalized:
    ``dc:date`` is the publication/creation date (EPUB 2+) and the
    EPUB 3-required ``<meta property="dcterms:modified">`` is the
    modification timestamp — the fields Tika reports for epub."""
    created = modified = None
    try:
        zf = zipfile.ZipFile(io.BytesIO(data))
        opf_path = _epub_opf_path(zf)
        if not opf_path:
            return None, None
        opf = _read_xml(zf, opf_path)
        if opf is None:
            return None, None
        for el in opf.iter():
            t = _local(el.tag)
            if t == "date" and el.text and created is None:
                created = _parse_iso_zulu(el.text.strip())
            elif (
                t == "meta"
                and el.get("property") == "dcterms:modified"
                and el.text
            ):
                modified = _parse_iso_zulu(el.text.strip())
    except Exception:
        return None, None
    return created, modified


def office_to_text(data: bytes, mime_type: str) -> str:
    if mime_type == EPUB_MIME:
        return epub_to_text(data)
    if mime_type in (OOXML_DOCX, OOXML_DOCM):
        return docx_to_text(data)
    if mime_type in ("application/vnd.oasis.opendocument.spreadsheet",
                     "application/vnd.sun.xml.calc"):
        return ods_to_text(data)
    if mime_type in ("application/vnd.oasis.opendocument.presentation",
                     "application/vnd.sun.xml.impress"):
        return odp_to_text(data)
    if mime_type == ODF_ODT or mime_type.startswith(
        ("application/vnd.oasis.opendocument", "application/vnd.sun.xml")
    ):
        return odt_to_text(data)
    if mime_type in (OOXML_PPTX, OOXML_PPTM):
        return pptx_to_text(data)
    return ""
