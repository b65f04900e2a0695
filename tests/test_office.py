"""Office-format extraction: docx/odt/pptx text, xlsx table explode,
zip-member classification (the Tika-covered mime classes,
_tika_mime_types.py, re-expressed with stdlib parsers)."""

import hashlib

from hoover_snoop2_spark.corpus import (
    render_docx,
    render_odt,
    render_pptx,
    render_xlsx,
)
from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.office_extract import (
    OOXML_DOCX,
    OOXML_XLSX,
    classify_zip_office,
    docx_to_text,
    odt_to_text,
    pptx_to_text,
    xlsx_to_table,
)


def _digest(data):
    return analyze_blob(hashlib.sha3_256(data).hexdigest(), data)


def test_docx():
    data, golden = render_docx(7, "en")
    assert classify_zip_office(data) == OOXML_DOCX
    assert docx_to_text(data) == golden
    d = _digest(data)[0]
    assert d["mime_type"] == OOXML_DOCX
    assert d["text"] == golden


def test_odt():
    data, golden = render_odt(11, "de")
    assert classify_zip_office(data) == "application/vnd.oasis.opendocument.text"
    assert odt_to_text(data) == golden
    assert _digest(data)[0]["text"] == golden


def test_pptx():
    data, golden = render_pptx(13, "fr")
    assert pptx_to_text(data) == golden
    assert _digest(data)[0]["text"] == golden


def test_xlsx_table():
    data, children, info = render_xlsx(17)
    assert classify_zip_office(data) == OOXML_XLSX
    got_info, got_children = xlsx_to_table(data)
    assert got_info["table-columns"] == info["table-columns"]
    assert got_info["table-row-count"] == info["table-row-count"]
    rows = _digest(data)
    digest = rows[0]
    assert digest["table_row_count"] == info["table-row-count"]
    assert len(rows) - 1 == len(children)


def test_plain_zip_not_office():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("a.txt", "x")
    assert classify_zip_office(buf.getvalue()) is None
    assert _digest(buf.getvalue())[0]["mime_type"] == "application/zip"


def test_docx_filetype_mapping():
    data, _ = render_docx(7, "en")
    from hoover_snoop2_spark.functions.filetypes import get_filetype

    assert get_filetype(_digest(data)[0]["mime_type"]) == "doc"


def test_xlsx_sparse_rows_align_by_cell_ref():
    """Excel omits empty cells; values must land at the column their r=
    reference names, not shift left (ADVICE round-1 regression)."""
    import io
    import zipfile

    from hoover_snoop2_spark.operators.office_extract import xlsx_to_table

    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.'
        'openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>a</t></is><v>h1</v></c>'
        '<c r="B1"><v>h2</v></c><c r="C1"><v>h3</v></c></row>'
        # row 2 omits B2 — v3 must stay in column C
        '<row r="2"><c r="A2"><v>v1</v></c><c r="C2"><v>v3</v></c></row>'
        "</sheetData></worksheet>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", '<?xml version="1.0"?><workbook/>')
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    info, children = xlsx_to_table(buf.getvalue())
    assert info["table-col-count"] == 3
    assert children == [("1.txt", "h1 = v1\nh2 = \nh3 = v3\n")]


def test_ods_cell_text():
    """ODF spreadsheet: one block per row, cells joined by spaces;
    number-columns-repeated expands."""
    from hoover_snoop2_spark.corpus import render_ods
    from hoover_snoop2_spark.operators.office_extract import (
        classify_zip_office,
        ods_to_text,
        office_to_text,
    )

    data, golden = render_ods(404, "en")
    mime = classify_zip_office(data)
    assert mime == "application/vnd.oasis.opendocument.spreadsheet"
    assert ods_to_text(data) == golden
    assert office_to_text(data, mime) == golden
    # repeated cells
    import io
    import zipfile

    content = (
        '<?xml version="1.0"?><office:document-content xmlns:office='
        '"urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text='
        '"urn:oasis:names:tc:opendocument:xmlns:text:1.0" xmlns:table='
        '"urn:oasis:names:tc:opendocument:xmlns:table:1.0"><office:body>'
        "<office:spreadsheet><table:table><table:table-row>"
        '<table:table-cell table:number-columns-repeated="3">'
        "<text:p>x</text:p></table:table-cell>"
        "</table:table-row></table:table></office:spreadsheet>"
        "</office:body></office:document-content>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/vnd.oasis.opendocument.spreadsheet")
        zf.writestr("content.xml", content)
    assert ods_to_text(buf.getvalue()) == "x x x"


def test_odp_slide_text():
    """ODF presentation: text frames in draw:page order."""
    from hoover_snoop2_spark.corpus import render_odp
    from hoover_snoop2_spark.operators.office_extract import (
        classify_zip_office,
        odp_to_text,
        office_to_text,
    )

    data, golden = render_odp(505, "fr")
    mime = classify_zip_office(data)
    assert mime == "application/vnd.oasis.opendocument.presentation"
    assert odp_to_text(data) == golden
    assert office_to_text(data, mime) == golden


def test_epub_spine_order_and_date():
    """EPUB extraction follows the OPF spine (odd doc_ids reverse it vs
    zip member order); dc:date surfaces as the creation date."""
    from hoover_snoop2_spark.corpus import office_dates_of, render_epub
    from hoover_snoop2_spark.operators.office_extract import (
        classify_zip_office,
        epub_dates,
        epub_to_text,
    )

    for d in (4, 7, 13, 20):
        data, golden = render_epub(d, "en")
        assert classify_zip_office(data) == "application/epub+zip"
        assert epub_to_text(data) == golden
        assert epub_dates(data) == office_dates_of(d)


def test_epub_broken_variants():
    from hoover_snoop2_spark.corpus import render_epub
    from hoover_snoop2_spark.operators.office_extract import epub_to_text

    assert epub_to_text(b"not a zip") == ""
    # zip without any opf → empty, never a crash
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("mimetype", "application/epub+zip")
        zf.writestr("foo.txt", "hi")
    assert epub_to_text(buf.getvalue()) == ""
    # spine referencing a missing chapter skips it, keeps the rest
    data, golden = render_epub(4, "en")
    buf2 = io.BytesIO(data)
    src = zipfile.ZipFile(buf2)
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        for n in src.namelist():
            body = src.read(n)
            if n == "OEBPS/content.opf":
                body = body.replace(
                    b"<manifest>",
                    b'<manifest><item id="ghost" href="missing.xhtml" '
                    b'media-type="application/xhtml+xml"/>',
                ).replace(b"<spine>", b'<spine><itemref idref="ghost"/>')
            zf.writestr(n, body)
    assert epub_to_text(out.getvalue()) == golden
