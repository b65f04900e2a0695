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
