"""StarOffice/OpenOffice 1.x (.sxw/.sxc/.sxi): ODF's ancestor rides the
same zip-of-XML machinery; OO1.x namespaces differ but local tags match."""
import io
import zipfile

from hoover_snoop2_spark.operators.analyze import analyze_blob


def _sx(mimetype: str, content: str) -> bytes:
    out = io.BytesIO()
    with zipfile.ZipFile(out, "w") as zf:
        zf.writestr(zipfile.ZipInfo("mimetype"), mimetype)
        zf.writestr(zipfile.ZipInfo("content.xml"), content)
    return out.getvalue()


def test_sxw_text():
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="http://openoffice.org/2000/office" '
        'xmlns:text="http://openoffice.org/2000/text"><office:body>'
        "<text:p>Star paragraph one.</text:p>"
        "<text:h>Heading two</text:h>"
        "</office:body></office:document-content>"
    )
    out = analyze_blob("k", _sx("application/vnd.sun.xml.writer", content))
    assert out[0]["mime_type"] == "application/vnd.sun.xml.writer"
    assert out[0]["status"] == "success"
    assert "Star paragraph one." in out[0]["text"]
    assert "Heading two" in out[0]["text"]


def test_sxc_rows():
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="http://openoffice.org/2000/office" '
        'xmlns:table="http://openoffice.org/2000/table" '
        'xmlns:text="http://openoffice.org/2000/text"><office:body>'
        "<table:table><table:table-row>"
        "<table:table-cell><text:p>alpha</text:p></table:table-cell>"
        "<table:table-cell><text:p>42</text:p></table:table-cell>"
        "</table:table-row></table:table>"
        "</office:body></office:document-content>"
    )
    out = analyze_blob("k", _sx("application/vnd.sun.xml.calc", content))
    assert out[0]["mime_type"] == "application/vnd.sun.xml.calc"
    assert "alpha" in out[0]["text"] and "42" in out[0]["text"]


def test_sxi_text():
    content = (
        '<?xml version="1.0"?><office:document-content '
        'xmlns:office="http://openoffice.org/2000/office" '
        'xmlns:draw="http://openoffice.org/2000/drawing" '
        'xmlns:text="http://openoffice.org/2000/text"><office:body>'
        '<draw:page draw:name="page1">'
        "<text:p>Slide note here</text:p>"
        "</draw:page></office:body></office:document-content>"
    )
    out = analyze_blob("k", _sx("application/vnd.sun.xml.impress", content))
    assert out[0]["mime_type"] == "application/vnd.sun.xml.impress"
    assert "Slide note here" in out[0]["text"]
