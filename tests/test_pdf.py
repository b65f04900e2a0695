"""PDF span parser — pdf.js item-join semantics
(pdf-tools/extract-text.js:28-42) over corpus-generated minimal PDFs."""

from hoover_snoop2_spark.corpus import render_pdf
from hoover_snoop2_spark.operators.pdf_spans import (
    _decode_pdf_string,
    extract_pdf_pages,
    pdf_to_text,
)


def test_corpus_pdf_round_trip():
    for doc_id in (3, 9, 27, 84, 252):
        data, golden, _kids = render_pdf(doc_id, "en")
        text, pages, broken = pdf_to_text(data)
        assert broken is None
        assert text == golden, doc_id


def test_multi_column_reading_order():
    # two columns emitted interleaved; parser must read column-major
    content = (
        b"BT /F1 12 Tf "
        b"1 0 0 1 72 720 Tm (L1) Tj "
        b"1 0 0 1 330 720 Tm (R1) Tj "
        b"1 0 0 1 72 706 Tm (L2) Tj "
        b"1 0 0 1 330 706 Tm (R2) Tj "
        b"ET"
    )
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< >>\nendobj\n2 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    pages = extract_pdf_pages(pdf)
    assert pages == [{"page": 1, "text": "L1 L2 R1 R2"}]


def test_string_escapes():
    assert _decode_pdf_string(rb"a\(b\)c\\d") == "a(b)c\\d"
    assert _decode_pdf_string(rb"\101\102") == "AB"
    assert _decode_pdf_string(rb"line\nnext") == "line\nnext"


def test_not_pdf_broken():
    text, pages, broken = pdf_to_text(b"not a pdf")
    assert broken == "pdf_not_pdf"


def test_flate_compressed_stream():
    """FlateDecode content streams inflate via stdlib zlib."""
    import re
    import zlib

    data, golden, _kids = render_pdf(42, "en")
    # recompress every content stream in the fixture pdf
    def compress(m):
        body = zlib.compress(m.group(1))
        return b"stream\n" + body + b"endstream"

    squeezed = re.sub(rb"stream\r?\n(.*?)endstream", compress, data, flags=re.DOTALL)
    assert squeezed != data
    text, pages, broken = pdf_to_text(squeezed)
    assert broken is None
    assert text == golden


def test_pdf_embedded_image_children():
    """DCTDecode image XObjects fan out as .jpg children (pdfimages
    analog, archives.py:491-528) and never break text extraction."""
    import hashlib

    from hoover_snoop2_spark.operators.analyze import analyze_blob
    from hoover_snoop2_spark.operators.pdf_spans import pdf_image_children

    data, golden, kids = render_pdf(1, "en")  # doc_id % 3 == 1 embeds a jpg
    assert kids == [("image-001.jpg", "")]
    imgs = pdf_image_children(data)
    assert [n for n, _ in imgs] == ["image-001.jpg"]
    assert imgs[0][1][:3] == b"\xff\xd8\xff"

    rows = analyze_blob(hashlib.sha3_256(data).hexdigest(), data)
    digest = rows[0]
    assert digest["status"] == "success"
    assert golden.startswith(digest["text"][:20])
    assert rows[1]["child_name"] == "image-001.jpg"
    # the child digests as a JPEG with empty text
    child = analyze_blob("x", rows[1]["child_data"])[0]
    assert child["mime_type"] == "image/jpeg"
    assert child["status"] == "success"


def test_large_image_dict_not_misclassified():
    """An image XObject whose dict exceeds a few hundred bytes (ICC color
    spaces, DecodeParms) must still be recognized as an image — not
    tokenized as a content stream or reported filter-unsupported."""
    big_dict_filler = b"/ICCBased [" + b"0.00123 " * 200 + b"]"
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 32
    content = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (hello) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Subtype /Image /Filter /DCTDecode /ColorSpace "
        + big_dict_filler
        + b" /Length " + str(len(jpeg)).encode() + b" >>\nstream\n"
        + jpeg + b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert len(big_dict_filler) > 512  # would defeat the old 512-byte window
    text, pages, broken = pdf_to_text(pdf)
    assert broken is None
    assert text == "hello"
    from hoover_snoop2_spark.operators.pdf_spans import pdf_image_children
    assert [n for n, _ in pdf_image_children(pdf)] == ["image-001.jpg"]


def test_unsupported_filter_stream_skipped_not_fatal():
    """A single LZW/other-filter stream no longer breaks the whole PDF —
    decodable streams still extract; broken only when NOTHING decodes."""
    good = b"BT /F1 12 Tf 1 0 0 1 72 720 Tm (kept) Tj ET"
    pdf_mixed = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Filter /LZWDecode /Length 4 >>\nstream\n\x80\x0b\x60\x50\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(good)).encode()
        + b" >>\nstream\n" + good + b"\nendstream\nendobj\n%%EOF\n"
    )
    text, pages, broken = pdf_to_text(pdf_mixed)
    assert broken is None
    assert text == "kept"

    pdf_all_bad = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Filter /LZWDecode /Length 4 >>\nstream\n\x80\x0b\x60\x50\nendstream\nendobj\n%%EOF\n"
    )
    text, pages, broken = pdf_to_text(pdf_all_bad)
    assert broken == "pdf_filter_unsupported"


def test_span_font_sizes_and_span_explode():
    """Tf tracking: sizes ride the spans (graphics state persists across
    BT/ET and may be set outside BT); extract_pdf_page_spans emits
    reading-ordered rows with seq + size."""
    from hoover_snoop2_spark.operators.pdf_spans import (
        extract_pdf_page_spans,
    )

    stream = (
        b"/F1 24 Tf "                       # set OUTSIDE BT: must stick
        b"BT 1 0 0 1 50 770 Tm (Title) Tj "
        b"/F2 11.5 Tf 1 0 0 1 50 750 Tm (body one) Tj ET "
        b"BT 1 0 0 1 50 730 Tm (body two) Tj ET"  # 11.5 persists
    )
    pdf = (
        b"%PDF-1.4\n1 0 obj << /Length 0 >> stream\n" + stream
        + b"\nendstream endobj\n%%EOF"
    )
    spans = extract_pdf_page_spans(pdf)
    assert [(s["seq"], s["text"], s["size"]) for s in spans] == [
        (1, "Title", 24.0),
        (2, "body one", 11.5),
        (3, "body two", 11.5),
    ]
