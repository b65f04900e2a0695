"""HTML boilerplate-strip extractor: block scoring, link density,
charset handling (reference analog: Tika text path + bleach cleanup,
digests.py:253-268, html.py:20-23)."""

from hoover_snoop2_spark.functions.textutils import decode_html, html_charset
from hoover_snoop2_spark.operators.html_extract import (
    extract_blocks,
    html_to_text,
    strip_tags,
)


def test_drops_nav_header_footer():
    html = (
        b"<html><head><title>T</title><style>x{}</style></head><body>"
        b'<nav><a href="/">Home</a> <a href="/x">X</a></nav>'
        b"<header><h1>Big Site</h1></header>"
        b"<article><p>First real paragraph of content.</p>"
        b"<p>Second real paragraph here.</p></article>"
        b'<footer><a href="/p">Privacy</a></footer></body></html>'
    )
    assert html_to_text(html) == (
        "First real paragraph of content.\n\nSecond real paragraph here."
    )


def test_link_density_drops_sidebar():
    blocks = extract_blocks(
        '<div><ul><li><a href="/1">link one</a></li>'
        '<li><a href="/2">link two</a></li></ul></div>'
        "<p>Actual content sentence with plenty of plain words.</p>"
    )
    assert blocks == ["Actual content sentence with plenty of plain words."]


def test_inline_links_kept():
    blocks = extract_blocks(
        '<p>Paragraph with an <a href="/x">inline link</a> inside lots of '
        "other plain prose words that dominate the block.</p>"
    )
    assert len(blocks) == 1 and "inline link" in blocks[0]


def test_whitespace_folded_and_nfc():
    blocks = extract_blocks("<p>a\n   b\t\tc</p>")
    assert blocks == ["a b c"]


def test_meta_charset_honored():
    raw = '<html><head><meta charset="windows-1252"></head><body><p>café “q”</p></body></html>'
    data = raw.encode("cp1252")
    assert html_charset(data) == "windows-1252"
    assert "café “q”" in decode_html(data)


def test_missing_meta_falls_to_latin1():
    raw = "<html><body><p>café</p></body></html>"
    data = raw.encode("cp1252")
    # é is the same byte in cp1252 and latin-1 → round trips
    assert "café" in decode_html(data)


def test_strip_tags():
    assert strip_tags("<p>hello <b>world</b></p>") == "hello world"


def test_malformed_html_no_crash():
    assert isinstance(html_to_text(b"<p>unclosed <div><<<>broken"), str)


def test_unlikely_candidates_dropped():
    """Cookie banners / comments / promo boxes have LOW link density —
    only the class/id heuristic rejects them (readability-style)."""
    from hoover_snoop2_spark.operators.html_extract import html_to_text

    html = (
        "<html><body>"
        '<div class="cookie-consent"><p>We use cookies. Accept?</p></div>'
        "<article><p>Real content paragraph one.</p>"
        '<div><div class="inner">x</div></div>'
        "<p>Real content paragraph two.</p></article>"
        '<section id="comments"><p>visitor says hi</p></section>'
        '<div class="related-promo"><p>You may also like.</p></div>'
        "</body></html>"
    ).encode()
    text = html_to_text(html)
    assert "Real content paragraph one." in text
    assert "Real content paragraph two." in text
    assert "cookies" not in text
    assert "visitor" not in text
    assert "also like" not in text


def test_nested_same_tag_inside_dropped_subtree():
    from hoover_snoop2_spark.operators.html_extract import html_to_text

    html = (
        '<body><div class="comments"><div><p>buried</p></div></div>'
        "<p>kept</p></body>"
    ).encode()
    text = html_to_text(html)
    assert text == "kept"


def test_void_tag_with_unlikely_class_does_not_swallow():
    from hoover_snoop2_spark.operators.html_extract import html_to_text

    html = b'<body><img class="advert" src="x.png"><p>after image</p></body>'
    assert html_to_text(html) == "after image"


def test_robots_directives_cases(spark):
    from hoover_snoop2_spark.operators.html_extract import robots_directives
    from pyspark.sql import functions as F

    rows = [
        (1, '<html><head><META NAME="robots" CONTENT="NOINDEX">'
            '</head><body>x</body></html>'),
        (2, '<html><head><link rel="canonical" '
            'href="https://c.example/a"></head><body>x</body></html>'),
        (3, '<html><body>plain</body></html>'),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    cols = robots_directives("html")
    got = {
        r["id"]: (r["ni"], r["nf"], r["cu"])
        for r in df.select(
            "id",
            cols["robots_noindex"].alias("ni"),
            cols["robots_nofollow"].alias("nf"),
            cols["canonical_url"].alias("cu"),
        ).collect()
    }
    assert got[1] == (True, False, "")
    assert got[2] == (False, False, "https://c.example/a")
    assert got[3] == (False, False, "")


def test_heading_outline_numbering(spark):
    from pyspark.sql import functions as F
    from hoover_snoop2_spark.operators.html_extract import heading_outline

    rows = [
        (0, "<h1>a</h1><h2>b</h2><h2>c</h2><h1>d</h1><h2>e</h2>"),
        # level skip: h3 directly under h1 -> 1.0.1
        (1, "<h1>a</h1><h3>b</h3>"),
        # deep counters reset when a shallower heading appears
        (2, "<h1>a</h1><h2>b</h2><h3>c</h3><h2>d</h2><h3>e</h3>"),
        (3, "no headings here"),
        (4, "<h6>deep</h6>"),
    ]
    df = spark.createDataFrame(rows, "id long, html string")
    got = {
        r["id"]: r["o"]
        for r in df.select(
            "id", heading_outline(F.col("html")).alias("o")
        ).collect()
    }
    assert got[0] == ["1 a", "1.1 b", "1.2 c", "2 d", "2.1 e"]
    assert got[1] == ["1 a", "1.0.1 b"]
    assert got[2] == ["1 a", "1.1 b", "1.1.1 c", "1.2 d", "1.2.1 e"]
    assert got[3] == []
    assert got[4] == ["0.0.0.0.0.1 deep"]
