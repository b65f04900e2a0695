"""RTF text extraction (application/rtf → filetype 'doc')."""

from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.rtf_extract import rtf_to_text


def test_basic_rtf():
    rtf = (rb"{\rtf1\ansi\ansicpg1252{\fonttbl{\f0 Times;}}"
           rb"\f0\fs24 Hello \b bold \b0 world.\par "
           rb"Second paragraph here.\par }")
    assert rtf_to_text(rtf) == "Hello bold world.\n\nSecond paragraph here."


def test_hex_and_unicode_escapes():
    uni = b"\\" + b"u8594 ?"
    rtf = rb"{\rtf1\ansi caf\'e9 and arrow " + uni + rb" end\par }"
    assert rtf_to_text(rtf) == "café and arrow → end"


def test_destination_groups_skipped():
    rtf = (rb"{\rtf1{\fonttbl{\f0 Arial;}}{\colortbl;\red1;}"
           rb"{\*\generator Weird 1.0;}visible\par{\info{\author X}}}")
    assert rtf_to_text(rtf) == "visible"


def test_analyze_routes_rtf():
    rtf = rb"{\rtf1\ansi body text\par }"
    d = analyze_blob("x", rtf)[0]
    assert d["mime_type"] == "application/rtf"
    assert d["text"] == "body text"


def test_not_rtf():
    assert rtf_to_text(b"plain text") == ""
