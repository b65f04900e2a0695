"""Property-based invariants (hypothesis) for the pure kernels — an
addition beyond the reference's example-based suite (it has none), catching
the classes of bugs fixed-fixture tests miss: arbitrary bytes must never
crash a sniffer/extractor, and normalization must be idempotent."""

from hypothesis import given, settings
from hypothesis import strategies as st

from hoover_snoop2_spark.functions.langid import detect_language
from hoover_snoop2_spark.functions.magic import detect_mime_encoding, sniff_bytes
from hoover_snoop2_spark.functions.textutils import normalize_text, read_text
from hoover_snoop2_spark.operators.analyze import analyze_blob
from hoover_snoop2_spark.operators.html_extract import html_to_text, strip_tags


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_sniff_total(data):
    mime, enc = sniff_bytes(data)
    assert isinstance(mime, str) and "/" in mime or mime.startswith("inode")
    assert enc in ("binary", "us-ascii", "utf-8", "utf-16", "iso-8859-1")


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096))
def test_analyze_blob_total(data):
    """The collapsed handle_file chain must classify, never raise —
    run_task's error capture (tasks.py:696-716) is the analog."""
    rows = analyze_blob("x" * 64, data)
    assert rows[0]["status"] in ("success", "skipped", "broken")
    assert rows[0]["text"] is not None or rows[0]["status"] != "success"


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_html_extract_total(data):
    assert isinstance(html_to_text(data), str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=1024))
def test_normalize_idempotent(text):
    once = normalize_text(text)
    assert normalize_text(once) == once


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=512))
def test_strip_tags_total(fragment):
    assert isinstance(strip_tags(fragment), str)


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048))
def test_read_text_consistent_with_encoding(data):
    enc = detect_mime_encoding(data)
    out = read_text(data, enc)
    if enc == "binary":
        assert out is None
    else:
        assert isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2048))
def test_langid_total(text):
    lang = detect_language(text)
    assert lang is None or len(lang) == 2
