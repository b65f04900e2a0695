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


# ---------------------------------------------------------------------------
# round-2 byte-level codecs: property round-trips (no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_7z_number_codec_roundtrip(v):
    import io

    from hoover_snoop2_spark.operators.sevenzip_extract import (
        _read_number,
        _write_number,
    )

    assert _read_number(io.BytesIO(_write_number(v))) == v


@given(st.lists(
    st.tuples(
        st.text(alphabet=st.characters(blacklist_categories=("Cs",),
                                       blacklist_characters="/\x00"),
                min_size=1, max_size=20),
        st.binary(max_size=200),
    ),
    min_size=1, max_size=5,
))
@settings(max_examples=25, deadline=None)
def test_7z_member_roundtrip(members):
    from hoover_snoop2_spark.operators.sevenzip_extract import (
        build_7z,
        unpack_7z,
    )

    members = [(f"m{i}_{name}", data) for i, (name, data) in enumerate(members)]
    for codec in ("copy", "lzma2"):
        assert unpack_7z(build_7z(members, codec=codec)) == members


@given(st.binary(min_size=0, max_size=64))
def test_safe_member_name_always_utf8_and_lossless(raw):
    from hoover_snoop2_spark.operators.archive_unpack import safe_member_name

    name = raw.decode("utf-8", "surrogateescape")
    safe = safe_member_name(name)
    safe.encode("utf-8")  # never raises
    # lossless: unescaping the %XX bytes recovers the original bytes
    import re

    if safe != name:
        out = bytearray()
        i = 0
        while i < len(safe):
            if safe[i] == "%" and re.fullmatch(r"[0-9A-F]{2}", safe[i+1:i+3]):
                out.append(int(safe[i+1:i+3], 16))
                i += 3
            else:
                out.extend(safe[i].encode("utf-8"))
                i += 1
        assert bytes(out) == raw


@given(st.lists(
    st.fixed_dictionaries({
        "subject": st.text(max_size=30),
        "body": st.text(max_size=200),
        "sender_name": st.text(
            alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
            max_size=15),
        "sender_email": st.emails(),
        "to": st.emails(),
    }),
    min_size=1, max_size=4,
))
@settings(max_examples=20, deadline=None)
def test_pst_message_roundtrip(messages):
    from hoover_snoop2_spark.operators.pst_extract import (
        PstFile,
        _prop_str,
        PR_BODY,
        PR_SUBJECT,
        build_pst,
    )

    pst = build_pst({"Folder": messages})
    parsed = PstFile(pst)
    got = parsed.messages()
    assert len(got) == len(messages)
    for (nid, props), want in zip(got, messages):
        body = _prop_str(props.get(PR_BODY)) or ""
        assert body == want["body"].rstrip("\x00")
        subj = _prop_str(props.get(PR_SUBJECT), subject_prefix=True) or ""
        expect = want["subject"].rstrip("\x00")
        if expect.startswith("\x01") and len(expect) >= 2:
            expect = expect[2:]
        assert subj == expect


_MAGIC_PREFIXES = [
    b"!BDN",                          # PST
    b"7z\xbc\xaf\x27\x1c",            # 7z
    b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1",  # OLE/CFB (msg/doc/xls/ppt)
    b"%PDF-1.4\n",                    # PDF
    b"PK\x03\x04",                    # zip/OOXML
    b"Rar!\x1a\x07\x00",              # RAR
    b"\x89PNG\r\n\x1a\n",             # PNG
    b"{\\rtf1 ",                      # RTF
]


@settings(max_examples=120, deadline=None)
@given(st.sampled_from(_MAGIC_PREFIXES), st.binary(max_size=4096))
def test_analyze_blob_total_on_magic_prefixed_garbage(prefix, tail):
    """Every format-specific parser must degrade to a broken/skip row on
    truncated or corrupt bytes that carry a real magic — never raise,
    never hang (the reference's run_task error capture, tasks.py:696-716).
    """
    rows = analyze_blob("k" * 64, prefix + tail)
    digest = rows[0]
    assert digest["status"] in ("success", "skipped", "broken")
    if digest["status"] == "broken":
        assert digest["broken_reason"]


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=8192))
def test_lzfu_roundtrip_property(data):
    """compress→decompress is the identity for arbitrary bytes (the
    [MS-OXRTFCP] codec must never corrupt a body)."""
    from hoover_snoop2_spark.operators.msg_extract import (
        compress_lzfu,
        decompress_lzfu,
    )

    assert decompress_lzfu(compress_lzfu(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=8192))
def test_lzfu_decode_total(data):
    """Arbitrary bytes into the decoder: clean LzfuError or valid
    output, never a crash."""
    from hoover_snoop2_spark.operators.msg_extract import (
        LzfuError,
        decompress_lzfu,
    )

    try:
        out = decompress_lzfu(data)
        assert isinstance(out, bytes)
    except LzfuError:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=8192))
def test_bcj2_roundtrip_property(data):
    """encode→decode identity for arbitrary bytes — including E8/E9/0F8x
    candidate bytes landing at every offset and near the tail."""
    from hoover_snoop2_spark.operators.sevenzip_extract import (
        bcj2_decode,
        bcj2_encode,
    )

    m, c, j, rc = bcj2_encode(data)
    assert bcj2_decode(m, c, j, rc, len(data)) == data


@settings(max_examples=100, deadline=None)
@given(st.binary(max_size=2048), st.binary(max_size=64),
       st.binary(max_size=64), st.binary(max_size=16))
def test_bcj2_decode_total(main, call, jump, rc):
    """Arbitrary stream fragments: clean SevenZipBroken or output, never
    an uncaught IndexError/struct.error inside a Spark task."""
    from hoover_snoop2_spark.operators.sevenzip_extract import (
        SevenZipBroken,
        bcj2_decode,
    )

    try:
        out = bcj2_decode(main, call, jump, rc, min(len(main) + 64, 4096))
        assert isinstance(out, bytes)
    except SevenZipBroken:
        pass


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=2048))
def test_langid_windows_total(text):
    """q209 kernel: total over arbitrary text, each verdict a known
    language or None, and window count matches the token count."""
    from hoover_snoop2_spark.functions.langid import (
        _LANGS_ORDER,
        WINDOW_MAX_TOKENS,
        WINDOW_TOKENS,
        detect_language_windows,
    )

    out = detect_language_windows(text)
    assert all(v is None or v in _LANGS_ORDER for v in out)
    if text:
        toks = text[: WINDOW_MAX_TOKENS * 12].lower().translate(
            str.maketrans("", "", ".,;:!?\"'()[]«»„“”’")
        ).split()[:WINDOW_MAX_TOKENS]
        assert len(out) == (len(toks) + WINDOW_TOKENS - 1) // WINDOW_TOKENS
    else:
        assert out == []


def test_langid_windows_mixed_text():
    """A half-English half-German text yields both verdicts in order."""
    from hoover_snoop2_spark.functions.langid import detect_language_windows

    text = "the and of to in is that it was for " * 4 + "der die und in den von zu das mit sich " * 4
    out = detect_language_windows(text)
    assert out[0] == "en" and out[-1] == "de"


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=4096), st.integers(min_value=9, max_value=16))
def test_z_lzw_roundtrip(raw, maxbits):
    """compress(1) LZW codec: decompress_z(compress_z(x)) == x for all
    byte strings, at every legal maxbits (exercises width changes, the
    8-code group padding, and KwKwK)."""
    from hoover_snoop2_spark.operators.unix_archives import (
        compress_z,
        decompress_z,
    )

    assert decompress_z(compress_z(raw, maxbits=maxbits)) == raw


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(
                st.characters(
                    min_codepoint=33, max_codepoint=126, exclude_characters="/"
                ),
                min_size=1,
                max_size=40,
            ),
            st.binary(max_size=512),
        ),
        max_size=6,
    )
)
def test_cpio_ar_roundtrip_fuzz(members):
    """cpio (all dialects) and ar round-trip arbitrary member names/bodies
    (ar long names route through the GNU name table)."""
    from hoover_snoop2_spark.operators.unix_archives import (
        build_ar,
        build_cpio,
        unpack_ar,
        unpack_cpio,
    )

    # unique names: archives keep duplicates, dicts in assertions don't
    members = [(f"{i}_{n}", b) for i, (n, b) in enumerate(members)]
    for fmt in ("newc", "odc", "bin"):
        assert unpack_cpio(build_cpio(members, fmt)) == members
    assert unpack_ar(build_ar(members)) == members


@given(st.binary(max_size=4096))
@settings(max_examples=60, deadline=None)
def test_content_encoding_gzip_roundtrip(data):
    """gzip/deflate/raw-deflate wire bodies inflate back to the exact
    original bytes; the decoder is total over arbitrary payloads."""
    import gzip as _gzip
    import zlib as _zlib

    from hoover_snoop2_spark.sources.warc import _decode_content

    assert _decode_content(_gzip.compress(data), "gzip") == data
    assert _decode_content(_zlib.compress(data), "deflate") == data
    co = _zlib.compressobj(wbits=-15)
    assert _decode_content(co.compress(data) + co.flush(), "deflate") == data


@given(st.binary(max_size=2048), st.sampled_from(
    ["gzip", "deflate", "br", "zstd", "identity", ""]))
@settings(max_examples=60, deadline=None)
def test_content_encoding_never_loses_payload(data, enc):
    """Arbitrary (usually invalid) bytes under any declared coding
    either decode or pass through unchanged — never raise, never
    return something that is neither."""
    import gzip as _gzip
    import zlib as _zlib

    from hoover_snoop2_spark.sources.warc import _decode_content

    out = _decode_content(data, enc)
    if out != data:
        # it decoded: an independent decode must reproduce the output
        assert enc in ("gzip", "x-gzip", "deflate", "zstd", "br")
        if enc in ("gzip", "x-gzip"):
            assert _gzip.decompress(data) == out
        elif enc == "deflate":
            try:
                assert _zlib.decompress(data) == out
            except _zlib.error:
                assert _zlib.decompress(data, -15) == out
        elif enc == "zstd":
            from hoover_snoop2_spark.functions.zstd_codec import (
                zstd_decompress,
            )

            assert zstd_decompress(data) == out
        else:  # br — rare but possible: arbitrary bytes forming a
            # valid (often empty) brotli stream
            from hoover_snoop2_spark.functions.brotli_codec import (
                brotli_decompress,
            )

            assert brotli_decompress(data) == out


@given(
    st.text(max_size=512),
    st.text(
        alphabet=st.sampled_from(
            "abcdefghijklmnopqrstuvwxyz0123456789-._~"
        ),
        min_size=1,
        max_size=80,
    ),
)
@settings(max_examples=60, deadline=None)
def test_wet_record_roundtrips_arbitrary_text(text, urlpart):
    """build_wet_record → parse_wet_records is identity on the text for
    ANY content — including text embedding CRLF CRLF and forged
    'WARC/1.0' headers — because the reader trusts Content-Length
    framing, not delimiters.  Record pairs concatenate cleanly."""
    from datetime import datetime

    from hoover_snoop2_spark.sources.warc import (
        build_wet_record,
        parse_wet_records,
    )

    evil = text + "\r\n\r\nWARC/1.0\r\nWARC-Type: conversion\r\n"
    url = "https://fuzz.example/" + urlpart
    recs = (
        build_wet_record(url, datetime(2026, 1, 1), text)
        + build_wet_record(url + "/2", datetime(2026, 1, 2), evil)
    )
    got = list(parse_wet_records(recs))
    assert [r["url"] for r in got] == [url, url + "/2"]
    assert got[0]["text"] == text
    assert got[1]["text"] == evil


@given(
    st.lists(
        st.sampled_from(["add", "batch", "restart"]),
        min_size=1,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=3),
)
@settings(max_examples=120, deadline=None)
def test_warc_stream_offset_protocol_exactly_once(ops, max_files):
    """Model-based check of the stream reader's offset protocol under
    the ENGINE's real call order (latestOffset before any anchor, then
    partitions(start,end), then commit(end)) across arbitrary
    interleavings of file arrivals, microbatches, and restarts: every
    file is read exactly once, and offsets never move backward —
    the invariant the maxFilesPerTrigger+restart regression violated."""
    from hoover_snoop2_spark.sources.warc_datasource import WarcStreamReader

    files: list[str] = []

    class R(WarcStreamReader):
        def __init__(self):
            super().__init__(
                {"path": "/nonexistent/*",
                 "maxFilesPerTrigger": str(max_files)}
            )

        def _files(self):
            return sorted(files)

    reader = R()
    start = {"last": ""}  # engine-checkpointed offset
    seen: list[str] = []
    n = 0
    # drain at the end the way the engine does: keep triggering until a
    # microbatch makes no progress (a fixed drain count under-drains
    # when maxFilesPerTrigger chunks a long backlog)
    ops = ops + ["drain"]
    for op in ops:
        if op == "add":
            files.append(f"seg-{n:05d}")
            n += 1
            continue
        if op == "restart":
            reader = R()  # in-process watermark lost; checkpoint kept
            continue
        while True:
            end = reader.latestOffset()
            assert end["last"] >= start["last"], "offset moved backward"
            batch = [p.path for p in reader.partitions(start, end)]
            seen.extend(batch)
            if max_files:
                # live chunking bound (first-anchor batch is exempt)
                assert len(batch) <= max(max_files, len(files))
            start = end
            reader.commit(end)
            if op != "drain" or not batch:
                break
    assert sorted(seen) == sorted(files), "lost or duplicated files"
    assert len(seen) == len(set(seen))
