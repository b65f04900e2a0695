"""Email parse + meta fields — assertion shapes mirror the reference's
test_emails.py:40-161 (subject/date/recipients/attachments/text)."""

from hoover_snoop2_spark.corpus import render_eml
from hoover_snoop2_spark.operators.email_parse import (
    attachments_of,
    email_meta,
    parse_email_bytes,
    read_header,
)


def test_parse_known_eml():
    eml, golden, atts = render_eml(103, "en")
    data = parse_email_bytes(eml)
    meta = email_meta(data)
    assert meta["text"] == golden
    assert meta["subject"].startswith("Report 103")
    assert meta["from"] == ["user50@mail4.example"]
    assert meta["to"] == ["team16@corp5.example"]
    assert set(meta["email-domains"]) == {"mail4.example", "corp5.example"}
    assert meta["date"].endswith("Z")  # zulu format (utils/__init__.py:59)
    got_atts = attachments_of(data)
    assert [a[0] for a in got_atts] == [a[0] for a in atts]
    assert [a[1] for a in got_atts] == [a[1] for a in atts]


def test_bom_stripped():
    eml, golden, _ = render_eml(7, "en")
    assert email_meta(parse_email_bytes(b"\xef\xbb\xbf" + eml))["text"] == golden


def test_multi_encoding_header():
    # RFC 2047 encoded-word headers decode via make_header (email.py:69-90)
    assert read_header("=?utf-8?b?dMOzcGlj?=") == "tópic"
    assert read_header("=?iso-8859-1?q?caf=E9?=") == "café"


def test_recipient_fold_order_preserving_dedup():
    raw = (
        b"From: a@x.example\r\nTo: b@y.example, c@z.example\r\n"
        b"Cc: b@y.example\r\nSubject: s\r\n\r\nbody"
    )
    meta = email_meta(parse_email_bytes(raw))
    # To + Cc fold into 'to' with order-preserving dedup (email.py:232-252)
    assert meta["to"] == ["b@y.example, c@z.example", "b@y.example"]
    assert meta["cc"] == ["b@y.example"]


def test_header_dump():
    raw = b"From: a@x.example\r\nX-Custom: v1\r\nX-Custom: v2\r\n\r\nbody"
    meta = email_meta(parse_email_bytes(raw))
    assert "X-Custom=v1" in meta["email-header"]
    assert "X-Custom=v2" in meta["email-header"]
    assert "X-Custom" in meta["email-header-key"]


def test_email_header_in_digest_and_sink(spark, digests):
    """email-header / email-header-key flow through the digest table into
    the ES sink (reference indexing.py:70-71)."""
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.operators.es_sink import to_es_documents

    eml = digests.filter(F.col("mime_type") == "message/rfc822").first()
    assert eml["email_header"] and any(
        h.startswith("Subject=") for h in eml["email_header"]
    )
    assert "Subject" in eml["email_header_key"]
    es = to_es_documents(digests)
    row = es.filter(F.col("content-type") == "message/rfc822").first()
    assert row["email-header"] and row["email-header-key"]


def test_mhtml_saved_page_extracts_html_body():
    """MHTML (.mht saved web page) is MIME multipart/related — it must
    route through the rfc822 path and surface the html part's text,
    with the page title as the subject."""
    from hoover_snoop2_spark.operators.analyze import analyze_blob

    mht = (
        b"From: <Saved by WebBrowser>\r\n"
        b"Subject: Test Page\r\n"
        b"Date: Mon, 01 Jan 2024 00:00:00 +0000\r\n"
        b"MIME-Version: 1.0\r\n"
        b'Content-Type: multipart/related; boundary="--bnd"\r\n\r\n'
        b"----bnd\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        b"Content-Location: https://example.org/page\r\n\r\n"
        b"<html><body><p>Saved page body text.</p></body></html>\r\n"
        b"----bnd--\r\n"
    )
    rows = analyze_blob("k", mht)
    digest = [r for r in rows if r["kind"] == "digest"][0]
    assert digest["mime_type"] == "message/rfc822"
    assert digest["text"] == "Saved page body text."
    assert digest["subject"] == "Test Page"
    assert digest["status"] == "success"


def test_boundary_matcher_matches_stdlib_regex():
    """The r6 feedparser boundary fast path must agree with the original
    per-message compiled pattern — same match/None and same captured
    groups — over structured and random (separator, line) pairs."""
    import random
    import re as _re

    from hoover_snoop2_spark.functions.mime_boundary import _compile

    rng = random.Random(99)
    seps = [
        "--simple", "--=_Part_12_345.678", '--b"quote', "--w[e]i(r)d+*?.^$|",
        "--", "--\\back\\slash", "--sp ace", "--tab\there", "--ünïcodé",
    ]
    for _ in range(30):
        seps.append("--" + "".join(rng.choice(
            "abcDEF0123=_.-()[]*+?^$|\\ \t") for _ in range(rng.randrange(1, 25))))

    tails = ["", "--", "-", " ", "\t \t", "--  ", "\n", "\r", "\r\n", "--\n",
             "-- \t\n", "--\r\n", " \r", "x", "--x", " x\n", "\n\n", "--\r\n\n",
             "\r\nx", "--junk", "\ntrailing", " -- \n"]
    for _ in range(60):
        tails.append("".join(rng.choice(" \t\r\n-x") for _ in range(rng.randrange(0, 8))))

    for sep in seps:
        pattern = ('(?P<sep>' + _re.escape(sep) +
                   r')(?P<end>--)?(?P<ws>[ \t]*)(?P<linesep>\r\n|\r|\n)?$')
        ref = _re.compile(pattern)
        fast = _compile(pattern)
        assert type(fast).__name__ == "_BoundaryMatcher", sep
        lines = [sep + t for t in tails] + tails + [sep[:-1] + t for t in tails]
        for line in lines:
            rm = ref.match(line)
            fm = fast.match(line)
            assert (rm is None) == (fm is None), (sep, line)
            if rm is not None:
                for g in ("sep", "end", "ws", "linesep"):
                    assert rm.group(g) == fm.group(g), (sep, line, g)
                assert rm.group(0) == fm.group(0), (sep, line)


def test_boundary_compile_fallback_untouched():
    """Patterns that are not the exact feedparser template must reach the
    real re.compile through the shim."""
    import email.feedparser as fp

    from hoover_snoop2_spark.functions.mime_boundary import (
        _ReShim,
        install,
    )

    install()
    assert isinstance(fp.re, _ReShim)
    # non-template pattern → real compiled regex
    p = fp.re.compile(r"abc(?P<x>\d+)")
    assert p.match("abc42").group("x") == "42"
    # template with flags → real compiled regex
    import re as _re
    tmpl = ('(?P<sep>' + _re.escape("--b") +
            r')(?P<end>--)?(?P<ws>[ \t]*)(?P<linesep>\r\n|\r|\n)?$')
    assert type(fp.re.compile(tmpl, _re.MULTILINE)).__name__ != "_BoundaryMatcher"
    # other attributes delegate
    assert fp.re.escape("a+b") == _re.escape("a+b")


def test_multipart_parse_identical_with_and_without_shim():
    """End-to-end: multipart messages parse to identical structures with
    the shim installed vs the pristine stdlib."""
    import email
    import email.feedparser as fp
    import random
    import re as _re

    from hoover_snoop2_spark.functions.mime_boundary import install

    rng = random.Random(5)
    msgs = []
    for i in range(40):
        b1 = f"=_bound{i}_{rng.randrange(10**9)}"
        b2 = f"inner{i}"
        body = (
            f"From: a@x.example\r\nTo: b@y.example\r\nSubject: t{i}\r\n"
            f'Content-Type: multipart/mixed; boundary="{b1}"\r\n\r\n'
            f"preamble\r\n--{b1}\r\n"
            f"Content-Type: text/plain\r\n\r\nhello {i}\r\n"
            f"--{b1}\r\n"
            f'Content-Type: multipart/alternative; boundary="{b2}"\r\n\r\n'
            f"--{b2}\r\nContent-Type: text/plain\r\n\r\nalt text\r\n"
            f"--{b2}--\r\n"
            f"--{b1}  \r\n"
            f"Content-Type: text/html\r\n\r\n<p>html {i}</p>\r\n"
            f"--{b1}--\r\nepilogue\r\n"
        ).encode()
        msgs.append(body)
    # a malformed one: unterminated inner multipart
    msgs.append(b"Content-Type: multipart/mixed; boundary=q\r\n\r\n--q\r\n"
                b"Content-Type: text/plain\r\n\r\nno closer\r\n")

    def dump(msg):
        if msg.is_multipart():
            return {
                "ct": msg.get_content_type(),
                "preamble": msg.preamble,
                "epilogue": msg.epilogue,
                "defects": [type(d).__name__ for d in msg.defects],
                "parts": [dump(p) for p in msg.get_payload()],
            }
        return {
            "ct": msg.get_content_type(),
            "payload": msg.get_payload(decode=True),
            "defects": [type(d).__name__ for d in msg.defects],
        }

    install()
    shimmed = [dump(email.message_from_bytes(m)) for m in msgs]
    saved = fp.re
    try:
        fp.re = _re  # pristine stdlib
        plain = [dump(email.message_from_bytes(m)) for m in msgs]
    finally:
        fp.re = saved
    assert shimmed == plain


def test_read_header_fast_path_matches_stdlib():
    """The plain-header fast path (no '=?') must equal the full
    make_header(decode_header(...)) round-trip for every header shape."""
    import email.header as H
    import random

    from hoover_snoop2_spark.operators.email_parse import read_header

    rng = random.Random(31)
    cases = [
        "plain subject", "", " ", "  leading", "trailing  ", "a\n b",
        "a\r\n\tb", "tab\there", "non-ascii é ü directly", 'quo"te; x',
        "x" * 300, "=?utf-8?q?enc=C3=A9ded?=", "pre =?utf-8?b?w6k=?= post",
        "=?bad?x?y?=", "=?", "a =? b", "=?utf-8?q?unterminated",
    ]
    for _ in range(200):
        cases.append("".join(rng.choice(
            "abc ?=\t\n;,:<>@é") for _ in range(rng.randrange(0, 60))))

    def ref(h):
        try:
            return str(H.make_header(H.decode_header(h)))
        except UnicodeDecodeError:
            return str(h)
        except Exception as e:  # HeaderParseError etc. — compare types
            return ("raised", type(e).__name__)

    def got(h):
        try:
            return read_header(h)
        except Exception as e:
            return ("raised", type(e).__name__)

    for h in cases:
        assert got(h) == ref(h), repr(h)
