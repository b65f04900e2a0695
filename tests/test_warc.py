"""WARC ingest (sources/warc.py): record grammar, gzip member handling,
file-granular and CDX-range read paths, pages-contract projection."""

import gzip
import os
from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR

from hoover_snoop2_spark.sources.warc import (
    WarcError,
    parse_warc_records,
    read_warc,
    read_warc_cdx,
    to_pages,
)


def _record(warc_type: str, url: str, date: str, payload: bytes,
            extra: dict | None = None) -> bytes:
    headers = [
        ("WARC-Type", warc_type),
        ("WARC-Date", date),
        ("WARC-Record-ID", f"<urn:uuid:{abs(hash((warc_type, url))):032x}>"),
        ("Content-Length", str(len(payload))),
    ]
    if url:
        headers.append(("WARC-Target-URI", url))
    for k, v in (extra or {}).items():
        headers.append((k, v))
    head = "WARC/1.0\r\n" + "".join(f"{k}: {v}\r\n" for k, v in headers)
    return head.encode() + b"\r\n" + payload + b"\r\n\r\n"


def _http_response(body: bytes, ctype: str = "text/html", status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


BODY_A = b"<html><body><p>alpha page</p></body></html>"
BODY_B = b"<html><body><p>beta page</p></body></html>"


def _build_records() -> list[bytes]:
    return [
        _record("warcinfo", "", "2024-01-01T00:00:00Z", b"software: test\r\n"),
        _record("request", "https://a.example/x", "2024-01-02T03:04:05Z",
                b"GET /x HTTP/1.1\r\nHost: a.example\r\n\r\n"),
        _record("response", "https://a.example/x", "2024-01-02T03:04:05Z",
                _http_response(BODY_A)),
        _record("response", "https://b.example/y", "2024-01-03T06:07:08Z",
                _http_response(BODY_B, ctype="text/html; charset=utf-8",
                               status=301)),
    ]


def test_parse_plain_stream():
    recs = list(parse_warc_records(b"".join(_build_records())))
    assert [r["url"] for r in recs] == ["https://a.example/x", "https://b.example/y"]
    assert recs[0]["html"] == BODY_A
    assert recs[0]["http_status"] == 200
    assert recs[0]["content_type"] == "text/html"
    assert recs[0]["warc_ts"] == datetime(2024, 1, 2, 3, 4, 5, tzinfo=timezone.utc)
    assert recs[1]["html"] == BODY_B
    assert recs[1]["http_status"] == 301


def test_parse_per_record_gzip_members():
    # Common-Crawl layout: every record its own gzip member, concatenated
    raw = b"".join(gzip.compress(r) for r in _build_records())
    recs = list(parse_warc_records(raw))
    assert [r["html"] for r in recs] == [BODY_A, BODY_B]


def test_parse_whole_stream_gzip():
    raw = gzip.compress(b"".join(_build_records()))
    assert [r["html"] for r in parse_warc_records(raw)] == [BODY_A, BODY_B]


def test_parse_bad_magic_raises():
    with pytest.raises(WarcError):
        list(parse_warc_records(b"NOTAWARC/1.0\r\n\r\n"))


def test_read_warc_binaryfile_path(spark, tmp_path):
    plain = tmp_path / "seg-0.warc"
    plain.write_bytes(b"".join(_build_records()))
    gz = tmp_path / "seg-1.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(r) for r in _build_records()))

    df = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = df.orderBy("warc_file", "url").collect()
    assert len(rows) == 4  # 2 responses per file
    assert {bytes(r["html"]) for r in rows} == {BODY_A, BODY_B}
    # pages projection carries the pinned contract
    pages = to_pages(df)
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    assert pages.count() == 4


def test_read_warc_cdx_range_reads(spark, tmp_path):
    # write per-record gzip members, tracking (offset, length) like a CDX
    warc_path = str(tmp_path / "seg.warc.gz")
    index = []
    with open(warc_path, "wb") as f:
        for rec in _build_records():
            member = gzip.compress(rec)
            index.append((warc_path, f.tell(), len(member)))
            f.write(member)

    cdx = spark.createDataFrame(index, "warc_file string, offset long, length long")
    # index-side pushdown: read ONLY the two response members
    responses = spark.createDataFrame(
        [index[2], index[3]], "warc_file string, offset long, length long"
    )
    got = read_warc_cdx(spark, responses, num_partitions=2).orderBy("url").collect()
    assert [bytes(r["html"]) for r in got] == [BODY_A, BODY_B]
    # full-index read skips non-response records on its own
    assert read_warc_cdx(spark, cdx).count() == 2


def test_warc_pages_flow_through_extraction(spark, tmp_path):
    """WARC-ingested html extracts byte-identically to the same html
    ingested via the parquet pages path."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    html = (
        b"<html><head><title>t</title></head><body>"
        b"<nav>boilerplate menu</nav>"
        b"<article><p>Real content paragraph one.</p>"
        b"<p>And paragraph two.</p></article></body></html>"
    )
    warc = tmp_path / "one.warc"
    warc.write_bytes(
        _record("response", "https://c.example/page", "2024-02-02T00:00:00Z",
                _http_response(html))
    )
    pages = to_pages(read_warc(spark, str(warc)))
    digests, _ = run_extraction(
        spark, pages, checkpoint_dir=str(tmp_path / "ckpt")
    )
    direct = spark.createDataFrame(
        [("https://c.example/page",
          datetime(2024, 2, 2, tzinfo=timezone.utc), html, None, None)],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    digests2, _ = run_extraction(
        spark, direct, checkpoint_dir=str(tmp_path / "ckpt2")
    )
    a = {(r["url"], r["text"]) for r in digests.select("url", "text").collect()}
    b = {(r["url"], r["text"]) for r in digests2.select("url", "text").collect()}
    assert a == b and len(a) >= 1


def test_index_warc_roundtrip_gzip_members(spark, tmp_path):
    """index once -> range-read via the index -> identical records."""
    from hoover_snoop2_spark.sources.warc import index_warc

    gz = tmp_path / "seg.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(r) for r in _build_records()))

    cdx = index_warc(spark, str(gz))
    rows = cdx.orderBy("offset").collect()
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "request", "response", "response"]
    assert rows[2]["http_status"] == 200 and rows[3]["http_status"] == 301
    assert rows[2]["content_type"] == "text/html"

    # index-side pushdown, then range reads
    responses = cdx.filter("warc_type = 'response' and http_status = 200")
    got = read_warc_cdx(spark, responses).collect()
    assert [bytes(r["html"]) for r in got] == [BODY_A]


def test_index_warc_roundtrip_plain(spark, tmp_path):
    from hoover_snoop2_spark.sources.warc import index_warc

    plain = tmp_path / "seg.warc"
    plain.write_bytes(b"".join(_build_records()))
    cdx = index_warc(spark, str(plain))
    responses = cdx.filter("warc_type = 'response'")
    got = read_warc_cdx(spark, responses).orderBy("url").collect()
    assert [bytes(r["html"]) for r in got] == [BODY_A, BODY_B]


def test_chunked_transfer_encoding_dechunked():
    body = b"5\r\nalpha\r\n6\r\n page!\r\n0\r\n\r\n"
    payload = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + body
    )
    rec = _record("response", "https://ch.example/x", "2024-01-01T00:00:00Z",
                  payload)
    recs = list(parse_warc_records(rec))
    assert recs[0]["html"] == b"alpha page!"


def test_chunked_framing_violation_returns_raw():
    # a body CLAIMING chunked but not actually framed must survive verbatim
    payload = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
        b"<html>not actually chunked</html>"
    )
    rec = _record("response", "https://ch.example/y", "2024-01-01T00:00:00Z",
                  payload)
    recs = list(parse_warc_records(rec))
    assert recs[0]["html"] == b"<html>not actually chunked</html>"


def test_revisit_records_surface_as_pointer_table(spark, tmp_path):
    from hoover_snoop2_spark.sources.warc import read_warc_revisits

    recs = _build_records() + [
        _record("revisit", "https://a.example/x", "2024-03-01T00:00:00Z",
                b"", extra={
                    "WARC-Refers-To": "<urn:uuid:00000000000000000000000000000001>",
                    "WARC-Refers-To-Target-URI": "https://a.example/x",
                    "WARC-Payload-Digest": "sha1:ABCDEF",
                    "WARC-Profile": "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest",
                }),
    ]
    warc = tmp_path / "seg.warc.gz"
    warc.write_bytes(b"".join(gzip.compress(r) for r in recs))

    rv = read_warc_revisits(spark, str(warc)).collect()
    assert len(rv) == 1
    assert rv[0]["url"] == "https://a.example/x"
    assert rv[0]["payload_digest"] == "sha1:ABCDEF"
    assert rv[0]["refers_to_target_uri"] == "https://a.example/x"
    # collected Spark timestamps are session-tz naive (session tz = UTC)
    assert rv[0]["warc_ts"] == datetime(2024, 3, 1)

    # pages read still returns only true responses — revisits never
    # masquerade as content rows
    pages = read_warc(spark, str(warc))
    assert pages.count() == 2


def test_index_warc_whole_stream_gzip_no_duplication(spark, tmp_path):
    """A whole-stream-gzipped WARC (ONE gzip member, many records) must
    index each record's span inside the inflated member; range reads then
    yield every response exactly once instead of re-parsing the full
    member per CDX row."""
    from hoover_snoop2_spark.sources.warc import index_warc

    gz = tmp_path / "whole.warc.gz"
    gz.write_bytes(gzip.compress(b"".join(_build_records())))

    cdx = index_warc(spark, str(gz))
    rows = cdx.orderBy("rec_offset").collect()
    # all rows share the single member span but carry distinct rec spans
    assert len({(r["offset"], r["length"]) for r in rows}) == 1
    assert len({(r["rec_offset"], r["rec_length"]) for r in rows}) == len(rows)

    responses = cdx.filter("warc_type = 'response'")
    got = read_warc_cdx(spark, responses).orderBy("url").collect()
    assert [bytes(r["html"]) for r in got] == [BODY_A, BODY_B]


def test_read_warc_cdx_without_rec_span_columns(spark, tmp_path):
    """External CDX tables (Common Crawl's published index) carry only
    (warc_file, offset, length) — the reader must keep accepting them."""
    rows = []
    data = b""
    for rec in _build_records():
        member = gzip.compress(rec)
        rows.append(("f", len(data), len(member)))
        data += member
    f = tmp_path / "seg.warc.gz"
    f.write_bytes(data)
    cdx = spark.createDataFrame(
        [(str(f), off, ln) for _, off, ln in rows],
        "warc_file string, offset long, length long",
    )
    got = read_warc_cdx(spark, cdx).orderBy("url").collect()
    assert [bytes(r["html"]) for r in got] == [BODY_A, BODY_B]


def test_wet_roundtrip_spark(spark, tmp_path):
    """Extraction digests → WET files (per-record gzip members) → read
    back: url/timestamp/text byte-identical; manifest counts match."""
    from hoover_snoop2_spark.sources.warc import read_wet, write_wet

    rows = [
        ("https://a.example/1", datetime(2026, 1, 2, 3, 4, 5), "hello world"),
        ("https://b.example/2", datetime(2026, 2, 3, 4, 5, 6), "unicode 通 text"),
        ("https://c.example/3", None, ""),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = str(tmp_path / "wet")
    manifest = write_wet(df.repartition(2), out).collect()
    assert sum(m.n_records for m in manifest) == 3
    back = read_wet(spark, out + "/*.warc.wet.gz")
    got = {r.url: (r.warc_ts, r.text) for r in back.collect()}
    assert got["https://a.example/1"] == (datetime(2026, 1, 2, 3, 4, 5), "hello world")
    assert got["https://b.example/2"][1] == "unicode 通 text"
    assert got["https://c.example/3"][1] == ""


def test_wet_record_deterministic_and_parseable():
    from hoover_snoop2_spark.sources.warc import (
        build_wet_record,
        parse_wet_records,
    )

    a = build_wet_record("https://x.example/p", datetime(2026, 3, 1), "text body")
    b = build_wet_record("https://x.example/p", datetime(2026, 3, 1), "text body")
    assert a == b  # UUIDv5 record id — no random state
    recs = list(parse_wet_records(a))
    assert len(recs) == 1
    assert recs[0]["url"] == "https://x.example/p"
    assert recs[0]["text"] == "text body"
    # response records are NOT conversion records — filtered out
    from hoover_snoop2_spark.sources.warc import parse_warc_records
    assert list(parse_warc_records(a)) == []


def test_q224_record_matches_build_wet_record(spark):
    """q224's SQL-rendered framing is byte-identical to the sink's
    `build_wet_record` output for every row, except the
    WARC-Record-ID line (UUIDv5 needs sha1, absent in the oracle
    engine) — the one header the query deliberately omits."""
    from hoover_snoop2_spark.queries import QUERIES
    from hoover_snoop2_spark.sources.warc import build_wet_record

    rows = QUERIES["q224_wet_export"](spark, SF_DIR).limit(50).collect()
    assert rows
    for r in rows:
        ts = datetime.strptime(r.warc_date, "%Y-%m-%dT%H:%M:%SZ")
        real = build_wet_record(r.url, ts, None).decode("utf-8")
        # drop the record-id line from the sink's header block; body is
        # compared via content_length (query text col vs sink's bytes)
        real_lines = [
            ln for ln in real.split("\r\n")
            if not ln.startswith("WARC-Record-ID:")
        ]
        got_head = r.record.split("\r\n\r\n", 1)[0].split("\r\n")
        exp_head = "\r\n".join(real_lines).split("\r\n\r\n", 1)[0].split("\r\n")
        # content-length differs (query uses the doc's text, sink got None)
        got_head = [h for h in got_head if not h.startswith("Content-Length:")]
        exp_head = [h for h in exp_head if not h.startswith("Content-Length:")]
        assert got_head == exp_head
        body = r.record.split("\r\n\r\n", 1)[1]
        assert body.endswith("\r\n\r\n")
        assert len(body[:-4].encode("utf-8")) == r.content_length


def test_content_encoding_gzip_and_deflate_inflated():
    """Bodies stored with HTTP Content-Encoding (the wire payload, as
    crawlers record it) are inflated: gzip, zlib-wrapped deflate, and
    the raw-deflate form broken servers send; an unknown coding (br
    without a lib) and corrupt bytes pass through unchanged."""
    import zlib as _zlib

    def resp(body: bytes, enc: str) -> bytes:
        return (
            f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            f"Content-Encoding: {enc}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body

    page = b"<html><body><p>compressed page</p></body></html>"
    cases = [
        ("https://e.example/gz", resp(gzip.compress(page), "gzip"), page),
        ("https://e.example/df",
         resp(_zlib.compress(page), "deflate"), page),
        ("https://e.example/raw", resp((lambda co: co.compress(page)
         + co.flush())(_zlib.compressobj(wbits=-15)), "deflate"), page),
        ("https://e.example/br", resp(b"\x0bunknown", "br"), b"\x0bunknown"),
        ("https://e.example/bad", resp(b"not gzip", "gzip"), b"not gzip"),
    ]
    raw = b"".join(
        _record("response", url, "2026-01-01T00:00:00Z", payload)
        for url, payload, _ in cases
    )
    got = {r["url"]: r["html"] for r in parse_warc_records(raw)}
    for url, _, want in cases:
        assert got[url] == want, url


# ---- .warc.zst (IIPC zstd convention) — r4 continuation ----


def _zst_frames(records, group=1):
    from hoover_snoop2_spark.functions.zstd_codec import zstd_compress_store

    out = b""
    for i in range(0, len(records), group):
        out += zstd_compress_store(b"".join(records[i : i + group]))
    return out


def test_parse_warc_zst_per_record_frames():
    recs = _build_records()
    for group in (1, 2, len(recs)):
        rows = list(parse_warc_records(_zst_frames(recs, group), "t.warc.zst"))
        assert [r["url"] for r in rows] == [
            "https://a.example/x", "https://b.example/y",
        ]
        assert rows[0]["html"] == BODY_A


def test_parse_warc_zst_leading_skippable_metadata():
    import struct as _struct

    # a non-dictionary skippable frame (e.g. crawler metadata) is skipped
    skip = _struct.pack("<II", 0x184D2A50, 4) + b"meta"
    raw = skip + _zst_frames(_build_records())
    rows = list(parse_warc_records(raw, "t.warc.zst"))
    assert len(rows) == 2


def test_parse_warc_zst_dictionary_refused():
    import struct as _struct

    dict_frame = _struct.pack("<II", 0x184D2A5D, 8) + b"dictbyte"
    raw = dict_frame + _zst_frames(_build_records())
    with pytest.raises(WarcError, match="dictionary"):
        list(parse_warc_records(raw, "t.warc.zst"))


def test_read_index_cdx_warc_zst(spark, tmp_path):
    from hoover_snoop2_spark.sources.warc import index_warc

    p = tmp_path / "seg.warc.zst"
    p.write_bytes(_zst_frames(_build_records(), group=2))
    df = read_warc(spark, str(p))
    assert df.count() == 2

    idx = index_warc(spark, str(p))
    rows = idx.orderBy("rec_offset").collect()
    # 4 records across 2 frames, each with its own in-frame span
    assert len(rows) == 4
    assert {r.warc_type for r in rows} == {
        "warcinfo", "request", "response",
    }
    responses = idx.filter(F.col("warc_type") == "response")
    pages = read_warc_cdx(spark, responses).orderBy("url").collect()
    assert [r.url for r in pages] == [
        "https://a.example/x", "https://b.example/y",
    ]
    assert bytes(pages[0].html) == BODY_A


# ---------------------------------------------------------------------------
# WAT (metadata sidecar) — build/parse/sink
# ---------------------------------------------------------------------------


def test_wat_html_metadata_document_order():
    from hoover_snoop2_spark.sources.warc import wat_html_metadata

    html = (b'<html><head><title> My Page </title>'
            b'<link href="https://c.example/s.css" rel="stylesheet">'
            b'</head><body>'
            b'<img src="https://img.example/top.png">'
            b'<a href="https://a.example/1">one</a>'
            b'<script src="https://cdn.example/s.js"></script>'
            b'<a href="https://a.example/2">two</a></body></html>')
    title, links = wat_html_metadata(html)
    assert title == "My Page"
    assert links == [
        ("LINK@/href", "https://c.example/s.css"),
        ("IMG@/src", "https://img.example/top.png"),
        ("A@/href", "https://a.example/1"),
        ("SCRIPT@/src", "https://cdn.example/s.js"),
        ("A@/href", "https://a.example/2"),
    ]
    # no title, no links
    assert wat_html_metadata(b"<html><body>plain</body></html>") == (
        None, [])


def test_wat_record_deterministic_and_parseable():
    import json

    from hoover_snoop2_spark.sources.warc import (
        build_wat_record,
        parse_warc_records,
        parse_wat_records,
    )

    html = (b'<html><head><title>T</title></head>'
            b'<body><a href="https://a.example/x">x</a></body></html>')
    a = build_wat_record("https://x.example/p", datetime(2026, 3, 1), html)
    b = build_wat_record("https://x.example/p", datetime(2026, 3, 1), html)
    assert a == b  # UUIDv5 record id — no random state
    # the id is a pinned function of (url, date, type)
    assert b"WARC-Record-ID: <urn:uuid:" in a
    recs = list(parse_wat_records(a))
    assert len(recs) == 1
    assert recs[0]["url"] == "https://x.example/p"
    assert recs[0]["title"] == "T"
    assert recs[0]["links"] == [("A@/href", "https://a.example/x")]
    # metadata records are NOT response/conversion records
    assert list(parse_warc_records(a)) == []
    # the body is well-formed compact JSON with the CC envelope shape
    body = bytes(a).split(b"\r\n\r\n", 1)[1].rstrip(b"\r\n")
    env = json.loads(body)
    assert env["Envelope"]["Format"] == "WARC"
    hm = (env["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"]
          ["HTML-Metadata"])
    assert hm["Head"]["Title"] == "T"
    assert hm["Links"] == [{"path": "A@/href", "url": "https://a.example/x"}]


def test_wat_roundtrip_spark(spark, tmp_path):
    """Pages → WAT files (per-record gzip members) → parse back:
    title/links byte-identical; manifest counts match."""
    import glob

    from hoover_snoop2_spark.sources.warc import parse_wat_records, write_wat

    rows = [
        ("https://a.example/1", datetime(2026, 1, 2, 3, 4, 5),
         bytearray(b'<html><head><title>A</title></head><body>'
                   b'<a href="https://b.example/2">x</a></body></html>')),
        ("https://b.example/2", datetime(2026, 2, 3, 4, 5, 6),
         bytearray(b"<html><body>no head</body></html>")),
        ("https://c.example/3", None, None),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    out = str(tmp_path / "wat")
    manifest = write_wat(df.repartition(2), out).collect()
    assert sum(m.n_records for m in manifest) == 3
    got = {}
    for path in glob.glob(out + "/*.warc.wat.gz"):
        with open(path, "rb") as f:
            for rec in parse_wat_records(f.read(), path):
                got[rec["url"]] = rec
    assert set(got) == {"https://a.example/1", "https://b.example/2",
                        "https://c.example/3"}
    assert got["https://a.example/1"]["title"] == "A"
    assert got["https://a.example/1"]["links"] == [
        ("A@/href", "https://b.example/2")]
    assert got["https://b.example/2"]["title"] is None
    assert got["https://b.example/2"]["links"] == []
    # None html + None ts: empty metadata, epoch date
    assert got["https://c.example/3"]["warc_ts"].year == 1970
