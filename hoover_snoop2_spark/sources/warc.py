"""WARC (ISO 28500 / WARC/1.0-1.1) ingest → the pinned pages table.

Common-Crawl-style corpora arrive as WARC container files; the pipeline's
input contract is ``pages(url, warc_ts, html, text, lang)`` (corpus.py).
This module bridges the two with two read paths that differ only in how
parallelism is obtained:

- ``read_warc(spark, path_glob)`` — one task per FILE via the binaryFile
  source.  Right when files are plentiful and moderate (Common Crawl ships
  ~72k segment files of ~1 GB per crawl, far more files than executors).
  A whole file is one task, so per-file memory is bounded by the largest
  file — use the CDX path if files are huge or few.

- ``read_warc_cdx(spark, cdx)`` — one task per RECORD RANGE via a CDX(J)
  index DataFrame (filename, offset, length).  Common Crawl gzips each
  record as its own gzip member precisely so byte ranges are independently
  decompressible; this path repartitions the index, seeks, and inflates
  only the referenced members.  This is the 100-TB route: parallelism is
  index-driven (and predicate pushdown happens on the *index* — filter by
  url/host/mime before any WARC byte is read).

Parsing is pure stdlib (record grammar: version line, CRLF-terminated
headers, Content-Length payload, CRLF CRLF separator; response records
carry an inner HTTP/1.x message whose body is the html payload).  Both
paths run inside mapInPandas — Arrow-batched, no per-row Python UDF —
and emit identical schemas.

Reference parity: the reference walks a filesystem for input
(snoop/data/filesystem.py:60-118); a web-scale corpus walks WARC
containers instead, so this is the filesystem.walk analog for crawls.
"""

from __future__ import annotations

import gzip
import io
import re
import struct
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: output schema — superset of the pages contract (text/lang left null by
#: ingest; content_type/status kept for filtering before extraction)
WARC_PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, "
    "content_type string, http_status int, warc_file string"
)

_MAX_HEADER = 64 * 1024


def _local_path(p: str) -> str:
    """binaryFile reports file:-scheme URIs; range reads open them
    locally (on a cluster this is an object-store ranged GET instead)."""
    if p.startswith("file://"):
        return p[len("file://"):]
    if p.startswith("file:"):
        return p[len("file:"):]
    return p


class WarcError(ValueError):
    pass


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    last = None
    for line in block.split(b"\r\n"):
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last:  # RFC 822 continuation
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        if b":" not in line:
            continue
        k, v = line.split(b":", 1)
        last = k.strip().decode("latin-1").lower()
        headers[last] = v.strip().decode("latin-1")
    return headers


def _decode_content(body: bytes, content_encoding: str) -> bytes:
    """Inflate an HTTP Content-Encoding'd body (RFC 9110 §8.4.1:
    gzip/x-gzip, deflate — both zlib-wrapped and the raw-deflate form
    broken servers send — and zstd per RFC 8878 §7.2 via the in-repo
    codec).  Same safety contract as :func:`_dechunk`: any decode
    failure (or an encoding we can't do, e.g. br without a brotli lib)
    returns the original bytes — a wrong guess must never lose
    payload."""
    enc = content_encoding.strip().lower()
    try:
        if enc in ("gzip", "x-gzip"):
            return gzip.decompress(body)
        if enc == "deflate":
            try:
                return zlib.decompress(body)
            except zlib.error:  # raw deflate, no zlib header
                return zlib.decompress(body, -15)
        if enc == "zstd":
            from ..functions.zstd_codec import zstd_decompress

            return zstd_decompress(body)
        if enc == "br":
            from ..functions.brotli_codec import (
                brotli_available,
                brotli_decompress,
            )

            if brotli_available():
                return brotli_decompress(body)
    except Exception:
        return body
    return body


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer coding (RFC 9112 §7.1).  On any
    framing violation the original bytes come back unchanged — a wrong
    guess must never lose payload."""
    out = bytearray()
    pos = 0
    n = len(body)
    while True:
        eol = body.find(b"\r\n", pos)
        if eol < 0:
            return bytes(body)
        size_tok = body[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            return bytes(body)
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) are framing, not payload
        if pos + size > n:
            return bytes(body)
        out += body[pos : pos + size]
        pos += size
        if body[pos : pos + 2] != b"\r\n":
            return bytes(body)
        pos += 2


def _parse_warc_date(s: str) -> datetime | None:
    # WARC-Date is ISO 8601 Zulu, second or sub-second precision
    try:
        return datetime.fromisoformat(s.replace("Z", "+00:00")).astimezone(
            timezone.utc
        )
    except ValueError:
        return None


def _gunzip_members(raw: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(offset, compressed_length, inflated_bytes) per gzip member —
    Common Crawl compresses each record as its own member precisely so
    these spans are independently fetchable (the CDX contract)."""
    pos = 0
    n = len(raw)
    while pos < n:
        dec = zlib.decompressobj(wbits=31)
        data = dec.decompress(raw[pos:]) + dec.flush()
        end = n - len(dec.unused_data)
        yield pos, end - pos, data
        if end == pos:  # safety: no forward progress
            raise WarcError(f"stalled gzip member walk at {pos}")
        pos = end


#: IIPC .warc.zst dictionary frame magic (a skippable frame carrying a
#: shared compression dictionary; frames that used it can't decode
#: standalone, so its presence is a typed refusal, not a wrong parse)
_WARC_ZST_DICT_MAGIC = 0x184D2A5D


def _unzstd_members(raw: bytes) -> Iterator[tuple[int, int, bytes]]:
    """(offset, compressed_length, inflated_bytes) per zstd frame — the
    ``.warc.zst`` convention compresses record groups as independent
    frames so spans stay range-fetchable, the zstd analogue of Common
    Crawl's per-record gzip members."""
    from ..functions.zstd_codec import ZstdError, iter_zstd_frames

    try:
        for off, ln, kind, payload in iter_zstd_frames(raw):
            if kind == "skippable":
                (magic,) = struct.unpack_from("<I", raw, off)
                if magic == _WARC_ZST_DICT_MAGIC:
                    raise WarcError(
                        "warc.zst dictionary frames unsupported "
                        "(frames are not standalone-decodable)"
                    )
                continue
            yield off, ln, payload
    except ZstdError as e:
        raise WarcError(f"bad zstd frame: {e}") from e


def _is_zstd_stream(raw: bytes) -> bool:
    """zstd data frame OR a leading skippable frame (a .warc.zst may
    open with its dictionary/metadata skippable frame)."""
    if len(raw) < 4:
        return False
    (magic,) = struct.unpack_from("<I", raw, 0)
    return magic == 0xFD2FB528 or 0x184D2A50 <= magic <= 0x184D2A5F


def _inflate_stream(raw: bytes) -> bytes:
    """Whole-stream inflate for record parsing: gzip members, zstd
    frames (.warc.zst), or plain bytes unchanged."""
    if raw[:2] == b"\x1f\x8b":
        return b"".join(data for _, _, data in _gunzip_members(raw))
    if _is_zstd_stream(raw):
        return b"".join(data for _, _, data in _unzstd_members(raw))
    return raw


def _iter_raw_records(
    raw: bytes, warc_file: str = ""
) -> Iterator[tuple[int, int, dict[str, str], bytes]]:
    """(start, end, headers, payload) per record in an UNCOMPRESSED
    stream."""
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        start = pos
        if not raw[pos : pos + 5] == b"WARC/":
            raise WarcError(f"bad record magic at offset {pos} in {warc_file!r}")
        hdr_end = raw.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
        if hdr_end < 0:
            raise WarcError(f"unterminated WARC header at {pos} in {warc_file!r}")
        headers = _parse_headers(raw[pos:hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise WarcError(f"missing Content-Length at {pos} in {warc_file!r}")
        body_start = hdr_end + 4
        payload = raw[body_start : body_start + length]
        pos = body_start + length
        yield start, pos, headers, payload


def parse_warc_records(
    raw: bytes, warc_file: str = ""
) -> Iterator[dict]:
    """Yield one dict per *response* record in a WARC byte stream.

    Accepts plain streams, whole-stream gzip, and Common-Crawl-style
    per-record gzip members.
    """
    raw = _inflate_stream(raw)

    for _start, _end, headers, payload in _iter_raw_records(raw, warc_file):
        if headers.get("warc-type") != "response":
            continue  # warcinfo/request/metadata/revisit records
        url = headers.get("warc-target-uri", "")
        ts = _parse_warc_date(headers.get("warc-date", ""))

        # inner HTTP/1.x response: status line + headers + CRLF CRLF + body
        status, ctype, html = 0, "", payload
        if payload[:5] in (b"HTTP/",):
            hend = payload.find(b"\r\n\r\n")
            if hend >= 0:
                head = payload[:hend]
                html = payload[hend + 4 :]
                first, _, rest = head.partition(b"\r\n")
                parts = first.split(None, 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                http_headers = _parse_headers(rest)
                ctype = http_headers.get("content-type", "")
                # crawlers often store the wire bytes verbatim — a chunked
                # body must be de-chunked or the html is framing-polluted
                if "chunked" in http_headers.get("transfer-encoding", "").lower():
                    html = _dechunk(html)
                # same goes for Content-Encoding: the stored body is the
                # compressed wire payload, useless to every downstream
                # extractor until inflated (transfer coding first, then
                # content coding — the reverse of how the server applied
                # them, RFC 9110 §8.4)
                html = _decode_content(
                    html, http_headers.get("content-encoding", "")
                )
        yield {
            "url": url,
            "warc_ts": ts,
            "html": html,
            "content_type": ctype,
            "http_status": status,
            "warc_file": warc_file,
        }


def _records_df(it: Iterator[dict]) -> Iterator[pd.DataFrame]:
    batch: list[dict] = []
    for rec in it:
        batch.append(rec)
        if len(batch) >= 256:
            yield pd.DataFrame(batch)
            batch = []
    if batch:
        yield pd.DataFrame(batch)


def parse_warc_revisits(raw: bytes, warc_file: str = "") -> Iterator[dict]:
    """Yield one dict per *revisit* record — the crawl's own URL-level
    dedup assertions (WARC 1.1 §6.7.2): a re-fetch whose payload matched
    an earlier capture is stored as a pointer (refers-to + payload
    digest) instead of the bytes.  Feeding these into the pipeline's
    dedup avoids re-extracting content the crawler already identified as
    unchanged."""
    raw = _inflate_stream(raw)
    for _s, _e, headers, _payload in _iter_raw_records(raw, warc_file):
        if headers.get("warc-type") != "revisit":
            continue
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
            "refers_to": headers.get("warc-refers-to", ""),
            "refers_to_target_uri": headers.get(
                "warc-refers-to-target-uri", ""
            ),
            "payload_digest": headers.get("warc-payload-digest", ""),
            "warc_file": warc_file,
        }


WARC_REVISIT_SCHEMA = (
    "url string, warc_ts timestamp, refers_to string, "
    "refers_to_target_uri string, payload_digest string, warc_file string"
)


def read_warc_revisits(spark: SparkSession, path_glob: str) -> DataFrame:
    """Revisit pointer table for a WARC glob — anti-join the pages read
    against it (or map urls to their referred capture) before running
    extraction."""
    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                batch = list(
                    parse_warc_revisits(bytes(row["content"]), row["path"])
                )
                if batch:
                    yield pd.DataFrame(batch)

    return files.select("path", "content").mapInPandas(
        parse, WARC_REVISIT_SCHEMA
    )


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """One task per WARC file (binaryFile source) → pages rows.

    The binaryFile scan prunes to (path, content); record parsing runs in
    mapInPandas so the html payloads travel Arrow-batched.  Filter/limit
    on url or content_type afterwards — at file granularity there is
    nothing to push below the record parse.
    """
    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield from _records_df(
                    parse_warc_records(bytes(row["content"]), row["path"])
                )

    return files.select("path", "content").mapInPandas(parse, WARC_PAGES_SCHEMA)


def read_warc_cdx(
    spark: SparkSession, cdx: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """Record-range reads driven by a CDX index: one gzip member per row.

    ``cdx`` must carry (warc_file string, offset long, length long) —
    exactly what Common Crawl's cdx-index / columnar index publishes.
    Pre-filter the index (host, mime, status, dedup by url) BEFORE calling:
    that is the predicate pushdown of this source — untouched records are
    never read, let alone inflated.

    Parallelism is index-driven: the index repartitions round-robin so
    range reads spread evenly regardless of how many distinct files there
    are (a single 1 GB WARC still fans out across the cluster).
    """
    has_rec_span = "rec_offset" in cdx.columns and "rec_length" in cdx.columns
    cols = ["warc_file", "offset", "length"]
    if has_rec_span:
        cols += ["rec_offset", "rec_length"]
    idx = cdx.select(*cols)
    if num_partitions:
        idx = idx.repartition(num_partitions)

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        handles: dict[str, io.BufferedReader] = {}
        # last inflated member, keyed by (fname, offset): rows of a shared
        # whole-stream-gzip member arrive adjacent (index order), so a
        # 1-deep cache decompresses each member once, not once per record
        last_key: tuple[str, int] | None = None
        last_data: bytes = b""
        try:
            for pdf in batches:
                for _, row in pdf.iterrows():
                    fname = _local_path(row["warc_file"])
                    fh = handles.get(fname)
                    if fh is None:
                        fh = handles[fname] = open(fname, "rb")
                    off = int(row["offset"])
                    key = (fname, off)
                    if key == last_key:
                        data = last_data
                    else:
                        fh.seek(off)
                        member = fh.read(int(row["length"]))
                        if member[:2] == b"\x1f\x8b":
                            data = b"".join(
                                d for _, _, d in _gunzip_members(member)
                            )
                        elif _is_zstd_stream(member):
                            data = b"".join(
                                d for _, _, d in _unzstd_members(member)
                            )
                        else:
                            data = member
                        last_key, last_data = key, data
                    if has_rec_span and pd.notna(row["rec_length"]):
                        s = int(row["rec_offset"])
                        data_slice = data[s : s + int(row["rec_length"])]
                    else:
                        data_slice = data
                    yield from _records_df(
                        parse_warc_records(data_slice, fname)
                    )
        finally:
            for fh in handles.values():
                fh.close()

    return idx.mapInPandas(fetch, WARC_PAGES_SCHEMA)


#: CDX(J)-shaped index schema: the byte span plus the filterable fields a
#: crawl index publishes (url / type / mime / status).  (offset, length)
#: address the fetchable unit (gzip member or raw slice); (rec_offset,
#: rec_length) address the single record INSIDE the inflated member, so a
#: whole-stream-gzipped WARC (one member, many records) indexes each
#: record individually instead of re-emitting the full member per row.
WARC_CDX_SCHEMA = (
    "warc_file string, offset long, length long, rec_offset long, "
    "rec_length long, url string, warc_type string, http_status int, "
    "content_type string"
)


def index_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Build the CDX index for WARC files — (warc_file, offset, length)
    byte spans per record plus filter columns.  One pass over each file
    (binaryFile granularity); the output feeds read_warc_cdx, closing the
    loop: index once, then every downstream job does index-pruned range
    reads instead of full-file scans.

    gzip inputs index the compressed member spans (what a range fetch
    must read); plain inputs index raw record spans.  Both are accepted
    back by read_warc_cdx/parse_warc_records unchanged.
    """
    files = spark.read.format("binaryFile").load(path_glob)

    def _entry(path, off, ln, rec_off, rec_ln, headers, payload):
        status, ctype = 0, ""
        if payload[:5] == b"HTTP/":
            hend = payload.find(b"\r\n\r\n")
            if hend >= 0:
                first, _, rest = payload[:hend].partition(b"\r\n")
                parts = first.split(None, 2)
                if len(parts) >= 2 and parts[1].isdigit():
                    status = int(parts[1])
                ctype = _parse_headers(rest).get("content-type", "")
        return {
            "warc_file": path,
            "offset": off,
            "length": ln,
            "rec_offset": rec_off,
            "rec_length": rec_ln,
            "url": headers.get("warc-target-uri", ""),
            "warc_type": headers.get("warc-type", ""),
            "http_status": status,
            "content_type": ctype,
        }

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                raw = bytes(row["content"])
                path = row["path"]
                entries = []
                if raw[:2] == b"\x1f\x8b":
                    # per-record spans inside the inflated member: a
                    # whole-stream gzip (one member, many records) must
                    # not index every record with the full member span
                    for off, ln, data in _gunzip_members(raw):
                        for s, e, hdrs, payload in _iter_raw_records(data, path):
                            entries.append(
                                _entry(path, off, ln, s, e - s, hdrs, payload)
                            )
                elif _is_zstd_stream(raw):
                    # .warc.zst: frames are the fetchable unit, with
                    # per-record spans inside each inflated frame
                    for off, ln, data in _unzstd_members(raw):
                        for s, e, hdrs, payload in _iter_raw_records(data, path):
                            entries.append(
                                _entry(path, off, ln, s, e - s, hdrs, payload)
                            )
                else:
                    for s, e, hdrs, payload in _iter_raw_records(raw, path):
                        entries.append(
                            _entry(path, s, e - s, 0, e - s, hdrs, payload)
                        )
                if entries:
                    yield pd.DataFrame(entries)

    return files.select("path", "content").mapInPandas(scan, WARC_CDX_SCHEMA)


def to_pages(warc_df: DataFrame) -> DataFrame:
    """Project ingest rows onto the pinned pages contract
    (url, warc_ts, html, text, lang) — text/lang are extraction outputs,
    null at ingest."""
    return warc_df.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
    )


# ---------------------------------------------------------------------------
# WET (extracted-text conversion records) — the Common-Crawl derivative
# format produced FROM extraction output, and read back like any WARC.
# ---------------------------------------------------------------------------

def build_wet_record(url: str, warc_ts, text: str) -> bytes:
    """One WARC/1.0 ``conversion`` record (the WET format: Common Crawl
    ships extracted text as ``*.warc.wet.gz`` files of conversion
    records).  The record id is a deterministic UUIDv5 of (url, date) so
    identical inputs produce byte-identical records — the property every
    golden/round-trip test in this repo leans on."""
    import uuid

    body = (text or "").encode("utf-8")
    # header injection guard: a CR/LF inside the url would terminate the
    # header block early (or forge WARC headers) and corrupt the framing
    # of every following record — percent-encode the separators
    url = (url or "").replace("\r", "%0D").replace("\n", "%0A")
    if warc_ts is None or pd.isna(warc_ts):  # None row-wise, NaT from Arrow
        date = "1970-01-01T00:00:00Z"
    else:
        date = warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\n{date}\nconversion")
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"Content-Type: text/plain\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return headers + body + b"\r\n\r\n"


def write_wet(df: DataFrame, out_dir: str) -> DataFrame:
    """Distributed WET sink: each partition writes ONE
    ``part-NNNNN.warc.wet.gz`` whose records are individually gzipped
    members (Common Crawl's framing — it is what makes CDX byte-range
    reads independently decompressible, `read_warc_cdx`).  Returns the
    manifest DataFrame (path, n_records, n_bytes); materialize it to
    run the write.  Input needs (url, warc_ts, text).

    Scale notes: one file per partition, no shuffle (repartition
    upstream to set the file count); ``out_dir`` must be a shared
    filesystem on a real cluster — the same contract as every
    path-based Spark sink."""
    import gzip as _gzip
    import os

    from pyspark import TaskContext

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.wet.gz")
        n = 0
        total = 0
        f = None  # opened lazily so empty partitions write nothing
        try:
            for pdf in batches:
                for url, ts, text in zip(
                    pdf["url"], pdf["warc_ts"], pdf["text"]
                ):
                    rec = build_wet_record(url, ts, text)
                    # one gzip member per record, mtime pinned for
                    # determinism; streamed straight out — buffering a
                    # partition's worth of members would hold the whole
                    # output file in executor memory
                    if f is None:
                        os.makedirs(out_dir, exist_ok=True)
                        f = open(path, "wb")
                    buf = io.BytesIO()
                    with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                        gz.write(rec)
                    f.write(buf.getvalue())
                    n += 1
                    total += len(rec)
        finally:
            if f is not None:
                f.close()
        if n:
            yield pd.DataFrame(
                {"path": [path], "n_records": [n], "n_bytes": [total]}
            )

    return df.select("url", "warc_ts", "text").mapInPandas(
        fn, schema="path string, n_records long, n_bytes long"
    )


def parse_wet_records(raw: bytes, warc_file: str = "") -> Iterator[dict]:
    """Yield one dict per ``conversion`` record (plain, whole-stream
    gzip, or per-record gzip member streams — same tolerance as
    parse_warc_records)."""
    raw = _inflate_stream(raw)
    for _s, _e, headers, payload in _iter_raw_records(raw, warc_file):
        if headers.get("warc-type") != "conversion":
            continue
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
            "text": payload.decode("utf-8", "replace"),
            "warc_file": warc_file,
        }


WET_SCHEMA = "url string, warc_ts timestamp, text string, warc_file string"


def read_wet(spark: SparkSession, path_glob: str) -> DataFrame:
    """WET ingest — one task per file via binaryFile, like read_warc."""
    files = spark.read.format("binaryFile").load(path_glob).select(
        "path", "content"
    )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = list(
                    parse_wet_records(bytes(content), _local_path(path))
                )
                if rows:
                    yield pd.DataFrame(rows)

    return files.mapInPandas(fn, schema=WET_SCHEMA)


# ---------------------------------------------------------------------------
# WAT (metadata sidecar) — completes the Common Crawl artifact triple:
# WARC (raw captures, read_warc/index_warc), WET (extracted text,
# build_wet_record/write_wet/read_wet), WAT (per-record metadata JSON,
# below).  Common Crawl ships ``*.warc.wat.gz`` files of WARC/1.0
# ``metadata`` records whose body is one JSON envelope per captured page:
# the WARC headers, the HTTP response shape, and the parsed HTML metadata
# (head title, outgoing links in document order with their DOM paths).
# ---------------------------------------------------------------------------

#: document-order link scan: the four link-bearing attributes WAT reports,
#: each tagged with its Common-Crawl DOM path convention
_WAT_LINK_RE = re.compile(
    rb"""<(?:
        (?P<a>a)\s[^>]*?href\s*=\s*["'](?P<a_url>[^"']+)["'] |
        (?P<img>img)\s[^>]*?src\s*=\s*["'](?P<img_url>[^"']+)["'] |
        (?P<link>link)\s[^>]*?href\s*=\s*["'](?P<link_url>[^"']+)["'] |
        (?P<script>script)\s[^>]*?src\s*=\s*["'](?P<script_url>[^"']+)["']
    )""",
    re.IGNORECASE | re.VERBOSE,
)
_WAT_TITLE_RE = re.compile(
    rb"<title[^>]*>(.*?)</title>", re.IGNORECASE | re.DOTALL
)
_WAT_PATHS = {"a": "A@/href", "img": "IMG@/src",
              "link": "LINK@/href", "script": "SCRIPT@/src"}


def wat_html_metadata(html: bytes | str) -> tuple[str | None, list]:
    """(title, [(dom_path, url), ...]) in document order — the
    HTML-Metadata section of a WAT envelope."""
    data = html.encode("utf-8", "replace") if isinstance(html, str) else html
    m = _WAT_TITLE_RE.search(data)
    title = None
    if m:
        title = m.group(1).decode("utf-8", "replace").strip() or None
    links = []
    for lm in _WAT_LINK_RE.finditer(data):
        for tag, grp in (("a", "a_url"), ("img", "img_url"),
                         ("link", "link_url"), ("script", "script_url")):
            if lm.group(tag):
                links.append((_WAT_PATHS[tag],
                              lm.group(grp).decode("utf-8", "replace")))
                break
    return title, links


def build_wat_record(url: str, warc_ts, html: bytes | str) -> bytes:
    """One WARC/1.0 ``metadata`` record holding the JSON envelope for a
    captured page — the WAT sibling of :func:`build_wet_record`.  The
    JSON is serialized compactly (no spaces) with insertion-order keys,
    so identical inputs produce byte-identical records; the record id is
    a deterministic UUIDv5 of (url, date, type) like WET's."""
    import json
    import uuid

    url = (url or "").replace("\r", "%0D").replace("\n", "%0A")
    if warc_ts is None or pd.isna(warc_ts):
        date = "1970-01-01T00:00:00Z"
    else:
        date = warc_ts.strftime("%Y-%m-%dT%H:%M:%SZ")
    title, links = wat_html_metadata(html or b"")
    html_meta: dict = {}
    if title is not None:
        html_meta["Head"] = {"Title": title}
    if links:
        html_meta["Links"] = [{"path": p, "url": u} for p, u in links]
    env = {
        "Envelope": {
            "Format": "WARC",
            "WARC-Header-Metadata": {
                "WARC-Type": "response",
                "WARC-Target-URI": url,
                "WARC-Date": date,
            },
            "Payload-Metadata": {
                "Actual-Content-Type": "application/http; msgtype=response",
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": html_meta,
                },
            },
        },
    }
    body = json.dumps(env, separators=(",", ":")).encode("utf-8")
    rid = uuid.uuid5(uuid.NAMESPACE_URL, f"{url}\n{date}\nmetadata")
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: metadata\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"Content-Type: application/json\r\n"
        f"Content-Length: {len(body)}\r\n"
        f"\r\n"
    ).encode("utf-8")
    return headers + body + b"\r\n\r\n"


def write_wat(df: DataFrame, out_dir: str) -> DataFrame:
    """Distributed WAT sink — one ``part-NNNNN.warc.wat.gz`` per
    partition, each record its own gzip member (the same CDX-friendly
    framing as :func:`write_wet`).  Input needs (url, warc_ts, html);
    returns the manifest DataFrame (path, n_records, n_bytes)."""
    import gzip as _gzip
    import os

    from pyspark import TaskContext

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.warc.wat.gz")
        n = 0
        total = 0
        f = None  # opened lazily so empty partitions write nothing
        try:
            for pdf in batches:
                for url, ts, html in zip(
                    pdf["url"], pdf["warc_ts"], pdf["html"]
                ):
                    rec = build_wat_record(
                        url, ts, bytes(html) if html is not None else b"")
                    if f is None:
                        os.makedirs(out_dir, exist_ok=True)
                        f = open(path, "wb")
                    buf = io.BytesIO()
                    with _gzip.GzipFile(fileobj=buf, mode="wb",
                                        mtime=0) as gz:
                        gz.write(rec)
                    f.write(buf.getvalue())
                    n += 1
                    total += len(rec)
        finally:
            if f is not None:
                f.close()
        if n:
            yield pd.DataFrame(
                {"path": [path], "n_records": [n], "n_bytes": [total]}
            )

    return df.select("url", "warc_ts", "html").mapInPandas(
        fn, schema="path string, n_records long, n_bytes long"
    )


def parse_wat_records(raw: bytes, warc_file: str = "") -> Iterator[dict]:
    """Yield one dict per ``metadata`` record: url, warc_ts, title,
    links (list of (path, url)), warc_file — the WAT ingest side."""
    import json

    raw = _inflate_stream(raw)
    for _s, _e, headers, payload in _iter_raw_records(raw, warc_file):
        if headers.get("warc-type") != "metadata":
            continue
        title = None
        links: list = []
        try:
            env = json.loads(payload.decode("utf-8", "replace"))
            hm = (env.get("Envelope", {}).get("Payload-Metadata", {})
                  .get("HTTP-Response-Metadata", {})
                  .get("HTML-Metadata", {}))
            title = hm.get("Head", {}).get("Title")
            links = [(d.get("path", ""), d.get("url", ""))
                     for d in hm.get("Links", [])]
        except (ValueError, AttributeError):
            pass  # malformed envelope: keep the record with empty metadata
        yield {
            "url": headers.get("warc-target-uri", ""),
            "warc_ts": _parse_warc_date(headers.get("warc-date", "")),
            "title": title,
            "links": links,
            "warc_file": warc_file,
        }
