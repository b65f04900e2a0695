"""Per-blob analysis kernel: the collapsed `handle_file → {unarchive |
email.parse | tika.rmeta | pdf} → digests.gather` chain of the reference
(filesystem.py:257-352, digests.py:216-390) as one dispatch function, plus
its `mapInPandas` batch wrapper.

Runs once per *unique* blob (content-hash memoization — the reference
de-duplicates every task on blob sha, models.py:102-113, tasks.py:779-783);
the pipeline joins results back to all urls sharing the hash.

Output is a union-shaped record stream: one ``kind='digest'`` row per blob
plus one ``kind='child'`` row per contained file, so container fan-out is a
flatMap (no array-of-binary megacells; children stream through Arrow in
their own rows).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from ..functions.filetypes import skip_mime
from ..functions.magic import sniff_bytes
from ..functions.textutils import normalize_text, read_text
from .archive_unpack import (
    BROKEN_ARCHIVE_MIME_TYPES,
    UNPACK_MIME_TYPES,
    UnpackBroken,
    emlx_strip,
    unpack_bytes,
)
from .email_parse import attachments_of, email_meta, parse_email_bytes
from .html_extract import html_to_text
from .pdf_spans import pdf_to_text
from .tables import corrected_table_mime, explode_table, is_table_mime, table_info

#: Spark DDL schema of the analyze output (digest ∪ child rows)
ANALYZE_SCHEMA = (
    "kind string, sha3_256 string, md5 string, sha1 string, sha256 string, "
    "size bigint, mime_type string, mime_encoding string, text string, "
    "status string, broken_reason string, subject string, "
    "email_from array<string>, email_to array<string>, "
    "email_domains array<string>, email_date string, "
    "table_columns array<string>, table_row_count bigint, "
    "n_children int, child_name string, child_data binary"
)

_EMPTY = {
    "md5": None, "sha1": None, "sha256": None, "size": None,
    "mime_type": None, "mime_encoding": None, "text": None,
    "status": None, "broken_reason": None, "subject": None,
    "email_from": None, "email_to": None, "email_domains": None,
    "email_date": None, "table_columns": None, "table_row_count": None,
    "n_children": None, "child_name": None, "child_data": None,
}


def analyze_blob(sha3: str, data: bytes) -> list[dict]:
    """One blob → [digest row, child rows...].  Pure, deterministic."""
    data = data or b""
    mime_type, mime_encoding = sniff_bytes(data)
    digest: dict = dict(_EMPTY)
    digest.update(
        kind="digest",
        sha3_256=sha3,
        md5=hashlib.md5(data).hexdigest(),
        sha1=hashlib.sha1(data).hexdigest(),
        sha256=hashlib.sha256(data).hexdigest(),
        size=len(data),
        mime_type=mime_type,
        mime_encoding=mime_encoding,
        status="success",
        text="",
    )
    children: list[tuple[str, bytes]] = []

    try:
        if skip_mime(mime_type):
            digest["status"] = "skipped"

        elif mime_type == "text/html":
            digest["text"] = html_to_text(data)

        elif mime_type == "text/plain":
            # csv sniff may correct the mime (is_table, archives.py:123-141)
            corrected = corrected_table_mime(data, mime_type, mime_encoding)
            if is_table_mime(corrected):
                digest["mime_type"] = corrected
                info = table_info(data, corrected, mime_encoding)
                if info:
                    digest["table_columns"] = info["table-columns"]
                    digest["table_row_count"] = info["table-row-count"]
                children = [
                    (name, text.encode("utf-8"))
                    for name, text in explode_table(data, corrected, mime_encoding)
                ]
            else:
                digest["text"] = normalize_text(read_text(data, mime_encoding)) or ""

        elif is_table_mime(mime_type):
            info = table_info(data, mime_type, mime_encoding)
            if info:
                digest["table_columns"] = info["table-columns"]
                digest["table_row_count"] = info["table-row-count"]
            children = [
                (name, text.encode("utf-8"))
                for name, text in explode_table(data, mime_type, mime_encoding)
            ]

        elif mime_type in ("message/rfc822", "message/x-emlx"):
            raw = emlx_strip(data) if mime_type == "message/x-emlx" else data
            email_data = parse_email_bytes(raw)
            meta = email_meta(email_data)
            digest["text"] = normalize_text(meta.get("text", "")) or ""
            digest["subject"] = meta.get("subject")
            digest["email_from"] = meta.get("from")
            digest["email_to"] = meta.get("to")
            digest["email_domains"] = meta.get("email-domains")
            digest["email_date"] = meta.get("date")
            children = attachments_of(email_data)

        elif mime_type == "application/pdf":
            text, _pages, broken = pdf_to_text(data)
            if broken:
                digest["status"] = "broken"
                digest["broken_reason"] = broken
            else:
                digest["text"] = normalize_text(text) or ""

        elif mime_type in UNPACK_MIME_TYPES or mime_type in BROKEN_ARCHIVE_MIME_TYPES:
            children = unpack_bytes(data, mime_type)

        # else: media/other — no text extractor; success with empty text

    except UnpackBroken as e:
        digest["status"] = "broken"
        digest["broken_reason"] = e.reason
    except Exception:
        # analog of run_task's error capture (tasks.py:696-716): the row is
        # marked, the job continues
        digest["status"] = "broken"
        digest["broken_reason"] = "analyze_error"

    digest["n_children"] = len(children)
    rows = [digest]
    for name, child_bytes in children:
        child: dict = dict(_EMPTY)
        child.update(
            kind="child",
            sha3_256=sha3,  # parent hash; join key back to parent urls
            child_name=name,
            child_data=child_bytes,
        )
        rows.append(child)
    return rows


def analyze_map_in_pandas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas body over (sha3_256, html) unique-blob batches.

    Emits digest/child rows in bounded chunks so one giant archive cannot
    pin an unbounded pandas frame in the Python worker.
    """
    CHUNK = 64
    for pdf in batches:
        buf: list[dict] = []
        for sha3, data in zip(pdf["sha3_256"], pdf["html"]):
            buf.extend(analyze_blob(sha3, data))
            if len(buf) >= CHUNK:
                yield pd.DataFrame(buf)
                buf = []
        if buf:
            yield pd.DataFrame(buf)
