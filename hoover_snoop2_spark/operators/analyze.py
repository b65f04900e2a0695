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
from .exif_extract import EXIF_MIME_TYPES, ExifBroken, extract_exif
from .office_extract import (
    EPUB_MIME,
    OOXML_DOCM,
    OOXML_DOCX,
    OOXML_PPTM,
    OOXML_PPTX,
    OOXML_XLSM,
    OOXML_XLSX,
    classify_zip_office,
    office_doc_dates,
    office_to_text,
    xlsx_to_table,
)
from .archive_unpack import (
    BROKEN_ARCHIVE_MIME_TYPES,
    UNPACK_MIME_TYPES,
    UnpackBroken,
    emlx_strip,
    safe_member_name,
    unpack_bytes,
)
from .email_parse import attachments_of, email_meta, parse_email_bytes
from .html_extract import html_to_text
from .pdf_spans import pdf_to_text
from .tables import explode_table, is_table_mime, table_info

#: Spark DDL schema of the analyze output (digest ∪ deferred-child rows).
#: url/parent_url/depth/ancestors are computed in-kernel (container
#: children recurse inside the UDF — see analyze_tree), so digest rows come
#: out fully formed — no join back to a url map on the hot path.  root_sha
#: ties every row to its round-input blob so duplicate inputs can clone
#: whole subtrees with a url-prefix rewrite.
ANALYZE_SCHEMA = (
    "kind string, sha3_256 string, root_sha string, url string, "
    "parent_url string, depth int, ancestors array<string>, "
    "md5 string, sha1 string, sha256 string, "
    "size bigint, mime_type string, mime_encoding string, text string, "
    "status string, broken_reason string, subject string, "
    "email_from array<string>, email_to array<string>, "
    "email_domains array<string>, email_date string, "
    "email_header array<string>, email_header_key array<string>, "
    "table_columns array<string>, table_row_count bigint, "
    "exif_location string, exif_date string, pgp boolean, "
    "date_created string, date_modified string, "
    "n_children int, child_name string, child_data binary"
)

#: in-kernel recursion budget: a container whose (direct) listing exceeds
#: either bound defers its children to the next driver round instead of
#: expanding inside one task — the Spark analog of the reference's
#: 20 000-row table splits / 150-page PDF chunks (defaultsettings.py:383,
#: pdf-tools/run.sh:5-11)
INLINE_MAX_CHILDREN = 2_000
INLINE_MAX_BYTES = 128 * 2**20

_EMPTY = {
    "md5": None, "sha1": None, "sha256": None, "size": None,
    "mime_type": None, "mime_encoding": None, "text": None,
    "status": None, "broken_reason": None, "subject": None,
    "email_from": None, "email_to": None, "email_domains": None,
    "email_date": None, "email_header": None, "email_header_key": None,
    "table_columns": None, "table_row_count": None,
    "exif_location": None, "exif_date": None, "pgp": None,
    "date_created": None, "date_modified": None,
    "n_children": None, "child_name": None, "child_data": None,
}

#: reference digests.py:142-147 — extra mime types read as raw text when
#: the encoding is not binary (can_read_text)
EXTRA_TEXT_MIME_TYPES = frozenset(
    {"application/json", "application/csv", "application/tab-separated-values"}
)


def analyze_blob(blob_key: str, data: bytes,
                 sha256_hex: str | None = None) -> list[dict]:
    """One blob → [digest row, child rows...].  Pure, deterministic.

    ``blob_key`` is the pipeline's opaque dedup/join key (JVM-side
    sha2-256 — F.sha2 needs no Python round-trip over the blob bytes);
    the digest's REPORTED ``sha3_256`` field (the reference's Blob PK,
    models.py:66-71) is computed here from the bytes.

    ``sha256_hex``, when given, MUST be the sha2-256 hex of ``data`` —
    callers that already hold it (analyze_tree holds it for every child
    by construction, and for roots whenever the pipeline attached a
    non-null JVM hash) pass it in so the digest's sha256 field needs no
    second full pass over the bytes."""
    data = data or b""
    mime_type, mime_encoding = sniff_bytes(data)
    if mime_type == "application/zip":
        # OOXML/ODF are zips of XML — refine by member names (the role
        # `file` + extension plays in the reference, magic.py docstring)
        office = classify_zip_office(data)
        if office:
            mime_type = office
    elif mime_type == "application/vnd.ms-excel":
        # all OLE containers sniff as ms-excel (the reference's rewrite,
        # magic.py:110-111); refine by stream names: MAPI streams → .msg,
        # WordDocument stream → legacy .doc, PowerPoint Document → .ppt
        from .doc_extract import is_word_doc
        from .msg_extract import looks_like_msg
        from .office_crypto import is_encrypted_office
        from .ppt_extract import PPT_MIME, is_ppt

        if is_encrypted_office(data):
            # Agile-encrypted OOXML: CFB with EncryptionInfo +
            # EncryptedPackage (the reference's Tika accepts the mime,
            # _tika_mime_types.py:1033)
            mime_type = "application/x-tika-ooxml-protected"
        elif looks_like_msg(data):
            mime_type = "application/vnd.ms-outlook"
        elif is_word_doc(data):
            mime_type = "application/msword"
        elif is_ppt(data):
            mime_type = PPT_MIME
        else:
            from .visio_extract import is_vsd

            if is_vsd(data):
                # legacy Visio: container recognized (Tika :760); the
                # VisioDocument stream's text is a documented gap
                mime_type = "application/vnd.visio"
    digest: dict = dict(_EMPTY)
    digest.update(
        kind="digest",
        sha3_256=hashlib.sha3_256(data).hexdigest(),
        md5=hashlib.md5(data).hexdigest(),
        sha1=hashlib.sha1(data).hexdigest(),
        sha256=sha256_hex or hashlib.sha256(data).hexdigest(),
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

        elif mime_type == "image/svg+xml":
            # the reference Tika-extracts svg character data
            # (_tika_mime_types.py:1219); root-element sniff keeps html
            # pages with inline <svg> islands on the html path
            from .html_extract import svg_to_text

            digest["text"] = svg_to_text(data)

        elif mime_type == "text/calendar":
            # native iCalendar reader (the reference Tika-extracts
            # text/calendar, _tika_mime_types.py:1350)
            from .calendar_extract import ics_dates, ics_to_text

            digest["text"] = normalize_text(ics_to_text(data)) or ""
            created, modified = ics_dates(data)
            digest["date_created"] = created
            digest["date_modified"] = modified

        elif mime_type == "text/x-vcard":
            from .calendar_extract import vcf_to_text

            digest["text"] = normalize_text(vcf_to_text(data)) or ""

        elif mime_type == "text/plain":
            # csv sniff may correct the mime (is_table, archives.py:123-141);
            # sniff ONCE and thread the dialect through info + explode
            from .tables import guess_csv_dialect

            dialect = guess_csv_dialect(data, mime_encoding)
            if dialect is not None:
                corrected = (
                    "text/tab-separated-values"
                    if dialect.delimiter == "\t" else "text/csv"
                )
                digest["mime_type"] = corrected
                info = table_info(data, corrected, mime_encoding, dialect=dialect)
                if info:
                    digest["table_columns"] = info["table-columns"]
                    digest["table_row_count"] = info["table-row-count"]
                children = [
                    (name, text.encode("utf-8"))
                    for name, text in explode_table(
                        data, corrected, mime_encoding, dialect=dialect)
                ]
            else:
                digest["text"] = normalize_text(read_text(data, mime_encoding)) or ""

        elif is_table_mime(mime_type):
            from .tables import guess_csv_dialect

            dialect = guess_csv_dialect(data, mime_encoding)
            info = table_info(data, mime_type, mime_encoding, dialect=dialect)
            if info:
                digest["table_columns"] = info["table-columns"]
                digest["table_row_count"] = info["table-row-count"]
            children = [
                (name, text.encode("utf-8"))
                for name, text in explode_table(
                    data, mime_type, mime_encoding, dialect=dialect)
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
            digest["email_header"] = meta.get("email-header")
            digest["email_header_key"] = meta.get("email-header-key")
            digest["pgp"] = meta.get("pgp", False) or None
            children = attachments_of(email_data)

        elif mime_type == "application/pdf":
            text, _pages, broken = pdf_to_text(data)
            if broken:
                digest["status"] = "broken"
                digest["broken_reason"] = broken
            else:
                digest["text"] = normalize_text(text) or ""
                # embedded images fan out as children (pdfimages analog,
                # archives.py:491-528) — they feed the OCR/media path
                from .pdf_spans import pdf_image_children

                children = pdf_image_children(data)

        elif mime_type in UNPACK_MIME_TYPES or mime_type in BROKEN_ARCHIVE_MIME_TYPES:
            children = unpack_bytes(data, mime_type)

        elif (
            mime_type in (OOXML_DOCX, OOXML_PPTX, OOXML_DOCM, OOXML_PPTM,
                          EPUB_MIME)
            or mime_type.startswith(("application/vnd.oasis.opendocument",
                                     "application/vnd.sun.xml"))
        ):
            digest["text"] = office_to_text(data, mime_type)
            if mime_type == EPUB_MIME:
                from .office_extract import epub_dates

                created, modified = epub_dates(data)
                digest["date_created"] = created
                digest["date_modified"] = modified
            else:
                created, modified = office_doc_dates(data)
                digest["date_created"] = created
                digest["date_modified"] = modified
            if mime_type in (OOXML_DOCM, OOXML_PPTM):
                # macro-enabled: VBA module sources fan out as children
                # ([MS-OVBA] walk; the reference Tika-accepts the
                # macroenabled.12 family, _tika_mime_types.py:499-532)
                from .vba_extract import VbaBroken, vba_modules_from_zip

                try:
                    children = [(f"macros/{n}.bas", t.encode("utf-8"))
                                for n, t in vba_modules_from_zip(data)]
                except VbaBroken as e:
                    digest["status"] = "broken"
                    digest["broken_reason"] = e.reason

        elif mime_type == "application/vnd.ms-outlook":
            # .msg extraction in-process (replaces the reference's
            # msgconvert subprocess, email.py:281-307)
            from .msg_extract import parse_msg

            meta = parse_msg(data)
            digest["text"] = normalize_text(meta.get("text", "")) or ""
            digest["subject"] = meta.get("subject")
            digest["email_from"] = meta.get("from")
            digest["email_to"] = meta.get("to")
            digest["email_date"] = meta.get("date")
            children = meta.get("attachments", [])

        elif mime_type == "application/vnd.ms-tnef":
            # winmail.dat ([MS-OXTNEF]) — the reference Tika-parses
            # this mime (_tika_mime_types.py:526); decoded natively so
            # its attachments recurse like .msg children
            from .tnef_extract import TnefBroken, parse_tnef

            try:
                meta = parse_tnef(data)
            except TnefBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                digest["text"] = normalize_text(meta.get("text", "")) or ""
                digest["subject"] = meta.get("subject")
                digest["email_from"] = meta.get("from")
                digest["email_date"] = meta.get("date")
                children = meta.get("attachments", [])

        elif mime_type == "text/x-uuencode":
            # uuencoded payloads fan out like archive members (the
            # reference Tika-accepts text/x-uuencode,
            # _tika_mime_types.py:1465)
            from .legacy_encodings import UuBroken, parse_uuencode

            try:
                children = parse_uuencode(data)
            except UuBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason

        elif mime_type == "application/mac-binhex40":
            # BinHex 4.0: CRC-verified data fork becomes the child; a
            # non-empty resource fork is preserved as <name>.rsrc
            # (_tika_mime_types.py:86)
            from .legacy_encodings import BinhexBroken, parse_binhex

            try:
                hqx = parse_binhex(data)
            except BinhexBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                children = [(hqx["name"] or "binhex", hqx["data"])]
                if hqx["rsrc"]:
                    children.append(((hqx["name"] or "binhex") + ".rsrc",
                                     hqx["rsrc"]))

        elif mime_type == "application/applefile":
            # AppleSingle carries the data fork inline; AppleDouble is
            # metadata-only by definition (_tika_mime_types.py:7)
            from .legacy_encodings import AppleFileBroken, parse_applefile

            try:
                af = parse_applefile(data)
            except AppleFileBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                digest["date_created"] = af["date_created"]
                digest["date_modified"] = af["date_modified"]
                if af["data"] is not None:
                    children = [(af["name"] or "datafork", af["data"])]

        elif mime_type == "application/x-msdownload":
            # PE/COFF header metadata (Tika :939-942): the link
            # timestamp is the only date a bare executable carries
            from .pe_extract import PeBroken, parse_pe

            try:
                meta = parse_pe(data)
            except PeBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                digest["date_created"] = meta["timestamp"]

        elif mime_type == "application/vnd.ms-cab-compressed":
            # [MS-CAB] folders: none/MSZIP(zlib)/LZX decode; Quantum is
            # a typed refusal (Tika :496; reference 7z ext archives.py:43)
            from .cab_extract import CabBroken, parse_cab

            try:
                children = parse_cab(data)
            except CabBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason

        elif mime_type == "application/vnd.ms-htmlhelp":
            # CHM/ITSS: LZXC sections decode via the in-repo LZX codec;
            # html members recurse like archive children (Tika :509)
            from .chm_extract import ChmBroken, chm_children

            try:
                children = chm_children(data)
            except ChmBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason

        elif mime_type == "application/x-bittorrent":
            # BEP-3 metainfo: name/announce/files as text (Tika :842)
            from .torrent_extract import TorrentBroken, torrent_to_text

            try:
                text, created = torrent_to_text(data)
            except TorrentBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                digest["text"] = normalize_text(text) or ""
                digest["date_created"] = created

        elif mime_type == "application/vnd.sqlite3":
            # native SQLite b-tree walk: every rowid table explodes like
            # csv (beyond-reference: .db blobs are everywhere in real
            # corpora); first table fills the digest table fields
            from .sqlite_extract import SqliteBroken, sqlite_to_tables

            try:
                info, kids = sqlite_to_tables(data)
            except SqliteBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                if info:
                    digest["table_columns"] = info["table-columns"]
                    digest["table_row_count"] = info["table-row-count"]
                children = [(n, t.encode("utf-8")) for n, t in kids]

        elif mime_type == "application/x-dbf":
            # dBase fixed-width table -> csv-shaped explode (Tika list
            # :863); structural sniff lives in magic.looks_like_dbf
            from .dbf_extract import DbfBroken, dbf_to_table

            try:
                info, kids = dbf_to_table(data)
            except DbfBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                if info:
                    digest["table_columns"] = info["table-columns"]
                    digest["table_row_count"] = info["table-row-count"]
                children = [(n, t.encode("utf-8")) for n, t in kids]

        elif mime_type in ("application/vnd.ms-visio.drawing",
                           "application/vnd.ms-visio.drawing.macroenabled.12"):
            # modern Visio OPC zip: shape text per page (Tika :527-532);
            # the macro-enabled variant fans out VBA like docm
            from .vba_extract import VbaBroken, vba_modules_from_zip
            from .visio_extract import vsdx_to_text

            digest["text"] = normalize_text(vsdx_to_text(data)) or ""
            created, modified = office_doc_dates(data)
            digest["date_created"] = created
            digest["date_modified"] = modified
            if mime_type.endswith("macroenabled.12"):
                try:
                    children = [(f"macros/{n}.bas", t.encode("utf-8"))
                                for n, t in vba_modules_from_zip(data)]
                except VbaBroken as e:
                    digest["status"] = "broken"
                    digest["broken_reason"] = e.reason

        elif mime_type == "application/vnd.wordperfect":
            # typed refusal: WP function-size tables couldn't be
            # sourced+self-verified (COVERAGE.md known-gaps)
            digest["status"] = "broken"
            digest["broken_reason"] = "wordperfect_unsupported"

        elif mime_type == "application/x-stuffit":
            # StuffIt compression is proprietary (same posture as
            # compressed RAR members): container recognized, typed refusal
            digest["status"] = "broken"
            digest["broken_reason"] = "stuffit_unsupported"

        elif mime_type == "application/vnd.lotus-1-2-3":
            # Lotus WK1 record stream -> csv-shaped explode (Tika :452)
            from .lotus_extract import Wk1Broken, wk1_to_table

            try:
                info, kids = wk1_to_table(data)
            except Wk1Broken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                if info:
                    digest["table_columns"] = info["table-columns"]
                    digest["table_row_count"] = info["table-row-count"]
                children = [(n, t.encode("utf-8")) for n, t in kids]

        elif mime_type == "application/onenote":
            # [MS-ONESTORE]: embedded FileDataStoreObject payloads
            # recurse as children, and the notebook's OWN text comes
            # from the best-effort node-tree walk (r5) — empty when the
            # structure doesn't parse, never wrong (Tika list :129-132)
            from .onenote_extract import (
                OneNoteBroken,
                extract_onenote_files,
                extract_onenote_text,
            )

            try:
                children = extract_onenote_files(data)
            except OneNoteBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            else:
                section_text = extract_onenote_text(data)
                if section_text:
                    digest["text"] = section_text

        elif mime_type == "application/x-tika-ooxml-protected":
            # password-protected OOXML ([MS-OFFCRYPTO] Agile): decrypt
            # with the worker-local archive password and re-analyze the
            # inner OOXML zip as a child row (it refines to docx/xlsx/
            # pptx there); no password → typed broken like the 7z path
            from ..functions.archive_crypto import default_archive_password
            from .office_crypto import OfficeCryptoBroken, decrypt_office

            password = default_archive_password()
            if password is None:
                digest["status"] = "broken"
                digest["broken_reason"] = "office_encrypted"
            else:
                try:
                    inner = decrypt_office(data, password)
                    children = [("package", inner)]
                except OfficeCryptoBroken as e:
                    digest["status"] = "broken"
                    digest["broken_reason"] = e.reason

        elif mime_type == "application/msword":
            # legacy Word piece-table text ([MS-DOC] over our CFB reader);
            # a Macros/VBA storage fans out module sources like docm
            from .doc_extract import DocBroken, doc_to_text
            from .vba_extract import VbaBroken, vba_modules_from_ole

            try:
                digest["text"] = doc_to_text(data)
                children = [(f"macros/{n}.bas", t.encode("utf-8"))
                            for n, t in vba_modules_from_ole(data)]
            except DocBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason
            except VbaBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason

        elif mime_type == "application/vnd.ms-excel":
            # legacy BIFF8 workbook ([MS-XLS]): SST + LABELSST cells →
            # the same table explode as csv/xlsx; non-BIFF OLE (the
            # catch-all mime) passes through with no text
            from .xls_extract import XlsBroken, is_xls, xls_to_table

            if is_xls(data):
                from .vba_extract import VbaBroken, vba_modules_from_ole

                try:
                    info, kids = xls_to_table(data)
                    if info:
                        digest["table_columns"] = info["table-columns"]
                        digest["table_row_count"] = info["table-row-count"]
                    children = [(n, t.encode("utf-8")) for n, t in kids]
                    # a _VBA_PROJECT_CUR/VBA storage fans out like xlsm
                    children += [(f"macros/{n}.bas", t.encode("utf-8"))
                                 for n, t in vba_modules_from_ole(data)]
                except XlsBroken as e:
                    digest["status"] = "broken"
                    digest["broken_reason"] = e.reason
                except VbaBroken as e:
                    digest["status"] = "broken"
                    digest["broken_reason"] = e.reason

        elif mime_type == "application/vnd.ms-powerpoint":
            # legacy PowerPoint text atoms ([MS-PPT] over our CFB reader)
            from .ppt_extract import PptBroken, ppt_to_text

            try:
                digest["text"] = ppt_to_text(data)
            except PptBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason

        elif mime_type == "application/rtf":
            from .rtf_extract import rtf_to_text

            digest["text"] = rtf_to_text(data)

        elif mime_type in (OOXML_XLSX, OOXML_XLSM):
            created, modified = office_doc_dates(data)
            digest["date_created"] = created
            digest["date_modified"] = modified
            info, kids = xlsx_to_table(data)
            if info:
                digest["table_columns"] = info["table-columns"]
                digest["table_row_count"] = info["table-row-count"]
            children = [(name, text.encode("utf-8")) for name, text in kids]
            if mime_type == OOXML_XLSM:
                from .vba_extract import VbaBroken, vba_modules_from_zip

                try:
                    children += [(f"macros/{n}.bas", t.encode("utf-8"))
                                 for n, t in vba_modules_from_zip(data)]
                except VbaBroken as e:
                    digest["status"] = "broken"
                    digest["broken_reason"] = e.reason

        elif mime_type in EXIF_MIME_TYPES:
            # EXIF GPS + creation date (reference exif.extract, exif.py:61-99)
            try:
                exif = extract_exif(data)
                digest["exif_location"] = exif.get("location")
                digest["exif_date"] = exif.get("date-created")
            except ExifBroken as e:
                digest["status"] = "broken"
                digest["broken_reason"] = e.reason

        elif mime_type in EXTRA_TEXT_MIME_TYPES and mime_encoding != "binary":
            # can_read_text's whitelist (digests.py:135-149)
            digest["text"] = normalize_text(read_text(data, mime_encoding)) or ""

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
    seen_names: dict[str, int] = {}
    for name, child_bytes in children:
        # undecodable member names (surrogate-escaped) are percent-escaped
        # losslessly — Arrow/parquet rejects lone surrogates (the
        # reference's name_bytes rationale, models.py:516-526)
        name = safe_member_name(name)
        # child urls must be unique per parent (two attachments may share a
        # filename); disambiguate repeats the way unpack listings do
        if name in seen_names:
            seen_names[name] += 1
            name = f"{name}.{seen_names[name]}"
        else:
            seen_names[name] = 0
        child: dict = dict(_EMPTY)
        child.update(
            kind="child",
            sha3_256=blob_key,  # parent join key back to parent urls
            child_name=name,
            child_data=child_bytes,
        )
        rows.append(child)
    return rows


def analyze_tree(
    blob_key: str,
    url: str,
    parent_url: str | None,
    depth: int,
    ancestors: tuple[str, ...],
    data: bytes,
    root_sha: str,
    max_depth: int,
    inline_max_children: int | None = None,
    inline_max_bytes: int | None = None,
    derive_null_key: bool = False,
) -> list[dict]:
    """Analyze one blob AND its container subtree in-process.

    Children are already in memory after unpack, so recursing here instead
    of re-shuffling them through a driver round removes ~4 job barriers per
    nesting level.  Guards:

    - recursion: child hash ∈ ancestor chain → broken 'archive_recursion'
      (check_recursion analog, archives.py:531-540);
    - depth: children beyond max_depth are dropped (bounded expansion);
    - size: oversized listings (INLINE_MAX_*) are NOT recursed — their
      children come back as kind='child' rows and the driver loop runs
      them as a normal next round (keeps one task from holding a whole
      giant archive, the reference's split-granularity concern).
    """
    if blob_key is None and derive_null_key:
        # no-dedup fast path (plans/pipeline.py strategy='none'): the
        # driver skipped the JVM sha2 pass, so derive the key here — the
        # same bytes hashed by the same algorithm yield the identical
        # value the JVM pass would have attached (the digest's reported
        # sha256 field IS this hash; see analyze_blob).  Gated on the
        # caller's request: under the ELECTED strategies a null key
        # means the row's html itself was NULL (F.sha2(NULL) is NULL),
        # and deriving sha256(b'') there would collide root_sha with
        # genuinely-empty blobs and make the dup-clone join fabricate
        # rows (pinned by test_null_html_no_fabricated_clones).
        blob_key = hashlib.sha256(data or b"").hexdigest()
        if root_sha is None:
            root_sha = blob_key
    # blob_key, when non-null, is the bytes' sha2-256 by pipeline
    # contract — reuse it as the digest's sha256 instead of re-hashing
    rows = analyze_blob(blob_key, data, sha256_hex=blob_key)
    digest = rows[0]
    digest.update(kind="digest", root_sha=root_sha, url=url,
                  parent_url=parent_url, depth=depth, ancestors=None)
    out = [digest]
    child_rows = rows[1:]
    if not child_rows:
        return out

    max_children = inline_max_children if inline_max_children is not None else INLINE_MAX_CHILDREN
    max_bytes = inline_max_bytes if inline_max_bytes is not None else INLINE_MAX_BYTES
    total_bytes = sum(len(c["child_data"] or b"") for c in child_rows)
    defer = len(child_rows) > max_children or total_bytes > max_bytes
    # ancestor chain carries blob_keys (sha2) — the SAME key family the
    # driver's relational guard compares against next-round JVM hashes
    chain = ancestors + (blob_key,)
    for c in child_rows:
        child_url = f"{url}//{c['child_name']}"
        child_data = c["child_data"] or b""
        if depth + 1 > max_depth:
            continue  # bounded expansion: beyond the cap nothing is emitted
        if defer:
            c.update(kind="child", root_sha=root_sha, url=child_url,
                     parent_url=url, depth=depth + 1, ancestors=list(chain))
            out.append(c)
            continue
        child_key = hashlib.sha256(child_data).hexdigest()
        if child_key in chain:
            # same id convention as the driver-round recursion guard
            # (plans/pipeline.py): the sha2 blob key doubles as the stable
            # sha3_256 document id and as the (literal) sha256 — whichever
            # round catches the bomb, the marker row's identity matches.
            rec: dict = dict(_EMPTY)
            rec.update(kind="digest",
                       sha3_256=child_key,
                       sha256=child_key,
                       root_sha=root_sha,
                       url=child_url, parent_url=url, depth=depth + 1,
                       ancestors=None, status="broken",
                       broken_reason="archive_recursion", text="")
            out.append(rec)
            continue
        out.extend(
            analyze_tree(child_key, child_url, url, depth + 1, chain,
                         child_data, root_sha, max_depth,
                         inline_max_children, inline_max_bytes,
                         derive_null_key)
        )
    return out


def analyze_map_in_pandas(max_depth: int = 5,
                          inline_max_children: int | None = None,
                          inline_max_bytes: int | None = None,
                          archive_password: str | None = None,
                          pgp_keydata: bytes | None = None,
                          pgp_passphrase: str | None = None,
                          derive_null_key: bool = False):
    """mapInPandas body factory over (blob_key, url, parent_url, depth,
    ancestors, html) unique-blob batches.

    Emits digest/deferred-child rows in bounded chunks so one giant archive
    cannot pin an unbounded pandas frame in the Python worker.

    ``archive_password`` / ``pgp_keydata`` / ``pgp_passphrase`` ride the
    closure and are installed as the worker-local defaults INSIDE the
    Python UDF worker — the driver-side set_* calls never reach the
    separate pyspark worker processes (the Spark analog of the
    reference's per-collection gpghome mount, collections.py).
    """
    CHUNK = 256

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # install UNCONDITIONALLY (None included): pyspark reuses worker
        # processes across jobs, so a previous run's secrets would
        # otherwise leak into a password-less run
        from ..functions.archive_crypto import set_archive_password
        from ..functions.pgp_codec import set_default_keyring
        set_archive_password(archive_password)
        set_default_keyring(pgp_keydata, pgp_passphrase)
        for pdf in batches:
            buf: list[dict] = []
            for key, url, parent_url, depth, ancestors, data in zip(
                pdf["blob_key"], pdf["url"], pdf["parent_url"], pdf["depth"],
                pdf["ancestors"], pdf["html"],
            ):
                chain = tuple(ancestors) if ancestors is not None else ()
                buf.extend(
                    analyze_tree(key, url, parent_url, int(depth), chain,
                                 data, root_sha=key, max_depth=max_depth,
                                 inline_max_children=inline_max_children,
                                 inline_max_bytes=inline_max_bytes,
                                 derive_null_key=derive_null_key)
                )
                if len(buf) >= CHUNK:
                    yield pd.DataFrame(buf)
                    buf = []
            if buf:
                yield pd.DataFrame(buf)

    return fn
