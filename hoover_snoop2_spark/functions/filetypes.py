"""mime-type → user-facing "filetype" mapping and skip rules.

Data tables mirror the reference's constants (snoop/data/_file_types.py:19-76
for FILE_TYPES; skip lists defaultsettings.py:281-288; supertype rule
digests.py:709-723).  Exposed both as Python dicts (for the analysis kernel)
and as a Spark CASE/map expression builder (JVM-side, no UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

FILE_TYPES: dict[str, str] = {
    "application/x-directory": "folder",
    "application/pdf": "pdf",
    "text/plain": "text",
    "text/html": "html",
    "application/x-hush-pgp-encrypted-html-body": "html",
    "application/xhtml+xml": "html",
    "message/x-emlx": "email",
    "message/rfc822": "email",
    "application/vnd.ms-outlook": "email",
    "application/vnd.ms-tnef": "email",
    "text/x-uuencode": "archive",
    "application/x-snappy-framed": "archive",
    "application/vnd.ms-htmlhelp": "archive",
    "application/vnd.ms-cab-compressed": "archive",
    "application/mac-binhex40": "archive",
    "application/applefile": "archive",
    "application/x-hoover-pst": "email-archive",
    "application/mbox": "email-archive",
    "application/msword": "doc",
    "application/x-tika-ooxml-protected": "doc",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "doc",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.template": "doc",
    "application/vnd.ms-word.document.macroEnabled.12": "doc",
    "application/vnd.ms-word.template.macroEnabled.12": "doc",
    "application/vnd.oasis.opendocument.text": "doc",
    "application/vnd.sun.xml.writer": "doc",
    "application/vnd.sun.xml.calc": "xls",
    "application/vnd.sun.xml.impress": "ppt",
    "application/vnd.oasis.opendocument.text-template": "doc",
    "application/rtf": "doc",
    "application/vnd.ms-excel": "xls",
    "application/vnd.ms-excel.addin.macroEnabled.12": "xls",
    "application/vnd.ms-excel.sheet.binary.macroEnabled.12": "xls",
    "application/vnd.ms-excel.sheet.macroenabled.12": "xls",
    "application/vnd.ms-excel.template.macroEnabled.12": "xls",
    "application/vnd.oasis.opendocument.spreadsheet": "xls",
    "application/vnd.oasis.opendocument.spreadsheet-template": "xls",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "xls",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.template": "xls",
    "application/x-dbf": "xls",
    "application/vnd.lotus-1-2-3": "xls",
    "application/vnd.sqlite3": "xls",
    "application/vnd.ms-visio.drawing": "doc",
    "application/vnd.ms-visio.drawing.macroenabled.12": "doc",
    "application/vnd.visio": "doc",
    "text/csv": "xls",
    "text/tab-separated-values": "xls",
    "application/csv": "xls",
    "application/tab-separated-values": "xls",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "ppt",
    "application/vnd.openxmlformats-officedocument.presentationml.template": "ppt",
    "application/vnd.openxmlformats-officedocument.presentationml.slideshow": "ppt",
    "application/vnd.ms-powerpoint": "ppt",
    "application/vnd.ms-powerpoint.addin.macroEnabled.12": "ppt",
    "application/vnd.ms-powerpoint.presentation.macroEnabled.12": "ppt",
    "application/vnd.ms-powerpoint.template.macroEnabled.12": "ppt",
    "application/vnd.ms-powerpoint.slideshow.macroEnabled.12": "ppt",
    "application/vnd.oasis.opendocument.presentation": "ppt",
    "application/vnd.oasis.opendocument.presentation-template": "ppt",
    "application/zip": "archive",
    "application/rar": "archive",
    "application/x-7z-compressed": "archive",
    "application/x-tar": "archive",
    "application/x-bzip2": "archive",
    "application/x-zip": "archive",
    "application/x-gzip": "archive",
    "application/x-zip-compressed": "archive",
    "application/x-rar-compressed": "archive",
    # our sniffer emits these exact strings for the same formats
    "application/gzip": "archive",
    "application/x-rar": "archive",
    "application/x-xz": "archive",
    "application/x-cpio": "archive",
    "application/x-archive": "archive",
    "application/x-rpm": "archive",
    "application/x-compress": "archive",
    "application/zstd": "archive",
    "application/x-lz4": "archive",
}

#: reference defaultsettings.py:281-288
SKIP_PROCESSING_MIME_TYPES = frozenset({"application/octet-stream", "inode/x-empty"})
SKIP_PROCESSING_EXTENSIONS = frozenset({".exe", ".dat"})


def get_filetype(mime_type: str | None) -> str | None:
    """FILE_TYPES lookup + audio/video/image supertype rule
    (digests.py:709-723)."""
    if not mime_type:
        return None
    if mime_type in FILE_TYPES:
        return FILE_TYPES[mime_type]
    supertype = mime_type.split("/")[0]
    if supertype in ("audio", "video", "image"):
        return supertype
    return None


def skip_mime(mime_type: str) -> bool:
    return mime_type in SKIP_PROCESSING_MIME_TYPES


def filetype_col(mime_col: Column) -> Column:
    """JVM-side mapping: literal map lookup + supertype CASE — stays inside
    whole-stage codegen, no Python round trip."""
    mapping = F.create_map(
        *[F.lit(x) for pair in FILE_TYPES.items() for x in pair]
    )
    supertype = F.split(mime_col, "/").getItem(0)
    return F.coalesce(
        mapping[mime_col],
        F.when(supertype.isin("audio", "video", "image"), supertype),
    )
