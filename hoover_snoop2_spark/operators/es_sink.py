"""Search-index sink shape — the reference's Elasticsearch document body.

`digests.bulk_index` builds one JSON doc per digest with a pinned mapping
(indexing.py:39-126; body assembly `_get_document_content`
digests.py:865-978).  Our sink is an Iceberg/parquet table with the same
field names and types, so a user of the reference's index can point their
queries at this table:

- keyword fields: content-type, md5, sha1, sha3-256/id, filetype, lang,
  path, filename, tags
- text: text, path-text, subject
- numeric: size (capped at 2^31-1, digests.py:44,635-637), word-count
- boolean: attachments, ocr, skipped
- arrays: path-parts, email fields

The bulk-batching games (300 docs/30 MiB bins, refresh-interval toggling,
tasks.py:1423-1431,1665-1683) are unnecessary — file sizing is the write
layer's job (`write.target-file-size-bytes` on Iceberg, parquet block size
here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: reference digests.py:44 — ES integer fields cap at 2^31-1
MAX_ES_INT = 2**31 - 1

#: reference tika.py:178-212 — metadata values truncated to 4 KiB before
#: folding into the single `tika` k:v field
KV_TRUNCATE = 4096


def metadata_kv_cols() -> tuple[F.Column, F.Column]:
    """The `tika` / `tika-key` folded-metadata fields (reference
    convert_for_indexing, tika.py:178-212): every typed metadata column
    the extractors produce becomes one 'key: value' string in a single
    array, so the index never grows one ES field per metadata key.  Pure
    column expressions — the flatten happens JVM-side."""

    def kv(key: str, col: F.Column) -> F.Column:
        return F.when(
            col.isNotNull(),
            F.concat(F.lit(key + ": "),
                     F.substring(col.cast("string"), 1, KV_TRUNCATE)),
        )

    pairs = F.array(
        kv("Content-Type", F.col("mime_type")),
        kv("Content-Encoding", F.col("mime_encoding")),
        kv("dcterms:created", F.col("date_created")),
        kv("dcterms:modified", F.col("date_modified")),
        kv("exif:GPS", F.col("exif_location")),
        kv("exif:DateTimeOriginal", F.col("exif_date")),
        kv("table:columns", F.array_join(F.col("table_columns"), ", ")),
        kv("table:row-count", F.col("table_row_count")),
        kv("message:subject", F.col("subject")),
    )
    tika = F.filter(pairs, lambda x: x.isNotNull())
    tika_key = F.transform(tika, lambda s: F.substring_index(s, ": ", 1))
    return tika, tika_key


def to_es_documents(digests: DataFrame) -> DataFrame:
    """Project the digest table into the reference's ES mapping shape."""
    from .gather_fields import with_path_fields

    d = with_path_fields(digests)
    tika, tika_key = metadata_kv_cols()
    return d.select(
        tika.alias("tika"),
        tika_key.alias("tika-key"),
        F.col("sha3_256").alias("id"),
        F.col("sha3_256").alias("sha3-256"),
        F.col("md5"),
        F.col("sha1"),
        F.col("mime_type").alias("content-type"),
        F.col("filetype"),
        F.least(F.col("size"), F.lit(MAX_ES_INT)).cast("int").alias("size"),
        F.col("text"),
        F.col("lang"),
        F.least(F.col("word_count"), F.lit(MAX_ES_INT)).cast("int").alias("word-count"),
        F.array(F.col("filename")).alias("filename"),
        F.array(F.col("path")).alias("path"),
        F.array(F.col("path")).alias("path-text"),
        F.col("path_parts").alias("path-parts"),
        # reference digests.py:305-311: `date` = modified/email date,
        # `date-created` = Tika created / EXIF creation date
        F.coalesce(F.col("email_date"), F.col("date_modified")).alias("date"),
        F.coalesce(F.col("date_created"), F.col("exif_date")).alias("date-created"),
        F.col("subject"),
        F.col("email_from").alias("from"),
        F.col("email_to").alias("to"),
        F.col("email_domains").alias("email-domains"),
        F.col("email_header").alias("email-header"),
        F.col("email_header_key").alias("email-header-key"),
        F.col("attachments"),
        (F.col("status") == "skipped").alias("skipped"),
        F.when(F.col("status") == "broken", F.array(F.col("broken_reason")))
        .otherwise(F.array().cast("array<string>"))
        .alias("broken"),
    )
