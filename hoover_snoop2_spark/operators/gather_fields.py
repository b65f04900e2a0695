"""Digest path/filename field builders + side-table joins — the remaining
`_get_document_content` surface (reference digests.py:865-978) beyond the
core gather projection:

- ``full_path`` / ``path_parts`` — container-aware path prefixes
  (digests.py:726-759): `//` marks archive boundaries; `path-parts` holds
  every cumulative prefix (ES path-bucket aggregations),
- ``filename`` — last path segment,
- OCR side-source join — external OCR artifacts matched to documents **by
  MD5 prefix of the artifact filename** (ocr.py:113-156, join at
  ocr.py:73-77): a broadcast left join adding `ocrtext` and an `ocr` flag,
- user-tags side table (DocumentUserTag, models.py:986-1081): tags
  aggregated per doc hash and joined at sink time.

All pure column expressions / joins — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_path_fields(df: DataFrame, url_col: str = "url") -> DataFrame:
    """filename, path, path_parts columns.

    ``path_parts`` = cumulative '/'-prefixes of the url path (scheme+host
    kept as the first element), mirroring path_parts (digests.py:746-759)
    which returns every prefix of the slash-split path.
    """
    # strip scheme; keep host as first path element (collection-root analog)
    path = F.regexp_replace(F.col(url_col), r"^[a-z]+://", "")
    segments = F.split(path, "/")
    # cumulative prefixes: transform over 1..n joining the first i segments
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(segments)),
        lambda i: F.concat_ws("/", F.slice(segments, 1, i)),
    )
    return (
        df.withColumn("path", path)
        .withColumn("filename", F.element_at(segments, -1))
        .withColumn("path_parts", prefixes)
    )


#: language-detector 2-letter → tesseract 3-letter codes (the subset our
#: langid emits; reference entities.LANGUAGE_CODE_MAP)
TESSERACT_LANG_CODES = {
    "en": "eng", "de": "deu", "fr": "fra", "es": "spa", "ro": "ron",
    "it": "ita", "pt": "por", "nl": "nld", "pl": "pol", "ru": "rus",
}


def join_ocr_sources(
    digests: DataFrame, ocr_docs: DataFrame, source_name: str = "ocr",
    broadcast: bool = True,
) -> DataFrame:
    """Attach external OCR text by md5 (the reference pairs OCR files to
    originals via the md5 embedded in the artifact filename,
    ocr.py:126-127; digest merge at digests.py:298-331).

    ocr_docs: (md5, ocrtext) for a single source, or (md5, source,
    ocrtext) for several (import directories + tesseract_{lang} runs).
    The result's ``ocrtext`` is the reference's ``map<source, text>`` —
    one row per document, every OCR source keyed by name — and ``ocr`` is
    true when ANY source has non-blank text (digests.py:325-331; an
    all-blank map reports false, not true).

    Defaults to a broadcast left join — OCR sources are usually
    dimension-sized next to the corpus; pass ``broadcast=False`` when a
    whole-corpus OCR pass makes the side table corpus-sized (AQE then
    picks the join strategy from stats).
    """
    if "source" not in ocr_docs.columns:
        ocr_docs = ocr_docs.withColumn("source", F.lit(source_name))
    # collect_set: duplicate-text documents share an md5, so the same
    # (source, text) entry can arrive once per twin — map_from_entries
    # rejects duplicate keys under Spark's default EXCEPTION dedup policy
    ocr = ocr_docs.groupBy("md5").agg(
        F.map_from_entries(
            F.sort_array(F.collect_set(F.struct("source", "ocrtext")))
        ).alias("ocrtext")
    )
    out = digests.join(F.broadcast(ocr) if broadcast else ocr, "md5", "left")
    return out.withColumn(
        "ocr",
        F.coalesce(
            F.exists(
                F.map_values("ocrtext"), lambda x: F.length(F.trim(x)) > 0
            ),
            F.lit(False),
        ),
    )


def with_ocr_flags(df: DataFrame, mime_col: str = "mime_type") -> DataFrame:
    """ocrpdf / ocrimage flags (digests.py:326-331): an OCR'd PDF sets
    ocrpdf, any other OCR'd source sets ocrimage."""
    is_pdf = F.col(mime_col) == "application/pdf"
    return df.withColumn("ocrpdf", F.col("ocr") & is_pdf).withColumn(
        "ocrimage", F.col("ocr") & ~is_pdf
    )


def filter_ocrtext_by_lang(
    df: DataFrame,
    ocr_languages: list[str],
    lang_col: str = "lang",
    ocrtext_col: str = "ocrtext",
) -> DataFrame:
    """Per-language ocrtext filter at gather time (digests.py:948-968):
    when the document's detected language maps to a configured tesseract
    language, keep only the matching ``tesseract_<code>`` entry;
    ``translated_*`` and custom import sources always survive.  Pure
    map_filter — no UDF."""
    code3 = F.create_map(
        *[F.lit(x) for kv in TESSERACT_LANG_CODES.items() for x in kv]
    )[F.col(lang_col)]
    applies = (
        F.col(lang_col).isNotNull()
        & code3.isNotNull()
        & code3.isin(list(ocr_languages))
        if ocr_languages else F.lit(False)
    )
    filtered = F.map_filter(
        F.col(ocrtext_col),
        lambda k, v: (~k.startswith("tesseract")) | (~applies) | k.endswith(code3),
    )
    out = df.withColumn(
        ocrtext_col,
        F.when(F.col(ocrtext_col).isNotNull(), filtered),
    )
    # re-derive the ocr flag(s) from the FILTERED map — a doc whose only
    # non-blank text came from a removed tesseract_<lang> entry must flip
    # ocr back to false (same exists() rule as join_ocr_sources)
    if "ocr" in out.columns:
        out = out.withColumn(
            "ocr",
            F.coalesce(
                F.exists(
                    F.map_values(ocrtext_col),
                    lambda x: F.length(F.trim(x)) > 0,
                ),
                F.lit(False),
            ),
        )
        if "ocrpdf" in out.columns and "ocrimage" in out.columns:
            out = out.withColumn(
                "ocrpdf", F.col("ocr") & F.col("ocrpdf")
            ).withColumn("ocrimage", F.col("ocr") & F.col("ocrimage"))
    return out


def join_user_tags(
    digests: DataFrame, tags: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Aggregate and attach user tags (public + private) per doc hash —
    the DocumentUserTag sink-time merge (digests.py:505-556).

    tags: (sha3_256 string, tag string, public boolean, user string).
    Public tags land in `tags`; private ones in `private_tags` as
    'user:tag' strings (the ES dynamic-template analog, indexing.py:96-113).
    User tags are human-entered (tiny next to the corpus) → broadcast by
    default; ``broadcast=False`` defers to AQE for machine-generated tags.
    """
    agg = tags.groupBy("sha3_256").agg(
        F.sort_array(
            F.collect_set(F.when(F.col("public"), F.col("tag")))
        ).alias("tags"),
        F.sort_array(
            F.collect_set(
                F.when(
                    ~F.col("public"),
                    F.concat_ws(":", F.col("user"), F.col("tag")),
                )
            )
        ).alias("private_tags"),
    )
    return digests.join(
        F.broadcast(agg) if broadcast else agg, "sha3_256", "left"
    )
