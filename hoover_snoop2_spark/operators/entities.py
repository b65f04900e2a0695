"""Structured entity extraction — the deterministic subset of the
reference's NER stage.

The reference extracts entities via an ML NLP service
(entities.get_entity_results, entities.py:279-351) — irreproducible
offline.  What IS reproducible is pattern-typed entities (EMAIL, URL, IP,
ISO-DATE): extracted JVM-side with `regexp_extract_all` (no UDF), emitted
in the reference's hit shape — an exploded hits table
(entity text, type, digest key) mirroring EntityHit rows
(models.py:1084-1154) — plus a dimension-style rollup
(`get_or_create Entity` analog, entities.py:415-504) as a groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: shared with the DuckDB oracle verbatim — keep in sync with queries.py
ENTITY_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s\"'<>]+",
    "ip": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "date": r"\b\d{4}-\d{2}-\d{2}\b",
}


def extract_entity_hits(
    df: DataFrame, id_col: str, text_col: str, types: list[str] | None = None
) -> DataFrame:
    """(id, entity, entity_type) hit rows — one per occurrence, in-document
    duplicates preserved (the reference keeps every hit span)."""
    types = types or list(ENTITY_PATTERNS)
    legs = []
    for t in types:
        legs.append(
            df.select(
                F.col(id_col).alias("id"),
                F.explode(
                    F.regexp_extract_all(F.col(text_col), F.lit(ENTITY_PATTERNS[t]), 0)
                ).alias("entity"),
                F.lit(t).alias("entity_type"),
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def entity_dimension(hits: DataFrame) -> DataFrame:
    """Entity dimension rollup — the get_or_create Entity/Type upsert
    (entities.py:415-504) as a groupBy: one row per (entity, type) with
    document frequency and total hits."""
    return hits.groupBy("entity", "entity_type").agg(
        F.countDistinct("id").alias("doc_freq"),
        F.count("*").alias("n_hits"),
    )
