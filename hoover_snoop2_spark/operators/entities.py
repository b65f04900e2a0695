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


#: candidate IBAN shape: 2 letters + 2 check digits + 10-30 alnum
IBAN_RE = r"\b[A-Z]{2}\d{2}[A-Z0-9]{10,30}\b"


def iban_mod97_valid(col) -> F.Column:
    """ISO 13616 IBAN checksum validation as a pure JVM expression —
    the verification step that turns a regexp PII *candidate* (shape
    match, huge false-positive rate on invoice numbers) into a
    confirmed detection.  Rearrange (first 4 chars to the back), map
    letters to two-digit values (A=10..Z=35), and fold mod 97 left to
    right with an ``aggregate`` higher-order function — the standard
    streaming form of the big-integer check, O(len) per row, no
    Python, no Decimal width limit.  NULL for NULL/empty input;
    ``true`` iff the remainder is 1."""
    c = F.col(col) if isinstance(col, str) else col
    rearranged = F.concat(F.substring(c, 5, 100), F.substring(c, 1, 4))
    chars = F.split(rearranged, "")

    def step(acc, ch):
        a = F.ascii(ch)
        return F.when(
            ch.rlike("[0-9]"), (acc * 10 + (a - 48)) % 97
        ).otherwise((acc * 100 + (a - 55)) % 97)

    rem = F.aggregate(
        F.filter(chars, lambda ch: ch != ""),
        F.lit(0).cast("long"),
        step,
    )
    return F.when(c.isNull() | (F.length(c) == 0), F.lit(None)).otherwise(
        rem == 1
    )


CARD_RE = r"\b\d{16}\b"


def luhn_valid(col) -> F.Column:
    """Luhn (ISO/IEC 7812) checksum validation as a pure JVM expression
    — the payment-card counterpart of :func:`iban_mod97_valid`: the
    q40-class regexps only find 16-digit *shapes* (order ids, tracking
    numbers); this confirms an actual card number.  Doubles every
    second digit from the right (subtracting 9 past 9) and sums with
    an ``aggregate`` higher-order function — O(len) per row, no
    Python.  NULL for NULL/empty input; ``true`` iff the total is
    divisible by 10."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c)

    def step(acc, i):
        d = F.ascii(F.substring(c, i, 1)) - 48
        doubled = F.when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)
        use = F.when((n - i) % 2 == 1, doubled).otherwise(d)
        return acc + use

    total = F.aggregate(
        F.sequence(F.lit(1), n), F.lit(0).cast("long"), step
    )
    return F.when(c.isNull() | (n == 0), F.lit(None)).otherwise(
        total % 10 == 0
    )
