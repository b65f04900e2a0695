"""Pattern-typed entity extraction (the deterministic NER subset)."""

from pyspark.sql import functions as F

from hoover_snoop2_spark.operators.entities import (
    entity_dimension,
    extract_entity_hits,
)


def test_extract_hits(spark):
    rows = [
        (1, "mail a@b.example and c@d.example, see https://x.example/p "
            "on 2024-03-01 from 10.0.0.1"),
        (2, "nothing structured here"),
        (3, "dup a@b.example a@b.example"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    hits = extract_entity_hits(df, "doc_id", "text").collect()
    by_type = {}
    for h in hits:
        by_type.setdefault(h["entity_type"], []).append((h["id"], h["entity"]))
    assert (1, "a@b.example") in by_type["email"]
    assert (1, "c@d.example") in by_type["email"]
    assert (1, "https://x.example/p") in by_type["url"]
    assert (1, "10.0.0.1") in by_type["ip"]
    assert (1, "2024-03-01") in by_type["date"]
    assert by_type["email"].count((3, "a@b.example")) == 2  # hits preserved
    assert not any(i == 2 for i, _ in by_type.get("email", []))


def test_entity_dimension(spark):
    rows = [(1, "x a@b.example"), (2, "y a@b.example a@b.example")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    dim = entity_dimension(
        extract_entity_hits(df, "doc_id", "text", ["email"])
    ).collect()
    assert len(dim) == 1
    assert dim[0]["doc_freq"] == 2
    assert dim[0]["n_hits"] == 3
