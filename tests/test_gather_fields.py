"""Path fields, OCR join, user-tag join (digests.py:726-978 surface)."""

from pyspark.sql import functions as F

from hoover_snoop2_spark.operators.gather_fields import (
    join_ocr_sources,
    join_user_tags,
    with_path_fields,
)


def test_path_fields(spark):
    df = spark.createDataFrame(
        [("https://site1.example/cat/42.zip//docs/a.txt",)], "url string"
    )
    row = with_path_fields(df).collect()[0]
    assert row["filename"] == "a.txt"
    assert row["path"] == "site1.example/cat/42.zip//docs/a.txt"
    assert row["path_parts"] == [
        "site1.example",
        "site1.example/cat",
        "site1.example/cat/42.zip",
        "site1.example/cat/42.zip/",          # '//' container boundary
        "site1.example/cat/42.zip//docs",
        "site1.example/cat/42.zip//docs/a.txt",
    ]


def test_ocr_join(spark):
    digests = spark.createDataFrame(
        [("d1", "m1"), ("d2", "m2")], "sha3_256 string, md5 string"
    )
    ocr = spark.createDataFrame(
        [("m1", "scanned text")], "md5 string, ocrtext string"
    )
    rows = {r["sha3_256"]: r for r in join_ocr_sources(digests, ocr).collect()}
    assert rows["d1"]["ocr"] is True
    assert rows["d1"]["ocrtext"] == {"ocr": "scanned text"}
    assert rows["d2"]["ocr"] is False
    assert rows["d2"]["ocrtext"] is None


def test_user_tags_join(spark):
    digests = spark.createDataFrame([("d1",), ("d2",)], "sha3_256 string")
    tags = spark.createDataFrame(
        [
            ("d1", "important", True, "alice"),
            ("d1", "secret", False, "bob"),
            ("d1", "todo", True, "bob"),
        ],
        "sha3_256 string, tag string, public boolean, user string",
    )
    rows = {r["sha3_256"]: r for r in join_user_tags(digests, tags).collect()}
    assert rows["d1"]["tags"] == ["important", "todo"]
    assert rows["d1"]["private_tags"] == ["bob:secret"]
    assert rows["d2"]["tags"] is None
