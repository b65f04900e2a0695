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


def test_multi_source_ocrtext_map(spark):
    """ocrtext is a map<source, text>; ocr flag true only for non-blank
    text somewhere in the map (digests.py:298-331)."""
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.operators.gather_fields import (
        filter_ocrtext_by_lang,
        join_ocr_sources,
        with_ocr_flags,
    )

    docs = spark.createDataFrame(
        [("a", "application/pdf", "en"), ("b", "image/png", "de"),
         ("c", "image/png", None)],
        "md5 string, mime_type string, lang string",
    )
    ocr = spark.createDataFrame(
        [("a", "ocr-import", "imported text"),
         ("a", "tesseract_eng", "english ocr"),
         ("a", "tesseract_deu", "german ocr"),
         ("a", "translated_en", "translation"),
         ("b", "tesseract_deu", "   ")],          # blank-only → ocr false
        "md5 string, source string, ocrtext string",
    )
    out = join_ocr_sources(docs, ocr)
    rows = {r["md5"]: r for r in out.collect()}
    assert rows["a"]["ocr"] is True
    assert rows["b"]["ocr"] is False               # all-blank map
    assert rows["c"]["ocr"] is False and rows["c"]["ocrtext"] is None
    assert sorted(rows["a"]["ocrtext"]) == [
        "ocr-import", "tesseract_deu", "tesseract_eng", "translated_en"]

    # language filter: doc 'a' detected en → only tesseract_eng survives;
    # custom + translated sources always kept
    filtered = filter_ocrtext_by_lang(out, ["eng", "deu"])
    fa = {r["md5"]: r for r in filtered.collect()}
    assert sorted(fa["a"]["ocrtext"]) == [
        "ocr-import", "tesseract_eng", "translated_en"]
    assert sorted(fa["b"]["ocrtext"]) == ["tesseract_deu"]  # de → deu kept
    assert fa["c"]["ocrtext"] is None

    flagged = {r["md5"]: r for r in with_ocr_flags(filtered).collect()}
    assert flagged["a"]["ocrpdf"] is True and flagged["a"]["ocrimage"] is False
    assert flagged["b"]["ocrpdf"] is False and flagged["b"]["ocrimage"] is False


def test_ocr_duplicate_text_twins_share_entry(spark):
    """Two documents with identical fingerprints share the OCR row — the
    duplicate (source, text) entries must not trip Spark's duplicate-map-
    key exception."""
    from hoover_snoop2_spark.operators.gather_fields import join_ocr_sources

    docs = spark.createDataFrame(
        [("m1", 1), ("m1", 2)], "md5 string, doc_id int")
    ocr = spark.createDataFrame(
        [("m1", "ocr-import", "same text"), ("m1", "ocr-import", "same text")],
        "md5 string, source string, ocrtext string",
    )
    out = join_ocr_sources(docs, ocr).collect()
    assert len(out) == 2
    assert all(dict(r["ocrtext"]) == {"ocr-import": "same text"} for r in out)


def test_lang_filter_rederives_ocr_flags(spark):
    """A doc whose ONLY non-blank text came from a removed
    tesseract_<lang> entry must flip ocr (and ocrpdf/ocrimage) back to
    false after the language filter."""
    from hoover_snoop2_spark.operators.gather_fields import (
        filter_ocrtext_by_lang,
        join_ocr_sources,
        with_ocr_flags,
    )

    docs = spark.createDataFrame(
        [("a", "application/pdf", "en")],
        "md5 string, mime_type string, lang string",
    )
    # detected lang en → tesseract_eng kept; only non-blank text is in
    # tesseract_deu, which the filter removes
    ocr = spark.createDataFrame(
        [("a", "tesseract_deu", "german ocr"),
         ("a", "tesseract_eng", "   ")],
        "md5 string, source string, ocrtext string",
    )
    out = with_ocr_flags(join_ocr_sources(docs, ocr))
    before = out.collect()[0]
    assert before["ocr"] is True and before["ocrpdf"] is True

    after = filter_ocrtext_by_lang(out, ["eng", "deu"]).collect()[0]
    assert sorted(after["ocrtext"]) == ["tesseract_eng"]
    assert after["ocr"] is False
    assert after["ocrpdf"] is False and after["ocrimage"] is False
