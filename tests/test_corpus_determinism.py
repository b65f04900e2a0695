"""Corpus generation must be bit-identical across runs and independent of
generation path (driver-local pandas vs Spark-parallel)."""

import hashlib

from hoover_snoop2_spark.corpus import build_doc, generate_pages


def test_build_doc_deterministic():
    for i in (0, 17, 99, 541, 977):
        a, b = build_doc(i), build_doc(i)
        assert a["html"] == b["html"]
        assert a["text"] == b["text"]


def test_generate_pages_bit_identical(tmp_path):
    p1, g1 = generate_pages(80, str(tmp_path / "a"))
    p2, g2 = generate_pages(80, str(tmp_path / "b"))
    h = lambda p: hashlib.sha256(open(p, "rb").read()).hexdigest()
    assert h(p1) == h(p2)
    assert h(g1) == h(g2)


def test_spark_generation_matches_local(spark, tmp_path):
    from pyspark.sql import functions as F

    from hoover_snoop2_spark.corpus import generate_pages_spark

    p_local, _ = generate_pages(50, str(tmp_path / "local"))
    p_spark = generate_pages_spark(spark, 50, str(tmp_path / "spark"))
    a = spark.read.parquet(p_local).select("url", F.md5("html").alias("h"), "text")
    b = spark.read.parquet(p_spark).select("url", F.md5("html").alias("h"), "text")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
