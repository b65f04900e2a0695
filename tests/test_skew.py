"""Skew guard: heavy blobs spread thin before the analyze UDF stage
(plans/skew.py spread_heavy; the reference splits oversized work at 20k
rows / 150 pages, defaultsettings.py:383-391, pdf-tools/run.sh:5-11)."""

import pytest
from pyspark.sql import functions as F

from hoover_snoop2_spark.plans.skew import HEAVY_SPREAD_BYTES, spread_heavy


def test_spread_heavy_distributes_heavy_rows(spark):
    """8 heavy blobs written into ONE input partition must come out of
    spread_heavy spread over several partitions; light rows keep their
    input partitioning (no shuffle)."""
    heavy_payload = b"x" * (HEAVY_SPREAD_BYTES + 1)
    rows = [(f"http://heavy/{i}", heavy_payload) for i in range(8)]
    rows += [(f"http://light/{i}", b"tiny") for i in range(100)]
    df = spark.createDataFrame(rows, "url string, html binary").coalesce(1)

    out = spread_heavy(df)
    parts = (
        out.withColumn("pid", F.spark_partition_id())
        .withColumn("heavy", F.length("html") > HEAVY_SPREAD_BYTES)
        .groupBy("heavy")
        .agg(F.countDistinct("pid").alias("n_parts"), F.count("*").alias("n"))
        .collect()
    )
    by_class = {r["heavy"]: r for r in parts}
    assert by_class[True]["n"] == 8
    assert by_class[False]["n"] == 100
    # 8 url-hashed heavy rows over >=16 partitions: expect good spread
    assert by_class[True]["n_parts"] >= 4
    # light rows stayed in their single input partition (pass-through)
    assert by_class[False]["n_parts"] == 1


def test_pipeline_with_heavy_blobs_unchanged_output(spark, tmp_path):
    """End-to-end: a skewed corpus (2 multi-MB html blobs among small
    ones) extracts identically with the skew guard wired in."""
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    big_text = "heavy body word " * 600_000  # ~9.6 MB (> HEAVY_SPREAD_BYTES)
    rows = [
        ("http://big/a", f"<html><body>{big_text}</body></html>".encode()),
        ("http://big/b", f"<html><body>{big_text}X</body></html>".encode()),
    ] + [
        (f"http://small/{i}", f"<html><body>doc {i}</body></html>".encode())
        for i in range(50)
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    p = str(tmp_path / "pages")
    pages.write.parquet(p)
    digests, _ = run_extraction(spark, spark.read.parquet(p))
    got = {r["url"]: r["text"] for r in digests.select("url", "text").collect()}
    assert len(got) == 52
    assert got["http://big/a"].strip() == big_text.strip()
    assert got["http://small/7"] == "doc 7"
