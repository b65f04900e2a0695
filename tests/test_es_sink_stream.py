"""ES-shaped sink projection + streaming extraction via foreachBatch."""

import os

from pyspark.sql import functions as F


def test_es_shape(spark, digests):
    from hoover_snoop2_spark.operators.es_sink import to_es_documents

    es = to_es_documents(digests)
    cols = set(es.columns)
    for want in ("id", "sha3-256", "content-type", "word-count",
                 "path-parts", "email-domains", "skipped", "broken"):
        assert want in cols, want
    row = es.filter(F.col("content-type") == "message/rfc822").first()
    assert row["from"] and row["subject"]
    assert es.count() == digests.count()


def test_streaming_extraction(spark, tmp_path):
    from hoover_snoop2_spark.corpus import generate_pages
    from hoover_snoop2_spark.streaming.extract_stream import start_extract_stream

    src = str(tmp_path / "pages_stream")
    os.makedirs(src)
    pages_path, golden_path = generate_pages(60, str(tmp_path / "gen"))
    pages = spark.read.parquet(pages_path)
    # two file drops → at least two micro-batches with maxFilesPerTrigger=8
    pages.filter(F.col("url").contains("/html")).write.mode("append").parquet(src)
    pages.filter(~F.col("url").contains("/html")).write.mode("append").parquet(src)

    out = str(tmp_path / "digests_out")
    q = start_extract_stream(spark, src, out, spark.read.parquet(src).schema)
    q.awaitTermination()

    got = spark.read.parquet(out)
    golden = spark.read.parquet(golden_path)
    j = golden.alias("g").join(got.alias("d"), "url", "left")
    assert j.filter(F.col("d.status").isNull()).count() == 0
    assert (
        j.filter(
            F.coalesce(F.col("d.text"), F.lit(""))
            != F.coalesce(F.col("g.text"), F.lit(""))
        ).count()
        == 0
    )
    # memoization across epochs: no duplicate urls
    assert got.groupBy("url").count().filter(F.col("count") > 1).count() == 0


def test_streaming_per_epoch_append(spark, tmp_path):
    """Per-epoch write volume stays O(batch): each micro-batch appends only
    its delta partition (epoch=N/) instead of rewriting the cumulative
    table, and every url lands in exactly one epoch."""
    from hoover_snoop2_spark.corpus import generate_pages
    from hoover_snoop2_spark.streaming.extract_stream import (
        read_digests,
        start_extract_stream,
    )

    src = str(tmp_path / "pages_stream")
    os.makedirs(src)
    pages_path, _ = generate_pages(60, str(tmp_path / "gen"))
    pages = spark.read.parquet(pages_path)
    # three file drops → three micro-batches with maxFilesPerTrigger=8
    thirds = [
        pages.filter(F.abs(F.hash("url")) % 3 == i).coalesce(1)
        for i in range(3)
    ]
    for part in thirds:
        part.write.mode("append").parquet(src)

    out = str(tmp_path / "digests_out")
    q = start_extract_stream(
        spark, src, out, spark.read.parquet(src).schema,
        max_files_per_trigger=1,
    )
    q.awaitTermination()

    got = spark.read.parquet(out)  # partition-discovers the epoch column
    per_epoch = {
        r["epoch"]: r["n"]
        for r in got.groupBy("epoch").agg(F.count("*").alias("n")).collect()
    }
    total = sum(per_epoch.values())
    assert len(per_epoch) >= 2, per_epoch
    # append-only: every epoch wrote a strict subset, never the whole table
    assert max(per_epoch.values()) < total, per_epoch
    # each url in exactly one epoch (memoization delta, no rewrites)
    assert (
        got.groupBy("url")
        .agg(F.countDistinct("epoch").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    assert read_digests(spark, out).count() == total


def test_metadata_kv_flatten(spark, digests):
    """convert_for_indexing analog (tika.py:178-212): typed metadata folds
    into one `tika` k:v array + `tika-key` key list."""
    from hoover_snoop2_spark.operators.es_sink import to_es_documents

    es = to_es_documents(digests)
    assert "tika" in es.columns and "tika-key" in es.columns
    office = es.filter(
        F.col("content-type").contains("officedocument.wordprocessingml")
    ).first()
    assert any(s.startswith("dcterms:created: ") for s in office["tika"])
    assert "dcterms:created" in office["tika-key"]
    assert any(s.startswith("Content-Type: ") for s in office["tika"])
    table = es.filter(F.col("content-type") == "text/csv").first()
    assert any(s.startswith("table:row-count: ") for s in table["tika"])


def test_streaming_wet_sink(spark, tmp_path):
    """foreachBatch extraction with wet_dir lands every epoch's delta as
    WET conversion records; the union across epochs matches the digest
    table url-for-url with identical text."""
    from hoover_snoop2_spark.corpus import generate_pages
    from hoover_snoop2_spark.sources.warc import read_wet
    from hoover_snoop2_spark.streaming.extract_stream import (
        start_extract_stream,
    )

    src = str(tmp_path / "pages_stream")
    os.makedirs(src)
    pages_path, _ = generate_pages(40, str(tmp_path / "gen"))
    pages = spark.read.parquet(pages_path)
    pages.filter(F.crc32(F.col("url")) % 2 == 0).write.mode("append").parquet(src)
    pages.filter(F.crc32(F.col("url")) % 2 == 1).write.mode("append").parquet(src)

    out = str(tmp_path / "digests_out")
    wet = str(tmp_path / "wet_out")
    q = start_extract_stream(
        spark, src, out, spark.read.parquet(src).schema, wet_dir=wet
    )
    q.awaitTermination()

    digests = spark.read.parquet(out)
    back = read_wet(spark, wet + "/epoch=*/*.warc.wet.gz")
    assert back.count() == digests.count()
    j = digests.alias("d").join(back.alias("w"), "url")
    assert j.count() == digests.count()
    assert (
        j.filter(
            F.coalesce(F.col("d.text"), F.lit(""))
            != F.coalesce(F.col("w.text"), F.lit(""))
        ).count()
        == 0
    )


def test_streaming_extraction_from_warc_source(spark, tmp_path):
    """The full crawl-to-corpus loop with NO batch staging: raw WARC
    drops stream in through the warc data source, foreachBatch runs the
    incremental pipeline, digests + WET records land per epoch — and
    the result is row-identical to the batch path over the same files."""
    import gzip

    from hoover_snoop2_spark.plans.pipeline import run_extraction
    from hoover_snoop2_spark.sources.warc import (
        read_warc,
        read_wet,
        to_pages,
    )
    from hoover_snoop2_spark.streaming.extract_stream import (
        start_extract_stream,
    )
    from test_warc import _build_records

    drop = tmp_path / "warc_drop"
    drop.mkdir()
    for i in range(2):
        (drop / f"seg-{i:05d}.warc.gz").write_bytes(
            b"".join(gzip.compress(r) for r in _build_records())
        )

    out = str(tmp_path / "digests_out")
    wet = str(tmp_path / "wet_out")
    q = start_extract_stream(
        spark,
        str(drop / "*.warc.gz"),
        out,
        source_format="warc",
        max_files_per_trigger=1,
        wet_dir=wet,
    )
    q.awaitTermination()

    got = spark.read.parquet(out)
    batch, _ = run_extraction(
        spark,
        to_pages(read_warc(spark, str(drop / "*.warc.gz"))),
        checkpoint_dir=str(tmp_path / "ckpt_batch"),
    )
    want = {(r.url, r.text) for r in batch.select("url", "text").collect()}
    have = {(r.url, r.text) for r in got.select("url", "text").collect()}
    assert want == have and want
    # WET side: one conversion record per url, readable back
    wet_back = read_wet(spark, wet + "/epoch=*/*.warc.wet.gz")
    assert wet_back.count() == got.select("url").distinct().count()
