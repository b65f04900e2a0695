"""Stream-static LSH near-dup join (streaming/dedup_stream.py)."""

import pytest
from pyspark.sql import functions as F

from hoover_snoop2_spark.streaming.dedup_stream import (
    build_dedup_index,
    stream_near_dups,
)
from hoover_snoop2_spark.streaming.incremental import run_stream_to_memory

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside "
    "the old house near the river bend every single morning"
)

CORPUS = [
    (100, BASE),
    (101, "a completely different article about catalyst optimizer rules "
          "and adaptive query execution with partition coalescing for "
          "large distributed joins in columnar execution engines"),
]


def test_batch_equivalence_of_stream_expressions(spark):
    """The stream query over a static frame (same exprs, batch mode)
    matches hand-computed Jaccard."""
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    index = build_dedup_index(corpus, "doc_id", "text", n_hashes=64, bands=16)
    pages = spark.createDataFrame(
        [("https://new.example/dup", BASE.replace("lazy", "sleepy")),
         ("https://new.example/novel",
          "utterly novel text on beekeeping techniques in alpine regions "
          "covering hive placement wind shelter and late winter feeding")],
        "url string, text string",
    )
    got = stream_near_dups(pages, index, n_hashes=64, bands=16).collect()
    assert {(r["url"], r["matched_id"]) for r in got} == {
        ("https://new.example/dup", 100)
    }
    assert all(r["jaccard"] >= 0.5 for r in got)


def test_streaming_near_dups_end_to_end(spark, tmp_path):
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    index = build_dedup_index(corpus, "doc_id", "text", n_hashes=64, bands=16)

    pages_dir = str(tmp_path / "pages_stream")
    spark.createDataFrame(
        [("https://new.example/dup", BASE.replace("lazy", "sleepy")),
         ("https://new.example/novel",
          "utterly novel text on beekeeping techniques in alpine regions "
          "covering hive placement wind shelter and late winter feeding")],
        "url string, text string",
    ).write.parquet(pages_dir)

    stream = spark.readStream.schema("url string, text string").parquet(pages_dir)
    out = stream_near_dups(stream, index, n_hashes=64, bands=16)
    assert out.isStreaming
    run_stream_to_memory(out, "near_dups_out")
    rows = spark.sql("select * from near_dups_out").collect()
    pairs = {(r["url"], r["matched_id"]) for r in rows}
    assert pairs == {("https://new.example/dup", 100)}
    # multi-band hits allowed, but every emitted row is verified exact
    assert all(r["jaccard"] >= 0.5 for r in rows)


def test_stream_plan_has_no_stream_stream_join(spark, tmp_path):
    """The stream side must be ONE projection (band keys + shingles
    carried together): joining two projections of the same streaming
    DataFrame would plan a stateful stream-stream self-join with
    unbounded state.  Only the stream-static join may remain."""
    corpus = spark.createDataFrame(CORPUS, "doc_id long, text string")
    index = build_dedup_index(corpus, "doc_id", "text", n_hashes=64, bands=16)
    pages_dir = str(tmp_path / "pages_plan")
    spark.createDataFrame(
        [("u", BASE)], "url string, text string"
    ).write.parquet(pages_dir)
    stream = spark.readStream.schema("url string, text string").parquet(pages_dir)
    out = stream_near_dups(stream, index, n_hashes=64, bands=16)
    plan = out._jdf.queryExecution().analyzed().toString()
    # exactly ONE streaming leaf: a second one would mean the stream was
    # projected twice and self-joined (stateful, unbounded)
    assert plan.count("StreamingRelation") == 1


def test_watermarked_exact_dedup_bounded_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicates inside the watermark
    window collapse to the first occurrence; output stays append-only."""
    import os

    from pyspark.sql import functions as F2

    from hoover_snoop2_spark.streaming.dedup_stream import (
        watermarked_exact_dedup,
    )

    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    schema = "fp string, url string, ts timestamp"
    rows1 = [
        ("a", "u1", "2024-01-01 10:00:00"),
        ("a", "u2", "2024-01-01 10:00:05"),
        ("b", "u3", "2024-01-01 10:00:10"),
    ]
    rows2 = [
        ("a", "u4", "2024-01-01 10:01:00"),  # dup within watermark
        ("c", "u5", "2024-01-01 10:01:30"),
    ]
    for batch in (rows1, rows2):
        spark.createDataFrame(batch, "fp string, url string, ts string").select(
            "fp", "url", F2.to_timestamp("ts").alias("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = watermarked_exact_dedup(stream, delay="10 minutes")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_dedup")
        .option("checkpointLocation", str(tmp_path / "ckpt_wm"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["fp"], r["url"])
        for r in spark.sql("SELECT fp, url FROM wm_dedup").collect()
    )
    # one row per fingerprint — the first seen; a's u2/u4 suppressed
    assert [fp for fp, _ in got] == ["a", "b", "c"]
    assert ("a", "u1") in got or ("a", "u2") in got  # first batch wins
    assert ("a", "u4") not in got
