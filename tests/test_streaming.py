"""Structured-Streaming incremental analogs (sync_common_data,
tasks.py:1689-1810)."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_watermark_delta(spark):
    from hoover_snoop2_spark.streaming.incremental import watermark_delta

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    full, wm1 = watermark_delta(ev, "ts", None)
    assert full.count() == ev.count()
    # advancing from the recorded watermark yields an empty delta
    delta, wm2 = watermark_delta(ev, "ts", wm1)
    assert delta.count() == 0
    assert wm2 == wm1


def test_stream_event_counts(spark, tmp_path):
    from hoover_snoop2_spark.streaming.incremental import (
        run_stream_to_memory,
        stream_event_counts,
    )

    src = str(tmp_path / "events_stream")
    os.makedirs(src)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(2000)
    ev.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    agg = stream_event_counts(spark, src, schema)
    run_stream_to_memory(agg, "stream_counts")
    got = spark.sql("SELECT sum(n) AS total FROM stream_counts").first()["total"]
    # append mode with watermark emits only closed windows; the final
    # (open) windows are withheld, so total <= input rows and > 0
    assert 0 < got <= 2000

    batch = (
        ev.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    stream_rows = spark.sql(
        "SELECT window_start, event_type, n FROM stream_counts"
    ).collect()
    batch_map = {
        (r["window"]["start"], r["event_type"]): r["n"] for r in batch.collect()
    }
    for r in stream_rows:
        assert batch_map[(r["window_start"], r["event_type"])] == r["n"]
