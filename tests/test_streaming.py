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


def test_session_window_streaming_with_watermark(spark, tmp_path):
    """q54's claim — the SAME session_window aggregate runs under
    readStream with a watermark — proven end to end.  Append mode emits
    a session only once the watermark passes its close, so the session
    containing the corpus's LAST event stays open and is withheld: the
    streaming result is exactly the batch result minus that unclosed
    tail session.  (A production stream emits it when later data — or
    an empty trigger past the gap — advances the watermark.)"""
    from pyspark.sql import functions as F

    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:10:00", 2.0),   # same session (gap < 30m)
        (1, "2024-01-01 11:30:00", 3.0),   # new session
        (2, "2024-01-01 09:00:00", 4.0),
    ]
    src = str(tmp_path / "events_stream")
    spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(src)

    def sessions(df):
        return (
            df.withWatermark("ts", "1 minute")
            .groupBy("user_id", F.session_window("ts", "30 minutes"))
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("v"))
            .select(
                "user_id",
                F.col("session_window.start").cast("string").alias("s"),
                "n_events",
                "v",
            )
        )

    batch = {
        (r["user_id"], r["s"], r["n_events"], r["v"])
        for r in sessions(
            spark.read.parquet(src)
        ).collect()
    }

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(src)
    out = sessions(stream)
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sw_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["s"], r["n_events"], r["v"])
        for r in spark.sql("select * from sw_out").collect()
    }
    unclosed_tail = {(1, "2024-01-01 11:30:00", 1, 3.0)}
    assert batch == got | unclosed_tail and len(got) == 2
    assert got == batch - unclosed_tail
