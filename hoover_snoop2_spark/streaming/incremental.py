"""Incremental ingest — the Structured-Streaming analog of the reference's
``sync_common_data`` loop (tasks.py:1689-1810: high-watermark on
Max(date_created), 13k-row batches, re-poll) and of the dispatcher's
"new files appeared" top-up (tasks.py:1276-1410).

Batch analog (oracle-checkable): ``watermark_delta`` — rows newer than the
recorded watermark, plus the new watermark.

Streaming analog: ``stream_page_counts`` — a file-source stream over a
pages/events directory with event-time windowed aggregation + watermark for
late data; runs to completion on static input with
``trigger(availableNow=True)`` in tests.  The extraction pipeline itself
runs per micro-batch via foreachBatch in production; here we demonstrate
the wiring with the counting aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def watermark_delta(
    df: DataFrame, ts_col: str, watermark: str | None
) -> tuple[DataFrame, str | None]:
    """Rows strictly newer than the watermark + the new high watermark
    (the reference's Max(date_created) sync cursor, tasks.py:1741-1760)."""
    delta = df if watermark is None else df.filter(F.col(ts_col) > F.lit(watermark))
    row = delta.agg(F.max(ts_col).alias("wm")).first()
    new_wm = row["wm"].isoformat() if row and row["wm"] is not None else watermark
    return delta, new_wm


def stream_event_counts(
    spark: SparkSession,
    src_dir: str,
    schema,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "5 minutes",
    late: str = "10 minutes",
):
    """readStream(parquet dir) → watermark → windowed counts.

    Returns the streaming DataFrame; callers start it with
    ``.writeStream.format('memory').trigger(availableNow=True)`` in tests
    or a real sink in production.
    """
    events = (
        spark.readStream.format("parquet").schema(schema).load(src_dir)
        # watermarks require zoned timestamps; parquet NTZ → session-TZ cast
        .withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    )
    return (
        events.withWatermark(ts_col, late)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            key_col,
            "n",
        )
    )


def run_stream_to_memory(stream_df, name: str = "stream_out"):
    """Drive a streaming query to completion over static input (test/smoke
    helper): availableNow trigger + memory sink."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
