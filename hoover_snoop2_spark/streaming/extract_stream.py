"""Streaming extraction: the pipeline as a Structured-Streaming sink.

The reference ingests continuously — celery beat re-dispatches
`filesystem.walk` every 59 s to pick up new files (tasks.py:1219-1243,
defaultsettings.py:452-457).  The Spark-native equivalent is a file-source
stream over the pages directory driven through ``foreachBatch``: every
micro-batch runs the SAME batch pipeline incrementally, with the digests
accumulated so far acting as the memoization set (content-hash dedup across
batches — exactly the reference's cross-run task dedup, tasks.py:356-364).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class StreamingExtractor:
    """foreachBatch handler carrying the cumulative digest table."""

    def __init__(self, spark: SparkSession, out_dir: str, max_depth: int = 5):
        self.spark = spark
        self.out_dir = out_dir
        self.max_depth = max_depth

    def _previous(self) -> DataFrame | None:
        import os

        if not os.path.exists(self.out_dir):
            return None
        try:
            return self.spark.read.parquet(self.out_dir)
        except Exception:
            return None

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..plans.pipeline import run_extraction

        previous = self._previous()
        digests, _ = run_extraction(
            self.spark,
            batch_df,
            max_depth=self.max_depth,
            previous_digests=previous,
        )
        # exactly-once-ish: overwrite with the merged table per epoch
        # (an Iceberg MERGE in production)
        digests.write.mode("overwrite").parquet(self.out_dir + ".tmp")
        final = self.spark.read.parquet(self.out_dir + ".tmp")
        final.write.mode("overwrite").parquet(self.out_dir)


def start_extract_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    schema,
    available_now: bool = True,
):
    """readStream(pages dir) → foreachBatch(incremental pipeline).

    ``available_now=True`` drains existing files and stops — the test /
    backfill mode; production would trigger on processingTime.
    """
    extractor = StreamingExtractor(spark, out_dir)
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", "8")
        .load(src_dir)
    )
    writer = stream.writeStream.foreachBatch(extractor.process_batch)
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="59 seconds").start()  # beat analog
    return q
