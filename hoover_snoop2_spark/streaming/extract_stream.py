"""Streaming extraction: the pipeline as a Structured-Streaming sink.

The reference ingests continuously — celery beat re-dispatches
`filesystem.walk` every 59 s to pick up new files (tasks.py:1219-1243,
defaultsettings.py:452-457).  The Spark-native equivalent is a file-source
stream over the pages directory driven through ``foreachBatch``: every
micro-batch runs the SAME batch pipeline incrementally, with the digests
accumulated so far acting as the memoization set (content-hash dedup across
batches — exactly the reference's cross-run task dedup, tasks.py:356-364).

Sink layout: one partition directory per epoch (``epoch=N/``), append-only.
Each micro-batch writes ONLY its delta digests — O(batch) write volume per
epoch, not O(corpus) — and the cumulative table is the partitioned read of
the whole directory (an Iceberg ``MERGE``/append commit in production).
Re-running an epoch overwrites its own partition, so retries stay
idempotent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_digests(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """Cumulative digest table = union of all epoch partitions.  Each sha
    appears in exactly one epoch (the memoization anti-join guarantees it),
    so the read needs no dedup."""
    if not os.path.exists(out_dir):
        return None
    try:
        return spark.read.parquet(out_dir).drop("epoch")
    except Exception:
        return None


class StreamingExtractor:
    """foreachBatch handler appending per-epoch digest deltas."""

    def __init__(self, spark: SparkSession, out_dir: str, max_depth: int = 5,
                 wet_dir: str | None = None):
        self.spark = spark
        self.out_dir = out_dir
        self.max_depth = max_depth
        self.wet_dir = wet_dir

    def digests(self) -> DataFrame | None:
        return read_digests(self.spark, self.out_dir)

    def process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        from ..plans.pipeline import run_extraction

        previous = self.digests()
        delta, _ = run_extraction(
            self.spark,
            batch_df,
            max_depth=self.max_depth,
            previous_digests=previous,
            include_previous=False,
        )
        # append-only: this epoch's delta lands in its own partition dir;
        # overwrite of the SAME epoch (streaming retry) is idempotent
        delta = delta.persist()
        try:
            delta.write.mode("overwrite").parquet(
                os.path.join(self.out_dir, f"epoch={int(epoch_id)}")
            )
            if self.wet_dir is not None:
                import shutil

                from ..sources.warc import write_wet

                # one WET record per url: a re-crawled url carries
                # several page rows, and a plain join would fan the
                # digest out into duplicate records with identical ids
                with_ts = delta.select("url", "text").dropDuplicates(
                    ["url"]
                ).join(
                    batch_df.select("url", "warc_ts")
                    .dropDuplicates(["url"]),
                    "url",
                    "left",
                )
                # retry idempotence must be explicit: parquet's
                # overwrite mode truncates the target, but write_wet
                # appends files — a failed first attempt would leave
                # stale part files that read_wet('epoch=*') unions
                # into duplicates
                epoch_dir = os.path.join(
                    self.wet_dir, f"epoch={int(epoch_id)}"
                )
                shutil.rmtree(epoch_dir, ignore_errors=True)
                write_wet(with_ts, epoch_dir).count()
        finally:
            delta.unpersist()


def start_extract_stream(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    schema=None,
    available_now: bool = True,
    max_files_per_trigger: int = 8,
    wet_dir: str | None = None,
    source_format: str = "parquet",
    checkpoint_location: str | None = None,
):
    """readStream(pages dir) → foreachBatch(incremental pipeline).

    ``available_now=True`` drains existing files and stops — the test /
    backfill mode; production would trigger on processingTime.
    ``wet_dir`` additionally lands each epoch's delta as WET files.
    ``source_format='warc'`` reads raw crawl drops through the warc
    streaming data source instead of parquet pages — the full
    crawl-to-corpus loop (WARC in → digests + WET out) with no batch
    staging step; ``schema`` is ignored (the source owns it) and the
    rows project onto the pages contract via ``to_pages``.
    ``source_format='files'`` watches a RAW directory tree through the
    streaming ``binaryFile`` source — the literal analog of the
    reference's beat-driven filesystem.walk re-scan: drop files into
    the collection dir and each trigger extracts only the new ones
    (schema is the source's own; ``.partial.emlx`` sibling repair is a
    batch-ingest feature — siblings may land in different micro-batches
    — so use ``sources.filesystem.read_directory`` for Apple Mail trees).
    """
    extractor = StreamingExtractor(spark, out_dir, wet_dir=wet_dir)
    if source_format == "files":
        from pyspark.sql import functions as F

        stream = (
            spark.readStream.format("binaryFile")
            # streaming file sources demand an explicit schema; this is
            # binaryFile's fixed one
            .schema("path string, modificationTime timestamp, "
                    "length long, content binary")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load(src_dir)
            .select(
                F.col("path").alias("url"),
                F.col("modificationTime").alias("warc_ts"),
                F.col("content").alias("html"),
            )
        )
    elif source_format == "warc":
        from ..sources.warc import to_pages
        from ..sources.warc_datasource import WarcDataSource

        spark.dataSource.register(WarcDataSource)
        stream = to_pages(
            spark.readStream.format("warc")
            .option("path", src_dir)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load()
        )
    else:
        stream = (
            spark.readStream.format("parquet")
            .schema(schema)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .load(src_dir)
        )
    writer = stream.writeStream.foreachBatch(extractor.process_batch)
    if checkpoint_location:
        # restartable watch: the source checkpoint remembers processed
        # files and keeps epoch ids advancing across runs — without it a
        # fresh query restarts at epoch 0 and re-reads the whole dir
        writer = writer.option("checkpointLocation", checkpoint_location)
    if available_now:
        q = writer.trigger(availableNow=True).start()
    else:
        q = writer.trigger(processingTime="59 seconds").start()  # beat analog
    return q
