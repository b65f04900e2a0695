"""Filesystem directory ingest — the reference's primary input mode
(`filesystem.walk`, snoop/data/filesystem.py:60-118) as a Spark source.

The reference recursively walks a collection directory, stores each
file's bytes as a Blob keyed by content hash, and queues
`handle_file` per file.  The Spark-native shape is the `binaryFile`
datasource with `recursiveFileLookup`: one row per file carrying
(path, modificationTime, content), column-pruned and partitioned by
Spark's file-scan planner (large files become their own partitions via
`spark.sql.files.maxPartitionBytes` — the walk itself never
bottlenecks on a driver loop).

Output is pages-shaped so `run_extraction` consumes it unchanged:

- ``url``   = the scan's file URI (``file:/...``) — the stable
  per-document identity, like the reference's path-derived File row;
- ``warc_ts`` = filesystem mtime (the reference stores stat().st_mtime
  on the File row, filesystem.py:154-170);
- ``html``  = raw bytes (name is the pipeline's input-column
  convention from BASELINE.json's input_hint, not an assertion about
  content type — the sniffer decides downstream).

Apple Mail ``.partial.emlx`` reconstruction needs SIBLING files from
the same directory (the reason the reference walks directories as
transactional units — filesystem.py docstring).  ``read_directory``
reproduces that contract relationally: a per-directory grouped apply
re-attaches ``<msg>.<ref>.emlxpart`` payloads (emlx_reconstruct.py)
and the repaired bytes replace the partial file's row; the
``.emlxpart`` fragment files themselves are dropped, like the
reference's `handle_file` skip (filesystem.py:186-193 routes them
only through their parent message).

Non-UTF-8 filenames: the reference shells to a "broken filename
service" to stat undecodable names; JVM path handling surfaces them
percent-escaped in the URI instead — documented deviation, no bytes
are lost (identity stays unique either way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_files(spark: SparkSession, root: str, *,
               recursive: bool = True,
               path_glob: str | None = None) -> DataFrame:
    """Raw (path, mtime, data) rows for every file under ``root``."""
    reader = (spark.read.format("binaryFile")
              .option("recursiveFileLookup", str(recursive).lower()))
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return (reader.load(root)
            .select(F.col("path"),
                    F.col("modificationTime").alias("mtime"),
                    F.col("content").alias("data")))


def read_directory(spark: SparkSession, root: str, *,
                   recursive: bool = True,
                   path_glob: str | None = None,
                   reconstruct_partial_emlx: bool = True) -> DataFrame:
    """Directory tree → pages(url, warc_ts, html) for run_extraction."""
    files = read_files(spark, root, recursive=recursive,
                       path_glob=path_glob)

    if reconstruct_partial_emlx:
        from ..operators.emlx_reconstruct import reconstruct_emlx

        # fully lazy (no eager existence probe): only directories that
        # actually contain a .partial.emlx enter the grouped repair —
        # the semi-join build side reads the pruned path column alone,
        # and when no Apple Mail exists the repair frame is empty and
        # AQE's empty-relation propagation turns the left join into a
        # pass-through, so plain corpora never pay the byte shuffle
        dirname = F.expr(
            "substring_index(path, '/', size(split(path, '/')) - 1)")
        partial_dirs = (files.filter(F.col("path").endswith(".partial.emlx"))
                        .select(dirname.alias("dirname")).distinct())
        relevant = (files.withColumn("dirname", dirname)
                    .join(partial_dirs, "dirname", "left_semi"))
        fixed = reconstruct_emlx(relevant.select("path", "data"))
        files = (
            files.alias("f")
            .join(fixed.alias("r"), "path", "left")
            .select(
                "path", "mtime",
                F.coalesce(F.col("r.data"), F.col("f.data")).alias("data"),
            )
        )
        # fragment files ride inside their parent message, never alone
        files = files.filter(~F.col("path").rlike(r"\.emlxpart$"))

    return files.select(
        F.col("path").alias("url"),
        F.col("mtime").alias("warc_ts"),
        F.col("data").alias("html"),
    )
