"""The end-to-end extraction pipeline — snoop2's task DAG
(walk → handle_file → {unarchive|email|tika|pdf} → gather → index,
SURVEY.md §3.1) re-expressed as one checkpointed DataFrame program.

Shape::

    pages ──► hash ──► recursion-guard ──► dedup(sha3) ──► size-class
          repartition ──► analyze (mapInPandas: sniff+extract+unpack)
          ──► join back to urls ──► children become next round's pages
          (bounded driver loop) ──► union rounds ──► gather projection
          (filetype, lang, word-count, skip rules) ──► digests

Scale notes (the parts that matter at 10^12 docs):

- extraction runs once per unique blob (dropDuplicates on sha3) and results
  fan back to urls with a join — the reference's content-hash memoization
  (models.py:102-113) as a relational op;
- the unpack loop is data-driven but bounded (MAX_DEPTH), with an
  ancestor-hash recursion guard replacing check_recursion
  (archives.py:531-540); each round is checkpointed, so lineage stays flat
  and a crashed run resumes from the last round's parquet/Iceberg snapshot;
- heavy blobs are spread thin before the UDF stage (plans/skew.py);
- everything after the UDF is plain Catalyst-optimized DataFrame code.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.filetypes import filetype_col
from ..functions.hashing import sha3_256_udf
from ..functions.langid import detect_language_udf
from ..operators.analyze import ANALYZE_SCHEMA, analyze_map_in_pandas
from .checkpoint import CheckpointStore, resume_delta
from .metrics import stage_metrics
from .skew import repartition_by_size_class

MAX_DEPTH = 5

_DIGEST_FIELDS = [
    "sha3_256", "md5", "sha1", "sha256", "size", "mime_type", "mime_encoding",
    "text", "status", "broken_reason", "subject", "email_from", "email_to",
    "email_domains", "email_date", "table_columns", "table_row_count",
    "n_children",
]


def run_extraction(
    spark: SparkSession,
    pages: DataFrame,
    checkpoint_dir: str | None = None,
    max_depth: int = MAX_DEPTH,
    previous_digests: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """pages(url, warc_ts, html, ...) → (digests, metrics).

    ``previous_digests`` enables incremental re-runs: already-processed
    hashes are anti-joined away (resume_delta) and stitched back in.
    """
    own_tmp = None
    if checkpoint_dir is None:
        own_tmp = tempfile.mkdtemp(prefix="snoop_spark_ckpt_")
        checkpoint_dir = own_tmp
    cp = CheckpointStore(checkpoint_dir)

    work = pages.select(
        "url",
        "html",
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).alias("depth"),
        F.array().cast("array<string>").alias("ancestors"),
    )

    digest_rounds: list[DataFrame] = []
    metric_rounds: list[DataFrame] = []
    round_no = 0

    while True:
        from pyspark import StorageLevel

        # hashed feeds three consumers (recursion split, dedup, url map);
        # persist so the hashing UDF runs once per round
        hashed = work.withColumn("sha3_256", sha3_256_udf(F.col("html"))).persist(
            StorageLevel.MEMORY_AND_DISK
        )

        # recursion guard: a child whose bytes equal an ancestor container
        # is a zip bomb (check_recursion, archives.py:531-540)
        is_rec = F.array_contains(F.col("ancestors"), F.col("sha3_256"))
        rec_digests = (
            hashed.filter(is_rec)
            .select(
                "url", "parent_url", "depth", "sha3_256",
                F.lit("broken").alias("status"),
                F.lit("archive_recursion").alias("broken_reason"),
                F.lit("").alias("text"),
            )
        )
        ok = hashed.filter(~is_rec)

        # memoization: skip hashes already digested in a previous run
        todo = resume_delta(ok, previous_digests) if round_no == 0 else ok

        uniq = todo.select("sha3_256", "html").dropDuplicates(["sha3_256"])
        uniq = repartition_by_size_class(uniq, data_col="html", key="sha3_256")
        analyzed = uniq.drop("_salt").mapInPandas(
            analyze_map_in_pandas, schema=ANALYZE_SCHEMA
        )
        # checkpoint: one write, two reads (digest + child split), flat lineage
        analyzed = cp.write(analyzed, f"analyzed_r{round_no}")

        url_map = todo.select("url", "parent_url", "depth", "ancestors", "sha3_256")
        digests_r = analyzed.filter(F.col("kind") == "digest").select(*_DIGEST_FIELDS)
        round_digests = url_map.drop("ancestors").join(digests_r, "sha3_256")
        digest_rounds.append(round_digests)
        digest_rounds.append(rec_digests)  # usually empty; union is lazy
        metric_rounds.append(stage_metrics(digests_r, "analyze", round_no))

        children = analyzed.filter(F.col("kind") == "child").select(
            "sha3_256", "child_name", "child_data"
        )
        if round_no >= max_depth:
            break
        n_children = children.limit(1).count()
        if n_children == 0:
            break

        # fan children out to every url that carries the parent blob
        work = (
            children.join(url_map, "sha3_256")
            .select(
                F.concat_ws("//", F.col("url"), F.col("child_name")).alias("url"),
                F.col("child_data").alias("html"),
                F.col("url").alias("parent_url"),
                (F.col("depth") + 1).alias("depth"),
                F.array_append(F.col("ancestors"), F.col("sha3_256")).alias("ancestors"),
            )
        )
        round_no += 1

    all_digests = digest_rounds[0]
    for d in digest_rounds[1:]:
        all_digests = all_digests.unionByName(d, allowMissingColumns=True)

    digests = gather(all_digests)
    metrics = metric_rounds[0]
    for m in metric_rounds[1:]:
        metrics = metrics.unionByName(m)

    if previous_digests is not None:
        digests = previous_digests.unionByName(digests, allowMissingColumns=True)

    digests = cp.write(digests, "digests")
    if own_tmp is not None:
        # caller gets materialized results; temp checkpoints stay until GC
        pass
    return digests, metrics


def gather(all_digests: DataFrame) -> DataFrame:
    """The digests.gather projection (digests.py:216-390, 865-978):
    filetype mapping, language detect, word-count, skip-by-extension,
    attachments flag, path fields.  Pure column expressions + one lang UDF.
    """
    ext = F.lower(F.regexp_extract(F.col("url"), r"(\.[A-Za-z0-9]+)$", 1))
    return (
        all_digests
        .withColumn("filetype", filetype_col(F.col("mime_type")))
        .withColumn(
            "status",
            F.when(ext.isin(".exe", ".dat"), F.lit("skipped")).otherwise(
                F.col("status")
            ),
        )
        # the reference's "word-count" is max text length in characters
        # (digests.py:887-893) — preserved verbatim, quirk included
        .withColumn("word_count", F.coalesce(F.length("text"), F.lit(0)))
        .withColumn(
            "lang",
            F.when(
                F.length("text") > 0, detect_language_udf(F.col("text"))
            ).otherwise(F.lit(None)),
        )
        .withColumn(
            "attachments",
            (F.col("filetype") == "email") & (F.coalesce("n_children", F.lit(0)) > 0),
        )
        .withColumn("path", F.col("url"))
        .withColumn(
            "is_container", F.coalesce(F.col("n_children"), F.lit(0)) > 0
        )
    )


def write_digests(digests: DataFrame, out_dir: str) -> None:
    """Sink analog of digests.bulk_index (digests.py:558-668): on a cluster
    this is ``writeTo(iceberg_table).append()`` / a foreachBatch ES writer;
    here a parquet directory."""
    digests.write.mode("overwrite").parquet(os.path.join(out_dir, "digests"))
