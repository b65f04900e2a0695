"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship digest pipeline over the sf0.001 documents
table; ``queries``/``oracle_sql`` expose the operator catalog from
``hoover_snoop2_spark.queries`` (SURVEY.md §2 coverage — one entry per
operator family, DuckDB oracle where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the text-side digest pipeline over sf0.001 documents —
    normalize → fingerprint dedup → quality gates → language confusion →
    one digest row per unique document (the reference's gather/index
    stages, digests.py:216-495, minus the binary extraction that pytest
    covers against the synthetic pages corpus)."""
    from hoover_snoop2_spark.functions.langid import detect_language_udf
    from hoover_snoop2_spark.functions.quality import fingerprint, quality_flag

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    scored = quality_flag(docs, "text").withColumn("fp", fingerprint(F.col("text")))
    reps = scored.groupBy("fp").agg(
        F.min("doc_id").alias("representative_id"),
        F.count("*").alias("dup_count"),
    )
    return (
        scored.join(reps, "fp")
        .filter(F.col("doc_id") == F.col("representative_id"))
        .withColumn("detected_lang", detect_language_udf(F.col("text")))
        .select(
            "doc_id", "fp", "dup_count", "lang", "detected_lang", "source",
            "n_chars", "n_tokens", "punct_ratio", "alpha_ratio",
            "mean_token_len", "quality_keep",
        )
        .orderBy("doc_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from hoover_snoop2_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from hoover_snoop2_spark.queries import ORACLES

    return dict(ORACLES)
