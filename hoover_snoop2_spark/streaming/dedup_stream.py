"""Streaming incremental near-dup detection: stream-static LSH join.

Crawl refreshes arrive continuously; each new page must be checked against
the already-indexed corpus WITHOUT re-running pairwise dedup over it.  The
Spark-native shape is a stream-static equi-join:

  static side   build_dedup_index(corpus)  — (id, band, band_hash, sh):
                LSH band keys + distinct shingle sets, computed ONCE and
                persisted (parquet/Iceberg); at 100 TB this table is keyed
                and bucketed by (band, band_hash) so the per-batch join
                prunes to the buckets the batch actually touches.
  stream side   band keys + shingles via the SAME column expressions as
                batch minhash (operators/dedup.band_keys — pure exprs, no
                state), so a page's keys are identical whichever path
                computes them.

The join itself is stateless (stream-static joins keep no watermark
state); verification happens inline in the join projection — exact
Jaccard over the two shingle arrays — so emitted matches are exact, not
probabilistic.  A page matching the same corpus doc through several bands
emits one row per band; downstream consumers dedupe by (url, matched_id)
in their sink upsert (the same idempotence rule the ES sink uses).

Scale note: carrying shingle arrays in the static index trades storage
for a self-contained verify (~10-100 KB/doc).  If that is too fat, drop
``sh`` from the index and verify in ``foreachBatch`` against the corpus
text table instead — the band join shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import band_keys


def build_dedup_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """Static LSH index: (id, band, band_hash, sh).  Persist this table
    partitioned/bucketed by (band, band_hash) and append new corpus docs'
    keys as they are admitted."""
    return band_keys(
        df, id_col, text_col, n_hashes, bands, k, with_shingles=True
    )


def stream_near_dups(
    stream_df: DataFrame,
    index: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    n_hashes: int = 16,
    bands: int = 4,
    k: int = 5,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Streaming (url, matched_id, jaccard) for every incoming page whose
    exact shingle Jaccard against an LSH-candidate corpus doc clears the
    threshold.  Append-mode compatible: no aggregation, no stream state."""
    # ONE projection of stream_df carrying both band keys and shingles —
    # joining two projections of the same streaming DataFrame would plan a
    # stateful stream-stream self-join with unbounded state; this keeps
    # only the stream-static join below
    probe = band_keys(
        stream_df, id_col, text_col, n_hashes, bands, k, with_shingles=True
    ).withColumnRenamed("sh", "q_sh")
    idx = index.select(
        F.col("id").alias("matched_id"),
        "band",
        "band_hash",
        F.col("sh").alias("m_sh"),
    )
    return (
        probe.join(idx, ["band", "band_hash"])
        # self-match guard; string-form compare because stream ids (urls)
        # and corpus ids (longs) may be differently typed
        .filter(
            F.col("id").cast("string") != F.col("matched_id").cast("string")
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("q_sh", "m_sh"))
            / F.size(F.array_union("q_sh", "m_sh")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select(
            F.col("id").alias(id_col),
            "matched_id",
            "band",
            F.round("jaccard", 4).alias("jaccard"),
        )
    )


def watermarked_exact_dedup(
    stream_df: DataFrame,
    fp_col: str = "fp",
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact streaming dedup with BOUNDED state —
    ``dropDuplicatesWithinWatermark``: a fingerprint seen once
    suppresses all duplicates arriving within the watermark window,
    and the engine evicts its state once the event-time watermark
    passes (plain streaming ``dropDuplicates`` keys state forever and
    OOMs a long-running ingest).  This is the built-in sibling of
    ``stateful.first_seen_stream`` (typed TTL state): watermark-bounded
    when duplicates cluster in event time — a crawl frontier re-seeing
    a url within the same fetch wave — TTL-bounded when the recrawl
    rule is wall-clock.  The reference's forever-dedup against the
    Blob PK (models.py:102-113) is what the watermark makes safe at
    stream scale.

    Single shuffle on the fingerprint; append output mode; downstream
    sees an insert-only stream of first occurrences.
    """
    return (
        stream_df.withWatermark(ts_col, delay)
        .dropDuplicatesWithinWatermark([fp_col])
    )
