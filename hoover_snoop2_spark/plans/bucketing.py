"""Bucketed storage layout: shuffle-free co-located joins.

The 100-TB join story: a fact table that will be joined on the same key
by many downstream jobs should pay its shuffle ONCE, at write time.
``bucketBy(n, key)`` + ``sortBy(key)`` persists hash-partitioned,
presorted files; every later equi-join between two tables bucketed the
same way compiles to a SortMergeJoin with NO Exchange on either side —
the scan itself satisfies the join's distribution requirement.  The
per-bucket Sort is ALSO elided when every bucket is a single file
(guaranteed here by repartitioning on the key before the write) and
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` lets the scan
report its ordering (Spark 3+ gates that probe behind the flag; the scan
stays correct either way).  This is the managed-table equivalent of the
Iceberg ``bucket(n, key)`` partition transform the extraction pipeline's
declared ingest uses (plans/pipeline.py dedup_strategy='shuffle' notes),
and the reference's per-collection stable directory layout
(/root/reference/snoop/data/collections.py blob repositories) re-expressed
as a Spark storage contract.

Only joins benefit mechanically; the correctness contract is that
bucketing NEVER changes results — queries over the bucketed table must
equal the same queries over the raw parquet (q195's oracle states exactly
that).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: one shared demo database per session; its LOCATION is a fresh tempdir
#: the first time a session creates it (never inside the repo tree)
DEFAULT_DATABASE = "bucketed_demo"


def ensure_database(
    spark: SparkSession,
    database: str = DEFAULT_DATABASE,
    location: str | None = None,
) -> str:
    """Create the demo database once per session (idempotent).  A fresh
    tempdir LOCATION keeps managed-table data out of the working tree;
    IF NOT EXISTS makes repeat calls reuse the first location."""
    if location is None:
        location = tempfile.mkdtemp(prefix="bucketed_demo_")
    spark.sql(
        f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{location}'"
    )
    return database


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    database: str = DEFAULT_DATABASE,
    sort: bool = True,
) -> DataFrame:
    """Persist ``df`` hash-bucketed (and per-file sorted) by ``key`` and
    return the managed table's DataFrame.  mode=overwrite so re-running
    a query in the same session replaces the previous demo table."""
    spark = df.sparkSession
    ensure_database(spark, database)
    # one file per bucket: the sorted-scan fast path (no Sort below the
    # SortMergeJoin) only applies when every bucket is a single file —
    # multiple files per bucket are individually sorted but the scan
    # can't assume a global order, so Spark re-sorts.  Repartitioning
    # by the bucket key into exactly `buckets` partitions makes each
    # write task own one whole bucket.
    writer = (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
    )
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(f"{database}.{table}")
    return spark.table(f"{database}.{table}")


def cobucketed_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    buckets: int = 8,
    database: str = DEFAULT_DATABASE,
    names: tuple[str, str] = ("fact_b", "dim_b"),
) -> DataFrame:
    """Write both sides bucketed on their join key with the SAME bucket
    count, then join the managed tables.  With
    spark.sql.sources.bucketing.enabled (default true) the SortMergeJoin
    over these scans has no Exchange and no Sort on either side —
    tests/test_bucketing.py asserts that on the formatted physical plan
    with broadcast disabled."""
    lb = write_bucketed(left, names[0], left_key, buckets, database)
    rb = write_bucketed(right, names[1], right_key, buckets, database)
    return lb.join(rb, lb[left_key] == rb[right_key])
