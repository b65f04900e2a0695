"""Skew-aware repartitioning for blob-sized rows.

The reference splits oversized work mechanically: tables at 20 000 rows
(defaultsettings.py:383-391), PDFs at 150 pages / 25-100 MiB chunks
(pdf-tools/run.sh:5-11, pdf_tools.py:37-44), and demotes Tika jobs > 50 MiB
(tika.py:24-28).  At Spark scale the equivalent hazard is partition skew:
a handful of megabyte-class ``html`` blobs landing in one task stalls the
stage (AQE's skew-join splitting only helps at shuffle joins, not inside a
mapInPandas stage).

Strategy (north_rule: "salted repartitioning by url-hash with explicit skew
splitting for megabyte-scale html blobs"):

- every row gets a deterministic ``salt = xxhash64(url) % parts`` — uniform
  spread regardless of url clustering;
- rows are split into size classes; the heavy class (> SIZE_CLASS_BYTES)
  is repartitioned separately with more, smaller partitions so each task
  holds only a few giant blobs;
- both classes run through the same downstream operators and union back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: blobs above this are "heavy" (the reference treats > 1 MiB html as the
#: skew class; Tika demotes > 50 MiB entirely)
SIZE_CLASS_BYTES = 1 * 2**20

#: pipeline spread threshold: only blobs whose ANALYZE time is a
#: task-stall risk are worth a shuffle + a second upstream pass.  A 1 MiB
#: html parses in ~10 ms — spreading those costs more than it saves; the
#: stall class is the 10-100 MiB PST/PDF/archive tier (the reference
#: demotes Tika jobs > 50 MiB, tika.py:24-28).
HEAVY_SPREAD_BYTES = 8 * 2**20

#: how many heavy rows one task should hold
HEAVY_ROWS_PER_PARTITION = 8


def salted(df: DataFrame, key: str = "url", parts: int | None = None) -> DataFrame:
    """Deterministic uniform salt column from the url hash."""
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(n)))


def spread_heavy(
    df: DataFrame,
    data_col: str = "html",
    key: str = "url",
    base_parts: int | None = None,
    threshold: int = HEAVY_SPREAD_BYTES,
) -> DataFrame:
    """Spread ONLY the heavy rows; light rows pass through UNSHUFFLED.

    This is the skew guard for the extraction pipeline's analyze
    ``mapInPandas`` stage: a handful of megabyte-class blobs co-located in
    one input split stalls the whole stage at scale.  Heavy rows
    (> SIZE_CLASS_BYTES) are repartitioned into 4x-many small partitions
    keyed by url hash, so one task never holds more than a few giants;
    light rows — the overwhelming bulk of the corpus bytes — keep their
    input partitioning, preserving the pipeline's "blobs never shuffle"
    property for the common case.

    Cost trade, stated plainly: the filter split makes both branches
    recompute their upstream (for the broadcast-dedup path that means a
    second pass over the source scan — cheap sequential column I/O),
    and the heavy branch shuffles its bytes once (rare rows, exactly the
    ones whose co-location would otherwise stall the stage).
    """
    spark = df.sparkSession
    n = base_parts or spark.sparkContext.defaultParallelism
    size = F.coalesce(F.length(F.col(data_col)), F.lit(0))
    light = df.filter(size <= threshold)
    heavy = df.filter(size > threshold).repartition(
        max(n * 4, 16), F.xxhash64(F.col(key))
    )
    return light.unionByName(heavy)


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Widen a too-narrow scan before a CPU-bound kernel.

    A small parquet input arrives as 1-2 scan splits (a 15 MB file is one
    split at the default 128 MB maxPartitionBytes), which serializes any
    compute-heavy stage downstream — measured 3.3x wall on the minhash
    shingle/signature kernel at sf0.1 on 32 cores.  Repartition UP to the
    session parallelism when the scan is narrower; inputs already wider
    (any real corpus) pass through untouched, so the guard costs nothing
    at scale.  The partition-count probe converts the plan, not the data —
    no job runs.
    """
    spark = df.sparkSession
    n = min_parts or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def dedup_by_size_class(
    df: DataFrame,
    data_col: str = "html",
    key: str = "sha3_256",
    base_parts: int | None = None,
) -> DataFrame:
    """Size-class split + hash dedup in ONE shuffle per class.

    The size filter is shuffle-free (identical bytes → identical size, so
    per-class dedup is globally correct); ``repartition(n, key)`` installs
    HashPartitioning(key) which satisfies dropDuplicates' required
    distribution, so Catalyst adds no second exchange.  Compared to
    dropDuplicates-then-repartition this halves the bytes crossing the
    shuffle — the dominant I/O for a binary corpus.
    """
    spark = df.sparkSession
    n = base_parts or spark.sparkContext.defaultParallelism
    sized = df.withColumn("_sz", F.coalesce(F.length(F.col(data_col)), F.lit(0)))
    light = (
        sized.filter(F.col("_sz") <= SIZE_CLASS_BYTES)
        .repartition(n, F.col(key))
        .dropDuplicates([key])
    )
    heavy = (
        sized.filter(F.col("_sz") > SIZE_CLASS_BYTES)
        .repartition(max(n * 4, 16), F.col(key))
        .dropDuplicates([key])
    )
    return light.unionByName(heavy).drop("_sz")


def repartition_by_size_class(
    df: DataFrame,
    data_col: str = "html",
    key: str = "url",
    base_parts: int | None = None,
) -> DataFrame:
    """Union of light rows (hash-partitioned by salted url) and heavy rows
    (spread thin).  Output partitioning feeds the analyze mapInPandas stage.
    """
    spark = df.sparkSession
    n = base_parts or spark.sparkContext.defaultParallelism
    sized = df.withColumn("_sz", F.coalesce(F.length(F.col(data_col)), F.lit(0)))

    light = (
        sized.filter(F.col("_sz") <= SIZE_CLASS_BYTES)
        .repartition(n, F.xxhash64(F.col(key)))
    )
    # heavy rows: small partitions so one task never holds many giants;
    # 4x partition count caps rows-per-task at the configured bound
    heavy = (
        sized.filter(F.col("_sz") > SIZE_CLASS_BYTES)
        .repartition(max(n * 4, 16), F.xxhash64(F.col(key)))
    )
    return light.unionByName(heavy).drop("_sz")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_from: str,
    hot_keys: list,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Hot-key-salted equi-join: the join twin of q59's salted
    aggregation.  When one fact key holds a constant fraction of the
    table (the empty-host bucket, the "unknown" language, the one CDN
    domain), a plain shuffle join sends that entire key to ONE reducer
    and the stage runs at single-task speed no matter the cluster size.
    AQE's skew-join split handles sort-merge cases; this is the explicit
    form that also works under bucketed layouts and in static plans.

    Mechanics: fact rows on a hot key get a deterministic salt
    ``xxhash64(salt_from) % buckets`` (cold keys salt 0); the dim side
    REPLICATES each hot row ``buckets`` times via explode(sequence) so
    every (key, salt) pair still finds its match.  The join key becomes
    (key, salt) — the hot key now spreads over ``buckets`` reducers.
    Replication cost is |hot dim rows| x buckets, negligible for a dim
    table.  Results are exactly a plain join's (q197's oracle IS the
    plain join)."""
    hot = F.col(key).isin(*[F.lit(k) for k in hot_keys])
    f = fact.withColumn(
        "_sjsalt",
        F.when(
            hot, F.pmod(F.xxhash64(F.col(salt_from)), F.lit(buckets))
        )
        .otherwise(F.lit(0))
        .cast("int"),
    )
    # explode must be the top-level expression (no nesting inside cast)
    d = dim.withColumn(
        "_sjsalt",
        F.explode(
            F.when(
                hot,
                F.sequence(F.lit(0), F.lit(buckets - 1)),
            ).otherwise(F.array(F.lit(0)))
        ),
    ).withColumn("_sjsalt", F.col("_sjsalt").cast("int"))
    return f.join(d, [key, "_sjsalt"], how).drop("_sjsalt")


def hybrid_skew_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    hot_threshold: int = 10_000,
) -> DataFrame:
    """Hot/cold hybrid join — the third skew strategy next to
    :func:`salted_join` (salt + replicate) and AQE's skew split: fact
    keys above ``hot_threshold`` rows join against a BROADCAST slice of
    the dimension (hot fact rows never shuffle at all), everything else
    takes the normal shuffle join.  This is the "differential" /
    partial-broadcast join: when 1% of keys hold 50% of rows, salting
    still shuffles those rows ``buckets``-ways, while broadcasting the
    (tiny) hot slice of the dim moves only the dim bytes and leaves the
    heavy fact rows where they are — the right trade whenever the hot
    dim slice fits in memory even though the whole dim does not.

    Mechanics: one count aggregate finds the hot keys (driver never
    sees them — the hot-key set stays a broadcast DataFrame); fact
    splits by broadcast semi/anti join (zero shuffles); the hot branch
    is `fact_hot ⋈ broadcast(dim_hot)`, the cold branch a plain
    shuffle join hinted MERGE so the split is visible in the plan; the
    union is by name.  Results are exactly a plain inner join's — the
    q214 oracle IS the plain join.
    """
    counts = fact.groupBy(fact_key).count()
    hot = counts.filter(F.col("count") >= hot_threshold).select(fact_key)
    hot_b = F.broadcast(hot)
    fact_hot = fact.join(hot_b, fact_key, "left_semi")
    fact_cold = fact.join(hot_b, fact_key, "left_anti")
    dim_hot = dim.join(
        hot_b.withColumnRenamed(fact_key, dim_key), dim_key, "left_semi"
    )
    joined_hot = fact_hot.join(
        F.broadcast(dim_hot), fact_hot[fact_key] == dim_hot[dim_key]
    )
    joined_cold = fact_cold.hint("merge").join(
        dim, fact_cold[fact_key] == dim[dim_key]
    )
    return joined_hot.unionByName(joined_cold)
