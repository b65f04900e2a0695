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

#: how many heavy rows one task should hold
HEAVY_ROWS_PER_PARTITION = 8


def salted(df: DataFrame, key: str = "url", parts: int | None = None) -> DataFrame:
    """Deterministic uniform salt column from the url hash."""
    n = parts or df.sparkSession.sparkContext.defaultParallelism
    return df.withColumn("_salt", F.pmod(F.xxhash64(F.col(key)), F.lit(n)))


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
