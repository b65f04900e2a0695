"""SparkSession factory tuned for the extraction workload.

Local mode is a single JVM; on a real cluster the same config applies per
executor.  The knobs that matter at 100 TB:

- AQE on (runtime coalesce + skew-join splitting),
- shuffle partitions sized to cores locally (cluster: 2-3x total cores),
- Arrow enabled with a bounded batch size so megabyte-scale ``html`` blobs
  don't blow up pandas-UDF worker memory (snoop2 caps analogous batches at
  30 MiB, reference ``tasks.py:1423-1431``),
- UTC session timezone for oracle comparability.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches carry raw page bytes.  512 rows measured cheapest on the
# bench corpus (tree-CPU 149/128/119/122 s at 128/256/512/1024 rows,
# local[4], 50k docs).  Megabyte-class blobs can't blow a batch up: the
# 8 MB scan-split / size-class spread caps how many heavies share a
# partition, so their batches hold only a handful of rows regardless.
ARROW_MAX_RECORDS_PER_BATCH = 512


def get_spark(
    app_name: str = "hoover_snoop2_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (falling back to
    ``local[*]``) so the bench harness can pin parallelism levels.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    if shuffle_partitions is None:
        # match local cores; a real cluster would use 2-3x total cores
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = 32 if n == "*" else max(int(n), 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.python.worker.reuse", "true")
        # Blob stages are CPU-bound per byte (parse/hash/unpack), so
        # partitions must be sized far below the 128 MB scan default or a
        # 200 MB corpus reads as 2 splits and the UDF stage runs 2-wide.
        # 8 MB targets keep every core busy while staying well inside the
        # Arrow batch memory envelope.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        # columnar-cache compression costs ~10ms/row CPU on binary/text
        # columns (measured) for no benefit on already-compressed payloads
        .config("spark.sql.inMemoryColumnarStorage.compressed", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    """Tear down the active session (needed between parallelism levels in
    the scaling bench — a JVM can only hold one master)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
