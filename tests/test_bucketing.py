"""Bucketed storage layout (plans/bucketing.py): co-located joins read
pre-shuffled, pre-sorted buckets — SortMergeJoin with no Exchange and no
Sort on either side.  The write-once-shuffle-never contract behind q195."""

from pyspark.sql import functions as F

from hoover_snoop2_spark.plans.bucketing import (
    cobucketed_join,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange_or_sort(spark):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("k2"), (F.col("id") + 5).alias("b")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # sort elimination additionally needs the bucketed scan to report its
    # per-bucket ordering, which Spark 3+ gates behind this flag (the
    # ordering probe needs one-file-per-bucket, which write_bucketed
    # guarantees via repartition-by-key)
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )
    try:
        j = cobucketed_join(
            left, right, "k", "k2", buckets=4, names=("t_fact", "t_dim")
        )
        plan = _plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        # the bucketed scans are sortBy(key) single-file: no Sort either
        assert "Sort [" not in plan
        got = {(r["k"], r["b"]) for r in j.collect()}
        want = {(i, i + 5) for i in range(0, 1000, 3)}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset(
            "spark.sql.legacy.bucketedTableScan.outputOrdering"
        )


def test_write_bucketed_roundtrip_and_overwrite(spark):
    df = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit("x").alias("s")
    )
    t = write_bucketed(df, "t_rt", "k", 2)
    assert t.count() == 50
    # overwrite with different content must replace, not append
    df2 = spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit("y").alias("s")
    )
    t2 = write_bucketed(df2, "t_rt", "k", 2)
    assert t2.count() == 20
    assert {r["s"] for r in t2.select("s").distinct().collect()} == {"y"}
