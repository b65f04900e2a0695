"""applyInPandasWithState: per-key incremental dedup counters across
micro-batches (the admin stats-matrix bookkeeping as grouped state)."""

import os

from pyspark.sql import functions as F


def test_stateful_dedup_counts(spark, tmp_path):
    from hoover_snoop2_spark.streaming.stateful import stateful_dedup_counts

    # static input split into two files → two micro-batches at mFPT=1
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows1 = [("h1", "a"), ("h1", "b"), ("h2", "a")]
    rows2 = [("h1", "b"), ("h1", "c"), ("h2", "a"), ("h3", "z")]
    schema = "host string, sha3_256 string"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
        "append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = stateful_dedup_counts(stream, key_col="host")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_counts")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = spark.sql("SELECT * FROM stateful_counts")
    # final (latest) state per key: take max total_rows
    final = {
        r["key"]: (r["total_rows"], r["unique_hashes"], r["exact"])
        for r in got.orderBy("total_rows").collect()
    }
    assert final["h1"] == (4, 3, True)   # a,b | b,c → 4 rows, {a,b,c}
    assert final["h2"] == (2, 1, True)   # a | a → 2 rows, {a}
    assert final["h3"] == (1, 1, True)
    # updates were emitted per micro-batch, not only at the end
    assert got.filter(F.col("key") == "h1").count() >= 2
