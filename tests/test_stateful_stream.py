"""applyInPandasWithState: per-key incremental dedup counters across
micro-batches (the admin stats-matrix bookkeeping as grouped state)."""

import os

import pytest
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


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState needs the protobuf python package "
    "(state-server wire protocol); absent in this container",
)
def test_transform_with_state_first_seen(spark, tmp_path):
    """transformWithStateInPandas (stateful v2): only the first
    occurrence of each fingerprint is emitted across micro-batches;
    later duplicates update state silently."""
    from hoover_snoop2_spark.streaming.stateful import first_seen_stream

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "fp string, url string"
    # batch 1: f1 twice (min url b), f2 once
    spark.createDataFrame(
        [("f1", "u/b"), ("f1", "u/c"), ("f2", "u/a")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    # batch 2: f1 again (dup, silent), f3 new
    spark.createDataFrame(
        [("f1", "u/a"), ("f3", "u/z")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        out = first_seen_stream(stream)
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("first_seen")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r["fp"]: (r["url"], r["n_dupes"])
            for r in spark.sql("SELECT * FROM first_seen").collect()
        }
    finally:
        if old is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )
    # exactly one row per fingerprint, first batch's min url wins
    assert got == {"f1": ("u/b", 1), "f2": ("u/a", 0), "f3": ("u/z", 0)}


def test_first_seen_processor_logic_without_spark():
    """The v2 processor's per-key logic, driven directly with a fake
    handle/state — runs even where the protobuf wire protocol (and thus
    the real transformWithState operator) is unavailable."""
    import pandas as pd

    from hoover_snoop2_spark.streaming.stateful import _first_seen_processor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema, ttlDurationMs=None):
            self.states[name] = FakeValueState()
            self.ttl = ttlDurationMs
            return self.states[name]

    proc = _first_seen_processor(ttl_ms=86_400_000)
    h = FakeHandle()
    proc.init(h)
    assert h.ttl == 86_400_000

    # batch 1: two urls for f1 → emit min url with 1 dupe
    out = list(
        proc.handleInputRows(
            ("f1",), iter([pd.DataFrame({"url": ["u/c", "u/b"]})]), None
        )
    )
    assert len(out) == 1
    row = out[0].iloc[0]
    assert (row["fp"], row["url"], row["n_dupes"]) == ("f1", "u/b", 1)

    # batch 2: f1 again → silent, state dupes incremented
    out2 = list(
        proc.handleInputRows(
            ("f1",), iter([pd.DataFrame({"url": ["u/a"]})]), None
        )
    )
    assert out2 == []
    assert h.states["seen"].get() == ("u/b", 2)

    # empty batch: no emit, no state change
    out3 = list(proc.handleInputRows(("f1",), iter([]), None))
    assert out3 == []
    assert h.states["seen"].get() == ("u/b", 2)
    proc.close()


def test_statestore_reader_introspects_group_state(spark, tmp_path):
    """spark.read.format('statestore') over the dedup-counter
    checkpoint: every key's live state is queryable offline — the
    stuck-key / state-skew audit a long-running streaming job needs —
    and batchId time-travels to an earlier micro-batch's state."""
    from hoover_snoop2_spark.streaming.stateful import (
        read_group_state,
        stateful_dedup_counts,
    )

    src = str(tmp_path / "src")
    os.makedirs(src)
    schema = "host string, sha3_256 string"
    spark.createDataFrame(
        [("h1", "a"), ("h1", "b"), ("h2", "a")], schema
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("h1", "b"), ("h3", "z")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    ckpt = str(tmp_path / "ckpt_ss")
    q = (
        stateful_dedup_counts(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src),
            key_col="host",
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("ss_counts")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    st = read_group_state(spark, ckpt)
    got = {r.key: (r.total, sorted(r.hashes)) for r in st.collect()}
    assert got == {
        "h1": (3, ["a", "b"]),
        "h2": (1, ["a"]),
        "h3": (1, ["z"]),
    }
    # time travel: after batch 0 only the first file's keys exist
    early = read_group_state(spark, ckpt, batch_id=0)
    got0 = {r.key: r.total for r in early.collect()}
    assert got0 == {"h1": 2, "h2": 1}
    # the checkpoint's own catalog: which operators hold state, how
    # many partitions, which batch range is reconstructable
    md = spark.read.format("state-metadata").load(ckpt).first()
    assert md.operatorName == "applyInPandasWithState"
    assert md.minBatchId == 0 and md.maxBatchId == 1
