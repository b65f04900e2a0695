"""Stream-stream interval join (streaming/join_stream.py): bounded-state
event-time pairing of two feeds, batch/stream equivalent."""

import datetime as dt
import os

from pyspark.sql import functions as F

from hoover_snoop2_spark.streaming.join_stream import interval_join

SCHEMA_L = "url string, fetch_ts timestamp, size long"
SCHEMA_R = "url string, render_ts timestamp, ok boolean"

T0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _mins(m):
    return T0 + dt.timedelta(minutes=m)


def _fixtures():
    fetches = [
        ("u1", _mins(0), 100),
        ("u2", _mins(1), 200),
        ("u3", _mins(2), 300),
        ("u1", _mins(30), 110),  # refetch much later
    ]
    renders = [
        ("u1", _mins(3), True),    # within 10m of u1@0
        ("u2", _mins(20), False),  # 19m after u2@1 -> outside window
        ("u3", _mins(2), True),    # same instant
        ("u1", _mins(31), True),   # matches the refetch only
        ("u9", _mins(5), True),    # no fetch at all
    ]
    return fetches, renders


EXPECT = {
    ("u1", 0, 3),
    ("u3", 2, 2),
    ("u1", 30, 31),
}


def _pairs(rows):
    return {
        (
            r["url"],
            int((r["fetch_ts"] - T0).total_seconds() // 60),
            int((r["render_ts"] - T0).total_seconds() // 60),
        )
        for r in rows
    }


def test_interval_join_batch_semantics(spark):
    fetches, renders = _fixtures()
    left = spark.createDataFrame(fetches, SCHEMA_L)
    right = spark.createDataFrame(renders, SCHEMA_R)
    out = interval_join(left, right, max_delay="10 minutes").collect()
    assert _pairs(out) == EXPECT
    cols = {c for c in interval_join(left, right).columns}
    assert cols == {"url", "fetch_ts", "render_ts", "size", "ok"}


def test_interval_join_streaming_matches_batch(spark, tmp_path):
    fetches, renders = _fixtures()
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    os.makedirs(lsrc)
    os.makedirs(rsrc)
    spark.createDataFrame(fetches, SCHEMA_L).coalesce(1).write.mode(
        "append"
    ).parquet(lsrc)
    spark.createDataFrame(renders, SCHEMA_R).coalesce(1).write.mode(
        "append"
    ).parquet(rsrc)

    ls = spark.readStream.schema(SCHEMA_L).parquet(lsrc)
    rs = spark.readStream.schema(SCHEMA_R).parquet(rsrc)
    out = interval_join(ls, rs, max_delay="10 minutes")
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sj_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sj_out").collect()
    assert _pairs(got) == EXPECT


def test_interval_join_left_outer_emits_unmatched(spark):
    fetches, renders = _fixtures()
    left = spark.createDataFrame(fetches, SCHEMA_L)
    right = spark.createDataFrame(renders, SCHEMA_R)
    out = interval_join(
        left, right, max_delay="10 minutes", how="leftOuter"
    )
    rows = out.collect()
    matched = _pairs(r for r in rows if r["render_ts"] is not None)
    assert matched == EXPECT
    unmatched = {
        (r["url"], int((r["fetch_ts"] - T0).total_seconds() // 60))
        for r in rows
        if r["render_ts"] is None
    }
    assert unmatched == {("u2", 1)}  # render 19m late -> outside window


def test_interval_join_plan_has_bounded_state_condition(spark, tmp_path):
    """The analyzed STREAMING plan must carry watermarks on both sides —
    the precondition for state eviction (on batch inputs the analyzer
    elides withWatermark, so only the streaming plan can prove it)."""
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    fetches, renders = _fixtures()
    spark.createDataFrame(fetches, SCHEMA_L).write.parquet(lsrc)
    spark.createDataFrame(renders, SCHEMA_R).write.parquet(rsrc)
    ls = spark.readStream.schema(SCHEMA_L).parquet(lsrc)
    rs = spark.readStream.schema(SCHEMA_R).parquet(rsrc)
    plan = (
        interval_join(ls, rs)
        ._jdf.queryExecution()
        .analyzed()
        .toString()
    )
    assert plan.count("EventTimeWatermark") == 2
    # the state-bounding time-range condition survived analysis
    assert "INTERVAL" in plan and ">=" in plan
