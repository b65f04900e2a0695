"""Stream-stream event-time interval join with bounded state.

The crawl-pipeline shape: a stream of page FETCHES joined to the stream
of their RENDERS/OCR results that arrive up to `max_delay` later (the
reference pairs ocr output back to documents by md5 after the fact,
analyzers/__init__.py ocr walk + gather; in a streaming world the pair
happens as the two feeds flow).  A naive stream-stream equi-join keeps
EVERY left row in state forever (any future right row might match);
Structured Streaming only drops state when BOTH sides carry watermarks
AND the join condition bounds the event-time distance — then a left row
older than (watermark - max_delay) provably cannot match anymore and is
evicted.

This module encodes those two requirements in one place so callers
cannot accidentally build the unbounded version:

- both inputs get ``withWatermark(ts, watermark)``;
- the join condition is ``l.key = r.key AND r.ts BETWEEN l.ts AND
  l.ts + max_delay`` — the time-range predicate Spark's state-cleanup
  planner requires.

State per key is O(rows inside one watermark+delay window), independent
of stream length — the property that lets the join run for months on a
100-TB/day feed.  Batch semantics are identical (the same function on
static DataFrames is a plain interval join — tests pin batch/stream
equivalence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "url",
    left_ts: str = "fetch_ts",
    right_ts: str = "render_ts",
    max_delay: str = "10 minutes",
    watermark: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join right-side events arriving within [left_ts, left_ts +
    max_delay] of their left-side counterpart.  Watermarks are applied
    to BOTH inputs (required for state eviction; harmless no-ops on
    batch DataFrames).  ``how`` may be 'inner' or 'leftOuter' (outer
    emits the unmatched left row once its watermark passes)."""
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_delay}")
        )
    )
    joined = lw.join(rw, cond, how)
    # de-duplicate the key column; keep both timestamps
    return joined.select(
        F.col(f"l.{key}").alias(key),
        F.col(f"l.{left_ts}").alias(left_ts),
        F.col(f"r.{right_ts}").alias(right_ts),
        *[
            F.col(f"l.{c}").alias(c)
            for c in left.columns
            if c not in (key, left_ts)
        ],
        *[
            F.col(f"r.{c}").alias(c)
            for c in right.columns
            if c not in (key, right_ts)
        ],
    )
