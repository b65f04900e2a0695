"""Per-stage lineage counters and the run-metrics table.

The reference materializes a task matrix — per (func, status) counts, avg
duration, bytes/sec — into a Statistics row every minute (admin.py:117-276,
tasks.py:1192-1213).  Here each pipeline round aggregates its digest output
per (stage, status, broken_reason) into a small metrics DataFrame which the
driver unions across rounds and writes next to the checkpoints; Spark
accumulators carry the per-partition row counts that don't merit a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_metrics(digests: DataFrame, stage: str, round_no: int) -> DataFrame:
    """(stage, round, status, broken_reason) → rows, bytes, text_chars."""
    return (
        digests.groupBy("status", "broken_reason")
        .agg(
            F.count("*").alias("rows"),
            F.sum("size").alias("bytes"),
            F.sum(F.length("text")).alias("text_chars"),
        )
        .select(
            F.lit(stage).alias("stage"),
            F.lit(round_no).alias("round"),
            "status",
            "broken_reason",
            "rows",
            "bytes",
            "text_chars",
        )
    )


class RowCounter:
    """Accumulator-backed per-partition row counter, attachable inside
    mapInPandas stages without forcing an extra action.

    ``child_acc`` additionally counts kind='child' rows (r6): the
    pipeline's per-round "any deferred children?" probe used to be its
    own `limit(1).count()` job over the checkpointed output; the count
    rides the checkpoint write instead.  Accumulator semantics make this
    sound for the zero-test: updates from successful tasks are applied
    when the write job completes, so 0 means no child row was committed;
    a retried/speculative task can only over-count, which at worst
    schedules one extra round over an empty work set (harmless), never
    drops work."""

    def __init__(self, spark, name: str):
        self.acc = spark.sparkContext.accumulator(0)
        self.child_acc = spark.sparkContext.accumulator(0)
        self.name = name

    def wrap(self, gen_fn):
        acc = self.acc
        child_acc = self.child_acc

        def wrapped(batches):
            for out in gen_fn(batches):
                acc.add(len(out))
                if "kind" in out.columns:
                    n_child = int((out["kind"] == "child").sum())
                    if n_child:
                        child_acc.add(n_child)
                yield out

        return wrapped
