"""Temporal joins Spark lacks as built-ins: bucketed range join, as-of join.

Both are named pain points for DataFrame engines — a naive `ON ts BETWEEN
start AND end` or `ts >= r.ts` inequality join plans as a
BroadcastNestedLoopJoin (or worse, a CartesianProduct) and dies at scale.
These operators re-express them as single-shuffle equi-joins:

- ``range_join_bucketed``: both sides key on a coarse time bucket — each
  fact row lands in exactly one bucket, each interval explodes to the
  buckets it covers — then the exact predicate filters inside the
  equi-join.  One shuffle on bucket id; interval duplication factor is
  ceil(interval_len / bucket_s) + 1, so pick bucket_s near the typical
  interval length.
- ``asof_join``: the union-and-carry-forward pattern — tag both inputs,
  union, ONE window per key ordered by (ts, side) with
  last(..., ignoreNulls) carrying the most recent right-side values
  forward, keep left rows.  One shuffle+sort on the key; no join node at
  all, so there is nothing for the planner to get wrong.  Right-side
  rows sort before left rows at equal ts, giving the standard
  ``l.ts >= r.ts`` inclusive semantics (DuckDB/QuestDB ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_s: int,
) -> DataFrame:
    """Rows of ``facts`` joined to every interval containing their
    timestamp (half-open [start, end), epoch-second columns).  Output =
    fact columns + interval columns; each (fact, interval) match appears
    exactly once (a fact has one bucket)."""
    f = facts.withColumn("_b", F.floor(F.col(ts_col) / bucket_s))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_s),
                F.floor((F.col(end_col) - 1) / bucket_s),
            )
        ),
    )
    return (
        f.join(iv, "_b")
        .where(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_b")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts_col: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """Each left row + the most recent right row per ``key`` with
    ``right.ts <= left.ts`` (inclusive); right columns come back
    prefixed, null when no prior right row exists.  Left columns pass
    through unchanged."""
    lcols = [c for c in left.columns]
    l = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l = l.withColumn(f"{prefix}{c}", F.lit(None).cast(right.schema[c].dataType))
    l = l.withColumn(f"{prefix}{ts_col}", F.lit(None).cast(right.schema[ts_col].dataType))

    r = right.select(
        key,
        ts_col,
        *[F.col(c).alias(f"{prefix}{c}") for c in right_cols],
        F.col(ts_col).alias(f"{prefix}{ts_col}"),
    ).withColumn("_side", F.lit(0))
    for c in lcols:
        if c not in (key, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    out_cols = lcols + [f"{prefix}{c}" for c in right_cols] + [f"{prefix}{ts_col}"]
    u = l.select(*out_cols, "_side").unionByName(r.select(*out_cols, "_side"))

    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts_col).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u
    for c in [f"{prefix}{x}" for x in right_cols] + [f"{prefix}{ts_col}"]:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.where(F.col("_side") == 1).drop("_side")
