"""Custom stateful streaming operator: incremental per-key dedup counters
via ``applyInPandasWithState``.

The reference keeps per-collection running totals in Django rows updated by
every task (admin stats matrix, admin.py:149-276; the dispatcher's
"documents seen so far" bookkeeping).  The Structured-Streaming-native
equivalent is grouped state: each key (host / collection) carries
(total_rows, seen-hash set) across micro-batches, emitting an updated
counter row per batch — exactly-once accounting without a driver-side
table.

State is the exact seen-hash set capped at ``MAX_STATE_HASHES``; past the
cap the unique counter degrades to "at least" semantics (flagged in the
output).  At 100-TB scale the set would be replaced by an HLL sketch per
key — the operator shape (groupBy → applyInPandasWithState) is identical.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

#: per-key exact-set bound; past this the unique count is a lower bound
MAX_STATE_HASHES = 100_000

OUTPUT_SCHEMA = (
    "key string, batch_rows long, total_rows long, unique_hashes long, "
    "exact boolean"
)
STATE_SCHEMA = "total long, hashes array<string>"


def _update(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        total, hashes = state.get
        seen = set(hashes or [])
    else:
        total, seen = 0, set()
    exact = len(seen) < MAX_STATE_HASHES
    batch = 0
    for pdf in pdfs:
        batch += len(pdf)
        for h in pdf["sha3_256"]:
            if h is not None and len(seen) < MAX_STATE_HASHES:
                seen.add(h)
            elif h is not None and h not in seen:
                exact = False
    total += batch
    state.update((total, sorted(seen)))
    yield pd.DataFrame(
        [{
            "key": key[0],
            "batch_rows": batch,
            "total_rows": total,
            "unique_hashes": len(seen),
            "exact": exact,
        }]
    )


def stateful_dedup_counts(stream_df, key_col: str = "host"):
    """(key_col, sha3_256) streaming DataFrame → per-key running counters.

    Emits one row per (key, micro-batch) in update mode: batch_rows,
    cumulative total_rows, cumulative unique_hashes.
    """
    from pyspark.sql import functions as F

    src = stream_df.select(
        F.col(key_col).cast("string").alias("key"), "sha3_256"
    )
    return src.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )


# ---------------------------------------------------------------------------
# transformWithState (Spark 4 stateful v2): streaming first-seen dedup
# ---------------------------------------------------------------------------

FIRST_SEEN_OUTPUT = "fp string, url string, n_dupes long"


def _first_seen_processor(ttl_ms):
    """Build the StatefulProcessor class lazily — pyspark's streaming
    submodule import is deferred so batch-only sessions never pay it."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class FirstSeenProcessor(StatefulProcessor):
        """Per-fingerprint ValueState: (first_url, dupes_seen).  A row
        whose fingerprint has live state is a duplicate (counted, not
        emitted); the first row per fingerprint is emitted with the
        running duplicate count at that point (0).  Within one
        micro-batch, the deterministic representative is the MINIMUM
        url, so retries and engines agree."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._seen = handle.getValueState(
                "seen",
                "first_url string, dupes long",
                ttlDurationMs=ttl_ms,
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            urls = []
            for pdf in rows:
                urls.extend(pdf["url"].tolist())
            if not urls:
                return iter(())
            if self._seen.exists():
                first_url, dupes = self._seen.get()
                self._seen.update((first_url, dupes + len(urls)))
                return iter(())
            rep = min(urls)
            self._seen.update((rep, len(urls) - 1))
            return iter(
                [pd.DataFrame([{
                    "fp": key[0],
                    "url": rep,
                    "n_dupes": len(urls) - 1,
                }])]
            )

        def close(self) -> None:
            pass

    return FirstSeenProcessor()


def first_seen_stream(stream_df, fp_col: str = "fp", url_col: str = "url",
                      ttl_ms: int | None = None):
    """Streaming first-occurrence dedup via ``transformWithStateInPandas``
    (the Spark 4 arbitrary-state v2 API) — the engine-native upgrade of
    ``dropDuplicates`` for long-running ingest: per-fingerprint typed
    ValueState with an optional TTL, so the dedup window is bounded by
    STATE EXPIRY instead of unbounded memory (the v1
    ``applyInPandasWithState`` operator above has to cap its own state
    by hand; v2 TTL state is swept by the store itself).  The reference
    dedups forever against the Blob PK (models.py:102-113) — batch
    semantics; a streaming ingest at 100 TB needs expiring state or the
    store grows with the corpus.

    Scale notes: state lives in the per-executor RocksDB state store
    (enable ``RocksDBStateStoreProvider`` — changelog checkpointing
    keeps commits incremental); keys shuffle once on the fingerprint;
    output is append-mode (first occurrences only), so downstream sinks
    see an insert-only stream.  TTL is processing-time based, matching
    a crawl's "re-accept after N days" recrawl rule.
    """
    from pyspark.sql import functions as F

    src = stream_df.select(
        F.col(fp_col).cast("string").alias("fp"),
        F.col(url_col).cast("string").alias("url"),
    )
    return src.groupBy("fp").transformWithStateInPandas(
        statefulProcessor=_first_seen_processor(ttl_ms),
        outputStructType=FIRST_SEEN_OUTPUT,
        outputMode="Append",
        timeMode="ProcessingTime",
    )


def read_group_state(spark, checkpoint_dir: str, batch_id: int | None = None):
    """Offline introspection of a streaming job's keyed state via
    Spark's state data source (``spark.read.format("statestore")``) —
    the ops tool the reference gets from inspecting its Postgres task
    rows (admin.py task tables) and a Spark pipeline otherwise lacks:
    which keys are stuck, how big the state is, whether one partition
    hoards it.  Returns (key, state struct fields..., partition_id)
    flattened one row per stored key.

    ``batch_id`` time-travels to the state AS OF that micro-batch
    (default: latest committed) — the state-side analog of the
    SnapshotStore's digest time travel.  Works against any stateful
    operator's checkpoint (applyInPandasWithState here); read-only,
    safe on a live query's checkpoint (state files are immutable per
    batch).  The companion catalog is
    ``spark.read.format("state-metadata").load(ckpt)`` — which
    operators hold state, partition counts, and the reconstructable
    [minBatchId, maxBatchId] range for the batch_id parameter."""
    r = spark.read.format("statestore")
    if batch_id is not None:
        r = r.option("batchId", str(batch_id))
    df = r.load(checkpoint_dir)
    key_cols = [
        f"key.{f.name}" for f in df.schema["key"].dataType.fields
    ]
    val = df.schema["value"].dataType.fields[0].name
    val_cols = [
        f"value.{val}.{f.name}"
        for f in df.schema["value"].dataType[val].dataType.fields
    ]
    return df.select(*key_cols, *val_cols, "partition_id")
