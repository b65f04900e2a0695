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
