"""Spark 4 Python Data Source SINK for WET extracted-text drops:
``df.write.format("wet")`` and ``df.writeStream.format("wet")``.

:func:`.warc.write_wet` is a mapInPandas sink — it works, but Spark
cannot give it transactional semantics: a retried task appends a second
copy of its partition's file and nothing cleans up after a failed job.
The Data Source writer API restores the classic two-phase commit every
production sink uses:

- executors stage each partition's records to
  ``<path>/_staging/<uuid>.warc.wet.gz`` (one gzip member per record,
  Common Crawl framing, via :func:`.warc.build_wet_record`) and return
  the staged name + counts as the task's commit message;
- the driver's ``commit()`` — called only when EVERY task succeeded —
  renames staged files to their final ``batch-<id>-part-<n>.warc.wet.gz``
  names and then atomically publishes ``_manifests/batch-<id>.json``
  (tmp + rename, the SnapshotStore idiom).  A speculative or retried
  task's extra staged file is simply never named in any commit message,
  so it is invisible garbage, not duplicate data;
- ``abort()`` deletes whatever was staged.

Exactly-once for the streaming form therefore composes from (source
offsets in the engine checkpoint) × (this sink's manifest): a replayed
microbatch re-runs ``commit()`` with the same batchId, and the manifest
write is idempotent (same name, atomic replace).  Readers either follow
the manifests or glob final names — staged files live under a
``_``-prefixed dir Spark's own file readers already ignore.

Input schema contract (same as write_wet): url string, warc_ts
timestamp, text string.  On a real cluster ``path`` must be a shared
filesystem — the standard contract for every path-based Spark sink;
rename-based publish maps to the metadata swap on object stores with a
manifest-committer equivalent.
"""

from __future__ import annotations

import glob as _glob
import gzip as _gzip
import io
import json
import os
import uuid
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)

from .warc import build_wet_record


class WetCommit(WriterCommitMessage):
    def __init__(self, staged: str, n_records: int, n_bytes: int):
        self.staged = staged
        self.n_records = n_records
        self.n_bytes = n_bytes


def _write_staged(path: str, iterator: Iterator) -> WetCommit | None:
    """Executor side: stream records into one staged gzip-member file.
    Returns None for an empty partition (no file is created)."""
    staging = os.path.join(path, "_staging")
    fname = os.path.join(staging, f"{uuid.uuid4().hex}.warc.wet.gz")
    f = None
    n = 0
    total = 0
    try:
        for row in iterator:
            rec = build_wet_record(row["url"], row["warc_ts"], row["text"])
            if f is None:
                os.makedirs(staging, exist_ok=True)
                f = open(fname, "wb")
            buf = io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            f.write(buf.getvalue())
            n += 1
            total += len(rec)
    finally:
        if f is not None:
            f.close()
    if n == 0:
        return None
    return WetCommit(fname, n, total)


def _publish(path: str, prefix: str, messages) -> None:
    """Driver side: rename staged files into their final names, then
    atomically publish the manifest.  Idempotent per (path, prefix) —
    a replayed streaming batch regenerates identical names."""
    files = []
    n_records = 0
    n_bytes = 0
    part = 0
    for m in messages:
        if m is None:  # empty partition
            continue
        final = os.path.join(path, f"{prefix}part-{part:05d}.warc.wet.gz")
        if os.path.exists(m.staged):
            os.replace(m.staged, final)
        files.append(
            {
                "path": final,
                "n_records": m.n_records,
                "n_bytes": m.n_bytes,
            }
        )
        n_records += m.n_records
        n_bytes += m.n_bytes
        part += 1
    # a replayed streaming batch may stage FEWER partitions than the
    # original commit (upstream repartition between runs); finals from
    # the stale commit that the new manifest no longer names must go,
    # or glob-based readers double-count what manifest readers don't see
    keep = {f["path"] for f in files}
    for old in _glob.glob(os.path.join(path, f"{prefix}part-*.warc.wet.gz")):
        if old not in keep:
            os.remove(old)
    mdir = os.path.join(path, "_manifests")
    os.makedirs(mdir, exist_ok=True)
    mpath = os.path.join(mdir, f"{prefix.rstrip('-') or 'job'}.json")
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {"files": files, "n_records": n_records, "n_bytes": n_bytes}, f
        )
    os.replace(tmp, mpath)


def _discard(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.staged):
            os.remove(m.staged)


class WetBatchWriter(DataSourceWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wet sink requires option('path', ...)")
        # unique per job so mode('append') jobs never collide on final
        # names or manifests (streaming gets this from the batchId)
        self.job = uuid.uuid4().hex[:12]

    def write(self, iterator):
        return _write_staged(self.path, iterator)

    def commit(self, messages) -> None:
        _publish(self.path, f"job-{self.job}-", messages)

    def abort(self, messages) -> None:
        _discard(messages)


class WetStreamWriter(DataSourceStreamWriter):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("wet sink requires option('path', ...)")

    def write(self, iterator):
        return _write_staged(self.path, iterator)

    def commit(self, messages, batchId: int) -> None:
        _publish(self.path, f"batch-{batchId:05d}-", messages)

    def abort(self, messages, batchId: int) -> None:
        _discard(messages)


class WetDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "wet"

    def writer(self, schema, overwrite: bool) -> WetBatchWriter:
        if overwrite:
            # a crawl drop is append-only by nature; refusing beats
            # silently not deleting prior segments
            raise ValueError(
                "wet sink is append-only; use mode('append')"
            )
        return WetBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> WetStreamWriter:
        return WetStreamWriter(self.options)


def read_manifests(path: str) -> dict:
    """Sum every published manifest under ``path`` — the committed view
    of the drop (staged garbage excluded by construction)."""
    out = {"files": [], "n_records": 0, "n_bytes": 0}
    for m in sorted(_glob.glob(os.path.join(path, "_manifests", "*.json"))):
        with open(m) as f:
            d = json.load(f)
        out["files"].extend(d["files"])
        out["n_records"] += d["n_records"]
        out["n_bytes"] += d["n_bytes"]
    return out
