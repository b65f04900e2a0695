"""Spark 4 Python Data Source for WARC archives: ``spark.read.format("warc")``.

The binaryFile + mapInPandas readers in :mod:`.warc` parallelize at FILE
granularity — right for Common Crawl's ~1 GiB segment files, wrong for
one giant archive.  Spark 4's Python Data Source API
(pyspark.sql.datasource) lets this source own its PARTITIONING: with a
CDX index (``option("cdx", <parquet dir>)``, as written by
:func:`.warc.index_warc`) the reader splits one WARC into
``numPartitions`` record-range slices, each executor range-reading only
its byte spans — a single archive fans out across the cluster, and
records the index filtered away are never read, let alone inflated.
Without an index it degrades to one partition per file (binaryFile
parity).

Registration is explicit and per-session::

    from hoover_snoop2_spark.sources.warc_datasource import WarcDataSource
    spark.dataSource.register(WarcDataSource)
    df = (spark.read.format("warc")
          .option("path", "/data/*.warc.gz")
          .option("cdx", "/data/cdx")          # optional
          .option("numPartitions", "64")        # with cdx
          .load())

Record parsing is shared verbatim with :mod:`.warc`
(parse_warc_records), so rows are identical to ``read_warc`` — pinned
by tests/test_warc_datasource.py.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from .warc import WARC_PAGES_SCHEMA, _local_path, parse_warc_records


class _WholeFile(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _CdxSlice(InputPartition):
    def __init__(self, spans: list[tuple[str, int, int]]):
        # [(warc_file, offset, length)] — gzip-member (or raw-record)
        # byte spans from the CDX index
        self.spans = spans


class WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source requires option('path', ...)")
        self.cdx = options.get("cdx")
        self.num_partitions = int(options.get("numPartitions", "8"))

    def partitions(self):  # driver-side
        if self.cdx:
            import pyarrow.parquet as pq

            files = []
            cdx_path = _local_path(self.cdx)
            if os.path.isdir(cdx_path):
                files = sorted(
                    _glob.glob(os.path.join(cdx_path, "*.parquet"))
                )
            else:
                files = sorted(_glob.glob(cdx_path))
            spans: list[tuple[str, int, int]] = []
            for f in files:
                t = pq.read_table(
                    f, columns=["warc_file", "offset", "length"]
                )
                spans.extend(
                    zip(
                        t.column("warc_file").to_pylist(),
                        t.column("offset").to_pylist(),
                        t.column("length").to_pylist(),
                    )
                )
            # contiguous slices keep each partition's reads sequential
            # within a file (object-store range GETs coalesce); sort by
            # (file, offset) then chop into numPartitions runs
            spans.sort(key=lambda s: (s[0], s[1]))
            n = max(1, min(self.num_partitions, len(spans)))
            per = -(-len(spans) // n)
            return [
                _CdxSlice(spans[i : i + per])
                for i in range(0, len(spans), per)
            ]
        paths = sorted(_glob.glob(_local_path(self.path)))
        if not paths:
            raise FileNotFoundError(self.path)
        return [_WholeFile(p) for p in paths]

    def read(self, partition):
        if isinstance(partition, _WholeFile):
            with open(partition.path, "rb") as fh:
                raw = fh.read()
            yield from _record_batches(
                parse_warc_records(raw, partition.path)
            )
            return

        def recs() -> Iterator[dict]:
            handles: dict[str, io.BufferedReader] = {}
            try:
                for warc_file, offset, length in partition.spans:
                    fname = _local_path(warc_file)
                    fh = handles.get(fname)
                    if fh is None:
                        fh = handles[fname] = open(fname, "rb")
                    fh.seek(int(offset))
                    member = fh.read(int(length))
                    if member[:2] == b"\x1f\x8b":
                        member = gzip.decompress(member)
                    yield from parse_warc_records(member, warc_file)
            finally:
                for fh in handles.values():
                    fh.close()

        yield from _record_batches(recs())


#: rows per Arrow RecordBatch handed back to the JVM — large enough to
#: amortize the per-batch IPC overhead, small enough that a batch of
#: megabyte-scale html blobs doesn't balloon executor memory
_ARROW_BATCH_ROWS = 256


def _record_batches(recs: Iterator[dict]):
    """Pack parsed WARC records into Arrow RecordBatches — the
    vectorized return path of the Python Data Source API (one Arrow IPC
    transfer per batch instead of pickling every row), keeping the
    source aligned with the no-per-row-Python rule the rest of the
    pipeline follows."""
    import pyarrow as pa

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("content_type", pa.string()),
            ("http_status", pa.int32()),
            ("warc_file", pa.string()),
        ]
    )
    cols: list[list] = [[], [], [], [], [], []]
    for rec in recs:
        cols[0].append(rec["url"])
        cols[1].append(rec["warc_ts"])
        cols[2].append(rec["html"])
        cols[3].append(rec["content_type"])
        cols[4].append(rec["http_status"])
        cols[5].append(rec["warc_file"])
        if len(cols[0]) >= _ARROW_BATCH_ROWS:
            yield pa.record_batch(
                [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
                schema=schema,
            )
            cols = [[], [], [], [], [], []]
    if cols[0]:
        yield pa.record_batch(
            [pa.array(c, type=f.type) for c, f in zip(cols, schema)],
            schema=schema,
        )


class WarcStreamReader(DataSourceStreamReader):
    """Continuous ingest of a growing crawl-drop directory:
    ``spark.readStream.format("warc")``.

    Offset model: ``{"last": <path>}`` — the lexicographically largest
    file already ingested.  Each microbatch covers every file that
    sorts strictly after ``start['last']`` up to ``end['last']``, one
    task per file (the batch reader's file granularity).  The contract
    this rests on is the one crawl drops already satisfy: segment
    names are monotonic (Common Crawl's timestamp-prefixed
    ``CC-MAIN-...-NNNNN`` names), so "new" == "sorts after the
    watermark".  A file that lands BELOW the watermark is never read —
    late renames are not supported, same as Spark's own FileStreamSource
    without ``latestFirst``.  Exactly-once comes from the engine: the
    (start, end] file range is replayed identically after a restart
    because both offsets live in the checkpoint, and this reader keeps
    no state the checkpoint doesn't carry."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc stream requires option('path', ...)")
        # max files per microbatch while the stream is live — bounds
        # batch latency as a backlog drains (maxFilesPerTrigger
        # parity).  Does NOT bound the first batch after a (re)start:
        # see the latestOffset invariant.
        self.max_files = int(options.get("maxFilesPerTrigger", "0"))
        self._last = ""
        self._anchored = False

    def _files(self) -> list[str]:
        return sorted(_glob.glob(_local_path(self.path)))

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        # CORRECTNESS INVARIANT: the returned offset must never sort
        # below an offset the engine already checkpointed, or the next
        # batch's (start, end] range walks BACK over processed files
        # and re-emits them.  The reader's in-process watermark dies
        # with the process, and the engine calls latestOffset BEFORE
        # initialOffset even on a fresh query (measured; the protocol
        # gives the reader no way to see the checkpointed offset here) —
        # so the FIRST call of a reader's lifetime must catch up to the
        # global max in one batch.  maxFilesPerTrigger chunking applies
        # from the second call on, once the watermark is anchored.
        files = self._files()
        if not files:
            return {"last": self._last}
        if not self._anchored:
            self._anchored = True
            self._last = max(self._last, files[-1])
            return {"last": self._last}
        new = [f for f in files if f > self._last]
        if new:
            cut = new[: self.max_files] if self.max_files else new
            self._last = cut[-1]
        return {"last": self._last}

    def partitions(self, start: dict, end: dict):
        lo, hi = start.get("last", ""), end.get("last", "")
        # keep the in-process watermark at least at the engine's —
        # defense in depth against any offset the log knows and we don't
        self._last = max(self._last, hi)
        return [
            _WholeFile(f) for f in self._files() if lo < f <= hi
        ]

    def read(self, partition):
        with open(partition.path, "rb") as fh:
            raw = fh.read()
        yield from _record_batches(parse_warc_records(raw, partition.path))

    def commit(self, end: dict) -> None:
        # the engine's committed offset is durable truth; track it
        self._last = max(self._last, end.get("last", ""))


class WarcDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_PAGES_SCHEMA

    def reader(self, schema) -> WarcReader:
        return WarcReader(self.options)

    def streamReader(self, schema) -> WarcStreamReader:
        return WarcStreamReader(self.options)
