"""Spark 4 Python Data Source for WARC (sources/warc_datasource.py):
spark.read.format('warc') with CDX-driven record-range partitioning."""

import gzip
import os

from pyspark.sql import functions as F

from hoover_snoop2_spark.sources.warc import index_warc, read_warc
from hoover_snoop2_spark.sources.warc_datasource import WarcDataSource

from test_warc import BODY_A, BODY_B, _build_records


def _register(spark):
    # idempotent per session: re-register is allowed and cheap
    spark.dataSource.register(WarcDataSource)


def test_warc_format_whole_file_matches_read_warc(spark, tmp_path):
    plain = tmp_path / "seg-0.warc"
    plain.write_bytes(b"".join(_build_records()))
    gz = tmp_path / "seg-1.warc.gz"
    gz.write_bytes(b"".join(gzip.compress(r) for r in _build_records()))

    _register(spark)
    via_ds = (
        spark.read.format("warc")
        .option("path", str(tmp_path / "*.warc*"))
        .load()
    )
    want = read_warc(spark, str(tmp_path / "*.warc*"))
    assert via_ds.schema == want.schema

    def key(rows):
        return sorted(
            (r["url"], r["warc_ts"], r["http_status"], bytes(r["html"]))
            for r in rows
        )

    assert key(via_ds.collect()) == key(want.collect())
    assert {bytes(r["html"]) for r in via_ds.collect()} == {BODY_A, BODY_B}


def test_warc_format_cdx_partitions_single_archive(spark, tmp_path):
    # one big archive of per-record gzip members; the CDX option must
    # fan it out across multiple partitions
    warc_path = str(tmp_path / "big.warc.gz")
    with open(warc_path, "wb") as f:
        for _ in range(6):
            for rec in _build_records():
                f.write(gzip.compress(rec))

    cdx_dir = str(tmp_path / "cdx")
    index_warc(spark, warc_path).write.parquet(cdx_dir)

    _register(spark)
    df = (
        spark.read.format("warc")
        .option("path", warc_path)
        .option("cdx", cdx_dir)
        .option("numPartitions", "4")
        .load()
    )
    # 6 copies x 4 records each in the index; only responses yield rows
    assert df.count() == 12
    n_parts = df.select(
        F.spark_partition_id().alias("p")
    ).distinct().count()
    assert n_parts == 4  # ONE archive spread over 4 tasks
    assert {bytes(r["html"]) for r in df.collect()} == {BODY_A, BODY_B}


def test_warc_format_cdx_index_pushdown(spark, tmp_path):
    # pre-filtered index -> only the selected record is ever read
    warc_path = str(tmp_path / "seg.warc.gz")
    spans = []
    with open(warc_path, "wb") as f:
        for rec in _build_records():
            member = gzip.compress(rec)
            spans.append((warc_path, f.tell(), len(member)))
            f.write(member)
    cdx_dir = str(tmp_path / "cdx_one")
    spark.createDataFrame(
        [spans[3]], "warc_file string, offset long, length long"
    ).write.parquet(cdx_dir)

    _register(spark)
    rows = (
        spark.read.format("warc")
        .option("path", warc_path)
        .option("cdx", cdx_dir)
        .load()
        .collect()
    )
    assert len(rows) == 1
    assert bytes(rows[0]["html"]) == BODY_B
    assert rows[0]["http_status"] == 301


def test_warc_stream_incremental_file_pickup(spark, tmp_path):
    """readStream.format('warc'): files present at start land in the
    first batch; a segment dropped mid-stream lands exactly once in a
    later batch; the watermark file is never re-read."""
    drop = tmp_path / "drop"
    drop.mkdir()
    for i in range(2):
        (drop / f"seg-{i:05d}.warc.gz").write_bytes(
            b"".join(gzip.compress(r) for r in _build_records())
        )

    _register(spark)
    q = (
        spark.readStream.format("warc")
        .option("path", str(drop / "*.warc.gz"))
        .load()
        .writeStream.format("memory")
        .queryName("warc_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("select count(*) c from warc_stream_t").first().c
        assert n1 == 4  # 2 files x 2 response records

        (drop / "seg-00002.warc.gz").write_bytes(
            b"".join(gzip.compress(r) for r in _build_records())
        )
        q.processAllAvailable()
        got = spark.sql(
            "select warc_file, count(*) c from warc_stream_t group by 1"
        ).collect()
        assert sum(r.c for r in got) == 6
        assert len(got) == 3 and all(r.c == 2 for r in got)
    finally:
        q.stop()


def test_warc_stream_max_files_per_trigger(spark, tmp_path):
    """maxFilesPerTrigger bounds each LIVE microbatch (the first batch
    of a reader's lifetime is the unbounded catch-up — see the
    latestOffset invariant); a mid-stream backlog drains across
    batches with no file lost or duplicated."""
    drop = tmp_path / "drop2"
    drop.mkdir()
    (drop / "seg-00000.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _build_records())
    )

    _register(spark)
    q = (
        spark.readStream.format("warc")
        .option("path", str(drop / "*.warc.gz"))
        .option("maxFilesPerTrigger", "2")
        .load()
        .writeStream.format("memory")
        .queryName("warc_stream_mft")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    try:
        q.processAllAvailable()
        for i in range(1, 5):  # 4-file backlog lands while running
            (drop / f"seg-{i:05d}.warc.gz").write_bytes(
                b"".join(gzip.compress(r) for r in _build_records())
            )
        q.processAllAvailable()
        rows = spark.sql(
            "select warc_file, count(*) c from warc_stream_mft group by 1"
        ).collect()
        assert len(rows) == 5 and all(r.c == 2 for r in rows)
        # 1 catch-up batch + 4 live files at <=2/batch -> >= 3 batches
        assert len(q.recentProgress) >= 3
    finally:
        q.stop()


def test_warc_stream_restart_from_checkpoint(spark, tmp_path):
    """Stop the stream, drop a new segment, restart on the SAME
    checkpoint: the reader is rebuilt with no memory of its own, so
    progress must come entirely from the checkpointed offsets — the
    old file is not re-read, the new one lands exactly once.  File
    sink (memory sink refuses checkpoint recovery)."""
    drop = tmp_path / "drop3"
    drop.mkdir()
    out = str(tmp_path / "restart_out")
    (drop / "seg-00000.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _build_records())
    )
    _register(spark)

    def start():
        return (
            spark.readStream.format("warc")
            .option("path", str(drop / "*.warc.gz"))
            .load()
            .select("url", "http_status", "warc_file")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt3"))
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    (drop / "seg-00001.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _build_records())
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = (
        spark.read.parquet(out)
        .groupBy("warc_file")
        .count()
        .collect()
    )
    got = {os.path.basename(r.warc_file): r["count"] for r in rows}
    assert got == {"seg-00000.warc.gz": 2, "seg-00001.warc.gz": 2}


def test_warc_stream_restart_with_max_files_no_duplicates(spark, tmp_path):
    """Regression: maxFilesPerTrigger + restart.  A rebuilt reader's
    in-process watermark is empty, so a naive chunked latestOffset
    would return the first K files — BEHIND the checkpointed offset —
    poisoning the offset log and re-emitting processed files in the
    following batch.  The reader must instead catch up to the global
    max on its first post-restart call."""
    drop = tmp_path / "drop4"
    drop.mkdir()
    out = str(tmp_path / "mft_restart_out")
    for i in range(4):
        (drop / f"seg-{i:05d}.warc.gz").write_bytes(
            b"".join(gzip.compress(r) for r in _build_records())
        )
    _register(spark)

    def start():
        return (
            spark.readStream.format("warc")
            .option("path", str(drop / "*.warc.gz"))
            .option("maxFilesPerTrigger", "2")
            .load()
            .select("url", "http_status", "warc_file")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt4"))
            .start()
        )

    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    (drop / "seg-00004.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _build_records())
    )
    q = start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.read.parquet(out).groupBy("warc_file").count().collect()
    got = {os.path.basename(r.warc_file): r["count"] for r in rows}
    assert got == {f"seg-{i:05d}.warc.gz": 2 for i in range(5)}
