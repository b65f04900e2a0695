"""Spark 4 Python Data Source for WARC (sources/warc_datasource.py):
spark.read.format('warc') with CDX-driven record-range partitioning."""

import gzip

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
            (r["url"], r["http_status"], bytes(r["html"])) for r in rows
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
