"""WET Data Source sink (sources/wet_datasource.py): two-phase commit
batch + streaming writes, manifest publication, staged-file hygiene."""

import gzip
import os
from datetime import datetime

from hoover_snoop2_spark.sources.warc import read_wet
from hoover_snoop2_spark.sources.warc_datasource import WarcDataSource
from hoover_snoop2_spark.sources.wet_datasource import (
    WetDataSource,
    read_manifests,
)

from test_warc import _build_records


def _register(spark):
    spark.dataSource.register(WetDataSource)
    spark.dataSource.register(WarcDataSource)


def test_wet_batch_write_roundtrip_and_manifest(spark, tmp_path):
    rows = [
        ("https://a.example/1", datetime(2026, 1, 2, 3, 4, 5), "hello"),
        ("https://b.example/2", datetime(2026, 2, 3, 4, 5, 6), "wörld 通"),
        ("https://c.example/3", None, ""),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, text string"
    )
    out = str(tmp_path / "wet_out")
    _register(spark)
    df.repartition(2).write.format("wet").mode("append").option(
        "path", out
    ).save()

    man = read_manifests(out)
    assert man["n_records"] == 3
    assert len(man["files"]) <= 2  # empty partitions publish nothing
    # staged dir holds no leftovers after commit
    assert _leftover_staged(out) == []

    back = read_wet(spark, out + "/*.warc.wet.gz")
    got = {r.url: r.text for r in back.collect()}
    assert got == {
        "https://a.example/1": "hello",
        "https://b.example/2": "wörld 通",
        "https://c.example/3": "",
    }

    # append-only contract: a second append must not clobber the first
    # (unique per-job prefixes), and overwrite mode is refused
    df.repartition(1).write.format("wet").mode("append").option(
        "path", out
    ).save()
    assert read_manifests(out)["n_records"] == 6
    assert read_wet(spark, out + "/*.warc.wet.gz").count() == 6
    import pytest as _pytest

    with _pytest.raises(Exception, match="append-only"):
        df.write.format("wet").mode("overwrite").option(
            "path", out
        ).save()


def _leftover_staged(out):
    staging = os.path.join(out, "_staging")
    return os.listdir(staging) if os.path.isdir(staging) else []


def test_wet_stream_sink_exactly_once_per_batch(spark, tmp_path):
    """readStream warc → extract text → writeStream wet: every source
    record lands exactly once across per-batch manifests."""
    from pyspark.sql import functions as F

    drop = tmp_path / "warc_in"
    drop.mkdir()
    (drop / "seg-00000.warc.gz").write_bytes(
        b"".join(gzip.compress(r) for r in _build_records())
    )
    out = str(tmp_path / "wet_stream_out")
    _register(spark)
    q = (
        spark.readStream.format("warc")
        .option("path", str(drop / "*.warc.gz"))
        .load()
        .select(
            "url", "warc_ts", F.col("html").cast("string").alias("text")
        )
        .writeStream.format("wet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        (drop / "seg-00001.warc.gz").write_bytes(
            b"".join(gzip.compress(r) for r in _build_records())
        )
        q.processAllAvailable()
    finally:
        q.stop()

    man = read_manifests(out)
    assert man["n_records"] == 4  # 2 files x 2 response records
    assert _leftover_staged(out) == []
    back = read_wet(spark, out + "/*.warc.wet.gz")
    assert back.count() == 4
    # per-batch manifests exist separately (batch ids in final names)
    names = {os.path.basename(f["path"]) for f in man["files"]}
    assert all(n.startswith("batch-") for n in names)
    assert len({n.split("-part-")[0] for n in names}) >= 2


def test_publish_replay_is_idempotent_and_prunes_stale(tmp_path):
    """Pure-unit check of the two-phase commit's driver half: replaying
    a batch with FEWER staged partitions (upstream repartition between
    runs) rewrites the manifest, reuses the final names, and prunes the
    stale extra final — glob readers and manifest readers agree."""
    import glob
    import json
    import os

    from hoover_snoop2_spark.sources.wet_datasource import (
        WetCommit,
        _publish,
    )

    out = str(tmp_path / "pub")
    staging = os.path.join(out, "_staging")
    os.makedirs(staging)

    def stage(name: str, payload: bytes) -> WetCommit:
        p = os.path.join(staging, name)
        with open(p, "wb") as f:
            f.write(payload)
        return WetCommit(p, 1, len(payload))

    # original commit: 3 partitions
    _publish(out, "batch-00007-", [
        stage("a", b"A"), None, stage("b", b"B"), stage("c", b"C"),
    ])
    finals = sorted(glob.glob(os.path.join(out, "batch-00007-part-*")))
    assert len(finals) == 3 and os.listdir(staging) == []

    # replay with 2 partitions (and new staged content)
    _publish(out, "batch-00007-", [stage("d", b"DD"), stage("e", b"E")])
    finals = sorted(glob.glob(os.path.join(out, "batch-00007-part-*")))
    assert len(finals) == 2  # stale part-00002 pruned
    man = json.load(open(os.path.join(out, "_manifests",
                                      "batch-00007.json")))
    assert man["n_records"] == 2 and man["n_bytes"] == 3
    assert sorted(f["path"] for f in man["files"]) == finals
    assert open(finals[0], "rb").read() == b"DD"
    assert open(finals[1], "rb").read() == b"E"
