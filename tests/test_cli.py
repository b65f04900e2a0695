"""spark-submit entry point (__main__.main): full run + version-gated
resume over the same checkpoint dir."""

import json
import os

import pyspark.sql


def test_cli_run_and_resume(spark, tmp_path, capsys, monkeypatch):
    from hoover_snoop2_spark.corpus import generate_pages
    from hoover_snoop2_spark.__main__ import main
    from hoover_snoop2_spark.plans.checkpoint import CheckpointStore

    # main() stops the session on exit; keep the shared fixture alive
    monkeypatch.setattr(pyspark.sql.SparkSession, "stop", lambda self: None)

    pages_path, _ = generate_pages(60, str(tmp_path / "gen"))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    assert main(["--input", pages_path, "--output", out,
                 "--checkpoint", ckpt, "--es-shape"]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["digests"] > 60  # children included
    assert os.path.exists(os.path.join(out, "digests"))

    # resume: valid checkpoint → delta is empty, counts unchanged
    assert main(["--input", pages_path, "--output", out,
                 "--checkpoint", ckpt, "--resume"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["digests"] == first["digests"]

    # stage-version bump invalidates the snapshot → full recompute, same counts
    cp = CheckpointStore(ckpt)
    assert cp.valid("digests")
    manifest = os.path.join(ckpt, "digests.manifest.json")
    with open(manifest) as f:
        m = json.load(f)
    m["version"] = 999
    with open(manifest, "w") as f:
        json.dump(m, f)
    assert not cp.valid("digests")
    assert main(["--input", pages_path, "--output", out,
                 "--checkpoint", ckpt, "--resume"]) == 0
    err = capsys.readouterr()
    third = json.loads(err.out.strip().splitlines()[-1])
    assert third["digests"] == first["digests"]
    assert "stale" in err.err


def test_cli_snapshot_versioned_resume(spark, tmp_path, capsys, monkeypatch):
    """--snapshot-dir: first run commits an overwrite snapshot; a resumed
    run over a grown corpus appends only the delta; old versions stay
    time-travelable."""
    from hoover_snoop2_spark.corpus import generate_pages
    from hoover_snoop2_spark.__main__ import main
    from hoover_snoop2_spark.plans.checkpoint import SnapshotStore

    monkeypatch.setattr(pyspark.sql.SparkSession, "stop", lambda self: None)

    pages_path, _ = generate_pages(60, str(tmp_path / "gen"))
    full = spark.read.parquet(pages_path)
    small_path = str(tmp_path / "pages_small")
    full.limit(20).write.parquet(small_path)

    out = str(tmp_path / "out")
    snaps = str(tmp_path / "snaps")

    assert main(["--input", small_path, "--output", out,
                 "--checkpoint", str(tmp_path / "c1"),
                 "--snapshot-dir", snaps]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert first["snapshot_version"] == 1

    assert main(["--input", pages_path, "--output", out,
                 "--checkpoint", str(tmp_path / "c2"),
                 "--snapshot-dir", snaps, "--resume"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["snapshot_version"] == 2
    assert second["digests"] > first["digests"]

    store = SnapshotStore(snaps)
    # cumulative view has no duplicate hashes (delta was memoized)
    cur = store.read(spark, "digests")
    assert cur.count() == second["digests"]
    shas = cur.filter("sha256 is not null").select("sha256", "url")
    assert shas.count() == shas.distinct().count()
    # time travel: v1 is exactly the first run
    assert store.read(spark, "digests", version=1).count() == first["digests"]
    # incremental consumers see only the delta
    assert store.incremental(spark, "digests", since=1).count() == (
        second["digests"] - first["digests"]
    )


def test_cli_wet_output(spark, tmp_path, capsys, monkeypatch):
    """--wet-dir emits WET conversion records whose text matches the
    digest table row-for-row (url-keyed, children included)."""
    from hoover_snoop2_spark.__main__ import main
    from hoover_snoop2_spark.corpus import generate_pages
    from hoover_snoop2_spark.sources.warc import read_wet

    monkeypatch.setattr(pyspark.sql.SparkSession, "stop", lambda self: None)
    pages_path, _ = generate_pages(40, str(tmp_path / "gen"))
    out = str(tmp_path / "out")
    wet = str(tmp_path / "wet")
    assert main(["--input", pages_path, "--output", out,
                 "--checkpoint", str(tmp_path / "ckpt"),
                 "--wet-dir", wet]) == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["wet"]["records"] == summary["digests"]

    back = spark.read.parquet(os.path.join(out, "digests")).alias("d").join(
        read_wet(spark, wet + "/*.warc.wet.gz").alias("w"), "url"
    )
    import pyspark.sql.functions as F
    assert back.count() == summary["digests"]
    mismatch = back.filter(
        F.coalesce(F.col("d.text"), F.lit(""))
        != F.coalesce(F.col("w.text"), F.lit(""))
    )
    assert mismatch.count() == 0


def test_cli_compact_snapshots(spark, tmp_path, capsys, monkeypatch):
    """--compact-snapshots after a resumed append: the reported version
    is the rewrite, the table collapses to one data dir, and counts are
    unchanged."""
    from hoover_snoop2_spark.__main__ import main
    from hoover_snoop2_spark.corpus import generate_pages
    from hoover_snoop2_spark.plans.checkpoint import SnapshotStore

    monkeypatch.setattr(pyspark.sql.SparkSession, "stop", lambda self: None)
    pages_path, _ = generate_pages(40, str(tmp_path / "gen"))
    full = spark.read.parquet(pages_path)
    small_path = str(tmp_path / "pages_small")
    full.limit(15).write.parquet(small_path)
    out = str(tmp_path / "out")
    snaps = str(tmp_path / "snaps")

    assert main(["--input", small_path, "--output", out,
                 "--checkpoint", str(tmp_path / "c1"),
                 "--snapshot-dir", snaps]) == 0
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert main(["--input", pages_path, "--output", out,
                 "--checkpoint", str(tmp_path / "c2"),
                 "--snapshot-dir", snaps, "--resume",
                 "--compact-snapshots"]) == 0
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["snapshot_version"] == 3  # append=2, rewrite=3
    store = SnapshotStore(snaps)
    assert len(store._resolve("digests", None)) == 1
    assert store.read(spark, "digests").count() == second["digests"]
    assert second["digests"] > first["digests"]


def test_cli_input_dir(spark, tmp_path, capsys, monkeypatch):
    """--input-dir ingests a raw directory tree (filesystem.walk mode)."""
    import json as _json

    from hoover_snoop2_spark.__main__ import main

    monkeypatch.setattr(pyspark.sql.SparkSession, "stop", lambda self: None)

    root = tmp_path / "collection"
    root.mkdir()
    (root / "a.txt").write_bytes(b"Directory-mode body text one.")
    sub = root / "nested"
    sub.mkdir()
    (sub / "b.html").write_bytes(
        b"<html><body><article><p>Nested article body, long enough to "
        b"dominate the page's block scoring.</p></article></body></html>")

    out = str(tmp_path / "out")
    assert main(["--input-dir", str(root), "--output", out,
                 "--checkpoint", str(tmp_path / "ckpt")]) == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["digests"] == 2

    texts = {r.url.split("/")[-1]: r.text
             for r in spark.read.parquet(out + "/digests").collect()}
    assert texts["a.txt"].startswith("Directory-mode body")
    assert "Nested article body" in texts["b.html"]
