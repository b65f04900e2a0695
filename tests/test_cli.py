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
