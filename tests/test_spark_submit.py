"""Ship-and-run check: the package runs under real `spark-submit
--py-files <zip>` (the north-rule deployment shape), not just in-process.

Builds the --py-files zip from the source tree, launches a genuinely
separate driver JVM via subprocess, runs the full extraction CLI
(__main__.main) over a small synthetic pages corpus, and validates the
digest parquet it writes.  This is the only test allowed to spawn its own
SparkSession-in-a-subprocess; everything else shares the fixture session.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "hoover_snoop2_spark")

SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.path.dirname(__import__("pyspark").__file__), "bin", "spark-submit"
)


def _build_pyfiles_zip(dest: str) -> str:
    """Zip the package the way a deploy pipeline would for --py-files."""
    zpath = os.path.join(dest, "hoover_snoop2_spark.zip")
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    return zpath


def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    from hoover_snoop2_spark.corpus import generate_pages

    pages_path, golden_path = generate_pages(40, str(tmp_path))
    golden = {
        r["url"]: r["text"]
        for r in spark.read.parquet(golden_path).collect()
    }

    zpath = _build_pyfiles_zip(str(tmp_path))
    runner = tmp_path / "job.py"
    # the driver file itself stays tiny — all logic ships in the zip
    runner.write_text(
        "import sys\n"
        "from hoover_snoop2_spark.__main__ import main\n"
        "sys.exit(main(sys.argv[1:]))\n"
    )
    out = str(tmp_path / "digests_out")
    env = {
        k: v
        for k, v in os.environ.items()
        # the submitted app must resolve the package from --py-files, not
        # from the repo checkout leaking in via PYTHONPATH
        if k != "PYTHONPATH"
    }
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath,
            str(runner),
            "--input", pages_path,
            "--output", out,
            "--checkpoint", str(tmp_path / "ckpt"),
        ],
        env=env,
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # the CLI prints a one-line JSON summary on stdout
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["digests"] > 0

    got = {
        r["url"]: r["text"]
        for r in spark.read.parquet(os.path.join(out, "digests"))
        .select("url", "text")
        .collect()
    }
    assert set(golden) <= set(got)
    mismatched = [u for u, t in golden.items() if got[u] != t]
    assert mismatched == []
