"""spark-submit entry point.

    spark-submit --py-files hoover_snoop2_spark.zip \
        -m ... hoover_snoop2_spark \
        --input  /path/to/pages_parquet_or_iceberg \
        --output /path/to/digests \
        --checkpoint /path/to/ckpt [--resume] [--max-depth 5]

Replaces the reference's `manage.py rundispatcher` + Celery beat loop
(tasks.py:1219-1243): one driver program, stages checkpointed, `--resume`
anti-joins already-digested hashes from the last snapshot
(plans/checkpoint.py — the is_completed analog, tasks.py:356-364).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="hoover_snoop2_spark")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages table (parquet dir)")
    src.add_argument("--input-dir",
                     help="ingest a raw directory tree instead of a pages "
                          "table (the reference's filesystem.walk mode): "
                          "recursive binaryFile scan, mtime as warc_ts, "
                          ".partial.emlx sibling reconstruction")
    p.add_argument("--output", required=True, help="digest sink directory")
    p.add_argument("--checkpoint", required=True, help="stage snapshot dir")
    p.add_argument("--resume", action="store_true",
                   help="skip hashes present in the checkpoint's last digests")
    p.add_argument("--max-depth", type=int, default=5)
    p.add_argument("--dedup-strategy",
                   choices=("auto", "broadcast", "shuffle"), default="auto",
                   help="blob-dedup plan: auto (size-measured per round), "
                        "broadcast winner election (no blob shuffle), or "
                        "co-located shuffle (for scales where winners "
                        "outgrow a broadcast)")
    p.add_argument("--es-shape", action="store_true",
                   help="emit reference-ES-mapping field names")
    p.add_argument("--wet-dir", default=None,
                   help="also emit the extracted text as Common-Crawl-"
                        "style WET files (one part-NNNNN.warc.wet.gz "
                        "per partition, per-record gzip members)")
    p.add_argument("--compact-snapshots", action="store_true",
                   help="after the snapshot commit, rewrite the table's "
                        "accumulated small data dirs into right-sized "
                        "files (Iceberg rewrite_data_files analog); "
                        "requires --snapshot-dir")
    p.add_argument("--snapshot-dir", default=None,
                   help="version digests in a SnapshotStore table: with "
                        "--resume, reads the current snapshot as the "
                        "memoization set and appends only this run's "
                        "delta; without, commits a fresh overwrite "
                        "snapshot (old versions stay time-travelable)")
    args = p.parse_args(argv)

    from .operators.es_sink import to_es_documents
    from .plans.checkpoint import CheckpointStore, SnapshotStore
    from .plans.pipeline import run_extraction, write_digests
    from .session import get_spark

    spark = get_spark(app_name="snoop2_spark_extract")
    if args.input_dir:
        from .sources.filesystem import read_directory

        pages = read_directory(spark, args.input_dir)
    else:
        pages = spark.read.parquet(args.input)

    store = SnapshotStore(args.snapshot_dir) if args.snapshot_dir else None
    previous = None
    if args.resume:
        if store is not None:
            if store.current_version("digests"):
                previous = store.read(spark, "digests")
            else:
                print("resume: snapshot table empty — running full "
                      "extraction", file=sys.stderr)
        else:
            cp = CheckpointStore(args.checkpoint)
            # version gate (the reference's @snoop_task(version=...) retry
            # invalidation, models.py:732-736): a stage-version bump makes
            # the old snapshot stale — recompute instead of resuming
            if cp.valid("digests"):
                previous = cp.read(spark, "digests")
            else:
                print("resume: checkpointed digests missing or stale "
                      "(stage version mismatch) — running full extraction",
                      file=sys.stderr)

    digests, metrics = run_extraction(
        spark, pages, checkpoint_dir=args.checkpoint,
        max_depth=args.max_depth, previous_digests=previous,
        dedup_strategy=args.dedup_strategy,
        # with a snapshot table the commit IS the union — append the delta
        include_previous=store is None or previous is None,
    )
    snapshot_version = None
    if store is not None:
        snapshot_version = store.commit(
            digests, "digests",
            mode="append" if previous is not None else "overwrite",
        )
        if args.compact_snapshots:
            compacted = store.compact(spark, "digests")
            if compacted is not None:
                snapshot_version = compacted
        digests = store.read(spark, "digests")

    out = to_es_documents(digests) if args.es_shape else digests
    write_digests(out, args.output)
    metrics.write.mode("overwrite").parquet(args.output + "/metrics")

    wet_files = None
    if args.wet_dir:
        import shutil

        from .sources.warc import write_wet

        # digests are url-keyed; the crawl timestamp lives on the pages
        # side (container children carry no capture time → epoch date).
        # Both sides dedup by url: re-crawled urls carry several page
        # rows and a plain m:n join would emit duplicate WET records
        # with identical record ids.
        with_ts = digests.select("url", "text").dropDuplicates(["url"]).join(
            pages.select("url", "warc_ts").dropDuplicates(["url"]),
            "url",
            "left",
        )
        # stale part files from a previous (or failed) run must not
        # survive — write_wet appends files, it cannot truncate
        shutil.rmtree(args.wet_dir, ignore_errors=True)
        manifest = write_wet(with_ts, args.wet_dir).collect()
        wet_files = {
            "files": len(manifest),
            "records": sum(m.n_records for m in manifest),
        }

    stats = {r["status"]: r["rows"] for r in
             metrics.groupBy("status").agg({"rows": "sum"})
             .withColumnRenamed("sum(rows)", "rows").collect()}
    summary = {"digests": digests.count(), "status_rows": stats}
    if snapshot_version is not None:
        summary["snapshot_version"] = snapshot_version
    if wet_files is not None:
        summary["wet"] = wet_files
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
