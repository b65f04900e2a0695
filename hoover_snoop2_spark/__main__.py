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
    p.add_argument("--input", required=True, help="pages table (parquet dir)")
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
    args = p.parse_args(argv)

    from .operators.es_sink import to_es_documents
    from .plans.checkpoint import CheckpointStore
    from .plans.pipeline import run_extraction, write_digests
    from .session import get_spark

    spark = get_spark(app_name="snoop2_spark_extract")
    pages = spark.read.parquet(args.input)

    previous = None
    if args.resume:
        cp = CheckpointStore(args.checkpoint)
        # version gate (the reference's @snoop_task(version=...) retry
        # invalidation, models.py:732-736): a stage-version bump makes the
        # old snapshot stale — recompute instead of resuming from it
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
    )
    out = to_es_documents(digests) if args.es_shape else digests
    write_digests(out, args.output)
    metrics.write.mode("overwrite").parquet(args.output + "/metrics")

    stats = {r["status"]: r["rows"] for r in
             metrics.groupBy("status").agg({"rows": "sum"})
             .withColumnRenamed("sum(rows)", "rows").collect()}
    print(json.dumps({"digests": digests.count(), "status_rows": stats}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
