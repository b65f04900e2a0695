"""Per-step extraction-leg profile (round 6 session 2).

Replicates bench.py's extraction leg (same corpus, same session config,
same count() materialization) with SNOOP_SPARK_TIMING prints enabled so
the wall splits into pairs-write / stats / analyze-write / work-write /
final-count steps.  Run standalone:

    SPARK_GRAFT_CPUS=32 python tools/profile_extraction_r06.py [repeats]
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SNOOP_SPARK_TIMING", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hoover_snoop2_spark.session import get_spark  # noqa: E402


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "150000"))
    spark = get_spark(app_name="profile_extraction", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import bench

    pages_path = bench._bench_corpus(spark, n_docs)
    from hoover_snoop2_spark.plans.pipeline import run_extraction

    pages = spark.read.parquet(pages_path)
    for i in range(repeats):
        t0 = time.perf_counter()
        digests, _ = run_extraction(spark, pages, checkpoint_dir=None)
        t1 = time.perf_counter()
        n = digests.count()
        t2 = time.perf_counter()
        print(f"[run {i}] build+jobs {t1 - t0:.1f}s  final count {t2 - t1:.1f}s  "
              f"total {t2 - t0:.1f}s  urls={n}", flush=True)


if __name__ == "__main__":
    main()
