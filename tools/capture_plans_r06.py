"""Capture .explain("formatted") for the headline queries into
plans/r06/<query>_{before|after}.txt (round-6 optimization evidence).

Usage: python tools/capture_plans_r06.py before|after [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "q01_pricing_summary",
    "q02_task_matrix",
    "q07_dim_join",
    "q11_decorrelated_subquery",
    "q14_batch_packing",
    "q16_dedup_exact",
    "q18_quality",
    "q21_cosine_topk",
    "q30_minhash_lsh_dups",
    "q31_simhash_dups",
    "q32_ann_lsh_topk",
    "q80_bigram_coverage",
    "q81_inverted_index",
    "q89_template_removal",
    "q96_pipeline_text",
    "q188_semdedup",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r06",
    )
    os.makedirs(out_dir, exist_ok=True)

    from hoover_snoop2_spark.queries import QUERIES
    from hoover_snoop2_spark.session import get_spark

    spark = get_spark(app_name="plans_r06")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")


if __name__ == "__main__":
    main()
