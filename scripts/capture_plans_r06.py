"""Dump .explain('formatted') for the bench queries to plans/r06/.

Usage: PYTHONPATH=. python scripts/capture_plans_r06.py before|after [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAMES = (
    "match_ordered_2",
    "match_score_single",
    "match_span_score",
    "match_unordered_3",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash",
    "ann_bruteforce",
    "quality",
    "pricing_summary",
)


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out_dir = os.path.join(REPO, "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from full_lattice_search_spark.plans.queries import QUERIES

    for name in NAMES:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(formatted(df))
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
