"""Round-6 optimization profiling harness (guide §1.4: noop-sink isolation).

NOT the driver bench — ``bench.py`` stays frozen.  This measures individual
queries with the noop sink so the computation is timed without the sink or
``.count()`` pruning, labels jobs, and can dump per-phase timings for the
match path.

Usage:
  PYTHONPATH=. python bench_extra.py [sf_dir] [query ...]
Env:
  SPARK_GRAFT_CPUS        core count (default 32; master local[N])
  FLS_PROFILE_REPEATS     min-of-N repeats (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OP_QUERIES = (
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


def build_session(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("fls-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", "8g")
        .config("spark.sql.columnVector.offheap.enabled", "true")
        .getOrCreate()
    )


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
    names = sys.argv[2:] or list(OP_QUERIES)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("FLS_PROFILE_REPEATS", "3"))

    spark = build_session(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from full_lattice_search_spark.plans import queries as Q

    # warm every shape once at tiny scale (codegen+JIT+python worker pool)
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        Q.QUERIES[name](spark, warm_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name} [rep {i}]")
            t0 = time.time()
            noop(Q.QUERIES[name](spark, sf_dir))
            best = min(best, time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"  {name}: {timings[name]}", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "noop_min": timings,
                      "repeats": repeats, "cpus": cpus}))
    spark.stop()


if __name__ == "__main__":
    main()
