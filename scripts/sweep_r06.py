"""r06 operator sweep: time every registered query once (count sink) at a
given SF to find pathological outliers.  Not a benchmark — a triage pass.

Usage: PYTHONPATH=. python scripts/sweep_r06.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", "8g")
        .config("spark.sql.columnVector.offheap.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from full_lattice_search_spark.plans.queries import QUERIES

    out: dict[str, float] = {}
    for name, fn in QUERIES.items():
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        try:
            fn(spark, sf_dir).count()
            out[name] = round(time.time() - t0, 2)
        except Exception as e:
            out[name] = -1.0
            print(f"ERR {name}: {e}", file=sys.stderr)
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"sf_dir": sf_dir, "count_sec": out}))
    spark.stop()


if __name__ == "__main__":
    main()
