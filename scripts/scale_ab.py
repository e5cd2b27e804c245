"""A/B harness for closing the 8->32 compute-scaling gap.

Runs the scaling bench's COMPUTE variant (extract_spans(...).count()) at
local[8] and local[32] under candidate Spark configs, fresh JVM per
(level, config), interleaved rounds with per-cell minima — prints the
8->32 speedup per config so the winner can be promoted into
scripts/scaling_bench.py.

Usage: PYTHONPATH=/root/repo python scripts/scale_ab.py [n_docs] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.operators.extract import extract_spans

cpus = int(sys.argv[1]); corpus = sys.argv[2]
conf = json.loads(sys.argv[3])
b = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "48g"))
for k, v in conf.items():
    b = b.config(k, v)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
if "spark.sql.files.maxPartitionBytes" not in conf:
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
docs = spark.read.parquet(corpus)
from full_lattice_search_spark.datagen import synth_documents
warm = synth_documents(spark, cpus * 60, seed=7, mega_every=0,
                       partitions=cpus * 2)
extract_spans(warm, LatticeConfig()).count()
extract_spans(docs.limit(500), LatticeConfig()).count()
best = float("inf")
for _ in range(2):
    t0 = time.time()
    extract_spans(docs, LatticeConfig()).count()
    best = min(best, time.time() - t0)
print(json.dumps({{"cpus": cpus, "secs": best}}))
spark.stop()
"""

CONFIGS = {
    "base": {},
    "split2m": {"spark.sql.files.maxPartitionBytes": str(2 * 1024 * 1024)},
    "arrow2k": {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2000",
    },
    "arrow40k": {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "40000",
    },
    "pargc": {
        "spark.driver.extraJavaOptions": "-XX:+UseParallelGC",
    },
}


def run(cpus: int, corpus: str, conf: dict) -> float:
    script = _WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), corpus, json.dumps(conf)],
        capture_output=True, text=True, check=True,
        env={**os.environ, "PYTHONPATH": REPO, "OMP_NUM_THREADS": "1",
             "OPENBLAS_NUM_THREADS": "1", "MKL_NUM_THREADS": "1"},
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["secs"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    base = tempfile.mkdtemp(prefix="fls_ab_", dir="/dev/shm")
    corpus = f"{base}/corpus"
    subprocess.run(
        [sys.executable, "-c",
         (f"import sys; sys.path.insert(0, {REPO!r})\n"
          "from pyspark.sql import SparkSession\n"
          "from full_lattice_search_spark.datagen import synth_documents\n"
          'spark = (SparkSession.builder.master("local[32]")'
          '.config("spark.ui.enabled","false").getOrCreate())\n'
          f"synth_documents(spark, {n_docs}, seed=42, mega_every=2000,"
          f" partitions=128).write.mode('overwrite').parquet({corpus!r})\n"
          "spark.stop()\n")],
        check=True, capture_output=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )
    best: dict[tuple, float] = {}
    for r in range(rounds):
        for name, conf in CONFIGS.items():
            for cpus in (32, 8):
                t = run(cpus, corpus, conf)
                key = (name, cpus)
                best[key] = min(best.get(key, float("inf")), t)
                print(f"round {r} {name} local[{cpus}]: {t:.2f}s "
                      f"(best {best[key]:.2f})", flush=True)
    print("\n== summary (min over rounds) ==")
    for name in CONFIGS:
        t8, t32 = best[(name, 8)], best[(name, 32)]
        print(f"{name:10s} 8: {t8:6.2f}s  32: {t32:6.2f}s  "
              f"speedup {t8 / t32:.2f}x  raw-eff {(t8 / t32) / 4:.3f}")


if __name__ == "__main__":
    main()
