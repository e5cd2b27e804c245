"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

No real cluster exists in this sandbox, so the N→4N executor criterion is
evidenced by running the SAME extraction job on the SAME input at two local
parallelism levels and reporting throughput at both plus scaling efficiency
= T_4N / (4 · T_N).  Each level runs in a fresh JVM (subprocess) so
JIT/codegen state can't leak between measurements; per-level timing is
min-of-repeats after a warmup pass to suppress noisy-neighbor interference.

Two pairs are measured on this 32-vCPU (16-core SMT) host:
- 4 → 16  : clean physical-core scaling (the headline pair)
- 8 → 32  : upper pair additionally conflated with SMT siblings + JVM
            task-thread overhead — reported for transparency

Input-split sizing: the bench corpus is only tens of MB, so the default
128 MB `spark.sql.files.maxPartitionBytes` would pack it into ~8 splits and
cap parallelism below the core count — the worker lowers it to 512 KB.  (At
the 100 TB design point the data is >> cores × 128 MB and the default is
correct; this knob is purely a small-input bench artifact.)

Writes BENCH/BASELINE.md.  Usage:
  PYTHONPATH=/root/repo python scripts/scaling_bench.py [n_docs]
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, shutil, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.operators.extract import extract_spans

cpus = int(sys.argv[1]); n_docs = int(sys.argv[2]); corpus = sys.argv[3]
repeats = int(sys.argv[4])
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "48g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 * 1024))
docs = spark.read.parquet(corpus)
# tmpfs output: measure the engine, not the sandbox's disk
out = tempfile.mkdtemp(prefix="fls_scale_out_", dir="/dev/shm")
# warmup: codegen/JIT + the FULL python worker pool (one partition per
# worker slot, else the timed run pays `import pandas` per new worker)
from full_lattice_search_spark.datagen import synth_documents
warm = synth_documents(spark, cpus * 60, seed=7, mega_every=0,
                       partitions=cpus * 2)
extract_spans(warm, LatticeConfig()).count()
extract_spans(docs.limit(500), LatticeConfig()).count()
best = float("inf")
best_compute = float("inf")
for _ in range(repeats):
    t0 = time.time()
    extract_spans(docs, LatticeConfig()).write.mode("overwrite").parquet(out)
    best = min(best, time.time() - t0)
    t0 = time.time()
    extract_spans(docs, LatticeConfig()).count()
    best_compute = min(best_compute, time.time() - t0)
rows = spark.read.parquet(out).count()
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({{"cpus": cpus, "secs": best, "rows": rows,
                   "docs_per_sec": n_docs / best,
                   "compute_secs": best_compute,
                   "compute_docs_per_sec": n_docs / best_compute}}))
spark.stop()
"""


def run_level(cpus: int, n_docs: int, corpus: str, repeats: int) -> dict:
    script = _WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", script, str(cpus), str(n_docs), corpus,
         str(repeats)],
        capture_output=True,
        text=True,
        check=True,
        env={
            **os.environ,
            "PYTHONPATH": REPO,
            # one BLAS/OMP thread per python worker — the workers ARE the
            # parallelism; nested thread pools just thrash the scheduler
            "OMP_NUM_THREADS": "1",
            "OPENBLAS_NUM_THREADS": "1",
            "MKL_NUM_THREADS": "1",
        },
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 300000
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    base = tempfile.mkdtemp(prefix="fls_scale_", dir="/dev/shm")
    corpus = f"{base}/corpus"

    # materialize the shared input once (fresh JVM, not measured)
    subprocess.run(
        [
            sys.executable,
            "-c",
            (
                f"import sys; sys.path.insert(0, {REPO!r})\n"
                "from pyspark.sql import SparkSession\n"
                "from full_lattice_search_spark.datagen import synth_documents\n"
                'spark = (SparkSession.builder.master("local[32]")'
                '.config("spark.ui.enabled","false").getOrCreate())\n'
                f"synth_documents(spark, {n_docs}, seed=42, mega_every=2000,"
                f" partitions=128).write.mode('overwrite').parquet({corpus!r})\n"
                "spark.stop()\n"
            ),
        ],
        check=True,
        capture_output=True,
        env={**os.environ, "PYTHONPATH": REPO},
    )

    # Interleave the levels across rounds and keep per-level minima: the
    # host is multi-tenant, and running levels back-to-back would fold
    # machine drift into the efficiency ratio.
    results: dict[int, dict] = {}
    for _ in range(repeats):
        for cpus in (4, 16, 8, 32):
            r = run_level(cpus, n_docs, corpus, 1)
            if cpus not in results:
                results[cpus] = r
            else:
                prev = results[cpus]
                for k in ("secs", "compute_secs"):
                    prev[k] = min(prev[k], r[k])
                prev["docs_per_sec"] = n_docs / prev["secs"]
                prev["compute_docs_per_sec"] = n_docs / prev["compute_secs"]

    eff_main = results[16]["docs_per_sec"] / (4.0 * results[4]["docs_per_sec"])
    eff_smt = results[32]["docs_per_sec"] / (4.0 * results[8]["docs_per_sec"])
    eff_compute = results[16]["compute_docs_per_sec"] / (
        4.0 * results[4]["compute_docs_per_sec"]
    )

    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds"
    )

    def row(c):
        r = results[c]
        return (
            f"| local[{c}] | {r['secs']:.2f} | {r['docs_per_sec']:.0f} "
            f"| {r['compute_secs']:.2f} | {r['compute_docs_per_sec']:.0f} "
            f"| {r['rows']} |"
        )

    md = f"""# BENCH/BASELINE — scaling evidence (N vs 4N)

North-rule criterion: throughput scaling efficiency >= 0.8 going from N to
4N executors.  Sandbox proxy (per driver instruction): the same end-to-end
extraction job (read parquet → extract_spans → write parquet, plus a
compute-only count-sink variant) on the same materialized input at two
local parallelism levels, fresh JVM per level, interleaved rounds with
per-level minima (min-of-{repeats}) after warming the full python worker
pool.

Generated {stamp} by scripts/scaling_bench.py on a 32-vCPU host
(16 physical cores + SMT, multi-tenant/noisy).

| parallelism | write wall (s) | write docs/sec | compute wall (s) | compute docs/sec | rows |
|---|---|---|---|---|---|
{row(4)}
{row(16)}
{row(8)}
{row(32)}

- input: {n_docs} deterministic synthetic interleaved documents
  (`datagen.synth_documents`, seed 42, mega-doc every 2000)
- **headline pair N=4 → 4N=16 (physical cores):
  extraction-compute efficiency = {eff_compute:.3f},
  write-path efficiency = {eff_main:.3f}** (target ≥ 0.8)
- secondary pair N=8 → 4N=32: write-path efficiency = {eff_smt:.3f} — the
  upper level spans SMT siblings and contends with the JVM's own task/IO
  threads (and neighbors), so it measures SMT yield as much as engine
  scaling; reported for transparency.
- input splits: `spark.sql.files.maxPartitionBytes` lowered to 512 KB so the
  tens-of-MB bench corpus fans out past the core count (at the 100 TB design
  point the 128 MB default is correct — data >> cores × split size).  The
  write path emits one ~30 KB file per task at this scale, so its timing is
  dominated by per-file commit overhead rather than engine work — the
  compute column is the scaling-relevant measurement.
- determinism: output is bit-identical across parallelism levels
  (tests/test_extract.py::test_datagen_deterministic_across_parallelism and
  the direct-vs-salted equivalence property).

Headline single-level numbers live in BENCH_r{{N}}.json (driver-run
`bench.py`).
"""
    os.makedirs(f"{REPO}/BENCH", exist_ok=True)
    with open(f"{REPO}/BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(
        json.dumps(
            {
                "levels": results,
                "efficiency_4_to_16_write": round(eff_main, 3),
                "efficiency_4_to_16_compute": round(eff_compute, 3),
                "efficiency_8_to_32": round(eff_smt, 3),
            }
        )
    )

    import shutil

    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
