"""Benchmark harness.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` (default 32) and
prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "docs_per_sec": ...}

The flagship number is end-to-end extraction throughput (docs/sec) over a
deterministic synthetic interleaved-docs corpus (BASELINE.json metric); the
corpus is materialized to parquet before timing so the measurement is
read → extract → write, not datagen.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_BENCH_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "20000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("fls-bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_MEM", "48g"))
        .config("spark.sql.session.timeZone", "UTC")
        # off-heap columnar buffers: at 32 slots the on-heap parquet scan
        # vectors put G1 under allocation pressure exactly while 32 python
        # workers are busy — A/B-validated in round 5 (BENCH/BASELINE.md
        # §Round-5: 32-level compute 6.8-14.1 s on-heap vs 3.8-5.1 s
        # off-heap, 6/6 interleaved rounds).  SPARK_GRAFT_OFFHEAP=0 opts out
        # for A/B measurements.
        .config(
            "spark.memory.offHeap.enabled",
            "false" if os.environ.get("SPARK_GRAFT_OFFHEAP") == "0" else "true",
        )
        .config("spark.memory.offHeap.size", "8g")
        .config(
            "spark.sql.columnVector.offheap.enabled",
            "false" if os.environ.get("SPARK_GRAFT_OFFHEAP") == "0" else "true",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from full_lattice_search_spark.config import LatticeConfig, MatchLatticeParams
    from full_lattice_search_spark.datagen import synth_documents
    from full_lattice_search_spark.functions.tokenizer import lattice_tokenize
    from full_lattice_search_spark.operators.extract import extract_spans
    from full_lattice_search_spark.operators.match import match_lattice
    from full_lattice_search_spark.plans import queries as Q

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    base = tempfile.mkdtemp(prefix="fls_bench_", dir=scratch)
    corpus_dir = f"{base}/corpus"
    out_dir = f"{base}/out"
    timings: dict[str, float] = {}

    op_queries = (
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

    try:
        # materialize the bench corpus (not timed)
        synth_documents(
            spark, N_BENCH_DOCS, seed=42, mega_every=2000, partitions=cpus * 2
        ).write.mode("overwrite").parquet(corpus_dir)
        corpus = spark.read.parquet(corpus_dir)

        # -- warmup (untimed): the first heavy query in a JVM pays codegen
        # compilation + JIT; run every query shape once at tiny scale so the
        # timed section measures steady-state throughput.
        warm_dir = "/root/testdata/sf0.001"
        warm_corpus = synth_documents(spark, 200, seed=1, mega_every=0)
        extract_spans(warm_corpus, LatticeConfig()).count()
        match_lattice(
            warm_corpus, "quick brown fox", LatticeConfig(),
            MatchLatticeParams(slop=2, include_span_score=False), top_k=10,
        ).collect()
        lattice_tokenize(warm_corpus, LatticeConfig()).count()
        for name in op_queries:
            Q.QUERIES[name](spark, warm_dir).count()

        repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

        def timed(name: str, action) -> None:
            # min over repeats: the host is multi-tenant and noisy; the
            # minimum is the least-contended (most faithful) measurement
            best = float("inf")
            for _ in range(repeats):
                t0 = time.time()
                action()
                best = min(best, time.time() - t0)
            timings[name] = best

        # q_extract: the BASELINE metric — end-to-end extraction throughput
        timed(
            "extract",
            lambda: extract_spans(corpus, LatticeConfig())
            .write.mode("overwrite")
            .parquet(out_dir),
        )
        docs_per_sec = N_BENCH_DOCS / timings["extract"]

        # compute-only twin: same plan, count sink — isolates engine work
        # from per-file commit overhead (write emits ~30 KB files at this
        # scale, so the write number under-reports the engine)
        timed(
            "extract_compute",
            lambda: extract_spans(corpus, LatticeConfig()).count(),
        )
        docs_per_sec_compute = N_BENCH_DOCS / timings["extract_compute"]

        # q_match_docs: document-scan span match over the corpus
        timed(
            "match_docs",
            lambda: match_lattice(
                corpus,
                "quick brown fox",
                LatticeConfig(),
                MatchLatticeParams(slop=2, include_span_score=False),
                top_k=10,
            ).collect(),
        )

        # q_tokenize: full token-stream expansion of the corpus
        timed(
            "tokenize", lambda: lattice_tokenize(corpus, LatticeConfig()).count()
        )

        # operator queries over the provided sf tables
        for name in op_queries:
            timed(name, lambda name=name: Q.QUERIES[name](spark, sf_dir).count())

        total = sum(timings.values())
        print(
            json.dumps(
                {
                    "metric": "end-to-end extraction + operator suite wall time",
                    "value": round(total, 3),
                    "unit": "sec",
                    "queries": {k: round(v, 3) for k, v in timings.items()},
                    "sf": sf,
                    "docs_per_sec": round(docs_per_sec, 1),
                    "docs_per_sec_compute": round(docs_per_sec_compute, 1),
                    "bench_docs": N_BENCH_DOCS,
                    "cpus": cpus,
                }
            )
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
