"""Product quantization: codebook training, encoding, ADC retrieval."""

from __future__ import annotations

import numpy as np
import pytest


def _planted(spark, n_clusters=4, per=12, dim=16, seed=9):
    """Clustered corpus: cluster centers ± small noise — PQ must keep
    same-cluster vectors together."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    rows = []
    for i in range(n_clusters * per):
        c = i % n_clusters
        v = centers[c] + 0.05 * rng.normal(size=dim)
        rows.append((i, [float(x) for x in v], c))
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, cluster long"
        ),
        {i: i % n_clusters for i in range(n_clusters * per)},
    )


def test_pq_train_validation_and_shape(spark):
    from full_lattice_search_spark.operators.similarity import pq_train

    emb, _ = _planted(spark)
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(emb, m=5)
    books = pq_train(emb, m=4, k=3)
    assert len(books) == 4
    for book in books:
        assert len(book) == 3
        assert all(len(cvec) == 4 for _, cvec in book)  # dim 16 / m 4
        ids = [cid for cid, _ in book]
        assert ids == sorted(ids)


def test_pq_encode_codes_and_determinism(spark):
    from full_lattice_search_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    emb, _ = _planted(spark)
    books = pq_train(emb, m=4, k=3)
    valid = [set(cid for cid, _ in b) for b in books]
    got = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, books).collect()
    }
    assert len(got) == 48
    for codes in got.values():
        assert len(codes) == 4
        assert all(c in valid[s] for s, c in enumerate(codes))
    # deterministic under repartitioning (literal-centroid assignment)
    got2 = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb.repartition(7), books).collect()
    }
    assert got2 == got


def test_ann_pq_adc_retrieves_same_cluster(spark):
    """ADC top-k over the planted corpus: with k_codebook >= the planted
    cluster count, the estimated-dot ranking must surface same-cluster
    neighbors (the PQ recall property at adequate codebook capacity)."""
    from full_lattice_search_spark.operators.similarity import ann_pq

    emb, cluster_of = _planted(spark)
    query = emb.filter("vec_id = 0")  # cluster 0
    hits = ann_pq(
        emb.select("vec_id", "embedding"), query, m=4, k_codebook=4, k=10
    ).collect()
    assert len(hits) == 10
    assert all(r["query_id"] == 0 for r in hits)
    assert all(r["vec_id"] != 0 for r in hits)
    same = sum(1 for r in hits if cluster_of[r["vec_id"]] == 0)
    assert same >= 8, [
        (r["vec_id"], cluster_of[r["vec_id"]]) for r in hits
    ]
    # ranks are contiguous and ordering is by estimated dot desc
    assert [r["rn"] for r in hits] == list(range(1, 11))
    dots = [r["est_dot"] for r in hits]
    assert dots == sorted(dots, reverse=True)


def test_ann_ivfpq_prunes_and_retrieves(spark):
    """IVF-PQ: results come only from the probed coarse clusters, and on
    the planted corpus the composite still surfaces same-cluster
    neighbors (coarse pruning keeps the right region, ADC ranks it)."""
    from full_lattice_search_spark.operators.similarity import (
        ann_ivfpq,
        ivf_assign,
        seed_centroids,
    )

    emb_full, cluster_of = _planted(spark)
    emb = emb_full.select("vec_id", "embedding")
    query = emb.filter("vec_id = 0")
    hits = ann_ivfpq(
        emb, query, n_centroids=4, n_probe=2, m=4, k_codebook=4, k=10
    ).collect()
    assert len(hits) == 10
    # every hit belongs to one of the query's probed coarse clusters
    cents = seed_centroids(emb, 4)
    coarse = {
        r["vec_id"]: r["cluster"]
        for r in ivf_assign(emb, cents).collect()
    }
    probe_clusters = {coarse[r["vec_id"]] for r in hits}
    assert len(probe_clusters) <= 2
    # recall on the planted corpus: most hits share the query's cluster
    same = sum(1 for r in hits if cluster_of[r["vec_id"]] == 0)
    assert same >= 8


def test_ann_pq_many_matches_single_and_plans_topk(spark):
    """Batch surface: pre-trained books + pre-encoded corpus answer a
    3-query batch; the first query's top-k must equal single-query
    ann_pq (which retrains identically — determinism contract), and each
    per-query branch must plan as TakeOrderedAndProject (partial top-k +
    merge, no full sort)."""
    from full_lattice_search_spark.operators.similarity import (
        ann_pq,
        ann_pq_many,
        pq_encode,
        pq_train,
    )

    emb, _ = _planted(spark)
    books = pq_train(emb, m=4, k=4, iterations=2)
    encoded = pq_encode(emb, books)
    queries = emb.orderBy("vec_id").limit(3)
    batch = ann_pq_many(encoded, queries, books, k=5)
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = {
        (r["query_id"], r["vec_id"], r["est_dot"], r["rn"])
        for r in batch.collect()
    }
    assert len({q for q, *_ in got}) == 3
    single = {
        (r["query_id"], r["vec_id"], r["est_dot"], r["rn"])
        for r in ann_pq(
            emb, emb.orderBy("vec_id").limit(1), m=4, k_codebook=4,
            iterations=2, k=5,
        ).collect()
    }
    assert {t for t in got if t[0] == 0} == single
    with pytest.raises(ValueError, match="empty query batch"):
        ann_pq_many(encoded, queries.limit(0), books, k=5)


def test_ann_ivfpq_residual_beats_or_ties_plain_recall(spark):
    """Residual codebooks only need to span one Voronoi cell — on the
    planted-cluster corpus recall@5 vs exact brute force must not be
    WORSE than plain IVF-PQ, and the zero-residual seeds must not crash
    (the divide-by-zero regression this mode shipped with)."""
    from full_lattice_search_spark.operators.similarity import (
        ann_ivfpq,
        brute_force_topk,
    )

    emb, _ = _planted(spark)
    query = emb.orderBy("vec_id").limit(1)
    exact = {
        r["vec_id"] for r in brute_force_topk(emb, query, k=5).collect()
    }

    def recall(residual):
        got = {
            r["vec_id"]
            for r in ann_ivfpq(
                emb, query, n_centroids=4, n_probe=2, m=4, k_codebook=4,
                k=5, residual=residual,
            ).collect()
        }
        return len(got & exact) / len(exact)

    assert recall(True) >= recall(False) - 1e-9


def test_ann_ivfpq_accepts_pretrained_books(spark):
    """Passing pre-trained codebooks must skip retraining and give the
    same answer as the train-inside call (training is deterministic)."""
    from full_lattice_search_spark.operators.similarity import (
        ann_ivfpq,
        pq_train,
    )

    emb, _ = _planted(spark)
    query = emb.orderBy("vec_id").limit(1)
    books = pq_train(emb, m=4, k=4, iterations=2)
    key = lambda df: sorted(
        (r["query_id"], r["vec_id"], r["est_dot"], r["rn"])
        for r in df.collect()
    )
    a = key(ann_ivfpq(emb, query, n_centroids=4, n_probe=2, m=4,
                      k_codebook=4, k=5))
    b = key(ann_ivfpq(emb, query, n_centroids=4, n_probe=2, m=4,
                      k_codebook=4, k=5, books=books))
    assert a == b


def test_ann_pq_rerank_recall_guard(spark):
    """Regression guard for the two-stage ladder result (BENCH/
    BASELINE.md): on the planted-cluster corpus, ADC shortlist + exact
    re-rank must recover near-exact recall once the shortlist covers a
    cluster (deterministic pipeline — this value is stable, not flaky)."""
    from full_lattice_search_spark.operators.similarity import (
        ann_pq_rerank,
        brute_force_topk,
        pq_encode,
        pq_train,
    )

    emb, _ = _planted(spark)  # 4 clusters x 12 vectors
    queries = emb.orderBy("vec_id").limit(2)
    exact = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["vec_id"])
    books = pq_train(emb, m=4, k=4, iterations=2, metric="l2")
    enc = pq_encode(emb, books, metric="l2")
    approx = {}
    for r in ann_pq_rerank(
        enc, queries, books, emb, k=5, shortlist=12
    ).collect():
        approx.setdefault(r["query_id"], set()).add(r["vec_id"])
    recalls = [
        len(approx.get(q, set()) & hits) / len(hits)
        for q, hits in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_pq_l2_metric_validation_and_determinism(spark):
    from full_lattice_search_spark.operators.similarity import (
        pq_encode,
        pq_train,
    )

    emb, _ = _planted(spark)
    with pytest.raises(ValueError, match="unknown metric"):
        pq_train(emb, m=4, k=4, metric="dotx")
    books = pq_train(emb, m=4, k=4, iterations=2, metric="l2")
    with pytest.raises(ValueError, match="unknown metric"):
        pq_encode(emb, books, metric="dotx")
    a = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(emb, books, metric="l2").collect()
    )
    b = sorted(
        (r["vec_id"], tuple(r["codes"]))
        for r in pq_encode(emb.repartition(7), books, metric="l2").collect()
    )
    assert a == b


def test_ann_ivfpq_rerank_recall_and_schema(spark):
    """Three-stage composite: coarse prune -> ADC shortlist -> exact
    re-rank must beat-or-tie plain IVF-PQ recall on the planted corpus
    and emit the rerank schema (cosine, not est_dot)."""
    from full_lattice_search_spark.operators.similarity import (
        ann_ivfpq,
        brute_force_topk,
    )

    emb, _ = _planted(spark)
    query = emb.orderBy("vec_id").limit(1)
    exact = {
        r["vec_id"] for r in brute_force_topk(emb, query, k=5).collect()
    }

    def recall(df):
        got = {r["vec_id"] for r in df.collect()}
        return len(got & exact) / len(exact)

    plain = ann_ivfpq(emb, query, n_centroids=4, n_probe=2, m=4,
                      k_codebook=4, k=5)
    rr = ann_ivfpq(emb, query, n_centroids=4, n_probe=2, m=4,
                   k_codebook=4, k=5, rerank=24)
    assert "cosine" in rr.columns and "est_dot" not in rr.columns
    assert recall(rr) >= recall(plain) - 1e-9
    assert recall(rr) >= 0.8  # shortlist covers both probed clusters
