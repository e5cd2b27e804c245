"""Dedup operator guards (LSH band-bucket cap)."""

from __future__ import annotations


def test_lsh_band_bucket_cap(spark):
    """max_band_bucket drops degenerate (boilerplate-sized) band buckets
    before the self-join — the quadratic-blow-up guard.  Identical texts
    all share every band, so a cap below the clique size removes exactly
    those pairs and leaves genuine near-dup pairs untouched."""
    import pyspark.sql.functions as F

    from full_lattice_search_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    boiler = [(i, "lorem ipsum dolor sit amet consectetur adipiscing elit")
              for i in range(10)]
    near = " ".join(f"tok{i}" for i in range(30))
    uniq = [(100, near + " endA"), (101, near + " endB")]
    docs = spark.createDataFrame(boiler + uniq, "doc_id long, text string")
    sigs = minhash_signature(docs).cache()

    uncapped = lsh_candidate_pairs(sigs).collect()
    capped = lsh_candidate_pairs(sigs, max_band_bucket=5).collect()

    boiler_ids = set(range(10))
    assert sum(
        1 for r in uncapped
        if r["doc_a"] in boiler_ids and r["doc_b"] in boiler_ids
    ) == 45  # the 10-clique
    assert all(
        not (r["doc_a"] in boiler_ids and r["doc_b"] in boiler_ids)
        for r in capped
    )
    # the genuine near-dup pair survives the cap
    assert any(r["doc_a"] == 100 and r["doc_b"] == 101 for r in capped)
