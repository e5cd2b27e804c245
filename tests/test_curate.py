"""Curation pipeline: extract → quality filter → dedup, end to end."""

from __future__ import annotations

import pytest

from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.operators.curate import curate_documents
from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA

GOOD = (
    "alpha|0|0|0.9 beta|1|0|0.8 gamma|2|0|0.7 delta|3|0|0.9 "
    "epsilon|4|0|0.6 zeta|5|0|0.9 eta|6|0|0.8 theta|7|0|0.7"
)
GOOD2 = (
    "kappa|0|0|0.9 lam|1|0|0.8 mu|2|0|0.7 nu|3|0|0.9 "
    "xi|4|0|0.6 pi|5|0|0.9 rho|6|0|0.8 sigma|7|0|0.7"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("a-good", [("text", GOOD, None, 0)]),
        ("b-dup-of-a", [("text", GOOD, None, 0)]),       # exact dup
        ("c-good2", [("text", GOOD2, None, 0)]),
        ("d-short", [("text", "one|0|0|0.5", None, 0)]),  # too few tokens
        ("e-media-only", [("image", None, "m://x", 0)]),  # empty text
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA).cache()


def test_curate_exact(corpus):
    kept = curate_documents(
        corpus, LatticeConfig(), min_quality=0.0, min_tokens=3, dedup="exact"
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    # dup dropped (keep lexically-min id), short + media-only filtered
    assert ids == ["a-good", "c-good2"]
    row = kept.filter("doc_id = 'a-good'").collect()[0]
    assert row["text"].startswith("alpha beta gamma")
    assert row["n_tokens"] == 8


def test_curate_minhash_drops_near_dups(spark):
    base = " ".join(f"tok{i}|{i}|0|0.9" for i in range(30))
    near = " ".join(f"tok{i}|{i}|0|0.9" for i in range(28))  # drop last 2
    docs = spark.createDataFrame(
        [
            ("a", [("text", base, None, 0)]),
            ("b", [("text", near, None, 0)]),
            ("c", [("text", " ".join(f"other{i}|{i}|0|0.9" for i in range(30)), None, 0)]),
        ],
        DOCUMENTS_SCHEMA,
    )
    kept = curate_documents(
        docs, LatticeConfig(), min_quality=0.0, min_tokens=3, dedup="minhash"
    )
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == ["a", "c"]


def test_curate_none_keeps_dups(corpus):
    kept = curate_documents(
        corpus, LatticeConfig(), min_quality=0.0, min_tokens=3, dedup="none"
    )
    assert kept.count() == 3


def test_curate_bad_mode(corpus):
    with pytest.raises(ValueError, match="unknown dedup mode"):
        curate_documents(corpus, dedup="fuzzy")


def test_curate_minhash_cc_keeps_one_per_component(spark):
    """'minhash_cc' keeps exactly one document per transitive near-dup
    component.  The pair-greedy 'minhash' mode can only under-drop
    (a member whose neighbors are all larger survives), so the cc
    survivor set is always a subset of the greedy one."""
    from full_lattice_search_spark.datagen import synth_documents
    from full_lattice_search_spark.operators.curate import curate_documents

    docs = synth_documents(spark, 80, seed=41, mega_every=0)
    greedy = {
        r["doc_id"]
        for r in curate_documents(docs, dedup="minhash").collect()
    }
    cc = {
        r["doc_id"]
        for r in curate_documents(docs, dedup="minhash_cc").collect()
    }
    assert cc, "cc mode returned nothing"
    assert cc <= greedy  # cc only removes additional transitive members
