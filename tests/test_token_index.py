"""Materialized token index: partition pruning + result parity with the
direct document-scan path."""

from __future__ import annotations

import pytest

from full_lattice_search_spark.config import LatticeConfig, MatchLatticeParams
from full_lattice_search_spark.datagen import synth_documents
from full_lattice_search_spark.operators.match import match_lattice
from full_lattice_search_spark.sources.token_index import (
    match_lattice_indexed,
    write_token_index,
)


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("index") / "tokens")
    docs = synth_documents(spark, 60, seed=13, mega_every=0)
    write_token_index(docs, path, LatticeConfig(), n_token_buckets=16)
    return path


def test_indexed_match_parity_with_scan(spark, index_path):
    docs = synth_documents(spark, 60, seed=13, mega_every=0)
    params = MatchLatticeParams(slop=3)
    direct = {
        (r["doc_id"], round(r["score"], 6), r["n_spans"])
        for r in match_lattice(docs, "the quick", LatticeConfig(), params).collect()
    }
    indexed = {
        (r["doc_id"], round(r["score"], 6), r["n_spans"])
        for r in match_lattice_indexed(
            spark, index_path, "the quick", LatticeConfig(), params,
            n_token_buckets=16,
        ).collect()
    }
    assert indexed == direct
    assert len(indexed) > 0


def test_indexed_lucene_similarity_parity_with_scan(spark, index_path):
    """similarity='lucene' over the PRUNED index: per-doc lengths come
    from the persisted doclen stats table (dl + dl_norm), per-term df
    from the term's own bucket — results must equal the full doc-scan
    path bit-for-bit."""
    docs = synth_documents(spark, 60, seed=13, mega_every=0)
    params = MatchLatticeParams(slop=3, similarity="lucene")
    key = lambda rows: sorted(
        (r["doc_id"], r["score"], r["n_spans"], r["similarity"])
        for r in rows
    )
    direct = key(
        match_lattice(docs, "the quick", LatticeConfig(), params).collect()
    )
    indexed = key(
        match_lattice_indexed(
            spark, index_path, "the quick", LatticeConfig(), params,
            n_token_buckets=16,
        ).collect()
    )
    assert indexed == direct
    assert len(indexed) > 0


def test_index_scan_prunes_partitions(spark, index_path):
    hits = match_lattice_indexed(
        spark, index_path, "quick", LatticeConfig(), MatchLatticeParams(),
        n_token_buckets=16,
    )
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "token_bucket" in plan.split("PartitionFilters")[1][:200]
    # rowgroup-level pushdown still applies within the bucket
    assert "PushedFilters" in plan


def test_read_source_dispatch(spark, tmp_path):
    """catalog.read_source: parquet paths read directly; iceberg:/table:
    specs route to the catalog reader (format check only — no Iceberg
    runtime in this sandbox)."""
    import pytest as _pytest

    from full_lattice_search_spark.datagen import synth_documents
    from full_lattice_search_spark.sources.catalog import read_source

    p = str(tmp_path / "docs")
    synth_documents(spark, 5, seed=1, mega_every=0).write.parquet(p)
    assert read_source(spark, p).count() == 5
    # iceberg spec must reach the iceberg data source (absent here → error
    # mentioning the format/table, not a parquet fallback)
    with _pytest.raises(Exception):
        read_source(spark, "iceberg:db.docs").count()
    with _pytest.raises(Exception):
        read_source(spark, "table:no_such_table").count()


def test_bucketed_table_removes_match_exchange(spark, tmp_path):
    """A token table bucketed+sorted by doc_id makes the match path
    shuffle-free (the 100 TB index layout): no Exchange in the plan, and
    hits identical to the shuffling path."""
    import pyspark.sql.functions as F

    from full_lattice_search_spark.config import (
        LatticeConfig,
        MatchLatticeParams,
    )
    from full_lattice_search_spark.functions.tokenizer import lattice_tokenize
    from full_lattice_search_spark.operators.match import match_lattice_tokens

    docs = synth_documents(spark, 60, seed=31, mega_every=0)
    toks = lattice_tokenize(docs, LatticeConfig())
    spark.sql("DROP TABLE IF EXISTS toks_bucketed")
    (
        toks.write.bucketBy(4, "doc_id")
        .sortBy("doc_id", "abs_pos", "seq")
        .mode("overwrite")
        .saveAsTable("toks_bucketed")
    )
    try:
        bucketed = spark.table("toks_bucketed")
        params = MatchLatticeParams(slop=3, include_span_score=False)
        fast = match_lattice_tokens(
            bucketed, "the quick", LatticeConfig(), params,
            assume_doc_clustered=True,
        )
        plan = fast._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        slow = match_lattice_tokens(
            bucketed, "the quick", LatticeConfig(), params
        )
        key = lambda df: sorted(
            (r["doc_id"], round(r["score"], 6), r["n_spans"])
            for r in df.collect()
        )
        got = key(fast)
        assert got == key(slow)
        assert len(got) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS toks_bucketed")


def test_indexed_phrase_prefix_parity_with_scan(spark, index_path):
    """phrase_prefix over the pruned index: expansion buckets resolved
    from the vocab table must make the span DP see every prefix-matching
    token's postings — results equal the full doc-scan path."""
    docs = synth_documents(spark, 60, seed=13, mega_every=0)
    params = MatchLatticeParams(slop=3)
    key = lambda rows: sorted(
        (r["doc_id"], round(r["score"], 6), r["n_spans"]) for r in rows
    )
    direct = key(
        match_lattice(
            docs, "the qu", LatticeConfig(), params, phrase_prefix=True
        ).collect()
    )
    indexed = key(
        match_lattice_indexed(
            spark, index_path, "the qu", LatticeConfig(), params,
            n_token_buckets=16, phrase_prefix=True,
        ).collect()
    )
    assert indexed == direct
    assert len(indexed) > 0


def test_indexed_lucene_phrase_prefix_parity_with_scan(spark, index_path):
    """similarity='lucene' × phrase_prefix over the PRUNED index — the
    combination that used to raise: the expansion idf blend now reads
    document frequencies from the vocab table and must equal the full
    doc-scan path bit-for-bit."""
    docs = synth_documents(spark, 60, seed=13, mega_every=0)
    params = MatchLatticeParams(slop=3, similarity="lucene")
    key = lambda rows: sorted(
        (r["doc_id"], r["score"], r["n_spans"], r["similarity"])
        for r in rows
    )
    direct = key(
        match_lattice(
            docs, "the qu", LatticeConfig(), params, phrase_prefix=True
        ).collect()
    )
    indexed = key(
        match_lattice_indexed(
            spark, index_path, "the qu", LatticeConfig(), params,
            n_token_buckets=16, phrase_prefix=True,
        ).collect()
    )
    assert indexed == direct
    assert len(indexed) > 0


def test_lucene_prefix_pruned_without_vocab_still_raises(spark, index_path):
    """The guard survives for callers that hand match_lattice_tokens a
    pruned view + doclen but NO vocab — silently-wrong idf blends must
    stay impossible."""
    import pyspark.sql.functions as F

    from full_lattice_search_spark.operators.match import (
        match_lattice_tokens,
    )

    tokens = spark.read.parquet(index_path).filter(
        F.col("token_bucket") == 0
    )
    doclen = spark.read.parquet(f"{index_path}_doclen")
    with pytest.raises(ValueError, match="vocab"):
        match_lattice_tokens(
            tokens, "the qu", LatticeConfig(),
            MatchLatticeParams(slop=3, similarity="lucene"),
            phrase_prefix=True, doclen=doclen,
        )
