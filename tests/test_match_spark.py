"""Spark end-to-end tests: match_lattice / match_lattice_tokens over the
interleaved documents table (input_hint schema)."""

from __future__ import annotations

import pytest

from full_lattice_search_spark.config import LatticeConfig, MatchLatticeParams
from full_lattice_search_spark.functions.tokenizer import lattice_tokenize
from full_lattice_search_spark.operators.match import (
    match_lattice,
    match_lattice_tokens,
)
from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA

DOC1 = "quick|0|0|0.6 brown|1|0|0.7 fox|2|0|0.5 box|2|0|0.1 jumped|3|0|0.9"
DOC2 = "how|0|0|0.6 now|1|0|0.7 brown|2|0|0.5 yellow|2|0|0.1 cow|3|0|0.9"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        ("doc1", [("text", DOC1, None, 0), ("image", None, "img://1", 1)]),
        ("doc2", [("text", DOC2, None, 0)]),
        ("doc3", None),
        ("doc4", []),
    ]
    return spark.createDataFrame(rows, DOCUMENTS_SCHEMA).cache()


def test_lattice_tokenize_spark(docs):
    toks = lattice_tokenize(docs, LatticeConfig())
    pdf = toks.toPandas().sort_values(["doc_id", "seq"])
    d1 = pdf[pdf["doc_id"] == "doc1"]
    assert list(d1["token"]) == ["quick", "brown", "fox", "box", "jumped"]
    assert list(d1["abs_pos"]) == [1, 2, 3, 3, 4]
    assert len(pdf) == 10


@pytest.mark.parametrize(
    "query,slop,expected",
    [
        ("quick box jumped", 1, {"doc1"}),
        ("quick fox jumped", 0, set()),
        ("jumped quick", 100, set()),
        ("fox box", 100, set()),
        ("brown", 0, {"doc1", "doc2"}),
    ],
)
def test_match_lattice_docs_path(docs, query, slop, expected):
    hits = match_lattice(
        docs, query, LatticeConfig(), MatchLatticeParams(slop=slop)
    )
    got = {r["doc_id"] for r in hits.collect()}
    assert got == expected


def test_match_lattice_tokens_path(spark, docs):
    toks = lattice_tokenize(docs, LatticeConfig()).cache()
    hits = match_lattice_tokens(
        toks, "quick box jumped", LatticeConfig(), MatchLatticeParams(slop=1)
    )
    rows = hits.collect()
    assert {r["doc_id"] for r in rows} == {"doc1"}
    # both paths produce identical scores
    hits_docs = match_lattice(
        docs, "quick box jumped", LatticeConfig(), MatchLatticeParams(slop=1)
    ).collect()
    assert abs(rows[0]["score"] - hits_docs[0]["score"]) < 1e-9


def test_match_lattice_top_k(docs):
    hits = match_lattice(
        docs, "brown", LatticeConfig(), MatchLatticeParams(), top_k=1
    )
    rows = hits.collect()
    assert len(rows) == 1
    # doc1's brown has score 0.7 > doc2's 0.5
    assert rows[0]["doc_id"] == "doc1"


def test_zero_terms_query(spark, docs):
    hits = match_lattice(docs, "   ", LatticeConfig(), MatchLatticeParams())
    assert hits.count() == 0
    hits_all = match_lattice(
        docs, "   ", LatticeConfig(), MatchLatticeParams(zero_terms_query="all")
    )
    assert hits_all.count() == 4


def test_no_batch_eval_python_in_plan(docs):
    # per input_hint: no per-row Python UDFs anywhere — only Arrow-batched
    # (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) nodes allowed
    hits = match_lattice(docs, "brown", LatticeConfig(), MatchLatticeParams())
    plan = hits._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
