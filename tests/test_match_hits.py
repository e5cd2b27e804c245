"""Span-match hit-count golden tests, ported from the reference's REST
integration suite (rest-api-spec/test/lattice_query/20_tests.yml — see
FIXTURES.md §3).  Pandas-level (fast) here; Spark e2e in test_match_spark.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from full_lattice_search_spark.config import LatticeConfig, MatchLatticeParams
from full_lattice_search_spark.functions.tokenizer import tokenize_pandas
from full_lattice_search_spark.operators.match import (
    analyze_query,
    match_tokens_pandas,
)

DOC1 = "quick|0|0|0.6 brown|1|0|0.7 fox|2|0|0.5 box|2|0|0.1 jumped|3|0|0.9"
DOC2 = "how|0|0|0.6 now|1|0|0.7 brown|2|0|0.5 yellow|2|0|0.1 cow|3|0|0.9"

AUDIO_DOC = (
    "quick|0|0|1.0|0.0|0.5 brown|1|0|1.0|1.5|1.7 fox|2|0|1.0|2.5|3.0 "
    "box|2|0|1.0|2.5|3.0 jumped|3|0|1.0|3.0|3.7"
)


def run_query(docs, query, config, params):
    doc_ids = pd.Series([f"doc{i+1}" for i in range(len(docs))])
    values = pd.Series([[d] for d in docs])
    toks = tokenize_pandas(doc_ids, values, config)
    terms = analyze_query(query, config)
    slop = params.effective_slop(config, len(terms))
    return match_tokens_pandas(
        toks,
        terms,
        slop,
        params.in_order,
        params.payload_function,
        params.payload_length_norm_factor,
    )


@pytest.mark.parametrize(
    "query,slop,expected_hits",
    [
        ("quick box jumped", 1, 1),  # 20_tests.yml:48-50
        ("quick fox jumped", 0, 0),  # :59-61 (gap 1 > slop 0)
        ("jumped quick", 100, 0),  # :70-72 (out of order)
        ("fox box", 100, 0),  # :81-83 (same position)
        ("quick brown fox", 0, 1),
        ("brown", 0, 2),  # single term, both docs
    ],
)
def test_base_format_hits(query, slop, expected_hits):
    cfg = LatticeConfig()
    params = MatchLatticeParams(slop=slop, in_order=True)
    hits = run_query([DOC1, DOC2], query, cfg, params)
    assert len(hits) == expected_hits


@pytest.mark.parametrize(
    "query,slop_seconds,inc_secs,expected_hits",
    [
        ("quick brown fox jumped", 3.0, 0.5, 1),  # :164-170
        ("quick brown fox jumped", 2.9, 0.5, 0),  # :175-181
        ("quick brown fox jumped", 3.0, 0.1, 1),  # :183-189
        ("quick brown fox jumped", 2.9, 0.1, 0),  # :191-197
        ("quick fox jumped", 3.0, 0.5, 1),  # :199-205
        ("quick box jumped", 2.9, 0.5, 0),  # :207-213
        ("quick box jumped", 3.0, 0.1, 1),  # :215-221
        ("quick fox jumped", 2.9, 0.1, 0),  # :223-229
        ("quick jumped", 3.0, 0.5, 1),  # :231-237
        ("quick jumped", 2.9, 0.5, 0),  # :239-245
        ("quick jumped", 3.0, 0.1, 1),  # :247-253
        ("quick jumped", 2.9, 0.1, 0),  # :255-261
        ("jumped quick", 4000.0, 0.1, 0),  # :263-269 (order)
        ("fox box", 4000.0, 0.1, 0),  # :271-277 (same position)
    ],
)
def test_audio_format_hits(query, slop_seconds, inc_secs, expected_hits):
    cfg = LatticeConfig(
        lattice_format="audio", audio_position_increment_seconds=inc_secs
    )
    params = MatchLatticeParams(slop_seconds=slop_seconds, in_order=True)
    hits = run_query([AUDIO_DOC], query, cfg, params)
    assert len(hits) == expected_hits


def test_seconds_to_slop_conversion():
    # slop = floor(slop_seconds/incSecs) - (numTerms-2) - 1
    # (MatchLatticeQueryBuilder.java:349-354)
    cfg = LatticeConfig(
        lattice_format="audio", audio_position_increment_seconds=0.5
    )
    p = MatchLatticeParams(slop_seconds=3.0)
    assert p.effective_slop(cfg, 4) == 3
    assert p.effective_slop(cfg, 2) == 5
    cfg01 = LatticeConfig(
        lattice_format="audio", audio_position_increment_seconds=0.1
    )
    assert MatchLatticeParams(slop_seconds=3.0).effective_slop(cfg01, 4) == 27


def test_graph_query_rejected():
    cfg = LatticeConfig()
    with pytest.raises(ValueError, match="graph queries"):
        analyze_query("a|0|0|0.5 b|0|1|0.4", cfg)


def test_zero_terms():
    cfg = LatticeConfig()
    assert analyze_query("   ", cfg) == []


def test_score_bucket_duplication_inflates_sum_score():
    # the term-frequency hack: duplicated tokens → more enumerated spans →
    # larger sum score (README.md:475-499)
    cfg_plain = LatticeConfig()
    cfg_dup = LatticeConfig(score_buckets=(0.5, 4,))
    params = MatchLatticeParams(slop=0, payload_function="sum")
    h1 = run_query([DOC1], "jumped", cfg_plain, params)
    h2 = run_query([DOC1], "jumped", cfg_dup, params)
    assert len(h1) == len(h2) == 1
    assert h2.iloc[0]["n_spans"] == 4 * h1.iloc[0]["n_spans"]
    assert h2.iloc[0]["score"] > h1.iloc[0]["score"] * 3.5


def test_enumeration_forward_only():
    # doc "a b a b": ordered query (a b) slop 10 → exactly 2 matches
    # (Lucene subspan iterators never rewind)
    cfg = LatticeConfig()
    toks = tokenize_pandas(
        pd.Series(["d"]),
        pd.Series([["a|0|0|0.5 b|1|0|0.5 a|2|0|0.5 b|3|0|0.5"]]),
        cfg,
    )
    hits = match_tokens_pandas(toks, ["a", "b"], 10, True, "sum", 1.0)
    assert hits.iloc[0]["n_spans"] == 2


def test_unordered_match():
    cfg = LatticeConfig()
    toks = tokenize_pandas(
        pd.Series(["d"]),
        pd.Series([["b|0|0|0.5 a|1|0|0.5"]]),
        cfg,
    )
    ordered = match_tokens_pandas(toks, ["a", "b"], 5, True, "sum", 1.0)
    unordered = match_tokens_pandas(toks, ["a", "b"], 5, False, "sum", 1.0)
    assert len(ordered) == 0
    assert len(unordered) == 1


def test_sum_score_value_single_term():
    # single term 'jumped' score 0.9, span width 1, lenNorm 1.0:
    # exp(log(1e5) + log(0.9) - log(1)) = 90000
    cfg = LatticeConfig()
    params = MatchLatticeParams(payload_function="sum")
    hits = run_query([DOC1], "jumped", cfg, params)
    assert abs(hits.iloc[0]["score"] - 90000.0) < 10.0
