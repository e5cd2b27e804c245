"""Follow-on analyzer chain goldens (LatticeConfig.follow_on).

The reference composes the lattice token filter with arbitrary ES token
filters (README.md:214-230; the 5x-indexing-speed phonetic follow-on
discussion :487-493).  The engine's analog: a configurable vectorized
chain applied after truncation, shared by indexing and query analysis.
"""

import pandas as pd
import pytest

from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.functions.tokenizer import (
    _soundex_one,
    tokenize_pandas,
)


def _toks(text, config):
    out = tokenize_pandas(pd.Series(["d"]), pd.Series([[text]]), config)
    return list(out["token"])


def test_unknown_follow_on_rejected():
    with pytest.raises(ValueError, match=r"unknown follow-on filter \[porter\]"):
        LatticeConfig(follow_on=("lowercase", "porter"))


def test_default_chain_equals_legacy_lowercase():
    text = "The|0|0|0.9 QUICK|1|0|0.6"
    legacy = _toks(text, LatticeConfig())
    explicit = _toks(text, LatticeConfig(follow_on=("lowercase",)))
    assert legacy == explicit == ["the", "quick"]
    assert _toks(text, LatticeConfig(lowercase=False)) == ["The", "QUICK"]
    assert _toks(text, LatticeConfig(follow_on=())) == ["The", "QUICK"]


def test_asciifold_chain():
    text = "Áccênt|0|0|0.9 naïve|1|0|0.6 plain|2|0|0.5"
    assert _toks(
        text, LatticeConfig(follow_on=("lowercase", "asciifold"))
    ) == ["accent", "naive", "plain"]
    # order matters: asciifold before lowercase leaves case intact
    assert _toks(text, LatticeConfig(follow_on=("asciifold",))) == [
        "Accent",
        "naive",
        "plain",
    ]


def test_soundex_classic_goldens():
    # the canonical American Soundex examples (h/w transparency,
    # adjacent-code collapse, vowel separation)
    for tok, want in [
        ("Robert", "R163"),
        ("Rupert", "R163"),
        ("Ashcraft", "A261"),
        ("Ashcroft", "A261"),
        ("Tymczak", "T522"),
        ("Pfister", "P236"),
        ("Honeyman", "H555"),
    ]:
        assert _soundex_one(tok) == want, tok
    assert _soundex_one("123") == "123"  # non-alpha passes through
    assert _soundex_one("") == ""


def test_soundex_chain_matches_at_query_time():
    """Phonetic follow-on end-to-end: index and query analysis share the
    chain, so 'Rupert' finds a doc containing 'Robert'."""
    from full_lattice_search_spark.operators.match import analyze_query

    cfg = LatticeConfig(follow_on=("soundex",))
    assert _toks("Robert|0|0|0.9", cfg) == ["R163"]
    assert analyze_query("Rupert", cfg) == ["R163"]


def test_transforming_chain_disables_raw_text_prefilter(spark):
    """Regression (caught in a live drive): the doc-scan JVM substring
    prefilter probes the ANALYZED term against the RAW text — valid for
    the lowercase chain, wrong for transforming filters: with soundex,
    'Rupert' analyzes to R163 which never appears in the raw lattice
    text, so the prefilter dropped every real match.  The full
    match_lattice path must hit."""
    from full_lattice_search_spark.operators.match import match_lattice
    from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA

    cfg = LatticeConfig(follow_on=("soundex",))
    docs = spark.createDataFrame(
        [
            ("d1", [("text", "Robert|0|0|0.9 called|1|0|0.8", None, 0)]),
            ("d2", [("text", "nothing|0|0|0.5 here|1|0|0.5", None, 0)]),
        ],
        DOCUMENTS_SCHEMA,
    )
    from full_lattice_search_spark.config import MatchLatticeParams

    hits = match_lattice(
        docs, "Rupert", cfg, MatchLatticeParams(include_span_score=False)
    ).collect()
    assert [r["doc_id"] for r in hits] == ["d1"]

    # asciifold: accented raw text, folded query — same prefilter trap
    cfg2 = LatticeConfig(follow_on=("lowercase", "asciifold"))
    docs2 = spark.createDataFrame(
        [("d3", [("text", "Áccênt|0|0|0.9", None, 0)])], DOCUMENTS_SCHEMA
    )
    hits2 = match_lattice(
        docs2, "accent", cfg2, MatchLatticeParams(include_span_score=False)
    ).collect()
    assert [r["doc_id"] for r in hits2] == ["d3"]
