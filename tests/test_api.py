"""ES-style DSL façade: parse/serialize goldens from
MatchLatticeQueryBuilderTests.java (testFromSimpleJson :129-153,
testFromJson :155-178, testIllegalValues :114-120) and an end-to-end
search over the yml fixture docs."""

from __future__ import annotations

import pytest

from full_lattice_search_spark.api import parse_match_lattice, search
from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA

SIMPLE = {"match_lattice": {"message": "this is a test"}}

# the reference's canonical serialized form of SIMPLE (defaults golden)
SIMPLE_EXPECTED = {
    "match_lattice": {
        "message": {
            "query": "this is a test",
            "slop": 0,
            "slop_seconds": 3.0,
            "zero_terms_query": "NONE",
            "in_order": True,
            "include_span_score": True,
            "payload_function": "sum",
            "payload_length_norm_factor": 1.0,
            "boost": 1.0,
        }
    }
}

FULL = {
    "match_lattice": {
        "message": {
            "query": "this is a test",
            "slop": 2,
            "slop_seconds": 14.8,
            "zero_terms_query": "ALL",
            "in_order": False,
            "include_span_score": False,
            "payload_function": "max",
            "payload_length_norm_factor": 0.5,
            "boost": 1.0,
        }
    }
}


def test_simple_json_defaults_golden():
    parsed = parse_match_lattice(SIMPLE)
    assert parsed.to_dict() == SIMPLE_EXPECTED


def test_full_json_roundtrip():
    parsed = parse_match_lattice(FULL)
    assert parsed.to_dict() == FULL
    assert parsed.query == "this is a test"
    assert parsed.params.slop == 2
    assert parsed.params.zero_terms_query == "all"
    assert parsed.params.payload_function == "max"


def test_illegal_values():
    with pytest.raises(ValueError, match=r"requires fieldName"):
        parse_match_lattice({"match_lattice": {}})
    with pytest.raises(ValueError, match=r"requires query value"):
        parse_match_lattice({"match_lattice": {"message": {"slop": 1}}})
    with pytest.raises(ValueError, match=r"does not support \[frob\]"):
        parse_match_lattice({"match_lattice": {"m": {"query": "x", "frob": 1}}})
    with pytest.raises(ValueError, match=r"multiple fields"):
        parse_match_lattice({"match_lattice": {"a": "x", "b": "y"}})
    with pytest.raises(ValueError, match=r"Unsupported zero_terms_query"):
        parse_match_lattice(
            {"match_lattice": {"m": {"query": "x", "zero_terms_query": "meh"}}}
        )
    with pytest.raises(ValueError, match=r"analyzer \[bogusAnalyzer\] not found"):
        parse_match_lattice(
            {"match_lattice": {"m": {"query": "x", "analyzer": "bogusAnalyzer"}}}
        )


DOC1 = "quick|0|0|0.6 brown|1|0|0.7 fox|2|0|0.5 box|2|0|0.1 jumped|3|0|0.9"
DOC2 = "how|0|0|0.6 now|1|0|0.7 brown|2|0|0.5 yellow|2|0|0.1 cow|3|0|0.9"


def test_search_similarity_setting(spark):
    """The per-index similarity setting flows through the facade: on the
    README text fixture, similarity='lucene' returns the reference's
    published max_score (9041.438) while the default engine flavor
    scores the same doc differently."""
    from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA

    TEXT = (
        "the|0|0|0.9 quick|1|0|0.6 brick|1|1|0.2 "
        "fox|2|0|0.5 box|2|1|0.09 jumped|3|0|1.0"
    )
    docs = spark.createDataFrame(
        [("1", [("text", TEXT, None, 0)])], DOCUMENTS_SCHEMA
    )
    body = {"match_lattice": {"spans": {"query": "quick jumped", "slop": 1}}}
    lucene = search(docs, body, LatticeConfig(), similarity="lucene")
    assert lucene["hits"]["max_score"] == pytest.approx(9041.438, rel=1e-6)
    engine = search(docs, body, LatticeConfig())
    assert engine["hits"]["max_score"] != lucene["hits"]["max_score"]


def test_search_end_to_end(spark):
    docs = spark.createDataFrame(
        [
            ("doc1", [("text", DOC1, None, 0)]),
            ("doc2", [("text", DOC2, None, 0)]),
        ],
        DOCUMENTS_SCHEMA,
    )
    body = {
        "match_lattice": {
            "field": {
                "query": "quick box jumped",
                "slop": 1,
                "include_span_score": False,
            }
        }
    }
    resp = search(docs, body, LatticeConfig(), size=5)
    assert resp["hits"]["total"]["value"] == 1
    assert resp["hits"]["hits"][0]["_id"] == "doc1"
    assert resp["hits"]["max_score"] == resp["hits"]["hits"][0]["_score"]

    # default body (include_span_score=TRUE): composed ranking end-to-end
    resp2 = search(
        docs, {"match_lattice": {"field": "brown"}}, LatticeConfig(), size=5
    )
    assert resp2["hits"]["total"]["value"] == 2
    assert resp2["hits"]["hits"][0]["_score"] >= resp2["hits"]["hits"][1]["_score"]
