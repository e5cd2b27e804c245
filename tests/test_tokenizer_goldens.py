"""Tokenizer-chain golden tests, ported from the reference test suite
(LatticeTokenFilterTests.java, BaseLatticeTokenPartsTests.java,
AudioLatticeTokenPartsTests.java — see FIXTURES.md §2)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.functions.tokenizer import tokenize_pandas


def tok(text: str, config: LatticeConfig) -> pd.DataFrame:
    return tokenize_pandas(pd.Series(["d1"]), pd.Series([[text]]), config)


BASE = "the|0|1|0.3 quick|1|0|0.9 brick|1|1|0.01 brown|2|0|1.0 fox|3|0|0.7 box|3|1|0.2"
AUDIO = (
    "the|0|1|0.3|1.0|0 quick|1|0|0.9|2.0|0.0 brick|1|1|0.01|2.0|0.0 "
    "brown|2|0|1.0|3.5|0.0 fox|3|0|0.7|4.0|0.0 box|3|1|0.2|4.0|0.0"
)
BUCKETS = (0.9, 5, 0.5, 3, 0.2, 2)


def test_passthrough_no_delimiters():
    # LatticeTokenFilterTests.java:44-55
    out = tok("the quick brown fox", LatticeConfig())
    assert list(out["token"]) == ["the", "quick", "brown", "fox"]
    assert list(out["pos_inc"]) == [1, 1, 1, 1]
    assert out["score"].isna().all()
    assert list(out["abs_pos"]) == [1, 2, 3, 4]


def test_base_lattice():
    # LatticeTokenFilterTests.java:57-95
    out = tok(BASE, LatticeConfig())
    assert list(out["token"]) == ["the", "quick", "brick", "brown", "fox", "box"]
    assert list(out["pos_inc"]) == [1, 1, 0, 1, 1, 0]
    np.testing.assert_allclose(
        out["score"].to_numpy(),
        np.array([0.3, 0.9, 0.01, 1.0, 0.7, 0.2], dtype=np.float32),
        rtol=0,
    )
    assert list(out["abs_pos"]) == [1, 2, 2, 3, 4, 4]
    assert list(out["pos"]) == [0, 1, 1, 2, 3, 3]
    assert list(out["rank"]) == [1, 0, 1, 0, 0, 1]


def test_score_bucket_duplication():
    # LatticeTokenFilterTests.java:97-142 — buckets [0.9,5, 0.5,3, 0.2,2]
    out = tok(BASE, LatticeConfig(score_buckets=BUCKETS))
    expected_tokens = (
        ["the"] * 2 + ["quick"] * 5 + ["brick"] + ["brown"] * 5
        + ["fox"] * 3 + ["box"] * 2
    )
    assert list(out["token"]) == expected_tokens
    expected_incs = [1, 0, 1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0]
    assert list(out["pos_inc"]) == expected_incs
    # duplicates carry the original payload and the same absolute position
    the = out[out["token"] == "the"]
    assert the["score"].nunique() == 1
    assert the["abs_pos"].nunique() == 1
    box = out[out["token"] == "box"]
    assert list(box["abs_pos"]) == [4, 4]


def test_audio_increments_with_buckets():
    # LatticeTokenFilterTests.java:144-193 — incSecs=0.1
    cfg = LatticeConfig(
        lattice_format="audio",
        audio_position_increment_seconds=0.1,
        score_buckets=BUCKETS,
    )
    out = tok(AUDIO, cfg)
    firsts = out[out["pos_inc"] != 0]
    # first-emission increments: the=10, quick=10, brown=15, fox=5
    # (brick and box are pos_inc 0 — same lattice position)
    assert list(firsts["token"]) == ["the", "quick", "brown", "fox"]
    assert list(firsts["pos_inc"]) == [10, 10, 15, 5]
    counts = out["token"].value_counts()
    assert counts["the"] == 2 and counts["quick"] == 5
    assert counts["brick"] == 1 and counts["brown"] == 5
    assert counts["fox"] == 3 and counts["box"] == 2


def test_parts_parsing_base():
    # BaseLatticeTokenPartsTests.java:24-65
    out = tok("cat|3|10|0.5", LatticeConfig())
    row = out.iloc[0]
    assert row["token"] == "cat"
    assert row["pos"] == 3 and row["rank"] == 10
    assert np.float32(row["score"]) == np.float32(0.5)


def test_audio_parts_and_float32_floor():
    # AudioLatticeTokenPartsTests.java:24-75 — the float32 artifact:
    # floor((2.28f - 1.26f) / 0.01f) == 102, not the float64 answer 101.
    cfg = LatticeConfig(
        lattice_format="audio", audio_position_increment_seconds=0.01
    )
    out = tok("cat|3|10|0.5|1.26|2.27 dog|4|0|0.5|2.28|3.0", cfg)
    assert np.float32(out.iloc[0]["start_t"]) == np.float32(1.26)
    assert np.float32(out.iloc[0]["stop_t"]) == np.float32(2.27)
    assert out.iloc[1]["pos_inc"] == 102

    cfg01 = LatticeConfig(
        lattice_format="audio", audio_position_increment_seconds=0.1
    )
    out01 = tok("cat|3|10|0.5|1.26|2.27 dog|4|0|0.5|2.28|3.0", cfg01)
    assert out01.iloc[1]["pos_inc"] == 10


def test_same_pos_audio_inc_zero():
    cfg = LatticeConfig(
        lattice_format="audio", audio_position_increment_seconds=0.1
    )
    out = tok("cat|3|10|0.5|1.26|2.27 dog|3|1|0.5|2.28|3.0", cfg)
    assert out.iloc[1]["pos_inc"] == 0


def test_partial_delimiters_raise():
    with pytest.raises(ValueError, match="failed to parse"):
        tok("cat|3|10", LatticeConfig())


def test_multi_value_position_gap():
    # mapper default position_increment_gap=100: second value's first token
    # lands gap+1 past the previous absolute position
    cfg = LatticeConfig()
    out = tokenize_pandas(
        pd.Series(["d1"]),
        pd.Series([["a|0|0|0.5 b|1|0|0.5", "c|0|0|0.5"]]),
        cfg,
    )
    assert list(out["token"]) == ["a", "b", "c"]
    assert list(out["abs_pos"]) == [1, 2, 103]


def test_lowercase_follow_on():
    out = tok("The|0|0|0.5 QUICK|1|0|0.5", LatticeConfig())
    assert list(out["token"]) == ["the", "quick"]
    out2 = tok("The|0|0|0.5", LatticeConfig(lowercase=False))
    assert list(out2["token"]) == ["The"]


def test_multiple_docs_state_isolation():
    cfg = LatticeConfig()
    out = tokenize_pandas(
        pd.Series(["d1", "d2"]),
        pd.Series([["a|0|0|0.5 b|1|0|0.5"], ["x|0|0|0.9"]]),
        cfg,
    )
    d2 = out[out["doc_id"] == "d2"]
    assert list(d2["pos_inc"]) == [1]
    assert list(d2["abs_pos"]) == [1]
    assert list(d2["seq"]) == [0]


def test_custom_delimiter():
    cfg = LatticeConfig(field_delimiter="#")
    out = tok("cat#3#10#0.5", cfg)
    assert out.iloc[0]["token"] == "cat"
    assert out.iloc[0]["pos"] == 3
