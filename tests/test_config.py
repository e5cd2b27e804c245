"""Config validation + serialization round-trips (the analog of the
reference's randomized query-builder round-trip tests,
MatchLatticeQueryBuilderTests.java — SURVEY.md §5.2)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from full_lattice_search_spark.config import LatticeConfig, MatchLatticeParams


def test_defaults_golden():
    # MatchLatticeQueryBuilderTests.java:136-150
    p = MatchLatticeParams()
    assert p.slop == 0
    assert p.slop_seconds == 3.0
    assert p.in_order is True
    assert p.include_span_score is True
    assert p.payload_function == "sum"
    assert p.payload_length_norm_factor == 1.0
    assert p.zero_terms_query == "none"
    assert p.boost == 1.0
    c = LatticeConfig()
    assert c.field_delimiter == "|"
    assert c.audio_position_increment_seconds == 0.01
    assert c.position_increment_gap == 100


@pytest.mark.parametrize(
    "kwargs,msg",
    [
        (dict(lattice_format="video"), "invalid lattice_format"),
        (dict(field_delimiter="||"), "single character"),
        (dict(score_buckets=(0.5,)), "even number"),
        (dict(score_buckets=(1.5, 2)), "outside"),
        (dict(score_buckets=(0.5, 0)), "must be an int >= 1"),
    ],
)
def test_config_validation(kwargs, msg):
    with pytest.raises(ValueError, match=msg):
        LatticeConfig(**kwargs)


@pytest.mark.parametrize(
    "kwargs,msg",
    [
        (dict(payload_function="avg"), "unknown payload_function"),
        (dict(zero_terms_query="some"), "invalid zero_terms_query"),
    ],
)
def test_params_validation(kwargs, msg):
    with pytest.raises(ValueError, match=msg):
        MatchLatticeParams(**kwargs)


@given(
    fmt=st.sampled_from(["lattice", "audio"]),
    delim=st.sampled_from(["|", "#", "/"]),
    inc=st.floats(0.001, 1.0, allow_nan=False),
    buckets=st.lists(
        st.tuples(
            st.floats(0.0, 1.0, allow_nan=False), st.integers(1, 9)
        ),
        max_size=3,
    ),
    lower=st.booleans(),
)
@settings(max_examples=50, deadline=None)
def test_config_json_roundtrip(fmt, delim, inc, buckets, lower):
    flat = tuple(x for pair in buckets for x in pair)
    cfg = LatticeConfig(
        lattice_format=fmt,
        field_delimiter=delim,
        audio_position_increment_seconds=inc,
        score_buckets=flat,
        lowercase=lower,
    )
    assert LatticeConfig.from_json(cfg.to_json()) == cfg


@given(
    slop=st.integers(0, 100),
    secs=st.floats(0.1, 100.0, allow_nan=False),
    in_order=st.booleans(),
    pf=st.sampled_from(["sum", "max", "min"]),
    ln=st.floats(0.0, 2.0, allow_nan=False),
    ztq=st.sampled_from(["none", "all"]),
)
@settings(max_examples=50, deadline=None)
def test_params_json_roundtrip(slop, secs, in_order, pf, ln, ztq):
    p = MatchLatticeParams(
        slop=slop,
        slop_seconds=secs,
        in_order=in_order,
        payload_function=pf,
        payload_length_norm_factor=ln,
        zero_terms_query=ztq,
    )
    assert MatchLatticeParams.from_json(p.to_json()) == p
