"""Reproduce the reference README's two published end-to-end scores.

The reference publishes exactly two composed (BM25 × payload) scores:
- audio example  `/root/reference/README.md:256-291` → max_score 36.987705
- text example   `/root/reference/README.md:330-393` → max_score 9041.438

These are the only ground truth available for A7 similarity parity
(include_span_score).  This module pins three facts (FIXTURES.md §6):

1. the engine's PAYLOAD score on both fixtures is bit-exact float32
   (300.0 audio, 20000.01171875 text) — so the entire delta between the
   engine's composed score and the reference's is the similarity factor;
2. payload × `lucene_legacy_span_similarity` (the reconstructed ES-7.3
   Lucene flavor) reproduces both published scores to < 1e-6 relative —
   the residual is float32 association order inside Lucene, not a missing
   model term;
3. the engine's native similarity differs from Lucene's by the documented
   flavor delta (sloppy-freq vs tf, norm-discounted dl, see
   bm25_scores/lucene_legacy_span_similarity docstrings) — ratio recorded
   here so a regression in either side trips the golden.
"""

import numpy as np
import pytest

from full_lattice_search_spark import LatticeConfig, MatchLatticeParams
from full_lattice_search_spark.operators.bm25 import (
    lucene_legacy_span_similarity,
)
from full_lattice_search_spark.operators.match import match_lattice
from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA

AUDIO_LATTICE = (
    "the|0|0|0.9|0.15|0.25 quick|1|0|0.6|0.25|0.5 brick|1|1|0.2|0.25|0.5 "
    "fox|2|0|0.5|1.0|1.3 box|2|1|0.09|1.0|1.3 jumped|3|0|1.0|2.0|2.5"
)
TEXT_LATTICE = (
    "the|0|0|0.9 quick|1|0|0.6 brick|1|1|0.2 "
    "fox|2|0|0.5 box|2|1|0.09 jumped|3|0|1.0"
)

REF_AUDIO_SCORE = 36.987705  # README.md:291
REF_TEXT_SCORE = 9041.438  # README.md:393

# Index statistics of the two single-doc README fixtures (derivation in
# FIXTURES.md §6): 6 tokens total (avgdl), 4 non-overlap positions (dl —
# Lucene norms discount posinc=0 lattice alternatives), every term df=1.
DL, AVGDL, N_DOCS = 4, 6.0, 1
# Span widths (total gaps inside the matched span): text 'quick jumped'
# skips one position (fox@2); audio positions quick@1, box@8, jumped@18
# (posinc floor((start-prev)/0.1) in float32) give (8-1-1)+(18-8-1)=15.
WIDTH_TEXT, WIDTH_AUDIO = 1, 15


def _hit(spark, lattice, query, config, params):
    docs = spark.createDataFrame(
        [("1", [("text", lattice, None, 0)])], DOCUMENTS_SCHEMA
    )
    rows = match_lattice(docs, query, config, params).collect()
    assert len(rows) == 1
    return rows[0]


@pytest.fixture(scope="module")
def audio_hit(spark):
    return _hit(
        spark,
        AUDIO_LATTICE,
        "quick box jumped",
        LatticeConfig(
            lattice_format="audio", audio_position_increment_seconds=0.1
        ),
        MatchLatticeParams(
            slop_seconds=2.0, in_order=True, payload_function="sum"
        ),
    )


@pytest.fixture(scope="module")
def text_hit(spark):
    return _hit(
        spark,
        TEXT_LATTICE,
        "quick jumped",
        LatticeConfig(),
        MatchLatticeParams(slop=1, in_order=True, payload_function="sum"),
    )


def test_payload_scores_bit_exact(audio_hit, text_hit):
    """Payload parity is float32-exact on both README fixtures — the
    composed-score delta is therefore ENTIRELY the similarity factor."""
    assert audio_hit["payload_score"] == 300.0
    assert text_hit["payload_score"] == 20000.01171875


@pytest.mark.parametrize(
    "hit_name,n_terms,width,ref",
    [
        ("audio_hit", 3, WIDTH_AUDIO, REF_AUDIO_SCORE),
        ("text_hit", 2, WIDTH_TEXT, REF_TEXT_SCORE),
    ],
)
def test_lucene_model_reproduces_published_scores(
    request, hit_name, n_terms, width, ref
):
    """engine payload × reconstructed Lucene similarity == published
    README max_score, to < 1e-6 relative (float32 association residue)."""
    hit = request.getfixturevalue(hit_name)
    sim = lucene_legacy_span_similarity(
        dfs=[1] * n_terms, n_docs=N_DOCS, dl=DL, avgdl=AVGDL, width=width
    )
    composed = float(
        np.float32(np.float32(hit["payload_score"]) * np.float32(sim))
    )
    assert composed == pytest.approx(ref, rel=1e-6)


@pytest.mark.parametrize(
    "lattice,query,cfg_kw,params_kw,ref",
    [
        (
            AUDIO_LATTICE,
            "quick box jumped",
            dict(
                lattice_format="audio",
                audio_position_increment_seconds=0.1,
            ),
            dict(slop_seconds=2.0),
            REF_AUDIO_SCORE,
        ),
        (TEXT_LATTICE, "quick jumped", dict(), dict(slop=1), REF_TEXT_SCORE),
    ],
)
def test_lucene_similarity_mode_reproduces_reference_end_to_end(
    spark, lattice, query, cfg_kw, params_kw, ref
):
    """similarity='lucene' end-to-end: the ENGINE ITSELF (not just the
    offline model) returns the reference's published max_score on the
    README fixtures — the A7 parity gap closed as an opt-in flavor.
    Tolerance 1e-6 relative: the residual is float32 association order
    inside Lucene internals the two published data points can't pin."""
    docs = spark.createDataFrame(
        [("1", [("text", lattice, None, 0)])], DOCUMENTS_SCHEMA
    )
    rows = match_lattice(
        docs,
        query,
        LatticeConfig(**cfg_kw),
        MatchLatticeParams(
            in_order=True,
            payload_function="sum",
            similarity="lucene",
            **params_kw,
        ),
    ).collect()
    assert len(rows) == 1
    assert rows[0]["score"] == pytest.approx(ref, rel=1e-6)


def test_lucene_mode_doc_scan_and_token_paths_agree(spark):
    """The two physical plans of similarity='lucene' (fused doc-scan
    kernel vs token-table match + stats-from-index) are one operator:
    same docs, same float32 scores."""
    from full_lattice_search_spark.datagen import synth_documents
    from full_lattice_search_spark.functions.tokenizer import (
        lattice_tokenize,
    )
    from full_lattice_search_spark.operators.match import (
        match_lattice_tokens,
    )

    docs = synth_documents(spark, 60, seed=31, mega_every=0).cache()
    toks = lattice_tokenize(docs, LatticeConfig()).cache()
    params = MatchLatticeParams(slop=6, similarity="lucene")
    key = lambda df: sorted(
        (r["doc_id"], r["score"], r["n_spans"], r["similarity"])
        for r in df.collect()
    )
    via_docs = key(
        match_lattice(docs, "quick brown", LatticeConfig(), params)
    )
    via_toks = key(
        match_lattice_tokens(toks, "quick brown", LatticeConfig(), params)
    )
    assert via_docs == via_toks
    assert len(via_docs) > 0


def test_lucene_mode_guards(spark):
    with pytest.raises(ValueError, match=r"unknown similarity"):
        MatchLatticeParams(similarity="tfidf")


def test_lucene_phrase_prefix_blended_idf(spark):
    """similarity='lucene' × phrase_prefix: the idf blends over the
    prefix expansion vocabulary.  'quick jum' expands 'jum' to the one
    matching corpus token ('jumped'), so the score must equal the
    explicit 'quick jumped' phrase query's — same statistics, same
    spans."""
    docs = spark.createDataFrame(
        [("1", [("text", TEXT_LATTICE, None, 0)])], DOCUMENTS_SCHEMA
    )
    params = MatchLatticeParams(
        slop=1, in_order=True, payload_function="sum", similarity="lucene"
    )
    via_prefix = match_lattice(
        docs, "quick jum", LatticeConfig(), params, phrase_prefix=True
    ).collect()
    via_exact = match_lattice(
        docs, "quick jumped", LatticeConfig(), params
    ).collect()
    assert len(via_prefix) == 1
    assert via_prefix[0]["score"] == via_exact[0]["score"]
    assert via_prefix[0]["score"] == pytest.approx(REF_TEXT_SCORE, rel=1e-6)


def _java_long_to_int4(i: int) -> int:
    """Faithful Lucene 8 SmallFloat.longToInt4 (util/SmallFloat.java)."""
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def _java_int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_NUM_FREE_VALUES = 255 - _java_long_to_int4(2**31 - 1)  # == 24


def _java_byte4_roundtrip(i: int) -> int:
    """byte4ToInt(intToByte4(i)) via the faithful encode/decode pair."""
    if i < _NUM_FREE_VALUES:
        return i
    enc = _NUM_FREE_VALUES + _java_long_to_int4(i - _NUM_FREE_VALUES)
    assert enc <= 255
    return _NUM_FREE_VALUES + _java_int4_to_long(enc - _NUM_FREE_VALUES)


def test_smallfloat_norm_quantization_matches_lucene():
    """Both the python helper and the SQL formula equal Lucene's
    SmallFloat.byte4ToInt(intToByte4(dl)) roundtrip — which is exact
    below 40 thanks to the NUM_FREE_VALUES=24 offset (a plain top-4-bit
    truncation would wrongly map 21->20 and 50->48)."""
    from full_lattice_search_spark.operators.bm25 import (
        smallfloat_byte4_roundtrip,
    )

    def sql_quantize(i: int) -> int:
        import math

        if i < 24:
            return i
        s = max(int(math.floor(math.log2(max(i - 24, 1)))) - 3, 0)
        return 24 + (((i - 24) >> s) << s)

    assert _NUM_FREE_VALUES == 24
    # the two counterexamples from the review
    assert _java_byte4_roundtrip(21) == 21
    assert _java_byte4_roundtrip(50) == 50
    assert _java_byte4_roundtrip(61) == 60
    for dl in list(range(0, 5000)) + [12345, 1 << 20, 2**31 - 1]:
        want = _java_byte4_roundtrip(dl)
        assert sql_quantize(dl) == want, dl
        assert smallfloat_byte4_roundtrip(dl) == want, dl


def test_engine_vs_lucene_similarity_delta_documented(audio_hit, text_hit):
    """The engine's native similarity differs from Lucene's by the flavor
    delta documented in FIXTURES.md §6.  For the text fixture the entire
    gap is the sloppy-freq factor and the norm dl: engine/Lucene =
    (tf_norm=1 vs freq/(freq+norm)) = 1.4/1.1 = 1.2727…  A change to
    either similarity that moves these ratios is a parity regression."""
    lucene_t = lucene_legacy_span_similarity(
        dfs=[1, 1], n_docs=N_DOCS, dl=DL, avgdl=AVGDL, width=WIDTH_TEXT
    )
    lucene_a = lucene_legacy_span_similarity(
        dfs=[1, 1, 1], n_docs=N_DOCS, dl=DL, avgdl=AVGDL, width=WIDTH_AUDIO
    )
    assert text_hit["similarity"] / lucene_t == pytest.approx(
        14.0 / 11.0, rel=1e-5
    )
    # audio: engine tf_norm=1 ⇒ engine sim = idf_sum; Lucene tfn =
    # (1/16)/(1/16 + 0.9) = 1/15.4, ×(k1+1)=2.2 ⇒ ratio = 15.4/2.2 = 7
    assert audio_hit["similarity"] / lucene_a == pytest.approx(
        7.0, rel=1e-5
    )


@pytest.mark.parametrize("n_fill", [48, 59])  # dl = 50 and 61
def test_lucene_norm_quantization_end_to_end(spark, n_fill):
    """similarity='lucene' on docs whose length sits in the range where
    the byte4 free-value offset matters (16-63): dl=50 must stay 50
    (pure truncation would use 48), dl=61 must quantize to 60.  The
    engine's similarity is compared against the Java-faithful model,
    which quantizes internally."""
    dl = n_fill + 2
    fill = " ".join(
        f"fill{i}|{i + 2}|0|0.5" for i in range(n_fill)
    )
    lattice = f"quick|0|0|0.5 jumped|1|0|0.5 {fill}"
    hit = _hit(
        spark,
        lattice,
        "quick jumped",
        LatticeConfig(),
        MatchLatticeParams(slop=0, in_order=True, similarity="lucene"),
    )
    want = lucene_legacy_span_similarity(
        dfs=[1, 1], n_docs=1, dl=dl, avgdl=float(dl), width=0
    )
    assert hit["similarity"] == pytest.approx(want, rel=1e-6)
    # and the quantized dl really differs from plain truncation at 61
    from full_lattice_search_spark.operators.bm25 import (
        smallfloat_byte4_roundtrip,
    )
    assert smallfloat_byte4_roundtrip(50) == 50
    assert smallfloat_byte4_roundtrip(61) == 60


def test_lucene_explain_both_paths(spark):
    """similarity='lucene' × explain=True: the per-hit span breakdown
    (reference LatticePayloadScoreQuery.java:316-326 Explanation tree)
    now carries through the lucene composition on BOTH physical paths —
    same score as the non-explain plan, span arrays consistent with the
    sloppy-freq the similarity was computed from."""
    from full_lattice_search_spark.functions.tokenizer import (
        lattice_tokenize,
    )
    from full_lattice_search_spark.operators.match import (
        match_lattice_tokens,
    )

    docs = spark.createDataFrame(
        [("1", [("text", TEXT_LATTICE, None, 0)])], DOCUMENTS_SCHEMA
    )
    params = MatchLatticeParams(
        slop=1, in_order=True, payload_function="sum", similarity="lucene"
    )
    via_docs = match_lattice(
        docs, "quick jumped", LatticeConfig(), params, explain=True
    ).collect()
    toks = lattice_tokenize(docs, LatticeConfig())
    via_toks = match_lattice_tokens(
        toks, "quick jumped", LatticeConfig(), params, explain=True
    ).collect()
    for rows in (via_docs, via_toks):
        assert len(rows) == 1
        r = rows[0]
        # explain arrays present and correct: one span quick@2..jumped@4
        # (abs_pos is 1-based: the@1 quick@2 fox@3 jumped@4)
        assert list(r["span_start"]) == [2]
        assert list(r["span_end"]) == [5]
        assert len(r["span_score"]) == 1
        # score identical to the non-explain plan == published reference
        assert r["score"] == pytest.approx(REF_TEXT_SCORE, rel=1e-6)
        # similarity consistent with the span breakdown: freq from the
        # span widths reproduces it through the reconstructed model
        k = 2
        freq_width = r["span_end"][0] - r["span_start"][0] - k
        want = lucene_legacy_span_similarity(
            dfs=[1, 1], n_docs=N_DOCS, dl=DL, avgdl=AVGDL, width=freq_width
        )
        assert r["similarity"] == pytest.approx(want, rel=1e-6)
        assert r["score"] == pytest.approx(
            float(
                np.float32(
                    np.float32(r["payload_score"])
                    * np.float32(r["similarity"])
                )
            ),
            rel=1e-7,
        )
