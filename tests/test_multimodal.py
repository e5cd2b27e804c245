"""Multimodal plumbing: the feature-decoder registry is the real
injection surface for decode kernels (the kernels themselves are
environment-blocked — see multimodal.py module docstring)."""

from full_lattice_search_spark.operators.multimodal import (
    N_FEATURES,
    media_features,
    register_feature_decoder,
    unregister_feature_decoder,
)
from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA


def _docs(spark):
    return spark.createDataFrame(
        [
            (
                "d1",
                [
                    ("image", None, "media://img/1", 0),
                    ("audio", None, "media://aud/1", 1),
                    ("text", "hello|0|0|0.5", None, 2),
                ],
            ),
            ("d2", [("image", None, "media://img/2", 0)]),
        ],
        DOCUMENTS_SCHEMA,
    )


def test_stub_decoder_default(spark):
    rows = media_features(_docs(spark)).collect()
    assert len(rows) == 3  # text span carries no media_ref
    assert all(len(r["features"]) == N_FEATURES for r in rows)


def test_registered_decoder_dispatches_per_kind(spark):
    """A custom kernel registered for ONE kind is applied to that kind's
    rows inside the Arrow batch while other kinds keep the stub — the
    PIL-for-images / stub-for-audio deployment shape."""

    def audio_kernel(refs):
        return [[len(r)] * N_FEATURES for r in refs]

    register_feature_decoder("audio", audio_kernel)
    try:
        rows = {
            (r["kind"], r["media_ref"]): r["features"]
            for r in media_features(_docs(spark)).collect()
        }
    finally:
        unregister_feature_decoder("audio")
    assert rows[("audio", "media://aud/1")] == [len("media://aud/1")] * (
        N_FEATURES
    )
    # image rows still use the md5 stub (hex digits, all < 16)
    assert all(v < 16 for v in rows[("image", "media://img/1")])
    # registry is a plan-time snapshot: after unregister, stub again
    rows2 = {
        r["media_ref"]: r["features"]
        for r in media_features(_docs(spark)).collect()
    }
    assert all(v < 16 for v in rows2["media://aud/1"])


def test_use_stub_false_routes_unregistered_kinds_to_real_decode(spark):
    """use_stub=False must NOT silently fall back to the md5 stub for a
    kind without a registered decoder — it goes through
    decode_media_bytes, which raises where decode libs are absent."""
    import pytest

    def audio_kernel(refs):
        return [[1] * N_FEATURES for _ in refs]

    register_feature_decoder("audio", audio_kernel)
    try:
        df = media_features(_docs(spark), use_stub=False)
        with pytest.raises(Exception, match="not installed"):
            df.collect()  # the image span has no registered decoder
    finally:
        unregister_feature_decoder("audio")


def test_wav_parser_real_roundtrip():
    """The RIFF parser must recover exactly the parameters the
    synthesizer encoded — including walking past the leading LIST chunk
    (a fixed-offset 'parser' would read garbage)."""
    import numpy as np

    from full_lattice_search_spark.functions.wav import (
        parse_wav,
        synth_wav_bytes,
        wav_pcm_features,
    )

    payload = synth_wav_bytes("media://wav/42")
    rate, channels, bits, s = parse_wav(payload)
    assert channels == 1 and bits == 16
    assert 8000 <= rate <= 8000 + 500 * 15
    assert s.dtype == np.dtype("<i2") and s.size >= 64
    # square wave: exactly two distinct values, symmetric
    vals = sorted(set(s.tolist()))
    assert len(vals) == 2 and vals[0] == -vals[1]
    feats = wav_pcm_features(payload)
    assert feats == [rate, 1, 16, s.size, s[0], s[-1], vals[1], vals[0]]


def test_wav_parser_rejects_malformed():
    import pytest

    from full_lattice_search_spark.functions.wav import (
        parse_wav,
        synth_wav_bytes,
    )

    with pytest.raises(ValueError, match="RIFF"):
        parse_wav(b"garbage-not-a-wav")
    wav = synth_wav_bytes("x")
    with pytest.raises(ValueError, match="truncated"):
        parse_wav(wav[:40])
    # non-PCM encoding flag
    bad = bytearray(wav)
    fmt_at = wav.index(b"fmt ")
    bad[fmt_at + 8] = 3  # IEEE float encoding
    with pytest.raises(ValueError, match="not PCM"):
        parse_wav(bytes(bad))


def test_wav_decoder_through_registry_end_to_end(spark):
    """register_feature_decoder('audio', wav_feature_decoder) feeds a
    REAL parse through the mapInPandas plumbing."""
    from full_lattice_search_spark.functions.wav import (
        synth_wav_bytes,
        wav_feature_decoder,
        wav_pcm_features,
    )

    register_feature_decoder("audio", wav_feature_decoder)
    try:
        rows = {
            r["media_ref"]: r["features"]
            for r in media_features(_docs(spark)).collect()
            if r["kind"] == "audio"
        }
    finally:
        unregister_feature_decoder("audio")
    want = wav_pcm_features(synth_wav_bytes("media://aud/1"))
    assert rows["media://aud/1"] == want
    assert want[0] >= 8000 and want[2] == 16
