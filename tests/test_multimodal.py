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
