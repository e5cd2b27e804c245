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


def test_ppm_parser_real_roundtrip():
    """The P6 parser must recover exactly what the synthesizer encoded —
    including tokenizing past the comment line between magic and
    dimensions (a fixed-layout 'parser' would misread the header)."""
    import hashlib

    import numpy as np

    from full_lattice_search_spark.functions.ppm import (
        parse_ppm,
        ppm_features,
        synth_ppm_bytes,
    )

    ref = "media://img/42"
    payload = synth_ppm_bytes(ref)
    w, h, maxval, px = parse_ppm(payload)
    d = [int(c, 16) for c in hashlib.md5(ref.encode()).hexdigest()]
    assert (w, h, maxval) == (4 + d[0], 4 + d[1], 255)
    base = 16 * d[2] + d[3]
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    want = ((base + 7 * x + 13 * y + 29 * c) % 256).astype(np.uint8)
    assert np.array_equal(px, want)
    v = want.ravel()
    assert ppm_features(payload) == [
        w, h, 255, v.size, int(v[0]), int(v[-1]), int(v.max()), int(v.min())
    ]


def test_ppm_parser_rejects_malformed():
    import pytest

    from full_lattice_search_spark.functions.ppm import (
        parse_ppm,
        synth_ppm_bytes,
    )

    with pytest.raises(ValueError, match="P6"):
        parse_ppm(b"P3\n2 2\n255\n...")  # ASCII PPM is a different format
    good = synth_ppm_bytes("x")
    with pytest.raises(ValueError, match="truncated raster"):
        parse_ppm(good[:-5])
    with pytest.raises(ValueError, match="maxval"):
        parse_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with pytest.raises(ValueError, match="expected integer"):
        parse_ppm(b"P6\nnope\n")


def test_nearest_resize_golden():
    """2x2 -> 4x4 nearest-neighbor: each source pixel becomes a 2x2
    block (floor index mapping)."""
    import numpy as np

    from full_lattice_search_spark.functions.ppm import nearest_resize

    src = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    out = nearest_resize(src, 4, 4)
    assert out.shape == (4, 4, 3)
    for ty in range(4):
        for tx in range(4):
            assert np.array_equal(out[ty, tx], src[ty // 2, tx // 2])
    # downscale picks the floor-mapped source rows/cols
    down = nearest_resize(src, 1, 1)
    assert np.array_equal(down[0, 0], src[0, 0])


def test_ppm_decoder_through_registry_end_to_end(spark):
    from full_lattice_search_spark.functions.ppm import (
        ppm_feature_decoder,
        ppm_features,
        synth_ppm_bytes,
    )

    register_feature_decoder("image", ppm_feature_decoder)
    try:
        rows = {
            r["media_ref"]: r["features"]
            for r in media_features(_docs(spark)).collect()
            if r["kind"] == "image"
        }
    finally:
        unregister_feature_decoder("image")
    for ref in ("media://img/1", "media://img/2"):
        assert rows[ref] == ppm_features(synth_ppm_bytes(ref))


def test_media_resize_real_pixel_kernel(spark):
    """media_resize with a byte fetcher runs the genuine decode + resample
    path: thumb bytes equal the numpy nearest-neighbor result, checksum is
    the sum of those bytes."""
    import numpy as np

    from full_lattice_search_spark.functions.ppm import (
        nearest_resize,
        parse_ppm,
        synth_ppm_bytes,
    )
    from full_lattice_search_spark.operators.multimodal import media_resize

    rows = {
        r["media_ref"]: r
        for r in media_resize(
            _docs(spark), width=5, height=3, fetch=synth_ppm_bytes
        ).collect()
    }
    for ref in ("media://img/1", "media://img/2"):
        _, _, _, px = parse_ppm(synth_ppm_bytes(ref))
        want = nearest_resize(px, 5, 3)
        got = rows[ref]
        assert bytes(got["thumb"]) == want.tobytes()
        assert got["checksum"] == int(want.astype(np.int64).sum())
        assert (got["width"], got["height"]) == (5, 3)


def test_decode_media_bytes_sniffs_formats():
    """decode_media_bytes is REAL for the two natively-decodable formats
    and still raises for formats needing external libraries."""
    import pytest

    from full_lattice_search_spark.functions.ppm import (
        ppm_features,
        synth_ppm_bytes,
    )
    from full_lattice_search_spark.functions.wav import (
        synth_wav_bytes,
        wav_pcm_features,
    )
    from full_lattice_search_spark.operators.multimodal import (
        decode_media_bytes,
    )

    assert decode_media_bytes(
        "r", synth_ppm_bytes("r")
    ).tolist() == ppm_features(synth_ppm_bytes("r"))
    assert decode_media_bytes(
        "r", synth_wav_bytes("r")
    ).tolist() == wav_pcm_features(synth_wav_bytes("r"))
    with pytest.raises(NotImplementedError):
        decode_media_bytes("r", b"\x89PNG\r\n...")
    with pytest.raises(NotImplementedError):
        decode_media_bytes("r", None)


def test_avi_probe_real_roundtrip():
    """The RIFF/AVI probe must recover exactly what the synthesizer
    encoded — walking past the JUNK chunk, into the nested hdrl/movi
    LISTs, and cross-checking avih's frame count against the actual
    frame chunks."""
    import hashlib
    import struct

    from full_lattice_search_spark.functions.avi import (
        avi_frame_count,
        avi_probe_features,
        parse_avi,
        synth_avi_bytes,
    )

    ref = "media://vid/7"
    d = [int(c, 16) for c in hashlib.md5(ref.encode()).hexdigest()]
    b = synth_avi_bytes(ref)
    n = 2 + d[0] + (d[1] % 3)
    w, h = 4 + d[1], 4 + d[2]
    p = parse_avi(b)
    assert (p["n_frames"], p["width"], p["height"]) == (n, w, h)
    assert p["us_per_frame"] == 33366 + 100 * d[3]
    assert avi_probe_features(b) == [
        n, w, h, 33366 + 100 * d[3], n, w * h * 3, w * h * 3, n * w * h * 3
    ]
    assert avi_frame_count(b) == n
    # header/movi disagreement must be LOUD, not trusted
    idx = b.index(b"avih") + 8 + 16  # dwTotalFrames
    bad = b[:idx] + struct.pack("<I", n + 5) + b[idx + 4:]
    import pytest

    with pytest.raises(ValueError, match="movi holds"):
        parse_avi(bad)
    with pytest.raises(ValueError, match="RIFF/AVI"):
        parse_avi(b"garbage")


def test_frame_sample_real_probe(spark):
    """frame_sample with a byte fetcher runs the real container walk —
    the synthesized frame-count formula deliberately differs from the
    md5 stub's, so matching it proves the probe ran."""
    from full_lattice_search_spark.functions.avi import (
        avi_frame_count,
        synth_avi_bytes,
    )
    from full_lattice_search_spark.operators.multimodal import frame_sample

    docs = spark.createDataFrame(
        [("d1", [("video", None, "media://vid/1", 0)]),
         ("d2", [("video", None, "media://vid/2", 0)])],
        DOCUMENTS_SCHEMA,
    )
    rows = frame_sample(docs, every_n=4, fetch=synth_avi_bytes).collect()
    by_ref = {}
    for r in rows:
        by_ref.setdefault(r["media_ref"], []).append(r["frame_idx"])
    for ref, idxs in by_ref.items():
        n = avi_frame_count(synth_avi_bytes(ref))
        assert sorted(idxs) == list(range(0, n, 4)), (ref, idxs, n)
    assert rows[0]["frame_ref"].startswith("media://vid/")
