"""Multimodal column plumbing: media spans as opaque references/bytes with
typed metadata, decoded/feature-extracted via Arrow-batched pandas UDFs.

Two media kinds have REAL pure-numpy decode kernels in this repo —
RIFF/PCM WAV (functions/wav.py) and P6 PPM images (functions/ppm.py) —
wired in through the decoder registry below; ``media_resize`` likewise
runs a genuine nearest-neighbor pixel kernel when given a byte fetcher.
Kinds needing external libraries (JPEG/PNG/MP4 …, not in this container)
fall back to a deterministic md5-based fake (clearly marked) so the
Spark-side plumbing — schema, mapInPandas batch shape, partitioning —
stays real and tested; swapping the stub for a PIL/pyav kernel changes
nothing outside that function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
        T.StructField("features", T.ArrayType(T.LongType()), True),
    ]
)

N_FEATURES = 8


def decode_media_bytes(ref: str, payload: bytes | None) -> np.ndarray:
    """Decode raw media bytes to the 8-int feature vector.  Formats with
    pure-numpy parsers in this repo are REAL: RIFF/WAVE (functions/wav.py)
    and P6 PPM (functions/ppm.py), sniffed by magic.  Everything else
    (JPEG/PNG/MP4 …) needs PIL/soundfile/pyav, which this container does
    not ship — those raise instead of silently stubbing."""
    if payload is not None:
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            from full_lattice_search_spark.functions.avi import (
                avi_probe_features,
            )

            return np.asarray(avi_probe_features(payload), dtype=np.int64)
        if payload[:4] == b"RIFF":
            from full_lattice_search_spark.functions.wav import (
                wav_pcm_features,
            )

            return np.asarray(wav_pcm_features(payload), dtype=np.int64)
        if payload[:2] == b"P6":
            from full_lattice_search_spark.functions.ppm import ppm_features

            return np.asarray(ppm_features(payload), dtype=np.int64)
    raise NotImplementedError(
        "media decode libraries for this format are not installed in "
        "this environment (RIFF/WAVE and P6 PPM decode natively)"
    )


# --- feature-decoder registry -------------------------------------------
# The injection point for real decode kernels: register one callable per
# media kind (signature: pd.Series of media_refs → list of N_FEATURES-long
# int lists).  ``media_features`` dispatches per kind inside the Arrow
# batch; kinds without a registered decoder fall back to the md5 stub, so
# a deployment can bring PIL for images while audio stays stubbed (or
# vice versa) without touching this module.
from collections.abc import Callable  # noqa: E402

_FEATURE_DECODERS: dict[str, Callable[[pd.Series], list[list[int]]]] = {}


def register_feature_decoder(
    kind: str, fn: Callable[[pd.Series], list[list[int]]]
) -> None:
    """Install a real decode kernel for one media kind ('image', 'audio',
    'video', ...).  Called on the driver before building the plan; the
    callable is shipped to workers inside the UDF closure."""
    _FEATURE_DECODERS[kind] = fn


def unregister_feature_decoder(kind: str) -> None:
    _FEATURE_DECODERS.pop(kind, None)


def _fake_decode_features(refs: pd.Series) -> list[list[int]]:
    """Deterministic stand-in: feature j = hex digit j of md5(media_ref).
    Chosen because DuckDB can reproduce it, giving the stub a real oracle."""
    out = []
    for r in refs:
        h = hashlib.md5(r.encode("utf-8")).hexdigest()
        out.append([int(h[j], 16) for j in range(N_FEATURES)])
    return out


def media_features(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    use_stub: bool = True,
) -> DataFrame:
    """Explode media spans and run the (stubbed) decoder as one
    ``mapInPandas`` stage.  Partition-local; scales with splits."""
    media = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.explode(
            F.expr(f"filter({spans_col}, s -> s.media_ref is not null)")
        ).alias("s"),
    ).select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.kind").alias("kind"),
    )

    decoders = dict(_FEATURE_DECODERS)  # snapshot into the UDF closure

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [None] * len(pdf)
            kinds = pdf["kind"].to_numpy()
            refs = pdf["media_ref"].reset_index(drop=True)
            for kind in pd.unique(pdf["kind"]):
                idx = np.flatnonzero(kinds == kind)
                fn = decoders.get(kind)
                if fn is None:
                    if use_stub:
                        fn = _fake_decode_features
                    else:
                        # use_stub=False promises REAL decode for every
                        # kind: an unregistered kind must go through
                        # decode_media_bytes (raising where decode libs
                        # are absent), never silently back to the stub —
                        # a silent stub here would mask a missing decoder
                        # in production
                        sub = [
                            decode_media_bytes(r, None).tolist()
                            for r in refs.iloc[idx]
                        ]
                        for i, f in zip(idx, sub):
                            feats[i] = f
                        continue
                sub = fn(refs.iloc[idx])
                for i, f in zip(idx, sub):
                    feats[i] = f
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].reset_index(drop=True),
                    "media_ref": pdf["media_ref"].reset_index(drop=True),
                    "kind": pdf["kind"].reset_index(drop=True),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_ref", T.StringType(), False),
    ]
)

MEDIA_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("thumb", T.BinaryType(), True),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def _fake_frame_count(ref: str) -> int:
    """Deterministic stand-in for container probing (pyav stream length):
    2 + first-hex-digit frames.  DuckDB-reproducible."""
    return 2 + int(hashlib.md5(ref.encode("utf-8")).hexdigest()[0], 16)


def frame_sample(
    docs: DataFrame,
    every_n: int = 4,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    fetch: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """Sample every ``every_n``-th frame of each video span.

    With ``fetch`` given (media_ref → container bytes; in production the
    object-store GET, in tests ``functions/avi.py:synth_avi_bytes``) the
    container probe is REAL: a RIFF/AVI chunk walk that cross-checks the
    avih header's frame count against the actual movi frame chunks.
    Without it the frame count falls back to a deterministic hash stub.
    Frame PIXEL decoding (codecs) stays out of scope either way —
    ``frame_ref`` is a pointer.  The Spark plumbing is the real thing a
    video pipeline needs: a flatMap-shaped ``mapInPandas`` whose output
    row count differs from its input (one row per sampled frame),
    partition-local, no shuffle."""
    media = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.explode(
            F.expr(f"filter({spans_col}, s -> s.kind = 'video')")
        ).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if fetch is not None:
            from full_lattice_search_spark.functions.avi import (
                avi_frame_count,
            )
        for pdf in batches:
            doc_ids, refs, idxs = [], [], []
            for d, r in zip(pdf["doc_id"], pdf["media_ref"]):
                if fetch is not None:
                    n = avi_frame_count(fetch(r))  # REAL container probe
                else:
                    n = _fake_frame_count(r)       # STUB: no bytes
                for i in range(0, n, every_n):
                    doc_ids.append(d)
                    refs.append(r)
                    idxs.append(i)
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "media_ref": refs,
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ref": [
                        f"{r}#f{i}" for r, i in zip(refs, idxs)
                    ],
                }
            )

    return media.mapInPandas(run, schema=FRAME_SAMPLE_SCHEMA)


def media_resize(
    docs: DataFrame,
    width: int = 16,
    height: int = 16,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    fetch: Callable[[str], bytes] | None = None,
) -> DataFrame:
    """Resize every image span to a thumbnail.

    With ``fetch`` given (media_ref → raw image bytes; in production the
    object-store GET, in tests ``functions/ppm.py:synth_ppm_bytes``), the
    pixel path is REAL: a P6 PPM parse + genuine nearest-neighbor
    resampling (``functions/ppm.py:ppm_thumb``), checksum = sum of the
    thumb's RGB bytes.  Without it the pixel kernel falls back to the
    deterministic md5 stub (bytes derived from md5(ref + 'WxH')) so the
    binary-column plumbing — opaque ``binary`` thumb payload + typed
    metadata + a DuckDB-checkable integer checksum — stays testable where
    no decodable bytes exist."""
    media = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.explode(
            F.expr(f"filter({spans_col}, s -> s.kind = 'image')")
        ).alias("s"),
    ).select("doc_id", F.col("s.media_ref").alias("media_ref"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_px = width * height * 3
        if fetch is not None:
            from full_lattice_search_spark.functions.ppm import ppm_thumb
        for pdf in batches:
            thumbs, sums = [], []
            for r in pdf["media_ref"]:
                if fetch is not None:
                    # REAL kernel: parse fetched bytes, nearest-neighbor
                    # resample with numpy — no image library
                    t, s = ppm_thumb(fetch(r), width, height)
                else:
                    hx = hashlib.md5(
                        f"{r}{width}x{height}".encode("utf-8")
                    ).hexdigest()                 # STUB: no bytes to decode
                    raw = bytes.fromhex(hx)
                    t = (raw * (n_px // len(raw) + 1))[:n_px]
                    s = sum(int(c, 16) for c in hx)
                thumbs.append(t)
                sums.append(s)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].reset_index(drop=True),
                    "media_ref": pdf["media_ref"].reset_index(drop=True),
                    "width": pd.Series([width] * len(pdf), dtype="int32"),
                    "height": pd.Series([height] * len(pdf), dtype="int32"),
                    "thumb": thumbs,
                    "checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema=MEDIA_RESIZE_SCHEMA)
