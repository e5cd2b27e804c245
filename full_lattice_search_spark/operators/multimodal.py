"""Multimodal column plumbing: media spans as opaque references/bytes with
typed metadata, decoded/feature-extracted via Arrow-batched pandas UDFs.

The image/audio decode libraries are NOT available in this environment, so
the decode kernels are STUBBED with a deterministic md5-based fake (clearly
marked); the Spark-side plumbing — schema, mapInPandas batch shape,
partitioning — is real and tested.  Swapping ``_fake_decode_features`` for
a PIL/torchaudio kernel changes nothing outside that function.
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
    """REAL decode goes here (PIL.Image.open / soundfile.read / pyav frame
    sample).  Not available in this container."""
    raise NotImplementedError(
        "media decode libraries are not installed in this environment"
    )


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

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not use_stub:  # pragma: no cover — needs real decode libs
                feats = [
                    decode_media_bytes(r, None).tolist()
                    for r in pdf["media_ref"]
                ]
            else:
                feats = _fake_decode_features(pdf["media_ref"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].reset_index(drop=True),
                    "media_ref": pdf["media_ref"].reset_index(drop=True),
                    "kind": pdf["kind"].reset_index(drop=True),
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURES_SCHEMA)
