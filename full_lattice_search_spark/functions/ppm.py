"""Real P6 PPM image decode kernel — the image-kind counterpart of the
WAV proof (``functions/wav.py``) for the media decoder registry
(``operators/multimodal.py``).

The container ships no image libraries, but a binary PPM (netpbm P6) is
just an ASCII header + raw RGB bytes, which numpy decodes natively — so
this kernel is REAL decode logic (magic validation, comment-tolerant
header tokenizing, dimension/maxval parsing, byte-plane decode and a
genuine nearest-neighbor resampling kernel), not an md5 stand-in.  Only
the byte FETCH is synthesized: ``synth_ppm_bytes`` derives a
deterministic image from the media_ref (standing in for the object-store
GET), which also gives the kernel a closed-form DuckDB oracle — the
synthesized image's dimensions and pixel ramp are md5-digit functions of
the ref, so the oracle predicts every feature and resize checksum
without touching bytes, while the engine only gets them right by
actually parsing the header and pixel planes it fetched.

Feature vector (N_FEATURES = 8, all ints):
    [width, height, maxval, n_values, first_value, last_value,
     max_value, min_value]   # values = R,G,B bytes in row-major order
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _md5_digits(ref: str) -> list[int]:
    return [int(c, 16) for c in hashlib.md5(ref.encode("utf-8")).hexdigest()]


def synth_ppm_bytes(ref: str) -> bytes:
    """Deterministic P6 PPM for ``ref`` — the stand-in for the storage
    fetch.  Image parameters are md5-digit functions: width = 4 + d0,
    height = 4 + d1, base = 16*d2 + d3, and pixel value at (row y, col x,
    channel c) = (base + 7x + 13y + 29c) mod 256.  A comment line is
    placed between the magic and the dimensions so a parser that assumes
    a fixed header layout (instead of tokenizing with comment handling)
    fails."""
    d = _md5_digits(ref)
    w, h = 4 + d[0], 4 + d[1]
    base = 16 * d[2] + d[3]
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    px = ((base + 7 * x + 13 * y + 29 * c) % 256).astype(np.uint8)
    header = b"P6\n# synthetic image\n%d %d\n255\n" % (w, h)
    return header + px.tobytes()


def parse_ppm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Minimal REAL P6 parser: validates the magic, tokenizes the header
    (arbitrary whitespace, ``#`` comments through end-of-line), reads
    width/height/maxval, and decodes the raw RGB plane with numpy.
    Returns (width, height, maxval, pixels[h, w, 3] uint8).  Raises
    ValueError on malformed input, non-P6 formats, or maxval > 255
    (two-byte samples unsupported)."""
    if len(payload) < 2 or payload[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    pos, n = 2, len(payload)
    fields: list[int] = []
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < n:
            ch = payload[pos]
            if ch in b" \t\r\n":
                pos += 1
            elif ch == 0x23:  # '#'
                while pos < n and payload[pos] not in b"\r\n":
                    pos += 1
            else:
                break
        start = pos
        while pos < n and payload[pos] in b"0123456789":
            pos += 1
        if pos == start:
            raise ValueError("malformed PPM header (expected integer)")
        fields.append(int(payload[start:pos]))
    w, h, maxval = fields
    if w <= 0 or h <= 0:
        raise ValueError(f"invalid dimensions {w}x{h}")
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported maxval {maxval} (need 1..255)")
    # exactly ONE whitespace byte separates maxval from the raster
    if pos >= n or payload[pos] not in b" \t\r\n":
        raise ValueError("missing raster separator")
    pos += 1
    need = w * h * 3
    raster = payload[pos:pos + need]
    if len(raster) < need:
        raise ValueError(
            f"truncated raster: need {need} bytes, have {len(raster)}"
        )
    px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
    return w, h, maxval, px


def ppm_features(payload: bytes) -> list[int]:
    """The 8-int feature vector over one decoded PPM payload."""
    w, h, maxval, px = parse_ppm(payload)
    v = px.ravel()
    return [
        int(w),
        int(h),
        int(maxval),
        int(v.size),
        int(v[0]),
        int(v[-1]),
        int(v.max()),
        int(v.min()),
    ]


def ppm_feature_decoder(refs: pd.Series) -> list[list[int]]:
    """Registry-shaped kernel for ``register_feature_decoder('image', …)``:
    fetch (synthesized here), then REAL parse + feature extraction."""
    return [ppm_features(synth_ppm_bytes(r)) for r in refs]


def nearest_resize(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Genuine nearest-neighbor resampling: output pixel (ty, tx) reads
    source pixel (sy, sx) with sy = ty*h // height, sx = tx*w // width
    (floor mapping — deterministic, matches the closed-form oracle).
    Pure numpy fancy indexing; no image library."""
    h, w = px.shape[0], px.shape[1]
    sy = (np.arange(height) * h) // height
    sx = (np.arange(width) * w) // width
    return px[sy[:, None], sx[None, :]]


def ppm_thumb(payload: bytes, width: int, height: int) -> tuple[bytes, int]:
    """Decode + resize one image; returns (raw RGB thumb bytes, integer
    checksum = sum of thumb bytes) — the resize kernel ``media_resize``
    uses on its non-stub path."""
    _, _, _, px = parse_ppm(payload)
    thumb = nearest_resize(px, width, height)
    return thumb.tobytes(), int(thumb.astype(np.int64).sum())
