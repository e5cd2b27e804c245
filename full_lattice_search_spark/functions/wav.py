"""Real RIFF/PCM WAV decode kernel — the non-stub proof of the media
decoder registry (``operators/multimodal.py``).

The container ships no audio libraries, but a WAV file is just a RIFF
chunk stream + raw PCM, which numpy decodes natively — so this kernel is
REAL decode logic (header validation, chunk walking, fmt parsing, int16
sample decode), not an md5 stand-in.  Only the byte FETCH is synthesized:
``synth_wav_bytes`` derives a deterministic WAV from the media_ref (the
object-store GET a production deployment would do instead), which also
gives the kernel a closed-form DuckDB oracle — the synthesized waveform's
parameters are md5-digit functions of the ref, so the oracle can predict
every feature without parsing bytes, while the engine only gets them
right by actually parsing the RIFF stream it fetched.

Feature vector (N_FEATURES = 8, all ints):
    [sample_rate, n_channels, bits_per_sample, n_samples,
     first_sample, last_sample, max_sample, min_sample]
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd


def _md5_digits(ref: str) -> list[int]:
    return [int(c, 16) for c in hashlib.md5(ref.encode("utf-8")).hexdigest()]


def synth_wav_bytes(ref: str) -> bytes:
    """Deterministic mono 16-bit PCM WAV for ``ref`` — the stand-in for
    the storage fetch.  Waveform parameters are md5-digit functions:
    rate = 8000 + 500·d0, n_samples = 64 + 8·d1, amplitude = 256·(d2+1),
    square-wave period = 4 + d3.  A LIST chunk is placed BEFORE fmt so a
    parser that assumes fixed offsets (instead of walking chunks) fails."""
    d = _md5_digits(ref)
    rate = 8000 + 500 * d[0]
    n = 64 + 8 * d[1]
    amp = 256 * (d[2] + 1)
    period = 4 + d[3]
    i = np.arange(n)
    samples = np.where((i // period) % 2 == 0, amp, -amp).astype("<i2")
    data = samples.tobytes()

    listc = b"LIST" + struct.pack("<I", 4) + b"INFO"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16
    )  # PCM, mono, 16-bit: block align 2, byte rate = rate*2
    datac = b"data" + struct.pack("<I", len(data)) + data
    body = b"WAVE" + listc + fmt + datac
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_wav(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Minimal REAL RIFF/PCM parser: validates magics, walks the chunk
    stream (word-aligned), reads fmt, and decodes the data chunk with
    numpy.  Returns (sample_rate, n_channels, bits_per_sample, samples).
    Raises ValueError on malformed input or non-PCM encodings."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, end = 12, 8 + riff_size
    rate = channels = bits = None
    samples = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise ValueError(f"unsupported encoding {audio_fmt} (not PCM)")
            if bits != 16:
                raise ValueError(f"unsupported bit depth {bits}")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return rate, channels, bits, samples


def wav_pcm_features(payload: bytes) -> list[int]:
    """The 8-int feature vector over one decoded WAV payload."""
    rate, channels, bits, s = parse_wav(payload)
    return [
        int(rate),
        int(channels),
        int(bits),
        int(s.size),
        int(s[0]) if s.size else 0,
        int(s[-1]) if s.size else 0,
        int(s.max()) if s.size else 0,
        int(s.min()) if s.size else 0,
    ]


def wav_feature_decoder(refs: pd.Series) -> list[list[int]]:
    """Registry-shaped kernel for ``register_feature_decoder('audio', …)``:
    fetch (synthesized here), then REAL parse + feature extraction."""
    return [wav_pcm_features(synth_wav_bytes(r)) for r in refs]
