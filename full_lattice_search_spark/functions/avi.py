"""Real RIFF/AVI container probe — the video-kind counterpart of the
WAV/PPM/PDF proofs for the media registry (``operators/multimodal.py``).

The container ships no video libraries, but an AVI file is just a RIFF
form: a ``hdrl`` LIST holding the ``avih`` main header (frame count,
dimensions) and a ``movi`` LIST holding the frame chunks (``00db`` /
``00dc``).  Probing it — what ``frame_sample`` needs — is pure chunk
walking, no codec required.  So this module is REAL probe logic:
RIFF/AVI magic validation, nested-LIST traversal, avih parsing, and a
frame-chunk walk that CROSS-CHECKS the header's frame count against the
actual chunks (a header-only probe would trust a lying file).  Only the
byte FETCH is synthesized: ``synth_avi_bytes`` derives a deterministic
AVI from the media_ref (frame count / dimensions are md5-digit
functions), giving the probe a closed-form DuckDB oracle.

Decoding frame PIXELS (cinepak/h264/...) genuinely needs codec
libraries and stays out of scope; the synthesized frames carry raw
bytes so the per-frame checksum is still byte-real.

Feature vector (N_FEATURES = 8, all ints):
    [n_frames, width, height, us_per_frame, n_movi_chunks,
     first_frame_bytes, last_frame_bytes, total_frame_bytes]
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd


def _md5_digits(ref: str) -> list[int]:
    return [int(c, 16) for c in hashlib.md5(ref.encode("utf-8")).hexdigest()]


def synth_avi_bytes(ref: str) -> bytes:
    """Deterministic AVI for ``ref``: n_frames = 2 + d0 + (d1 mod 3)
    (deliberately NOT the md5 stub's 2 + d0 formula, so an oracle row
    can only pass through the real probe), width = 4 + d1, height =
    4 + d2, us_per_frame = 33366 + 100·d3; frame k carries w·h·3 raw
    bytes of value (k·7 + d3) mod 256.  A JUNK chunk precedes hdrl so
    fixed-offset 'parsers' fail."""
    d = _md5_digits(ref)
    n = 2 + d[0] + (d[1] % 3)
    w, h = 4 + d[1], 4 + d[2]
    uspf = 33366 + 100 * d[3]
    fsize = w * h * 3

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        uspf,          # dwMicroSecPerFrame
        fsize * 30,    # dwMaxBytesPerSec (nominal)
        0,             # dwPaddingGranularity
        0x10,          # dwFlags (AVIF_HASINDEX off, keep simple)
        n,             # dwTotalFrames
        0,             # dwInitialFrames
        1,             # dwStreams
        fsize,         # dwSuggestedBufferSize
        w,             # dwWidth
        h,             # dwHeight
        0, 0, 0, 0,    # dwReserved
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl" + (
        b"avih" + struct.pack("<I", len(avih)) + avih
    )
    junk = b"JUNK" + struct.pack("<I", 8) + b"\x00" * 8
    frames = b""
    for k in range(n):
        payload = bytes(((k * 7 + d[3]) % 256,)) * fsize
        frames += b"00db" + struct.pack("<I", fsize) + payload
        if fsize & 1:
            frames += b"\x00"
    movi = b"LIST" + struct.pack("<I", 4 + len(frames)) + b"movi" + frames
    body = b"AVI " + junk + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi(payload: bytes) -> dict:
    """Minimal REAL RIFF/AVI probe: validates magics, walks top-level
    chunks (word-aligned), parses ``avih`` out of the ``hdrl`` LIST, and
    walks the ``movi`` LIST's frame chunks.  Raises ValueError when the
    header's dwTotalFrames disagrees with the movi chunk count (a
    header-only probe would silently trust it).  Returns a dict with
    n_frames, width, height, us_per_frame, frame_sizes."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    if riff_size + 8 > len(payload):
        raise ValueError("truncated RIFF payload")
    pos, end = 12, 8 + riff_size
    avih = None
    frame_sizes: list[int] = []
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"LIST":
            form = body[:4]
            if form == b"hdrl":
                # walk sub-chunks for avih
                sp = 4
                while sp + 8 <= size:
                    scid = body[sp:sp + 4]
                    (ssize,) = struct.unpack_from("<I", body, sp + 4)
                    if scid == b"avih":
                        if ssize < 40:
                            raise ValueError("avih too short")
                        avih = struct.unpack_from("<10I", body, sp + 8)
                    sp += 8 + ssize + (ssize & 1)
            elif form == b"movi":
                sp = 4
                while sp + 8 <= size:
                    scid = body[sp:sp + 4]
                    (ssize,) = struct.unpack_from("<I", body, sp + 4)
                    if scid[2:4] in (b"db", b"dc"):
                        frame_sizes.append(ssize)
                    sp += 8 + ssize + (ssize & 1)
        pos += 8 + size + (size & 1)
    if avih is None:
        raise ValueError("missing avih header")
    n_hdr = avih[4]
    if n_hdr != len(frame_sizes):
        raise ValueError(
            f"header claims {n_hdr} frames but movi holds "
            f"{len(frame_sizes)}"
        )
    return {
        "n_frames": len(frame_sizes),
        "width": avih[8],
        "height": avih[9],
        "us_per_frame": avih[0],
        "frame_sizes": frame_sizes,
    }


def avi_probe_features(payload: bytes) -> list[int]:
    """The 8-int feature vector over one probed AVI payload."""
    p = parse_avi(payload)
    fs = p["frame_sizes"]
    return [
        int(p["n_frames"]),
        int(p["width"]),
        int(p["height"]),
        int(p["us_per_frame"]),
        len(fs),
        int(fs[0]) if fs else 0,
        int(fs[-1]) if fs else 0,
        int(sum(fs)),
    ]


def avi_feature_decoder(refs: pd.Series) -> list[list[int]]:
    """Registry-shaped kernel for ``register_feature_decoder('video', …)``:
    fetch (synthesized here), then REAL probe."""
    return [avi_probe_features(synth_avi_bytes(r)) for r in refs]


def avi_frame_count(payload: bytes) -> int:
    """Real container probe for ``frame_sample``: the cross-checked
    frame count from the movi walk."""
    return parse_avi(payload)["n_frames"]
