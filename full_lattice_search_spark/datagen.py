"""Deterministic synthetic generator for the interleaved-documents table
(BASELINE.json ``input_hint`` shape: doc_id, spans array<struct<kind, text,
media_ref, offset>>).

Generated *distributedly*: ``spark.range(n) → mapInPandas`` with a per-doc
RNG seeded from ``(seed, doc_index)`` — output is bit-identical regardless of
partitioning or parallelism (the determinism property the N-vs-4N scaling
run depends on).  No driver-side materialization, so the same code generates
10^3 docs for tests and 10^9+ on a cluster.

Fixture docs from the reference test suite (LatticeTokenFilterTests.java,
rest-api-spec 20_tests.yml) are embedded verbatim at fixed doc indexes so
parity tests can target them by id.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA

# Reference fixture payloads (FIXTURES.md §2-3) pinned at doc indexes 0..3.
FIXTURE_TEXTS = [
    "quick|0|0|0.6 brown|1|0|0.7 fox|2|0|0.5 box|2|0|0.1 jumped|3|0|0.9",
    "how|0|0|0.6 now|1|0|0.7 brown|2|0|0.5 yellow|2|0|0.1 cow|3|0|0.9",
    "the|0|1|0.3 quick|1|0|0.9 brick|1|1|0.01 brown|2|0|1.0 fox|3|0|0.7 box|3|1|0.2",
    "the quick brown fox",  # pass-through doc
]

VOCAB = np.array(
    [
        "the", "quick", "brown", "fox", "box", "jumped", "over", "lazy",
        "dog", "how", "now", "cow", "yellow", "brick", "road", "search",
        "lattice", "token", "stream", "audio", "speech", "word", "error",
        "rate", "index", "query", "span", "near", "score", "payload",
        "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
        "theta", "iota", "kappa", "lam", "mu", "nu", "xi", "omicron",
        "pi", "rho", "sigma", "tau", "upsilon",
    ],
    dtype=object,
)

_HTML_TMPL = (
    "<html><head><title>t</title><style>.x{{color:red}}</style></head><body>"
    "<nav><a href='/'>home</a> <a href='/about'>about</a></nav>"
    "<article><h1>{title}</h1><p>{body}</p></article>"
    "<footer>&copy; 2026 corp</footer></body></html>"
)


def _make_lattice_text(rng: np.random.Generator, n_pos: int, audio: bool) -> str:
    recs = []
    t = np.float32(0.0)
    for p in range(n_pos):
        n_alt = int(rng.integers(1, 4))
        words = rng.choice(VOCAB, size=n_alt, replace=False)
        scores = np.round(rng.uniform(0.01, 1.0, size=n_alt), 4)
        scores[::-1].sort()
        dur = np.float32(round(float(rng.uniform(0.1, 0.8)), 2))
        for r in range(n_alt):
            if audio:
                recs.append(
                    f"{words[r]}|{p}|{r}|{scores[r]}|{t}|{np.float32(t + dur)}"
                )
            else:
                recs.append(f"{words[r]}|{p}|{r}|{scores[r]}")
        t = np.float32(t + dur + np.float32(round(float(rng.uniform(0.0, 0.5)), 2)))
    return " ".join(recs)


def _gen_doc(doc_index: int, seed: int, audio: bool, mega_every: int) -> list[tuple]:
    """Spans for one document — pure function of (doc_index, seed)."""
    if doc_index < len(FIXTURE_TEXTS):
        return [("text", FIXTURE_TEXTS[doc_index], None, 0)]
    rng = np.random.default_rng(np.random.PCG64(seed * 1_000_003 + doc_index))
    is_mega = mega_every > 0 and doc_index % mega_every == (mega_every - 1)
    n_spans = int(rng.integers(2, 8)) if not is_mega else int(rng.integers(150, 250))
    spans = []
    for i in range(n_spans):
        kind_roll = rng.random()
        if kind_roll < 0.55:
            spans.append(
                ("text", _make_lattice_text(rng, int(rng.integers(3, 15)), audio), None, i)
            )
        elif kind_roll < 0.75:
            title = " ".join(rng.choice(VOCAB, size=3))
            body = " ".join(rng.choice(VOCAB, size=int(rng.integers(8, 40))))
            spans.append(("text", _HTML_TMPL.format(title=title, body=body), None, i))
        elif kind_roll < 0.9:
            spans.append(("image", None, f"media://img/{doc_index}/{i}", i))
        else:
            spans.append(("audio", None, f"media://aud/{doc_index}/{i}", i))
    return spans


def synth_documents(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    audio: bool = False,
    mega_every: int = 1000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic interleaved-documents table."""
    rng_range = spark.range(0, n_docs, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = {
                "doc_id": [f"doc-{i:012d}" for i in ids],
                "spans": [
                    [
                        {"kind": k, "text": t, "media_ref": m, "offset": o}
                        for (k, t, m, o) in _gen_doc(int(i), seed, audio, mega_every)
                    ]
                    for i in ids
                ],
            }
            yield pd.DataFrame(rows)

    return rng_range.mapInPandas(gen, schema=DOCUMENTS_SCHEMA)
