"""Vectorized lattice analysis chain (SURVEY.md §2.2 T1–T12).

Re-expresses the reference's stateful Lucene token filter
(``index/LatticeTokenFilter.java:28-114`` + ``index/LatticeTokenParts.java``
+ ``index/AudioLatticeTokenParts.java``) as a *vectorized* pandas/numpy
transform: whitespace tokenize → pipe-record parse → position increments →
score-bucket duplication → absolute positions → lowercase.

Everything parity-relevant is computed in ``np.float32`` — the reference does
float math in Java ``float`` and e.g. ``floor((2.28f-1.26f)/0.01f) == 102``
(not the float64 answer 101; see AudioLatticeTokenPartsTests.java:69-74).

The Spark wrapper is a single ``mapInPandas`` stage: tokenization is
per-document independent, so it is embarrassingly parallel — **zero
shuffles**, one Arrow round-trip per batch.  At 100 TB this scales linearly
with input splits; no key can skew it because no grouping happens.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.schema import TOKENS_SCHEMA

_WS_RE = re.compile(r"\s+")

_EMPTY_TOKENS = pd.DataFrame(
    {
        "doc_id": pd.Series([], dtype=object),
        "seq": pd.Series([], dtype=np.int32),
        "token": pd.Series([], dtype=object),
        "pos": pd.Series([], dtype="Int32"),
        "rank": pd.Series([], dtype="Int32"),
        "score": pd.Series([], dtype=np.float32),
        "start_t": pd.Series([], dtype=np.float32),
        "stop_t": pd.Series([], dtype=np.float32),
        "pos_inc": pd.Series([], dtype=np.int32),
        "abs_pos": pd.Series([], dtype=np.int32),
    }
)


def tokenize_pandas(
    doc_ids: pd.Series,
    values: pd.Series,
    config: LatticeConfig,
) -> pd.DataFrame:
    """Tokenize a batch of documents.

    ``doc_ids``: one entry per document.  ``values``: parallel series where
    each element is the document's *list* of field values (multi-valued
    fields get ``position_increment_gap`` between values, reference
    ``mapper/LatticeFieldMapper.java:139-168``) or a single string.

    Returns a token DataFrame matching TOKENS_SCHEMA column-for-column.
    """
    n_docs = len(doc_ids)
    if n_docs == 0:
        return _EMPTY_TOKENS.copy()

    # --- T1: explode values, then whitespace-tokenize (vectorized) ---------
    frame = pd.DataFrame(
        {
            "di": np.arange(n_docs, dtype=np.int64),
            "val": [
                [v] if isinstance(v, str) else (list(v) if v is not None else [])
                for v in values
            ],
        }
    )
    frame = frame.explode("val", ignore_index=True)
    frame = frame[frame["val"].notna()]
    if len(frame) == 0:
        return _EMPTY_TOKENS.copy()
    # per-doc value index (for the multi-value position gap)
    frame["vi"] = frame.groupby("di").cumcount()

    # --- whitespace split + delimiter scan on Arrow kernels (C, not
    # per-token Python regex — ~4× the pandas str path) ----------------
    vals = pa.array(frame["val"].to_numpy(), pa.string())
    tok_lists = pc.utf8_split_whitespace(vals)
    counts = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
    row_idx = np.repeat(
        np.arange(len(frame), dtype=np.int64), counts.astype(np.int64)
    )
    flat = pc.list_flatten(tok_lists)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    if not nonempty.all():
        flat = flat.filter(pa.array(nonempty))
        row_idx = row_idx[nonempty]
    n = len(flat)
    if n == 0:
        return _EMPTY_TOKENS.copy()

    di = frame["di"].to_numpy()[row_idx]
    vi = frame["vi"].to_numpy()[row_idx]

    # --- T2: delimiter scan — 0 delimiters → pass-through; partial → error
    # (reference index/LatticeTokenParts.java:133-150, filter branch :71,88-89)
    delim = config.field_delimiter
    n_delim = pc.count_substring(flat, delim).to_numpy(zero_copy_only=False)
    parsed_mask = n_delim == (config.n_fields - 1)
    pass_mask = n_delim == 0
    bad = ~(parsed_mask | pass_mask)
    if bad.any():
        first_bad = flat[int(bad.argmax())].as_py()
        raise ValueError(
            f"failed to parse lattice token [{first_bad}]: expected "
            f"{config.n_fields - 1} '{delim}' delimiters, found "
            f"{int(n_delim[bad.argmax()])}"
        )

    # --- T3/T4: field parse (Arrow split + cast, float32 scores) ----------
    term = flat.to_numpy(zero_copy_only=False).copy()
    pos = np.full(n, -1, dtype=np.int64)
    rank = np.full(n, -1, dtype=np.int64)
    score = np.full(n, np.nan, dtype=np.float32)
    start_t = np.full(n, np.nan, dtype=np.float32)
    stop_t = np.full(n, np.nan, dtype=np.float32)

    if parsed_mask.any():
        idx = np.flatnonzero(parsed_mask)
        sub = flat.take(pa.array(idx))
        parts = pc.list_flatten(pc.split_pattern(sub, delim))
        nf = config.n_fields
        base = np.arange(len(idx), dtype=np.int64) * nf

        def field(j: int) -> pa.Array:
            return parts.take(pa.array(base + j))

        term[idx] = field(0).to_numpy(zero_copy_only=False)
        pos[idx] = pc.cast(field(1), pa.int64()).to_numpy(zero_copy_only=False)
        rank[idx] = pc.cast(field(2), pa.int64()).to_numpy(zero_copy_only=False)
        # parse via float64 then narrow — same double-rounding behavior as
        # numpy astype(str→float32) and Java's parse in all golden cases
        score[idx] = (
            pc.cast(field(3), pa.float64())
            .to_numpy(zero_copy_only=False)
            .astype(np.float32)
        )
        if config.is_audio:
            start_t[idx] = (
                pc.cast(field(4), pa.float64())
                .to_numpy(zero_copy_only=False)
                .astype(np.float32)
            )
            stop_t[idx] = (
                pc.cast(field(5), pa.float64())
                .to_numpy(zero_copy_only=False)
                .astype(np.float32)
            )

    # --- T7/T8: position increments --------------------------------------
    # State is per (doc, value): the filter is reset between values/docs
    # (reference index/LatticeTokenFilter.java:95-104).  Pass-through tokens
    # advance position by 1 but do not update parser state (:71,88-89).
    group = di * (vi.max() + 1) + vi  # unique per (doc, value)
    pos_inc = np.ones(n, dtype=np.int64)

    if parsed_mask.any():
        pi = np.flatnonzero(parsed_mask)  # parsed rows, emission order
        g = group[pi]
        prev_same = np.zeros(len(pi), dtype=bool)
        prev_same[1:] = g[1:] == g[:-1]
        p = pos[pi]
        lag_p = np.empty_like(p)
        lag_p[1:] = p[:-1]
        lag_p[0] = -(2**31)
        same_pos = prev_same & (p == lag_p)

        if not config.is_audio:
            inc = np.where(same_pos, 0, 1).astype(np.int64)
        else:
            inc_secs = np.float32(config.audio_position_increment_seconds)
            s = start_t[pi]  # float32
            lag_s = np.empty_like(s)
            lag_s[1:] = s[:-1]
            lag_s[0] = np.float32(0.0)
            # first token in value: floor(start/incSecs); else
            # floor((start-last_start)/incSecs); both clamped to >= 1;
            # all arithmetic in float32 (AudioLatticeTokenParts.java:50-62).
            delta = np.where(prev_same, s - lag_s, s).astype(np.float32)
            stepped = np.floor(delta / inc_secs).astype(np.int64)
            inc = np.maximum(1, stepped)
            inc = np.where(same_pos, 0, inc)
        pos_inc[pi] = inc

    # Multi-value gap: first emitted token of value k>0 adds the gap
    # (posIncGap default 100 → positions jump by gap+inc).
    first_of_group = np.ones(n, dtype=bool)
    first_of_group[1:] = group[1:] != group[:-1]
    gap_rows = first_of_group & (vi > 0)
    pos_inc = pos_inc + np.where(gap_rows, config.position_increment_gap, 0)

    # --- T10: score-bucket duplication ------------------------------------
    # First bucket (thresholds descending) with score >= threshold wins;
    # duplicates emit consecutively at the same position (posInc 0) carrying
    # the same payload (index/LatticeTokenFilter.java:61-93, factory :74-99).
    repeats = np.ones(n, dtype=np.int64)
    buckets = config.sorted_buckets()
    if buckets and parsed_mask.any():
        conds = [score >= np.float32(t) for t, _ in buckets]
        choices = [np.int64(r) for _, r in buckets]
        repeats = np.where(parsed_mask, np.select(conds, choices, default=1), 1)

    # --- T9: absolute positions (running sum per doc), then duplicate ------
    abs_pos = _cumsum_by_group(pos_inc, di)

    if (repeats > 1).any():
        take = np.repeat(np.arange(n), repeats)
        is_dup = np.ones(len(take), dtype=bool)
        first_emit = np.concatenate(([0], np.cumsum(repeats)[:-1]))
        is_dup[first_emit] = False
        term = term[take]
        pos = pos[take]
        rank = rank[take]
        score = score[take]
        start_t = start_t[take]
        stop_t = stop_t[take]
        abs_pos = abs_pos[take]
        pos_inc = np.where(is_dup, 0, pos_inc[take])
        di = di[take]
        parsed_out = parsed_mask[take]
    else:
        parsed_out = parsed_mask

    # --- T5/T6: bare term text, composable follow-on filter chain ----------
    term = _apply_follow_on(term, config.effective_follow_on())
    out_tok = pd.Series(term, dtype=object)

    m = len(di)
    seq = _cumcount_by_group(di)
    out = pd.DataFrame(
        {
            "doc_id": pd.Series(doc_ids.to_numpy()[di], dtype=object),
            "seq": seq.astype(np.int32),
            "token": out_tok,
            "pos": pd.array(
                np.where(parsed_out, pos, 0).astype(np.int32),
                dtype="Int32",
            ),
            "rank": pd.array(
                np.where(parsed_out, rank, 0).astype(np.int32),
                dtype="Int32",
            ),
            "score": score.astype(np.float32),
            "start_t": start_t.astype(np.float32),
            "stop_t": stop_t.astype(np.float32),
            "pos_inc": pos_inc.astype(np.int32),
            "abs_pos": abs_pos.astype(np.int32),
        }
    )
    # pass-through rows carry no parse fields
    out.loc[~parsed_out, ["pos", "rank"]] = pd.NA
    assert m == len(out)
    return out


# American Soundex consonant codes (vowels/h/w/y carry no code; h/w are
# transparent — they don't break a run of equal codes).
_SOUNDEX_CODES = {
    **{c: "1" for c in "bfpv"},
    **{c: "2" for c in "cgjkqsxz"},
    **{c: "3" for c in "dt"},
    "l": "4",
    **{c: "5" for c in "mn"},
    "r": "6",
}


def _soundex_one(tok: str) -> str:
    """American Soundex of one token; non-alphabetic tokens pass through
    unchanged (a lattice stream can carry numbers/markup)."""
    if not tok or not tok[0].isalpha():
        return tok
    t = tok.lower()
    out = [t[0].upper()]
    prev = _SOUNDEX_CODES.get(t[0], "")
    for ch in t[1:]:
        code = _SOUNDEX_CODES.get(ch)
        if code is not None:
            if code != prev:
                out.append(code)
            prev = code
        elif ch not in "hw":
            prev = ""  # vowels (and anything else) break the run
    return (("".join(out)) + "000")[:4]


def _apply_follow_on(term: np.ndarray, chain: tuple[str, ...]) -> np.ndarray:
    """Apply the configured follow-on filter chain, vectorized:
    `lowercase` runs on the Arrow kernel; `asciifold`/`soundex` map over
    UNIQUE tokens only (the per-token python cost is amortized across all
    duplicate occurrences — a bounded-vocabulary trick, not a per-row
    loop over the corpus)."""
    for name in chain:
        if name == "lowercase":
            term = pc.utf8_lower(pa.array(term, pa.string())).to_numpy(
                zero_copy_only=False
            )
        elif name == "asciifold":
            import unicodedata

            s = pd.Series(term, dtype=object)
            mapping = {
                u: (
                    unicodedata.normalize("NFKD", u)
                    .encode("ascii", "ignore")
                    .decode("ascii")
                    if isinstance(u, str)
                    else u
                )
                for u in pd.unique(s)
            }
            term = s.map(mapping).to_numpy()
        elif name == "soundex":
            s = pd.Series(term, dtype=object)
            mapping = {
                u: _soundex_one(u) if isinstance(u, str) else u
                for u in pd.unique(s)
            }
            term = s.map(mapping).to_numpy()
        else:  # pragma: no cover — VALID_FOLLOW_ON gate in LatticeConfig
            raise ValueError(f"unknown follow-on filter [{name}]")
    return term


def _cumsum_by_group(vals: np.ndarray, group: np.ndarray) -> np.ndarray:
    """Running sum of ``vals`` restarting at each new ``group`` value
    (groups are contiguous)."""
    total = np.cumsum(vals)
    first = np.ones(len(vals), dtype=bool)
    first[1:] = group[1:] != group[:-1]
    starts = np.flatnonzero(first)
    base = np.zeros(len(vals), dtype=total.dtype)
    base[starts] = total[starts] - vals[starts]
    np.maximum.accumulate(base, out=base)
    return total - base


def _cumcount_by_group(group: np.ndarray) -> np.ndarray:
    """0-based position within each contiguous group run."""
    n = len(group)
    idx = np.arange(n, dtype=np.int64)
    first = np.ones(n, dtype=bool)
    first[1:] = group[1:] != group[:-1]
    starts = idx.copy()
    starts[~first] = 0
    np.maximum.accumulate(starts, out=starts)
    return idx - starts


def text_values_col(spans_col: str = "spans") -> F.Column:
    """JVM-side expression extracting the ordered list of text field values
    from an interleaved spans array (kept out of Python on purpose —
    Catalyst prunes/pushes this)."""
    return F.expr(
        f"transform("
        f"  array_sort(filter({spans_col}, s -> s.kind = 'text'),"
        f"             (a, b) -> a.offset - b.offset),"
        f"  s -> s.text)"
    )


def lattice_tokenize(
    docs: DataFrame,
    config: LatticeConfig,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """Expand an interleaved-documents table into the token stream.

    One ``mapInPandas`` stage over ``(doc_id, values)`` — the span filtering /
    ordering runs JVM-side so only two narrow columns cross the Arrow
    boundary.  No shuffle: per-document work, partition-local.
    """
    narrow = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        text_values_col(spans_col).alias("values"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield tokenize_pandas(pdf["doc_id"], pdf["values"], config)

    return narrow.mapInPandas(run, schema=TOKENS_SCHEMA)
