"""``match_lattice`` — ordered span matching + probabilistic payload scoring.

Re-expresses the reference's Lucene query stack (SpanNearQuery wrapped in
LatticePayloadScoreQuery; ``index/query/MatchLatticeQueryBuilder.java:263-347``
and ``index/query/LatticePayloadScoreQuery.java:52-343``) as two Spark plans:

1. **Document-scan path** (`match_lattice`): one ``mapInPandas`` over the
   interleaved documents table — tokenize + match + score inside a single
   Arrow batch.  A JVM-side substring prefilter keeps non-candidate documents
   out of Python entirely, so at 100 TB the scan stays a parallel
   filter→project with **zero shuffles**; the only exchange is the final
   top-k (`TakeOrderedAndProject`, per-partition k then merge — the same
   physical shape as ES per-shard top-k + coordinator merge).

2. **Token-table path** (`match_lattice_tokens`): for a pre-materialized
   token table (our "inverted index"), filter ``token IN terms`` — pushed to
   the parquet/Iceberg scan — then one shuffle to group candidate docs and
   ``applyInPandas`` the span DP.  Bucketing the token table by ``doc_id``
   removes even that shuffle.

Span-matching semantics replicate Lucene's ``NearSpansOrdered``: subspan
iterators only move forward; for each occurrence of the first term the later
terms stretch greedily to the earliest in-order positions, and the match is
emitted iff the accumulated gap ``start_n - end_1 - …`` is within slop.  For
unit-width terms the gap telescopes to ``p_k - p_1 - (k-1)``, which makes the
whole enumeration a chain of ``np.searchsorted`` calls — fully vectorized
across match candidates.

Scoring replicates the payload algebra (``SumLatticePayloadFunction.java``
and siblings) including the order-dependent per-step clamp of the log fold
and the float32 constants (MIN_SCORE=10e-7f, SCORE_MULT=log(10e4)).
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from full_lattice_search_spark.config import (
    MIN_LOG_SCORE,
    MIN_SCORE,
    NULL_PAYLOAD_SCORE,
    SCORE_MULT,
    LatticeConfig,
    MatchLatticeParams,
)
from full_lattice_search_spark.functions.tokenizer import (
    text_values_col,
    tokenize_pandas,
)
from full_lattice_search_spark.schema import EXPLAIN_HITS_SCHEMA, HITS_SCHEMA


def analyze_query(
    query: str, config: LatticeConfig, analyzer: str = "default"
) -> list[str]:
    """Run the search analyzer over the query text (whitespace + lowercase,
    same chain as indexing).  Rejects graph queries — query tokens that land
    at the same position (posInc 0), mirroring
    ``MatchLatticeQueryBuilder.java:312-314``.

    ``analyzer='keyword'`` short-circuits to a single term on the raw value
    (MatchLatticeQueryBuilder.java:292-295)."""
    if analyzer == "keyword":
        return [query] if query else []
    if analyzer != "default":
        raise ValueError(f"unknown query analyzer [{analyzer}]")
    toks = tokenize_pandas(
        pd.Series(["q"]), pd.Series([[query]]), config
    )
    if len(toks) == 0:
        return []
    if (toks["pos_inc"].to_numpy() == 0).any():
        raise ValueError("graph queries are not supported")
    return list(toks["token"])


# ---------------------------------------------------------------------------
# Per-document span DP (numpy)
# ---------------------------------------------------------------------------


def _ordered_matches(
    plists: list[tuple[np.ndarray, np.ndarray]], slop: int
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Lucene NearSpansOrdered enumeration over unit-width terms.

    ``plists[i] = (positions, payload_scores)`` for query term i, sorted by
    position (duplicates kept — score-bucket duplicates are real postings).

    Returns ``(span_start, span_end_exclusive, per_term_scores)`` for every
    enumerated match, vectorized over occurrences of the first term.
    """
    p1, s1 = plists[0]
    k = len(plists)
    if k == 1:
        return p1, p1 + 1, [s1]
    starts = p1
    valid = np.ones(len(p1), dtype=bool)
    target = p1 + 1  # next subspan must start at/after previous end
    term_scores = [s1]
    last = p1
    for pos_i, score_i in plists[1:]:
        idx = np.searchsorted(pos_i, target, side="left")
        ok = idx < len(pos_i)
        idx_c = np.minimum(idx, max(len(pos_i) - 1, 0))
        m = pos_i[idx_c]
        sc = score_i[idx_c]
        valid &= ok
        term_scores.append(sc)
        last = m
        target = m + 1
    gap = last - starts - (k - 1)
    matched = valid & (gap <= slop)
    return (
        starts[matched],
        last[matched] + 1,
        [s[matched] for s in term_scores],
    )


def _unordered_matches(
    plists: list[tuple[np.ndarray, np.ndarray]], slop: int
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """NearSpansUnordered analog: enumerate candidate windows by advancing
    the minimum-start term pointer (heap-free k-way walk); match when the
    covering window satisfies ``(max_end - min_start) - k <= slop``.

    Sequential reference implementation — kept as the equivalence oracle
    for ``_unordered_matches_vec`` (property-tested); the engine's hot path
    uses the vectorized form."""
    k = len(plists)
    if k == 1:
        p1, s1 = plists[0]
        return p1, p1 + 1, [s1]
    ptrs = [0] * k
    lens = [len(p) for p, _ in plists]
    starts_out, ends_out = [], []
    scores_out: list[list[float]] = [[] for _ in range(k)]
    while all(ptrs[i] < lens[i] for i in range(k)):
        cur = [plists[i][0][ptrs[i]] for i in range(k)]
        lo = min(cur)
        hi = max(cur)
        if (hi + 1 - lo) - k <= slop:
            starts_out.append(lo)
            ends_out.append(hi + 1)
            for i in range(k):
                scores_out[i].append(plists[i][1][ptrs[i]])
        i_min = int(np.argmin(cur))
        ptrs[i_min] += 1
    return (
        np.asarray(starts_out, dtype=np.int64),
        np.asarray(ends_out, dtype=np.int64),
        [np.asarray(s, dtype=np.float32) for s in scores_out],
    )


def _unordered_matches_vec(
    plists: list[tuple[np.ndarray, np.ndarray]], slop: int
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """Vectorized NearSpansUnordered walk (no per-document Python loop).

    Equivalence with the sequential min-pointer walk: every posting is
    consumed exactly once, at the step where it is the global minimum
    (ties break to the lowest term index, then list order).  At the step
    where posting ``e`` of list ``i`` at position ``p`` is consumed,
    pointer ``j`` sits at the first posting of list ``j`` with position
    ``> p`` (for ``j < i`` — its positions ``<= p`` were consumed at
    earlier steps) or ``>= p`` (for ``j > i`` — equal positions are still
    unconsumed because ``i`` wins the tie).  The step executes iff all
    those pointers exist (a missing one is exactly the walk's exhaustion
    stop), and emits iff the covering width satisfies the slop.  Each
    condition is one ``np.searchsorted`` per (i, j) pair over the
    doc-encoded positions, so the whole enumeration is k(k-1)
    searchsorteds regardless of document count; windows that would cross
    a document boundary exceed the slop by construction and mask out.
    Results are re-sorted to the sequential walk's emission order
    (position, term index, duplicate order) so downstream float folds see
    the same accumulation order.  Property-tested against
    ``_unordered_matches``.
    """
    k = len(plists)
    if k == 1:
        p1, s1 = plists[0]
        return p1, p1 + 1, [s1]
    if any(len(p) == 0 for p, _ in plists):
        empty = np.array([], dtype=np.int64)
        return empty, empty, [np.array([], dtype=np.float32)] * k
    starts_parts: list[np.ndarray] = []
    ends_parts: list[np.ndarray] = []
    scores_parts: list[list[np.ndarray]] = [[] for _ in range(k)]
    key_i_parts: list[np.ndarray] = []
    key_e_parts: list[np.ndarray] = []
    for i, (p_i, s_i) in enumerate(plists):
        n_i = len(p_i)
        if n_i == 0:
            continue
        valid = np.ones(n_i, dtype=bool)
        maxpos = p_i.copy()
        window_scores: list[np.ndarray | None] = [None] * k
        window_scores[i] = s_i
        for j, (p_j, s_j) in enumerate(plists):
            if j == i:
                continue
            side = "right" if j < i else "left"
            idx = np.searchsorted(p_j, p_i, side=side)
            ok = idx < len(p_j)
            idx_c = np.minimum(idx, max(len(p_j) - 1, 0))
            valid &= ok
            np.maximum(maxpos, p_j[idx_c], out=maxpos)
            window_scores[j] = s_j[idx_c]
        matched = valid & ((maxpos + 1 - p_i) - k <= slop)
        if not matched.any():
            continue
        starts_parts.append(p_i[matched])
        ends_parts.append(maxpos[matched] + 1)
        for j in range(k):
            scores_parts[j].append(window_scores[j][matched])
        key_i_parts.append(np.full(int(matched.sum()), i, dtype=np.int64))
        key_e_parts.append(np.flatnonzero(matched))
    if not starts_parts:
        empty = np.array([], dtype=np.int64)
        return empty, empty, [np.array([], dtype=np.float32)] * k
    starts = np.concatenate(starts_parts)
    ends = np.concatenate(ends_parts)
    key_i = np.concatenate(key_i_parts)
    key_e = np.concatenate(key_e_parts)
    # sequential consumption order: (position, term index, in-list order)
    order = np.lexsort((key_e, key_i, starts))
    return (
        starts[order],
        ends[order],
        [np.concatenate(s)[order] for s in scores_parts],
    )


def _fold_leaf_scores(
    term_scores: list[np.ndarray], dtype: type
) -> np.ndarray:
    """A2: per-span payload fold ``acc = max(acc + log(payload), MIN_LOG)``,
    clamped at *every step* (order-dependent — do NOT sum-then-clamp;
    SumLatticePayloadFunction.java:44-49).  Null payloads decode to 1e-5
    (FloatDecoder.java:24-44)."""
    n = len(term_scores[0]) if term_scores else 0
    acc = np.zeros(n, dtype=dtype)
    min_log = dtype(MIN_LOG_SCORE)
    for s in term_scores:
        s = s.astype(dtype)
        s = np.where(np.isnan(s), dtype(NULL_PAYLOAD_SCORE), s)
        acc = np.maximum(acc + np.log(s), min_log)
    return acc


def _span_scores(
    starts: np.ndarray,
    ends: np.ndarray,
    leaf: np.ndarray,
    len_norm: float,
    dtype: type,
) -> np.ndarray:
    """A3: ``exp(SCORE_MULT + leaf - log((end-start) * lenNorm))``;
    lenNorm == 0 disables length normalization
    (SumLatticePayloadFunction.java:30-41)."""
    base = dtype(SCORE_MULT) + leaf
    if len_norm != 0.0:
        width = (ends - starts).astype(dtype)
        base = base - np.log(width * dtype(len_norm))
    return np.exp(base)


def _doc_score(span_scores: np.ndarray, payload_function: str, dtype: type) -> float:
    """A3-A6: combine span scores into the doc score; zero spans → MIN_SCORE
    (guarded by the caller); negative → 0 (A8)."""
    if len(span_scores) == 0:
        return float(MIN_SCORE)
    if payload_function == "sum":
        out = span_scores.sum(dtype=dtype)
    elif payload_function == "max":
        out = span_scores.max()
    else:  # min — reference seeds with first span (cur==0 ? s : min)
        out = span_scores.min()
    out = float(out)
    if np.isnan(out) or out < 0:
        return 0.0
    return out


_EMPTY_HITS = pd.DataFrame(
    {
        "doc_id": pd.Series([], dtype=object),
        "score": pd.Series([], dtype=np.float64),
        "n_spans": pd.Series([], dtype=np.int32),
    }
)


def _hits_output_schema(explain: bool, with_freq: bool):
    """Arrow schema of ``match_tokens_pandas`` output — the column order
    mirrors the kernel's construction order (freq before the explain
    arrays)."""
    from pyspark.sql import types as T

    fields = list(HITS_SCHEMA.fields)
    if with_freq:
        fields.append(T.StructField("sloppy_freq", T.DoubleType(), True))
    if explain:
        fields += [
            T.StructField("span_start", T.ArrayType(T.LongType()), True),
            T.StructField("span_end", T.ArrayType(T.LongType()), True),
            T.StructField("span_score", T.ArrayType(T.DoubleType()), True),
        ]
    return T.StructType(fields)


def _empty_hits(explain: bool, with_freq: bool = False) -> pd.DataFrame:
    out = _EMPTY_HITS.copy()
    if with_freq:
        out["sloppy_freq"] = pd.Series([], dtype=np.float64)
    if explain:
        for c in ("span_start", "span_end", "span_score"):
            out[c] = pd.Series([], dtype=object)
    return out

# per-doc position space for the cross-document encoding; abs_pos is far
# below this for any real document, and slop is validated against it
_DOC_STRIDE = np.int64(1) << 40


# Every O(docs) stats frame the composed doc-scan scoring persists is
# tracked here so callers can scope its lifetime instead of reaching for
# spark.catalog.clearCache() (which would evict unrelated caches too).
_COMPOSED_STATS_CACHE: list[DataFrame] = []


@contextlib.contextmanager
def composed_cache_scope():
    """Scoped lifecycle for composed doc-scan query caches.

    ``match_lattice`` with the reference-default ``include_span_score``
    persists one O(docs) statistics frame per query and Spark keeps it
    registered until unpersist/session end.  A long-running interactive
    driver issuing many distinct composed queries accumulates cache;
    wrap each query (or batch of queries) in this scope and every stats
    frame persisted inside is unpersisted on exit::

        with composed_cache_scope():
            hits = match_lattice(docs, "q", cfg, params)
            hits.collect()          # consume INSIDE the scope

    Consume the hits inside the scope — using the DataFrame afterwards
    still works but recomputes the stats pass.  Standing queries should
    use the materialized token index instead (statistics live in the
    index; nothing is cached per query)."""
    mark = len(_COMPOSED_STATS_CACHE)
    try:
        yield
    finally:
        while len(_COMPOSED_STATS_CACHE) > mark:
            df = _COMPOSED_STATS_CACHE.pop()
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped


def release_composed_caches() -> int:
    """Unpersist every tracked composed-query stats frame (the
    non-context-manager surface).  Returns how many were released."""
    n = 0
    while _COMPOSED_STATS_CACHE:
        df = _COMPOSED_STATS_CACHE.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass
    return n


def match_tokens_pandas(
    tokens: pd.DataFrame,
    terms: list[str],
    slop: int,
    in_order: bool,
    payload_function: str,
    len_norm: float,
    dtype: type = np.float32,
    prefix_last: bool = False,
    explain: bool = False,
    with_freq: bool = False,
) -> pd.DataFrame:
    """Match + score one batch of token rows (any number of docs).

    ``tokens`` needs columns doc_id, token, abs_pos, score, seq.
    Returns (doc_id, score, n_spans) for docs with >= 1 enumerated span;
    with ``explain=True`` adds per-doc ``span_start``/``span_end``/
    ``span_score`` arrays (doc-relative, enumeration order) — the analog of
    the reference's per-hit Explanation tree
    (LatticePayloadScoreQuery.java:316-326).  With ``with_freq=True`` adds
    ``sloppy_freq``: Lucene's span frequency Σ 1/(1 + span gap count),
    float32-accumulated in enumeration order (SpanScorer.setFreqCurrentDoc
    analog) — the raw material of the "lucene" similarity flavor.

    Vectorized across documents: positions are encoded as
    ``doc_index * 2^40 + abs_pos`` so the greedy in-order chain (one
    ``searchsorted`` per query term) runs over ALL documents at once — a
    chain that leaks into the next document necessarily exceeds the slop
    and is masked out.  No per-document Python loop on either path.
    """
    if slop < 0:  # audio seconds→slop conversion can go negative: no match
        return _empty_hits(explain, with_freq)
    assert slop < (1 << 39), "slop out of range for position encoding"
    keep = tokens["token"].isin(_flat_terms(terms))
    if prefix_last and terms:
        keep = keep | tokens["token"].str.startswith(terms[-1])
    cand = tokens[keep]
    if len(cand) == 0:
        return _empty_hits(explain, with_freq)
    # postings order: by (abs_pos, seq) per term — stable, deterministic
    cand = cand.sort_values(["doc_id", "abs_pos", "seq"], kind="stable")
    doc_codes, doc_uniques = pd.factorize(cand["doc_id"], sort=False)
    gpos = doc_codes.astype(np.int64) * _DOC_STRIDE + cand["abs_pos"].to_numpy(
        dtype=np.int64
    )
    tok_arr = cand["token"].to_numpy()
    score_arr = cand["score"].to_numpy(dtype=np.float32)

    plists: list[tuple[np.ndarray, np.ndarray]] = []
    for i, t in enumerate(terms):
        if prefix_last and i == len(terms) - 1:
            # phrase-prefix: the final term matches any token with the
            # prefix (SpanMultiTermQueryWrapper(PrefixQuery) analog,
            # mapper/LatticeFieldMapper.java:251-271)
            m = cand["token"].str.startswith(t).to_numpy()
        elif not isinstance(t, str):
            # multi-phrase slot: any of the alternatives matches this
            # position (SpanOrQuery over the slot's terms — the
            # MultiPhraseQuery analog); the union list inherits the
            # (abs_pos, seq) postings order from `cand`
            m = np.isin(tok_arr, t)
        else:
            m = tok_arr == t
        if not m.any():
            return _empty_hits(explain, with_freq)
        plists.append((gpos[m], score_arr[m]))

    if in_order:
        starts, ends, term_scores = _ordered_matches(plists, slop)
    else:
        starts, ends, term_scores = _unordered_matches_vec(plists, slop)
    # matches whose window crossed a document boundary exceed the slop and
    # were already masked; starts/ends share one doc by construction
    match_docs = (starts // _DOC_STRIDE).astype(np.int64)
    if len(starts) == 0:
        return _empty_hits(explain, with_freq)

    leaf = _fold_leaf_scores(term_scores, dtype)
    spans = _span_scores(starts, ends, leaf, len_norm, dtype)

    n_docs = len(doc_uniques)
    n_spans = np.bincount(match_docs, minlength=n_docs).astype(np.int64)
    if payload_function == "sum":
        # ordered fold per doc to mirror the reference's accumulation
        agg = np.zeros(n_docs, dtype=dtype)
        np.add.at(agg, match_docs, spans.astype(dtype))
    elif payload_function == "max":
        agg = np.full(n_docs, -np.inf, dtype=dtype)
        np.maximum.at(agg, match_docs, spans.astype(dtype))
    else:  # min
        agg = np.full(n_docs, np.inf, dtype=dtype)
        np.minimum.at(agg, match_docs, spans.astype(dtype))

    hit_mask = n_spans > 0
    out_scores = agg[hit_mask].astype(np.float64)
    out_scores = np.where(
        np.isnan(out_scores) | (out_scores < 0), 0.0, out_scores
    )
    out = pd.DataFrame(
        {
            "doc_id": pd.Series(np.asarray(doc_uniques, dtype=object)[hit_mask]),
            "score": out_scores,
            "n_spans": n_spans[hit_mask].astype(np.int32),
        }
    )
    if with_freq:
        # Lucene sloppy freq: per span 1/(1 + gaps), gaps = width minus the
        # matched terms; accumulated in `dtype` — float32 (the default)
        # mirrors SpanScorer's float freq field; the float64 variant is
        # for order-insensitive oracle comparison
        gaps = (ends - starts - len(terms)).astype(np.int64)
        np.maximum(gaps, 0, out=gaps)
        slop_factor = (1.0 / (1.0 + gaps)).astype(dtype)
        freq = np.zeros(n_docs, dtype=dtype)
        np.add.at(freq, match_docs, slop_factor)
        out["sloppy_freq"] = freq[hit_mask].astype(np.float64)
    if explain:
        # match rows are sorted by doc (gpos-ascending on both paths), so the
        # per-doc breakdown is an offset split — no per-row Python objects
        # beyond the output lists themselves (explain is a debugging surface).
        cuts = np.cumsum(n_spans[hit_mask])[:-1]
        rel_start = (starts % _DOC_STRIDE).astype(np.int64)
        rel_end = (ends % _DOC_STRIDE).astype(np.int64)
        out["span_start"] = pd.Series(
            np.split(rel_start, cuts), dtype=object
        )
        out["span_end"] = pd.Series(np.split(rel_end, cuts), dtype=object)
        out["span_score"] = pd.Series(
            np.split(spans.astype(np.float64), cuts), dtype=object
        )
    return out


def _unordered_matches_by_doc(
    plists: list[tuple[np.ndarray, np.ndarray]], slop: int
) -> tuple[np.ndarray, np.ndarray, list[np.ndarray], np.ndarray]:
    """Sequential unordered walk over doc-encoded positions, one document
    slice at a time.  Superseded by ``_unordered_matches_vec`` on the hot
    path; retained as the equivalence oracle for the property test."""
    k = len(plists)
    doc_sets = [np.unique(p // _DOC_STRIDE) for p, _ in plists]
    docs = doc_sets[0]
    for d in doc_sets[1:]:
        docs = np.intersect1d(docs, d, assume_unique=True)
    starts_all, ends_all, docs_all = [], [], []
    scores_all: list[list[np.ndarray]] = [[] for _ in range(k)]
    for d in docs:
        sub = []
        for p, s in plists:
            lo = np.searchsorted(p, d * _DOC_STRIDE, side="left")
            hi = np.searchsorted(p, (d + 1) * _DOC_STRIDE, side="left")
            sub.append((p[lo:hi] - d * _DOC_STRIDE, s[lo:hi]))
        st, en, sc = _unordered_matches(sub, slop)
        if len(st):
            starts_all.append(st + d * _DOC_STRIDE)
            ends_all.append(en + d * _DOC_STRIDE)
            docs_all.append(np.full(len(st), d, dtype=np.int64))
            for i in range(k):
                scores_all[i].append(sc[i])
    if not starts_all:
        empty = np.array([], dtype=np.int64)
        return empty, empty, [np.array([], dtype=np.float32)] * k, empty
    return (
        np.concatenate(starts_all),
        np.concatenate(ends_all),
        [np.concatenate(s).astype(np.float32) for s in scores_all],
        np.concatenate(docs_all),
    )


# ---------------------------------------------------------------------------
# Spark plans
# ---------------------------------------------------------------------------


def _resolve(
    query,
    config: LatticeConfig,
    params: MatchLatticeParams,
    analyzer: str = "default",
):
    if isinstance(query, str):
        terms = analyze_query(query, config, analyzer)
    else:
        terms = analyze_multi_phrase(query, config, analyzer)
    slop = params.effective_slop(config, len(terms))
    return terms, slop


def analyze_multi_phrase(
    slots, config: LatticeConfig, analyzer: str = "default"
) -> list:
    """Multi-phrase query analysis (Lucene MultiPhraseQuery analog — the
    reference delegates phrase/multi-phrase/phrase-prefix to the text
    query machinery, ``mapper/LatticeFieldMapper.java:259-271``): the
    query is a list of per-position slots, each a string or a list of
    alternative strings ("synonyms at one position").  Every alternative
    runs through the query analyzer and must come out as exactly one
    term.  Returns the slot list with single-alternative slots collapsed
    to plain strings (the downstream kernels treat a list slot as
    match-any-of)."""
    terms: list = []
    for slot in slots:
        alts = [slot] if isinstance(slot, str) else list(slot)
        if not alts:
            raise ValueError("multi-phrase slot with no alternatives")
        analyzed = []
        for alt in alts:
            t = analyze_query(alt, config, analyzer)
            if len(t) != 1:
                raise ValueError(
                    "each multi-phrase alternative must analyze to one "
                    f"term; {alt!r} analyzed to {t!r}"
                )
            analyzed.append(t[0])
        uniq = sorted(set(analyzed))
        terms.append(uniq[0] if len(uniq) == 1 else uniq)
    return terms


def _flat_terms(terms: list) -> list[str]:
    """Flatten multi-phrase slots to the candidate-term list."""
    out: list[str] = []
    for t in terms:
        if isinstance(t, str):
            out.append(t)
        else:
            out.extend(t)
    return out


def _zero_terms_hits(source: DataFrame, params: MatchLatticeParams) -> DataFrame:
    """zero_terms_query='all': every doc matches with MIN_SCORE (× boost)."""
    return source.select(
        "doc_id",
        F.lit(float(MIN_SCORE) * params.boost).alias("score"),
        F.lit(0).alias("n_spans"),
    )


def _compose_score(
    hits: DataFrame,
    tokens: DataFrame,
    terms: list[str],
    params: MatchLatticeParams,
    phrase_prefix: bool,
    doclen: DataFrame | None = None,
) -> DataFrame:
    """A7: ``include_span_score`` — multiply the engine-native similarity
    (BM25 over the token table) into the payload score, mirroring
    ``LatticePayloadScoreQuery.java:333-339`` (``scoreCurrentDoc`` returns
    ``getSpanScore() * payloadScore`` when includeSpanScore), then apply the
    builder ``boost``.  Exposes the decomposition as ``payload_score`` /
    ``similarity`` columns (the Explanation analog at the doc level).

    The joined tables are both keyed by doc_id — an ordinary shuffle join
    that AQE converts to broadcast when the hit list is small."""
    from full_lattice_search_spark.operators.bm25 import bm25_scores

    boost = float(params.boost)
    sims = bm25_scores(tokens, terms, prefix_last=phrase_prefix, doclen=doclen)
    sims = sims.withColumnRenamed("bm25", "similarity")
    scored = (
        hits.withColumnRenamed("score", "payload_score")
        .join(sims, "doc_id")
        .withColumn(
            "score",
            F.col("payload_score") * F.col("similarity") * F.lit(boost),
        )
    )
    front = ["doc_id", "score", "n_spans", "payload_score", "similarity"]
    rest = [c for c in scored.columns if c not in front]
    return scored.select(*front, *rest)


# Above this many distinct candidate tokens the idf map is no longer
# inlined as a plan literal (driver memory / plan size); the composition
# falls back to a relational join on the df frame.
_MAX_IDF_LITERALS = 4096


def _compose_from_stats_join(
    matched: DataFrame,
    token_df: DataFrame,
    n_docs: int,
    avgdl: float,
    boost: float,
) -> DataFrame:
    """Join-based twin of ``_compose_from_stats``'s literal-map fold, for
    unbounded candidate vocabularies (short phrase_prefix on a large
    corpus): idf stays a distributed (token, df) frame, per-doc tf entries
    explode (≤ candidate terms per doc) and join on token — AQE picks
    broadcast vs shuffle by the actual df-frame size.  Same formula and
    constants; only the float64 summation order can differ."""
    from full_lattice_search_spark.operators.bm25 import B, K1

    idf_df = token_df.select(
        "token",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("count") + F.lit(0.5))
            / (F.col("count") + F.lit(0.5))
        ).alias("idf"),
    )
    exploded = matched.select(
        "doc_id",
        "n_spans",
        "payload_score",
        F.col("dl").cast("double").alias("dl_d"),
        F.explode(F.arrays_zip("tf_tokens", "tf_counts")).alias("z"),
    ).select(
        "doc_id",
        "n_spans",
        "payload_score",
        "dl_d",
        F.col("z.tf_tokens").alias("token"),
        F.col("z.tf_counts").cast("double").alias("tf"),
    )
    part = F.col("idf") * (
        F.col("tf")
        * F.lit(K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(K1)
            * (F.lit(1.0 - B) + F.lit(B) * F.col("dl_d") / F.lit(avgdl))
        )
    )
    return (
        exploded.join(idf_df, "token")
        .groupBy("doc_id")
        .agg(
            F.first("n_spans").alias("n_spans"),
            F.first("payload_score").alias("payload_score"),
            F.sum(part).alias("similarity"),
        )
        .withColumn(
            "score",
            F.col("payload_score") * F.col("similarity") * F.lit(boost),
        )
        .select("doc_id", "score", "n_spans", "payload_score", "similarity")
    )


def _compose_from_stats(stats: DataFrame, boost: float) -> DataFrame:
    """A7 composition from the SINGLE tokenize pass: ``stats`` is the
    per-document output of the fused tokenize+match+stats kernel
    (SPAN_STATS_SCHEMA) — payload-score hit fields plus the raw corpus
    statistics (dl, per-query-term tf).  BM25 is assembled from those
    columns with the same formula/constants as ``bm25_scores``.

    Corpus statistics (n_docs, total length, per-term df — a
    query-vocabulary-sized set) are collected by one eager tiny job over
    the persisted stats frame and become PLAN-TIME LITERALS (an idf map),
    so the per-doc similarity is a row-local fold over that doc's ≤|terms|
    tf entries — no explode, no join, no aggregation shuffle.  (The HOF
    lambda runs interpreted, but over a handful of elements per row with
    literal-only math — not the hot-path-HOF anti-pattern, which is about
    corpus-sized arrays re-evaluating heavy subexpressions.)

    ``stats`` is consumed by the eager stats job and the final
    projection, so the caller persists it — one materialization of one
    row per document, O(docs) not O(tokens)."""
    import math

    from full_lattice_search_spark.operators.bm25 import B, K1

    crow = stats.filter(F.col("dl") > 0).agg(
        F.count("*").alias("n"), F.sum("dl").alias("t")
    ).collect()[0]
    n_docs = int(crow["n"] or 0)
    total_len = int(crow["t"] or 0)
    token_df = (
        stats.filter(F.size("tf_tokens") > 0)
        .select(F.explode("tf_tokens").alias("token"))
        .groupBy("token")
        .count()
    )
    # The literal idf map is only safe for a bounded vocabulary: a
    # phrase_prefix query's candidate set is every distinct corpus token
    # with the prefix, and inlining that into the plan (and the driver)
    # does not scale.  Probe with limit(N+1) — if the vocabulary exceeds
    # the cap, compose via a relational join on the df frame instead.
    df_rows = token_df.limit(_MAX_IDF_LITERALS + 1).collect()
    matched = stats.filter("matched")
    if n_docs == 0 or not df_rows:  # no postings → no matched rows either
        return matched.select(
            "doc_id",
            F.lit(None).cast("double").alias("score"),
            "n_spans",
            "payload_score",
            F.lit(None).cast("double").alias("similarity"),
        )
    avgdl = total_len / n_docs
    if len(df_rows) > _MAX_IDF_LITERALS:
        return _compose_from_stats_join(
            matched, token_df, n_docs, avgdl, boost
        )
    idf_map = F.create_map(
        *[
            c
            for r in df_rows
            for c in (
                F.lit(r["token"]),
                F.lit(
                    math.log(
                        1.0
                        + (n_docs - int(r["count"]) + 0.5)
                        / (int(r["count"]) + 0.5)
                    )
                ),
            )
        ]
    )
    dl_d = F.col("dl").cast("double")
    similarity = F.aggregate(
        F.arrays_zip("tf_tokens", "tf_counts"),
        F.lit(0.0),
        lambda acc, z: acc
        + F.element_at(idf_map, z["tf_tokens"])
        * (
            z["tf_counts"].cast("double")
            * F.lit(K1 + 1.0)
            / (
                z["tf_counts"].cast("double")
                + F.lit(K1)
                * (F.lit(1.0 - B) + F.lit(B) * dl_d / F.lit(avgdl))
            )
        ),
    )
    return (
        matched.withColumn("similarity", similarity)
        .withColumn(
            "score",
            F.col("payload_score") * F.col("similarity") * F.lit(boost),
        )
        .select("doc_id", "score", "n_spans", "payload_score", "similarity")
    )


def _lucene_idf_terms(
    terms: list, dfs: dict[str, int], prefix: bool
) -> list[str]:
    """The distinct term set Lucene's SpanWeight collects for the idf sum
    (``extractTermStates`` dedups into a Map<Term, TermStates>; terms
    absent from the corpus contribute no TermStatistics).  For
    phrase_prefix the last slot expands to every corpus token with the
    prefix ("blended" statistics over the rewritten SpanOr); multi-phrase
    slots contribute each alternative."""
    fixed = terms[:-1] if prefix else terms
    out = list(dict.fromkeys(_flat_terms(fixed)))
    if prefix:
        p = terms[-1]
        out.extend(
            t for t in sorted(dfs) if t.startswith(p) and t not in out
        )
    return [t for t in out if dfs.get(t, 0) > 0]


def _compose_from_stats_lucene(
    stats: DataFrame, terms: list, boost: float, prefix: bool = False
) -> DataFrame:
    """``similarity='lucene'``: compose the RECONSTRUCTED ES-7.x Lucene
    span similarity (see ``bm25.lucene_legacy_span_similarity`` and
    FIXTURES.md §6) from the single-pass stats frame — the engine then
    reproduces the reference's published end-to-end scores:

    - freq: the kernel's float32 sloppy span frequency (Σ 1/(1+gaps));
    - dl: overlap-discounted token count, quantized to Lucene's 4-bit
      SmallFloat norm (byte4 roundtrip with the 24-value free-value
      offset — exact below 40, 24 + top-4-bits of (dl-24) above);
    - avgdl: sumTotalTermFreq/docCount (FULL token count — Lucene's dl
      and avgdl are structurally inconsistent on lattice fields);
    - idf/weight: corpus constants — ONE eager tiny statistics job over
      the persisted stats frame collects k df values + 2 scalars (like
      the IVF literal centroids), then they become plan-time literals;
    - every composition step cast through float32, matching Lucene's
      association order.
    """
    df_rows = (
        stats.filter(F.size("tf_tokens") > 0)
        .select(F.explode("tf_tokens").alias("token"))
        .groupBy("token")
        .count()
        .collect()
    )
    dfs = {r["token"]: int(r["count"]) for r in df_rows}
    weight, avgdl = _lucene_corpus_consts(
        stats.select("doc_id", "dl"),
        dfs,
        _lucene_idf_terms(terms, dfs, prefix),
        boost,
    )
    sim = _lucene_sim_sql(weight, avgdl)
    return (
        stats.filter("matched")
        .withColumn("similarity", F.expr(sim).cast("double"))
        .withColumn(
            "score",
            F.expr(f"cast(cast(payload_score as float) * {sim} as float)")
            .cast("double"),
        )
        .select("doc_id", "score", "n_spans", "payload_score", "similarity")
    )


def _lucene_sim_sql(weight: float, avgdl: float) -> str:
    """Float32 Lucene-similarity SQL over per-row ``sloppy_freq`` /
    ``dl_norm`` columns with plan-time ``weight``/``avgdl`` literals.  The
    `d` suffixes matter: bare fractional literals parse as DECIMAL in
    Spark SQL and would silently turn the norm into 6-digit decimal math."""
    from full_lattice_search_spark.operators.bm25 import B, K1

    # Lucene SmallFloat.byte4ToInt(intToByte4(dl_norm)): exact below 24
    # (NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) = 24 small
    # values get dedicated bytes), else 24 + top-4-significant-bits of
    # (dl_norm - 24).  A plain top-4-bit truncation is wrong for e.g.
    # 21 (->20) and 50 (->48): Lucene keeps both exact.
    s_expr = (
        "greatest(cast(floor(log2(greatest(dl_norm - 24, 1))) as int)"
        " - 3, 0)"
    )
    dlq = (
        f"(case when dl_norm < 24 then dl_norm else 24 + "
        f"shiftleft(shiftright(dl_norm - 24, {s_expr}), {s_expr}) end)"
    )
    norm = f"({K1!r}d * (1.0d - {B!r}d + {B!r}d * {dlq} / {avgdl!r}d))"
    tfn = f"cast(sloppy_freq / (sloppy_freq + {norm}) as float)"
    return f"cast(cast({weight!r}d as float) * {tfn} as float)"


def _lucene_corpus_consts(
    doclen: DataFrame, dfs: dict[str, int], terms: list[str], boost: float
) -> tuple[float, float]:
    """(weight, avgdl) literals from corpus statistics, float32-composed
    exactly like ``lucene_legacy_span_similarity``."""
    import math

    from full_lattice_search_spark.operators.bm25 import K1

    crow = doclen.filter(F.col("dl") > 0).agg(
        F.count("*").alias("n"), F.sum("dl").alias("t")
    ).collect()[0]
    n_docs = int(crow["n"] or 0)
    total_len = int(crow["t"] or 0)
    if n_docs == 0:
        return 0.0, 1.0
    idf = np.float32(
        sum(
            math.log(
                1.0 + (n_docs - dfs.get(t, 0) + 0.5) / (dfs.get(t, 0) + 0.5)
            )
            for t in terms
        )
    )
    weight = float(np.float32(np.float32(boost * (K1 + 1.0)) * idf))
    avgdl = float(np.float32(total_len / n_docs))
    return weight, avgdl


def _compose_lucene_tokens(
    hits: DataFrame,
    tokens: DataFrame,
    terms: list,
    boost: float,
    doclen: DataFrame | None = None,
    prefix: bool = False,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """``similarity='lucene'`` for the token-table path: corpus statistics
    (dl, overlap-discounted dl_norm, per-term df) come from the token
    table itself — the index-statistics analog; one eager tiny job turns
    them into plan-time literals, then the float32 composition joins the
    per-doc dl_norm onto the freq-carrying hits.

    ``doclen``: precomputed (doc_id, dl, dl_norm) statistics table (the
    materialized index writes one).  Required when ``tokens`` is a pruned
    view: per-doc lengths can't be recovered from pruned postings, while
    per-term df CAN (a term's postings all live in its own bucket).

    ``vocab``: precomputed (token, df) term dictionary (the index writes
    one at ``{path}_vocab``).  When given, dfs come from it instead of a
    postings aggregation — required for ``prefix`` over a pruned view
    (the expansion vocabulary spans buckets the view may not include),
    and cheaper everywhere (the dictionary is pre-aggregated and
    token-sorted, so the prefix filter is a parquet range scan)."""
    if doclen is None:
        doclen = tokens.groupBy(
            F.col("doc_id").cast("string").alias("doc_id")
        ).agg(
            F.count("*").alias("dl"),
            F.sum((F.col("pos_inc") > 0).cast("long")).alias("dl_norm"),
        )
    elif "dl_norm" not in doclen.columns:
        raise ValueError(
            "similarity='lucene' needs a doclen table with a dl_norm "
            "column (overlap-discounted length); rebuild the token index "
            "with this version's write_token_index"
        )
    else:
        doclen = doclen.select(
            F.col("doc_id").cast("string").alias("doc_id"), "dl", "dl_norm"
        )
    df_pred = F.col("token").isin(_flat_terms(terms))
    if prefix:
        df_pred = df_pred | F.col("token").startswith(terms[-1])
    if vocab is not None:
        df_rows = vocab.filter(df_pred).select("token", "df").collect()
    else:
        df_rows = (
            tokens.filter(df_pred)
            .groupBy("token")
            .agg(F.countDistinct("doc_id").alias("df"))
            .collect()
        )
    dfs = {r["token"]: int(r["df"]) for r in df_rows}
    weight, avgdl = _lucene_corpus_consts(
        doclen, dfs, _lucene_idf_terms(terms, dfs, prefix), boost
    )
    sim = _lucene_sim_sql(weight, avgdl)
    scored = (
        hits.withColumnRenamed("score", "payload_score")
        .join(doclen.select("doc_id", "dl_norm"), "doc_id")
        .withColumn("similarity", F.expr(sim).cast("double"))
        .withColumn(
            "score",
            F.expr(f"cast(cast(payload_score as float) * {sim} as float)")
            .cast("double"),
        )
    )
    front = ["doc_id", "score", "n_spans", "payload_score", "similarity"]
    # explain arrays (span_start/span_end/span_score) ride along; the
    # composition internals (dl_norm, sloppy_freq) are dropped — freq is
    # recomputable from the span boundaries
    rest = [
        c
        for c in scored.columns
        if c not in front and c not in ("dl_norm", "sloppy_freq")
    ]
    return scored.select(*front, *rest)


def match_lattice(
    docs: DataFrame,
    query: str,
    config: LatticeConfig | None = None,
    params: MatchLatticeParams | None = None,
    top_k: int | None = None,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    dtype: type = np.float32,
    phrase_prefix: bool = False,
    query_analyzer: str = "default",
    explain: bool = False,
) -> DataFrame:
    """Document-scan match: tokenize + span-match + score in one
    ``mapInPandas`` pass over the interleaved documents table.

    Physical plan: parquet scan (column-pruned to doc_id+spans) →
    JVM substring prefilter → ArrowEval mapInPandas → optional
    TakeOrderedAndProject.  No shuffle except the final top-k merge.

    With the reference-default ``include_span_score=True`` the payload score
    is multiplied by the engine-native BM25 similarity.  The corpus
    statistics BM25 needs (document lengths, term frequencies, document
    frequencies) come from the SAME fused kernel that matches: it emits one
    row per document carrying both the hit fields and (dl, per-term tf),
    and the similarity is composed from those columns — the corpus is
    tokenized exactly once.  The per-doc stats frame feeds the eager
    statistics job and the hit projection, so it is persisted
    (MEMORY_AND_DISK) — one O(docs)-row materialization, never O(tokens).
    Cache lifecycle: Spark keeps the cached frame registered until
    ``unpersist``/session end.  A LONG-RUNNING driver issuing many
    ad-hoc composed queries should wrap each in
    ``composed_cache_scope()`` (or call ``release_composed_caches()``
    periodically) — scoped unpersist of exactly these frames, nothing
    else; standing queries belong on the materialized token index
    (statistics live in the index, nothing is cached per query).  A
    per-job driver doesn't care.
    The JVM substring prefilter is skipped on this path because corpus
    statistics are defined over every document, matched or not; the
    matcher's own term filter makes non-candidate docs nearly free.
    ``explain=True`` composed scoring keeps the two-pass formulation (the
    explain arrays don't flow through the stats schema).  Deployments at
    scale can still prefer the materialized token index
    (``match_lattice_tokens``), where statistics come from the same table
    the matcher reads.
    """
    config = config or LatticeConfig()
    params = params or MatchLatticeParams()
    if params.include_span_score and docs.isStreaming:
        raise ValueError(
            "include_span_score=True needs corpus statistics, which are "
            "undefined over an unbounded stream; pass "
            "include_span_score=False for streaming matches (see "
            "streaming/stream.py:match_stream)"
        )
    terms, slop = _resolve(query, config, params, query_analyzer)
    if phrase_prefix and terms and not isinstance(terms[-1], str):
        raise ValueError(
            "phrase_prefix needs a single-term final slot, got "
            f"alternatives {terms[-1]!r}"
        )

    spark = docs.sparkSession
    if not terms:
        if params.zero_terms_query == "none":
            return spark.createDataFrame([], HITS_SCHEMA)
        return _zero_terms_hits(
            docs.select(F.col(doc_id_col).cast("string").alias("doc_id")),
            params,
        )

    narrow = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        text_values_col(spans_col).alias("values"),
    )

    in_order, pf, ln = params.in_order, params.payload_function, (
        params.payload_length_norm_factor
    )

    if params.include_span_score and not explain:
        # SINGLE-PASS composed scoring: the same kernel that matches also
        # emits each document's dl and per-query-term tf, and BM25 is
        # composed from those columns (see docstring).  No prefilter —
        # corpus statistics cover every document.
        from pyspark import StorageLevel

        from full_lattice_search_spark.schema import SPAN_STATS_SCHEMA

        want_lucene = params.similarity == "lucene"

        def run_stats(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                toks = tokenize_pandas(pdf["doc_id"], pdf["values"], config)
                hits_pdf = match_tokens_pandas(
                    toks, terms, slop, in_order, pf, ln, dtype,
                    prefix_last=phrase_prefix, with_freq=want_lucene,
                )
                out = pd.DataFrame({"doc_id": pdf["doc_id"].astype(str)})
                dl = toks.groupby("doc_id").size()
                out["dl"] = (
                    out["doc_id"].map(dl).fillna(0).astype("int64")
                )
                # overlap-discounted length (Lucene norms don't count
                # posinc=0 lattice alternatives)
                dln = (
                    toks[toks["pos_inc"].to_numpy() > 0]
                    .groupby("doc_id")
                    .size()
                )
                out["dl_norm"] = (
                    out["doc_id"].map(dln).fillna(0).astype("int64")
                )
                cand_mask = toks["token"].isin(_flat_terms(terms))
                if phrase_prefix and terms:
                    cand_mask |= (
                        toks["token"].str.startswith(terms[-1]).fillna(False)
                    )
                tf = (
                    toks[cand_mask]
                    .groupby(["doc_id", "token"])
                    .size()
                    .reset_index(name="tf")
                )
                g = tf.groupby("doc_id")
                # docs without any candidate term map to NaN — Arrow needs
                # None for a null array cell, not a float
                out["tf_tokens"] = [
                    x if isinstance(x, list) else None
                    for x in out["doc_id"].map(g["token"].agg(list))
                ]
                out["tf_counts"] = [
                    x if isinstance(x, list) else None
                    for x in out["doc_id"].map(g["tf"].agg(list))
                ]
                hm = hits_pdf.set_index("doc_id")
                out["payload_score"] = out["doc_id"].map(hm["score"])
                out["n_spans"] = (
                    out["doc_id"].map(hm["n_spans"]).fillna(0).astype("int32")
                )
                out["matched"] = out["doc_id"].isin(hm.index)
                if want_lucene:
                    out["sloppy_freq"] = out["doc_id"].map(hm["sloppy_freq"])
                else:
                    out["sloppy_freq"] = np.nan
                yield out[
                    [
                        "doc_id", "payload_score", "n_spans", "matched",
                        "dl", "tf_tokens", "tf_counts", "sloppy_freq",
                        "dl_norm",
                    ]
                ]

        stats = narrow.mapInPandas(
            run_stats, schema=SPAN_STATS_SCHEMA
        ).persist(StorageLevel.MEMORY_AND_DISK)
        _COMPOSED_STATS_CACHE.append(stats)  # see composed_cache_scope
        if want_lucene:
            hits = _compose_from_stats_lucene(
                stats, terms, float(params.boost), prefix=phrase_prefix
            )
        else:
            hits = _compose_from_stats(stats, float(params.boost))
        if top_k is not None:
            hits = hits.orderBy(F.desc("score"), "doc_id").limit(top_k)
        return hits

    # JVM-side candidate prefilter: ONE substring probe on the longest query
    # term (a superset of token equality — the bare token prefixes each pipe
    # record; length is the cheap rarity proxy).  Probing every term here
    # would re-evaluate the document-reconstruction chain once per Contains:
    # Catalyst collapses the projection into the (interpreted, HOF-bearing)
    # Filter, so a k-term query rebuilt each doc's text k times in the scan
    # stage (r01 PLANS.md).  The Python matcher verifies ALL terms anyway —
    # a doc missing any term yields no postings — so the single-probe filter
    # is correctness-neutral and evaluates the concat chain exactly once.
    #
    # VALIDITY: the probe compares an ANALYZED term against the RAW text,
    # which is a superset only while the follow-on chain maps each token to
    # a lowercase-substring of itself — true for 'lowercase', FALSE for
    # transforming filters (soundex turns 'Robert' into 'R163', which never
    # appears in the raw text; asciifold folds accents the raw text still
    # carries).  With a transforming chain the prefilter must be skipped.
    # Multi-phrase slots can't anchor the probe (the doc may contain any
    # alternative) — probe the longest SINGLE-term slot, or skip when
    # every slot is a multi.
    single_terms = [t for t in terms if isinstance(t, str)]
    if (
        not set(config.effective_follow_on()) - {"lowercase"}
        and single_terms
    ):
        probe = max(single_terms, key=len).lower()
        narrow = narrow.filter(
            F.lower(F.concat_ws(" ", F.col("values"))).contains(probe)
        )

    want_lucene = (
        params.include_span_score and params.similarity == "lucene"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            toks = tokenize_pandas(pdf["doc_id"], pdf["values"], config)
            yield match_tokens_pandas(
                toks, terms, slop, in_order, pf, ln, dtype,
                prefix_last=phrase_prefix, explain=explain,
                with_freq=want_lucene,
            )

    schema = _hits_output_schema(explain, with_freq=want_lucene)
    hits = narrow.mapInPandas(run, schema=schema)
    if params.include_span_score:
        # only reachable with explain=True (the default composed path is
        # the single-pass kernel above): two-pass so the explain arrays
        # survive composition
        from full_lattice_search_spark.functions.tokenizer import (
            lattice_tokenize,
        )

        tokens = lattice_tokenize(docs, config, doc_id_col=doc_id_col,
                                  spans_col=spans_col)
        if want_lucene:
            hits = _compose_lucene_tokens(
                hits, tokens, terms, float(params.boost),
                prefix=phrase_prefix,
            )
        else:
            hits = _compose_score(
                hits, tokens, terms, params, phrase_prefix
            )
    elif params.boost != 1.0:
        hits = hits.withColumn(
            "score", F.col("score") * F.lit(float(params.boost))
        )
    if top_k is not None:
        hits = hits.orderBy(F.desc("score"), "doc_id").limit(top_k)
    return hits


def match_lattice_tokens(
    tokens: DataFrame,
    query: str,
    config: LatticeConfig | None = None,
    params: MatchLatticeParams | None = None,
    top_k: int | None = None,
    dtype: type = np.float32,
    phrase_prefix: bool = False,
    query_analyzer: str = "default",
    explain: bool = False,
    doclen: DataFrame | None = None,
    assume_doc_clustered: bool = False,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Token-table match: ``token IN terms`` filter (pushed down to the
    scan) → shuffle by doc_id → per-doc span DP via ``applyInPandas``.

    Use when the token stream is pre-materialized (the engine's "index").
    If the token table is bucketed/partitioned by doc_id the exchange
    disappears entirely.  The reference-default ``include_span_score=True``
    multiplies in the engine-native BM25 similarity computed from the same
    token table (the index-statistics analog).

    Semantics note: with ``zero_terms_query='all'`` this path returns only
    documents that produced at least one token (all-media documents are not
    present in a token table) — the document-scan path returns every doc.
    """
    config = config or LatticeConfig()
    params = params or MatchLatticeParams()
    terms, slop = _resolve(query, config, params, query_analyzer)
    if phrase_prefix and terms and not isinstance(terms[-1], str):
        raise ValueError(
            "phrase_prefix needs a single-term final slot, got "
            f"alternatives {terms[-1]!r}"
        )
    spark = tokens.sparkSession
    if not terms:
        if params.zero_terms_query == "none":
            return spark.createDataFrame([], HITS_SCHEMA)
        return _zero_terms_hits(
            tokens.select(F.col("doc_id").cast("string")).distinct(), params
        )

    want_lucene = (
        params.include_span_score and params.similarity == "lucene"
    )
    if want_lucene:
        if phrase_prefix and doclen is not None and vocab is None:
            raise ValueError(
                "similarity='lucene' with phrase_prefix over a pruned "
                "index view (doclen passed) needs the index's vocabulary "
                "table to supply the expansion set's document "
                "frequencies — pass vocab (write_token_index writes it "
                "at {path}_vocab), or use match_lattice_indexed which "
                "wires it automatically"
            )
        if doclen is not None and "dl_norm" not in doclen.columns:
            raise ValueError(
                "similarity='lucene' needs a doclen table with a dl_norm "
                "column; rebuild the token index with this version's "
                "write_token_index"
            )

    in_order, pf, ln = params.in_order, params.payload_function, (
        params.payload_length_norm_factor
    )

    pred = F.col("token").isin(_flat_terms(terms))
    if phrase_prefix:
        pred = pred | F.col("token").startswith(terms[-1])
    cand = tokens.filter(pred).select(
        "doc_id", "token", "abs_pos", "score", "seq"
    )

    # One hash exchange co-locates each doc's candidate rows; the sort makes
    # them contiguous so mapInPandas can process thousands of docs per Arrow
    # batch (a per-doc applyInPandas would pay one UDF call per document).
    # Arrow may still split a partition into multiple batches mid-document,
    # so incomplete trailing docs are carried over to the next batch.
    #
    # ``assume_doc_clustered``: the caller guarantees each document's rows
    # are already contiguous-and-sorted within one input split (a table
    # written ``bucketBy(n, doc_id).sortBy(doc_id, abs_pos, seq)``, or an
    # Iceberg table with a doc_id bucket transform + sort order) — the
    # exchange AND the sort disappear; the match becomes a pure scan →
    # ArrowEval map, the zero-shuffle index path at 100 TB.
    if not assume_doc_clustered:
        n_part = tokens.sparkSession.sparkContext.defaultParallelism
        cand = cand.repartition(n_part, "doc_id").sortWithinPartitions(
            "doc_id", "abs_pos", "seq"
        )

    def run(batches) -> "pd.DataFrame":
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_doc = pdf["doc_id"].iloc[-1]
            tail_mask = pdf["doc_id"] == last_doc
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if len(head):
                yield match_tokens_pandas(
                    head, terms, slop, in_order, pf, ln, dtype,
                    prefix_last=phrase_prefix, explain=explain,
                    with_freq=want_lucene,
                )
        if carry is not None and len(carry):
            yield match_tokens_pandas(
                carry, terms, slop, in_order, pf, ln, dtype,
                prefix_last=phrase_prefix, explain=explain,
                with_freq=want_lucene,
            )

    schema = _hits_output_schema(explain, with_freq=want_lucene)
    hits = cand.mapInPandas(run, schema=schema)
    if want_lucene:
        hits = _compose_lucene_tokens(
            hits, tokens, terms, float(params.boost), doclen=doclen,
            prefix=phrase_prefix, vocab=vocab,
        )
    elif params.include_span_score:
        hits = _compose_score(
            hits, tokens, terms, params, phrase_prefix, doclen=doclen
        )
    elif params.boost != 1.0:
        hits = hits.withColumn(
            "score", F.col("score") * F.lit(float(params.boost))
        )
    if top_k is not None:
        hits = hits.orderBy(F.desc("score"), "doc_id").limit(top_k)
    return hits


def exists_lattice(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """P2: exists query — documents whose lattice field would index at
    least one token (the analog of ES ``exists`` on the mapped field:
    a text span with non-whitespace content).  Pure JVM plan: the span
    projection + one trimmed-length filter, no Python, no shuffle."""
    joined = F.concat_ws(" ", text_values_col(spans_col))
    return docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        joined.alias("_j"),
    ).filter(F.length(F.trim(F.col("_j"))) > 0).select("doc_id")


def match_snippets(
    tokens: DataFrame,
    query: str,
    config: LatticeConfig | None = None,
    params: MatchLatticeParams | None = None,
    dtype: type = np.float32,
    assume_doc_clustered: bool = False,
) -> DataFrame:
    """Highlight surface: the matched span windows with their token text.

    Composes the explain arrays (span boundaries per hit) with the token
    table: explode spans → doc_id-equi join with a position-range predicate
    → ordered concat of the query-term tokens inside each window.  Returns
    distinct (doc_id, span_start, span_end, snippet).

    At scale this is one extra equi-join keyed on doc_id against the
    already-filtered ``token IN terms`` projection — the range predicate
    rides along as a post-join filter, never a cross product."""
    config = config or LatticeConfig()
    params = params or MatchLatticeParams()
    terms, _ = _resolve(query, config, params, "default")
    hits = match_lattice_tokens(
        tokens, query, config, params, dtype=dtype, explain=True,
        assume_doc_clustered=assume_doc_clustered,
    )
    spans = hits.select(
        "doc_id",
        F.explode(F.arrays_zip("span_start", "span_end")).alias("s"),
    ).select(
        "doc_id",
        F.col("s.span_start").alias("span_start"),
        F.col("s.span_end").alias("span_end"),
    ).distinct()
    toks = tokens.filter(F.col("token").isin(terms)).select(
        "doc_id",
        "token",
        F.col("abs_pos").cast("long").alias("abs_pos"),
    ).distinct()
    joined = spans.join(toks, "doc_id").filter(
        (F.col("abs_pos") >= F.col("span_start"))
        & (F.col("abs_pos") < F.col("span_end"))
    )
    return (
        joined.groupBy("doc_id", "span_start", "span_end")
        .agg(
            F.concat_ws(
                " ",
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(abs_pos, token))), s -> s.token)"
                ),
            ).alias("snippet")
        )
    )


def match_lattice_many(
    tokens: DataFrame,
    queries: list[tuple[str, str]],
    config: LatticeConfig | None = None,
    params: MatchLatticeParams | None = None,
    dtype: type = np.float32,
    assume_doc_clustered: bool = False,
) -> DataFrame:
    """Batch execution of many standing queries in ONE pass — the
    percolator-shaped operator: at 10^12 documents, N queries as N jobs
    cost N corpus scans; this costs one.

    ``queries``: (query_id, query) pairs sharing ``params`` — each query
    a text string or a multi-phrase slot list.  The scan
    filter is ``token IN union(all query terms)`` (still pushed down); one
    shuffle co-locates each doc's candidate rows; the per-batch matcher
    then runs each query's span DP over the already-localized postings
    (pure numpy — the marginal cost per extra query is the DP, not IO).
    Output: (query_id, doc_id, score, n_spans), payload-only scoring
    (compose BM25 per query downstream if needed — corpus statistics are
    query-independent).

    Zero-term queries (all stopwords/whitespace) honor
    ``params.zero_terms_query`` exactly like ``match_lattice``: 'none'
    contributes no rows for that query_id; 'all' emits a MIN_SCORE row per
    distinct document (one extra distinct over the token table, only paid
    when such a query is present)."""
    from pyspark.sql import types as T

    config = config or LatticeConfig()
    params = params or MatchLatticeParams()
    if params.include_span_score:
        raise ValueError(
            "match_lattice_many scores payload-only; compose BM25 per "
            "query downstream (corpus statistics are query-independent)"
        )
    analyzed: list[tuple[str, list, int]] = []
    zero_qids: list[str] = []
    union_terms: set[str] = set()
    for qid, qtext in queries:
        # a list-shaped query is a multi-phrase slot list (same contract
        # as match_lattice)
        if isinstance(qtext, str):
            terms = analyze_query(qtext, config)
        else:
            terms = analyze_multi_phrase(qtext, config)
        if not terms:
            zero_qids.append(qid)
            continue
        slop = params.effective_slop(config, len(terms))
        analyzed.append((qid, terms, slop))
        union_terms.update(_flat_terms(terms))
    schema = T.StructType(
        [T.StructField("query_id", T.StringType(), False)]
        + list(HITS_SCHEMA.fields)
    )
    spark = tokens.sparkSession
    zero_hits = None
    if zero_qids and params.zero_terms_query == "all":
        qdf = spark.createDataFrame(
            [(q,) for q in zero_qids], schema="query_id string"
        )
        zero_hits = (
            tokens.select("doc_id")
            .distinct()
            .crossJoin(F.broadcast(qdf))
            .select(
                "query_id",
                F.col("doc_id").cast("string").alias("doc_id"),
                F.lit(float(MIN_SCORE) * params.boost)
                .cast("double")
                .alias("score"),
                F.lit(0).cast("int").alias("n_spans"),
            )
        )
    if not analyzed:
        if zero_hits is not None:
            return zero_hits
        return spark.createDataFrame([], schema)

    cand = tokens.filter(
        F.col("token").isin(sorted(union_terms))
    ).select("doc_id", "token", "abs_pos", "score", "seq")
    if not assume_doc_clustered:
        n_part = spark.sparkContext.defaultParallelism
        cand = cand.repartition(n_part, "doc_id").sortWithinPartitions(
            "doc_id", "abs_pos", "seq"
        )
    in_order, pf, ln = params.in_order, params.payload_function, (
        params.payload_length_norm_factor
    )

    def run_queries(pdf: pd.DataFrame) -> Iterator[pd.DataFrame]:
        for qid, terms, slop in analyzed:
            out = match_tokens_pandas(
                pdf, terms, slop, in_order, pf, ln, dtype
            )
            out.insert(0, "query_id", qid)
            yield out

    def run(batches) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if len(pdf) == 0:
                continue
            last_doc = pdf["doc_id"].iloc[-1]
            tail_mask = pdf["doc_id"] == last_doc
            carry = pdf[tail_mask]
            head = pdf[~tail_mask]
            if len(head):
                yield from run_queries(head)
        if carry is not None and len(carry):
            yield from run_queries(carry)

    matched = cand.mapInPandas(run, schema=schema)
    if zero_hits is not None:
        matched = matched.unionByName(zero_hits)
    return matched
