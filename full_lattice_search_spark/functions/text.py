"""Text-analysis functions for training-data curation: language ID,
quality scoring, token counting, fingerprinting.

All column expressions (JVM, codegen) — designed so a SQL engine (DuckDB)
reproduces them exactly, which is how the correctness oracles work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# n-gram-free heuristic language profiles: stopword marker sets.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "of", "and", "to", "in", "a", "is"),
    "es": ("el", "la", "de", "que", "y", "los"),
    "de": ("der", "die", "und", "das", "ist", "von"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "zh": ("de5", "shi4", "le5"),  # romanized placeholders
}

STOPWORDS = LANG_MARKERS["en"]


def _toks(text_col: str) -> str:
    return f"split(lower({text_col}), ' ')"


def marker_count_col(text_col: str, markers: tuple[str, ...]) -> Column:
    arr = ", ".join(f"'{m}'" for m in markers)
    return F.expr(
        f"size(filter({_toks(text_col)}, t -> array_contains(array({arr}), t)))"
    )


def lang_id(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic language ID: argmax of marker-set hit counts; ties resolve
    in fixed profile order (en first)."""
    counts = {
        lang: marker_count_col(text_col, m).alias(f"c_{lang}")
        for lang, m in LANG_MARKERS.items()
    }
    scored = docs.select(
        F.col(id_col).cast("long").alias("doc_id"), *counts.values()
    )
    langs = list(LANG_MARKERS)
    best = F.greatest(*[F.col(f"c_{lang}") for lang in langs])
    pred = None
    for lang in reversed(langs):
        cond = F.when(F.col(f"c_{lang}") == best, F.lit(lang))
        pred = cond.otherwise(pred) if pred is not None else cond
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.cast("long").alias("marker_hits"),
    )


def quality_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Length / word-shape / stopword-ratio quality features + a composite
    score in [0, 1].  The formula is arbitrary but fixed — the point is the
    plumbing and the oracle parity."""
    toks = _toks(text_col)
    n_tokens = F.expr(f"size({toks})")
    mean_len = F.expr(
        f"(length({text_col}) - (size({toks}) - 1)) / size({toks})"
    )
    stop_ratio = marker_count_col(text_col, STOPWORDS) / n_tokens
    quality = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.6
        + F.lit(0.4) * (F.lit(1.0) - F.least(stop_ratio * 2, F.lit(1.0))),
        4,
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_len, 4).alias("mean_token_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def token_counts(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Whitespace token count + a BPE-ish subword proxy: runs of letters,
    runs of digits, and isolated non-space symbols each count as one."""
    ws = F.expr(f"size(split({text_col}, ' '))")
    bpe = F.expr(
        f"size(regexp_extract_all({text_col}, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]', 0))"
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        ws.cast("long").alias("ws_tokens"),
        bpe.cast("long").alias("bpe_tokens"),
    )


def fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefix_tokens: int = 16,
) -> DataFrame:
    """Document fingerprints: full-text hash + head fingerprint over the
    first ``prefix_tokens`` tokens (cheap near-head-dup probe)."""
    toks = _toks(text_col)
    full = F.md5(F.lower(F.trim(F.col(text_col))))
    head = F.expr(
        f"md5(concat_ws(' ', slice({toks}, 1, {prefix_tokens})))"
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        full.alias("fp_full"),
        head.alias("fp_head"),
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (the rolling-hash scheme of
    Schleimer/Wilkerson/Aiken's MOSS): hash every word k-gram, slide a
    window of ``w`` consecutive k-gram hashes over the document, keep each
    window's minimum — the guaranteed-density fingerprint set that makes
    partial-overlap detection position-robust (any shared run of
    w+k-1 tokens shares at least one selected hash).

    Plan: posexplode k-grams → one md5 + conv per k-gram (codegen) → one
    shuffle by doc for the ordered window min (min of struct(hash, pos):
    no ties in a 48-bit space, so the selection is deterministic) →
    distinct selected hashes, sorted, per doc.  Returns
    (doc_id, fp: '|'-joined sorted distinct selected hashes, n_fp).
    """
    from pyspark.sql import Window

    grams = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(
            f"""
            transform(
              sequence(1, greatest(size(split(lower({text_col}), ' ')) - {k - 1}, 1)),
              i -> concat_ws(' ', slice(split(lower({text_col}), ' '), i, {k}))
            )
            """
        ).alias("_grams"),
    ).select(
        "doc_id", F.posexplode("_grams").alias("gpos", "gram")
    )
    hashed = grams.select(
        "doc_id",
        "gpos",
        F.conv(F.substring(F.md5("gram"), 1, 12), 16, 10)
        .cast("bigint")
        .alias("h"),
    )
    win = (
        Window.partitionBy("doc_id")
        .orderBy("gpos")
        .rowsBetween(0, w - 1)
    )
    n_win = Window.partitionBy("doc_id")
    sel = hashed.withColumn("_mh", F.min("h").over(win)).withColumn(
        "_n", F.count("*").over(n_win)
    )
    # only full windows select (window start i <= n-w), except short docs
    # (< w k-grams) which contribute their single global minimum
    sel = sel.filter(
        (F.col("gpos") <= F.col("_n") - w)
        | ((F.col("_n") < w) & (F.col("gpos") == 0))
    )
    picked = sel.select("doc_id", F.col("_mh").alias("h")).distinct()
    return (
        picked.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "|", F.expr("transform(array_sort(collect_list(h)), x -> cast(x as string))")
            ).alias("fp"),
            F.count("*").cast("long").alias("n_fp"),
        )
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition signals: the fraction of word n-grams that
    are duplicates (1 - distinct/total) for n=2,3, and the most-frequent
    token's share.  High values flag boilerplate/degenerate text for
    pipeline filtering.  Partition-local array expressions, no shuffle;
    the token array is materialized ONCE in its own projection (inlining
    the split into the HOF lambdas would re-tokenize per element), and the
    top-token share is a single O(n) fold over the sorted array rather
    than a distinct×filter O(n²) sweep."""
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.expr(_toks(text_col)).alias("_toks"),
    )

    def frac_dup(n: int, alias: str):
        grams = (
            f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)),"
            f" i -> concat_ws(' ', slice(_toks, i, {n})))"
        )
        return F.round(
            F.lit(1.0)
            - F.expr(f"size(array_distinct({grams}))")
            / F.expr(f"size({grams})"),
            4,
        ).alias(alias)

    # max run length over the sorted tokens == max token multiplicity
    top_share = F.round(
        F.expr(
            """
            aggregate(
              array_sort(_toks),
              named_struct('prev', '', 'cur', 0, 'best', 0),
              (a, t) -> named_struct(
                'prev', t,
                'cur', CASE WHEN t = a.prev THEN a.cur + 1 ELSE 1 END,
                'best', greatest(a.best,
                        CASE WHEN t = a.prev THEN a.cur + 1 ELSE 1 END)),
              a -> a.best
            )
            """
        )
        / F.expr("size(_toks)"),
        4,
    )
    return base.select(
        "doc_id",
        frac_dup(2, "frac_dup_2gram"),
        frac_dup(3, "frac_dup_3gram"),
        top_share.alias("top_token_share"),
    )


# conservative, RE2-and-Java-compatible patterns (no lookaround)
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_URL_RE = r"https?://[^ ]+"


def redact_pii(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Training-data hygiene: replace emails/URLs with typed placeholders
    and count the redactions.  Codegen regexp_replace over the scan —
    the standard pre-training scrub pass, shuffle-free."""
    # Column-API patterns (F.lit) — interpolating the regex into an F.expr()
    # SQL string would strip the backslash from '\.' at parse time, making the
    # counts match a *different* pattern than the replacements below.
    n_email = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL_RE), F.lit(0))
    )
    n_url = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(PII_URL_RE), F.lit(0))
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col(text_col), PII_EMAIL_RE, "<EMAIL>"),
        PII_URL_RE,
        "<URL>",
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        clean.alias("clean_text"),
        n_email.cast("long").alias("n_emails"),
        n_url.cast("long").alias("n_urls"),
    )


def _ngram_positions(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(doc_id, gpos, h): md5 hash of every word k-gram with its 0-based
    token position.  Docs shorter than k tokens produce no grams.  One
    explode + one md5 per gram — all codegen, no UDFs."""
    toks = _toks(text_col)
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.expr(
                f"""
                case when size({toks}) >= {k} then
                  transform(
                    sequence(1, size({toks}) - {k - 1}),
                    i -> concat_ws(' ', slice({toks}, i, {k}))
                  )
                else array() end
                """
            ).alias("_grams"),
        )
        .select("doc_id", F.posexplode("_grams").alias("gpos", "gram"))
        .select("doc_id", "gpos", F.md5("gram").alias("h"))
    )


def duplicate_ngram_stats(
    docs: DataFrame,
    k: int = 8,
    scope: str = "corpus",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring duplication signal (Lee et al., "Deduplicating
    Training Data Makes Language Models Better"): hash every word k-gram,
    count occurrences corpus-wide, and report per document how much of it
    is duplicated text.

    ``scope='corpus'``: a gram is duplicated if it occurs >= 2 times
    anywhere (including twice in one document — the paper's setting);
    ``'cross_doc'``: only if it appears in >= 2 distinct documents
    (boilerplate detection — ignores within-doc repetition).

    Returns (doc_id, n_grams, n_dup_grams, dup_ratio).

    100 TB shape: explode -> hash -> ONE groupBy(h) with map-side partial
    aggregation (the gram-hash table is corpus-sized: this is a shuffle
    join back on h, never a broadcast) -> per-doc partial agg.  All
    codegen; the only wide ops are the two hash exchanges.
    """
    if scope not in ("corpus", "cross_doc"):
        raise ValueError(f"unknown scope {scope!r}")
    grams = _ngram_positions(docs, k, id_col, text_col)
    counts = grams.groupBy("h").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    dup_cond = (
        (F.col("n_occ") >= 2)
        if scope == "corpus"
        else (F.col("n_docs") >= 2)
    )
    flagged = grams.join(counts, "h").withColumn(
        "is_dup", dup_cond.cast("long")
    )
    base = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_grams"),
        F.sum("is_dup").alias("n_dup_grams"),
    )
    return base.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("n_dup_grams", F.lit(0)).alias("n_dup_grams"),
        F.when(
            F.coalesce("n_grams", F.lit(0)) > 0,
            F.col("n_dup_grams") / F.col("n_grams"),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_ratio"),
    )


def strip_duplicate_ngrams(
    docs: DataFrame,
    k: int = 8,
    scope: str = "corpus",
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_first: bool = False,
) -> DataFrame:
    """Cut duplicated substrings out of each document (the removal step
    of exact-substring dedup): every token covered by at least one
    duplicated k-gram occurrence is dropped, and the survivors are
    re-joined in order.  Documents shorter than k tokens pass through
    unchanged.

    Removal policy: with the default ``keep_first=False``, EVERY
    occurrence of a duplicated gram is cut — corpus scope flags all
    copies, so no canonical copy survives and a fully-boilerplate
    document comes back with empty ``clean_text``.  That deviates from
    Lee et al. ("Deduplicating Training Data Makes Language Models
    Better"), whose ExactSubstr removal keeps one occurrence of each
    duplicated substring; pass ``keep_first=True`` to exempt the
    earliest occurrence per gram hash (ordered by (doc_id, position) —
    deterministic under any partitioning).

    Returns (doc_id, clean_text, n_tokens, n_kept).

    Plan: the ``duplicate_ngram_stats`` flagging join, then covered
    positions explode (k rows per duplicated gram), distinct, and an
    aggregation that rebuilds the text from the kept positions
    (collect_list -> array_sort by position -> concat_ws).  The rebuild
    collects one doc's tokens into one aggregation buffer — fine for
    documents (bounded size), never used across documents.  keep_first
    adds one min(struct(doc_id, gpos)) to the existing gram-hash
    aggregation — no extra shuffle."""
    if scope not in ("corpus", "cross_doc"):
        raise ValueError(f"unknown scope {scope!r}")
    grams = _ngram_positions(docs, k, id_col, text_col)
    counts = grams.groupBy("h").agg(
        F.count("*").alias("n_occ"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.min(F.struct("doc_id", "gpos")).alias("first_occ"),
    )
    dup_cond = (
        (F.col("n_occ") >= 2)
        if scope == "corpus"
        else (F.col("n_docs") >= 2)
    )
    flagged = grams.join(counts, "h").filter(dup_cond)
    if keep_first:
        flagged = flagged.filter(
            (F.col("doc_id") != F.col("first_occ.doc_id"))
            | (F.col("gpos") != F.col("first_occ.gpos"))
        )
    covered = (
        flagged
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("gpos"), F.col("gpos") + F.lit(k - 1))
            ).alias("pos"),
        )
        .distinct()
    )
    toks = _toks(text_col)
    tokens = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(F.expr(toks)).alias("pos", "tok"),
    )
    kept = tokens.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("clean_text"),
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(F.expr(toks)).cast("long").alias("n_tokens"),
    )
    return base.join(rebuilt, "doc_id", "left").select(
        "doc_id",
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        "n_tokens",
        F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
    )
