"""End-to-end corpus curation: extract → quality-filter → dedup.

The composed training-data pipeline over interleaved documents:

1. extract main-content spans (zero-shuffle mapInArrow),
2. score extracted text (length / stopword-ratio quality features),
3. drop low-quality documents,
4. deduplicate — ``exact`` (md5 hash-groupBy keep-min) or ``minhash``
   (LSH candidate pairs; a doc is dropped when it pairs with a
   lexically-smaller survivor — the standard greedy LSH dedup).

Everything stays declarative on top of the extraction stage.  Scale notes:
exact dedup is a single window shuffle on the text hash (row_number()==1
keeps the min-id survivor — no join, no per-distinct-text table); the
minhash drop is a plain left_anti whose strategy AQE picks at runtime —
dedup side tables grow with the corpus dup rate (30-50% on web data), so
nothing here is ever force-broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.functions.text import (
    STOPWORDS,
    marker_count_col,
)
from full_lattice_search_spark.operators.dedup import (
    lsh_candidate_pairs,
    minhash_signature,
)
from full_lattice_search_spark.operators.extract import extract_spans


def extracted_text(extracted: DataFrame) -> DataFrame:
    """(doc_id, text) — the document's extracted text content (all text
    spans joined in source order)."""
    return extracted.select(
        "doc_id",
        F.expr(
            "concat_ws(' ', transform("
            "filter(spans, s -> s.text is not null), s -> s.text))"
        ).alias("text"),
    )


def _score(texts: DataFrame) -> DataFrame:
    """Quality features keyed by the (string) doc_id."""
    toks = "split(lower(text), ' ')"
    n_tokens = F.expr(f"size({toks})")
    stop_ratio = marker_count_col("text", STOPWORDS) / n_tokens
    quality = F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.6
        + F.lit(0.4) * (F.lit(1.0) - F.least(stop_ratio * 2, F.lit(1.0))),
        4,
    )
    return texts.select(
        "doc_id",
        "text",
        n_tokens.cast("long").alias("n_tokens"),
        quality.alias("quality"),
    )


def curate_documents(
    docs: DataFrame,
    config: LatticeConfig | None = None,
    min_quality: float = 0.2,
    min_tokens: int = 3,
    dedup: str = "exact",
    max_band_bucket: int | None = None,
) -> DataFrame:
    """Returns (doc_id, text, n_tokens, quality) for surviving documents.

    ``dedup`` modes: 'exact' (text-hash groups), 'minhash' (pair-greedy:
    drop every doc that LSH-pairs with a smaller doc_id — one join, but
    under-drops transitive chains whose smallest member connects through
    larger intermediaries), 'minhash_cc' (connected components over the
    pairs — keeps exactly one doc per transitive near-dup component, at
    the cost of the label-propagation rounds), 'none'."""
    if dedup not in ("exact", "minhash", "minhash_cc", "none"):
        raise ValueError(f"unknown dedup mode [{dedup}]")
    config = config or LatticeConfig()

    texts = extracted_text(extract_spans(docs, config))
    scored = _score(texts)
    kept = scored.filter(
        (F.col("quality") >= min_quality)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("text") != "")
    )

    if dedup == "none":
        return kept
    if dedup == "exact":
        # one shuffle on the text hash, no join: the min-doc_id survivor per
        # duplicate group is row_number()==1.  (A groupBy+join formulation
        # materializes one row per DISTINCT TEXT — corpus-sized at a web-
        # scale dup rate — and must never be broadcast.)
        from pyspark.sql import Window

        w = Window.partitionBy(F.md5(F.lower(F.trim("text")))).orderBy(
            "doc_id"
        )
        return (
            kept.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    # minhash: drop every doc that shares an LSH band with a smaller doc_id.
    # Plain left_anti — the dropped-id side grows with the corpus dup rate
    # (30-50% on web data), so the join strategy is left to AQE.
    sigs = minhash_signature(kept, id_cast=None)
    # doc_a < doc_b (lexical on strings); max_band_bucket guards the
    # band self-join against degenerate boilerplate buckets at scale
    pairs = lsh_candidate_pairs(sigs, max_band_bucket=max_band_bucket)
    if dedup == "minhash_cc":
        from full_lattice_search_spark.operators.dedup import (
            near_dup_groups,
        )

        groups = near_dup_groups(pairs)
        dropped = groups.filter(
            F.col("doc_id") != F.col("group_id")
        ).select("doc_id")
        return kept.join(dropped, "doc_id", "left_anti")
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return kept.join(dropped, "doc_id", "left_anti")
