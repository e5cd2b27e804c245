"""End-to-end corpus curation: extract → quality-filter → dedup.

The composed training-data pipeline over interleaved documents:

1. extract main-content spans (zero-shuffle mapInArrow),
2. score extracted text (length / stopword-ratio quality features),
3. drop low-quality documents,
4. deduplicate — ``exact`` (md5 hash-groupBy keep-min) or ``minhash``
   (LSH candidate pairs; a doc is dropped when it pairs with a
   lexically-smaller survivor — the standard greedy LSH dedup).

Everything stays declarative: aggregations and anti-joins on top of the
extraction stage.  At 100 TB the hash/signature tables are narrow
projections and the dropped-ids side of the anti-join is small → broadcast.
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
) -> DataFrame:
    """Returns (doc_id, text, n_tokens, quality) for surviving documents."""
    if dedup not in ("exact", "minhash", "none"):
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
        reps = kept.groupBy(F.md5(F.lower(F.trim("text"))).alias("h")).agg(
            F.min("doc_id").alias("keep_id")
        )
        return (
            kept.withColumn("h", F.md5(F.lower(F.trim("text"))))
            .join(F.broadcast(reps), "h")
            .filter(F.col("doc_id") == F.col("keep_id"))
            .drop("h", "keep_id")
        )
    # minhash: drop every doc that shares an LSH band with a smaller doc_id
    sigs = minhash_signature(kept, id_cast=None)
    pairs = lsh_candidate_pairs(sigs)  # doc_a < doc_b (lexical on strings)
    dropped = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    return kept.join(F.broadcast(dropped), "doc_id", "left_anti")
