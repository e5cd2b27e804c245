"""Structured Streaming front-end for the extraction pipeline.

The reference is not a streaming system — each document is analyzed
independently at index time (SURVEY.md §2.10) — so the streaming surface is
exactly the batch extractor lifted onto an unbounded source: new parquet
files landing in a directory are discovered, extracted (the same
zero-shuffle mapInArrow stage), and appended to the sink with exactly-once
progress via the streaming checkpoint.  No watermarks or cross-event state
are needed; per-micro-batch metrics land in the same lineage table shape as
the batch checkpoint.

``trigger(availableNow=True)`` turns this into an incremental batch job —
the cloud-scale pattern for "catch up on everything new, then stop".
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from full_lattice_search_spark.config import LatticeConfig
from full_lattice_search_spark.operators.extract import extract_spans
from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA


def extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    config: LatticeConfig | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Stream-extract every document file that lands in ``input_dir``."""
    config = config or LatticeConfig()
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)

    extracted = extract_spans(docs, config)

    writer = (
        extracted.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def match_stream(
    spark: SparkSession,
    input_dir: str,
    query: str,
    output_dir: str,
    checkpoint_dir: str,
    config: LatticeConfig | None = None,
    slop: int = 0,
) -> StreamingQuery:
    """Standing match_lattice query over a document stream: every arriving
    document is tokenized+matched; hits append to the sink."""
    from full_lattice_search_spark.config import MatchLatticeParams
    from full_lattice_search_spark.operators.match import match_lattice

    config = config or LatticeConfig()
    docs = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    # payload-only scoring: BM25 corpus statistics are undefined over an
    # unbounded stream (and the stats aggregation is not append-mode-safe);
    # composed ranking belongs to the batch/token-index paths.
    hits = match_lattice(
        docs, query, config,
        MatchLatticeParams(slop=slop, include_span_score=False),
    )
    return (
        hits.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
