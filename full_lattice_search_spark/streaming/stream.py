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


def sessionize_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
) -> StreamingQuery:
    """Custom stateful streaming operator (``applyInPandasWithState``):
    gap-based sessionization of an event stream.

    Per ``user_id`` group state carries ``(last_ts_s, session_idx)`` across
    micro-batches, so a session spanning a batch boundary keeps its index —
    the semantics of the batch window formulation (q_events_sessionize),
    incrementalized.  Input parquet schema:
    (event_id long, user_id long, ts_s long, value double); events must
    arrive in event-time order per user across batches (the usual
    log-shipping contract).  Output: one row per event with its assigned
    session index — append mode, exactly-once via the streaming checkpoint.

    At scale this shuffles each micro-batch once on user_id (the state
    partitioning) — the same exchange the batch window pays — and state per
    key is two longs, so the state store stays tiny even at 10^9 users.
    """
    import pandas as pd

    schema = "event_id long, user_id long, ts_s long, value double"
    out_schema = "user_id long, event_id long, ts_s long, session_idx long"
    state_schema = "last_ts_s long, session_idx long"

    def assign(key, pdfs, state):
        import numpy as np

        (user_id,) = key
        if state.exists:
            last_ts, sess = state.get
        else:
            last_ts, sess = None, 0
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values(["ts_s", "event_id"], kind="stable")
            ts = pdf["ts_s"].to_numpy(dtype=np.int64)
            prev = np.empty_like(ts)
            prev[1:] = ts[:-1]
            prev[0] = last_ts if last_ts is not None else ts[0]
            new_sess = (ts - prev) > gap_seconds
            if last_ts is None:
                new_sess[0] = True  # first event ever starts session 1
            idx = sess + np.cumsum(new_sess)
            sess = int(idx[-1])
            last_ts = int(ts[-1])
            yield pd.DataFrame(
                {
                    "user_id": np.full(len(ts), user_id, dtype=np.int64),
                    "event_id": pdf["event_id"].to_numpy(dtype=np.int64),
                    "ts_s": ts,
                    "session_idx": idx.astype(np.int64),
                }
            )
        state.update((last_ts, sess))

    events = spark.readStream.schema(schema).parquet(input_dir)
    sessions = events.groupBy("user_id").applyInPandasWithState(
        assign, out_schema, state_schema, "append", "NoTimeout"
    )
    return (
        sessions.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
