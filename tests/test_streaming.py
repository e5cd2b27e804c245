"""Structured Streaming extraction: incremental file discovery with
exactly-once progress across restarts (availableNow micro-batches)."""

from __future__ import annotations

import pyspark.sql.functions as F

from full_lattice_search_spark.datagen import synth_documents
from full_lattice_search_spark.streaming.stream import extract_stream, match_stream


def test_extract_stream_incremental(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    synth_documents(spark, 30, seed=11, mega_every=0).write.parquet(
        src, mode="append"
    )
    q = extract_stream(spark, src, out, ckpt)
    q.awaitTermination(120)
    first = spark.read.parquet(out).count()
    assert first == 30

    # second wave: only the new files are processed on restart
    synth_documents(spark, 20, seed=12, mega_every=0).withColumn(
        "doc_id", F.concat(F.lit("w2-"), F.col("doc_id"))
    ).write.parquet(src, mode="append")
    q2 = extract_stream(spark, src, out, ckpt)
    q2.awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() == 50
    assert result.select("doc_id").distinct().count() == 50

    # re-run with no new data: no duplicates (exactly-once bookkeeping)
    q3 = extract_stream(spark, src, out, ckpt)
    q3.awaitTermination(120)
    assert spark.read.parquet(out).count() == 50


def test_match_stream(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    synth_documents(spark, 10, seed=3, mega_every=0).write.parquet(src)
    q = match_stream(spark, src, "quick brown fox", out, ckpt, slop=2)
    q.awaitTermination(120)
    hits = spark.read.parquet(out)
    # fixture doc 2 ("the quick brick brown fox box" CN) must match
    assert hits.filter(F.col("doc_id") == "doc-000000000002").count() == 1


def test_sessionize_stream_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: per-user session indices must
    survive the micro-batch boundary (state carries last_ts/session_idx),
    matching the batch window semantics."""
    from full_lattice_search_spark.streaming.stream import sessionize_stream

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, user_id long, ts_s long, value double"

    # user 1: events at 0s, 600s | 5000s, 5300s (gap 1800 → two sessions);
    # user 2: 100s | 4000s — the second arrives in wave 2 mid-state
    wave1 = [(1, 1, 0, 1.0), (2, 1, 600, 1.0), (10, 2, 100, 1.0)]
    wave2 = [(3, 1, 5000, 1.0), (4, 1, 5300, 1.0), (11, 2, 4000, 1.0)]
    spark.createDataFrame(wave1, schema).write.parquet(src, mode="append")
    q = sessionize_stream(spark, src, out, ckpt)
    q.awaitTermination(120)

    spark.createDataFrame(wave2, schema).write.parquet(src, mode="append")
    q2 = sessionize_stream(spark, src, out, ckpt)
    q2.awaitTermination(120)

    rows = {
        (r["user_id"], r["event_id"]): r["session_idx"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {
        (1, 1): 1, (1, 2): 1,      # wave-1 session
        (1, 3): 2, (1, 4): 2,      # new session after 4400s gap (state kept)
        (2, 10): 1, (2, 11): 2,    # user 2 crosses the batch boundary
    }


def test_streaming_composed_scoring_rejected(spark, tmp_path):
    """include_span_score over an unbounded stream must fail fast with a
    clear message, not blow up mid-plan in the state checker."""
    import pytest

    from full_lattice_search_spark.config import (
        LatticeConfig,
        MatchLatticeParams,
    )
    from full_lattice_search_spark.operators.match import match_lattice
    from full_lattice_search_spark.schema import DOCUMENTS_SCHEMA

    src = str(tmp_path / "src")
    synth_documents(spark, 5, seed=1, mega_every=0).write.parquet(src)
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(src)
    with pytest.raises(ValueError, match="unbounded stream"):
        match_lattice(stream, "quick", LatticeConfig(), MatchLatticeParams())


def test_match_stream_multi_phrase(spark, tmp_path):
    """A multi-phrase slot-list query flows through the streaming front
    end unchanged (the batch matcher handles slot lists; the stream is
    just readStream -> match -> append sink)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    synth_documents(spark, 10, seed=3, mega_every=0).write.parquet(src)
    q = match_stream(
        spark, src, [["quick"], ["brick", "brown"]], out, ckpt, slop=2
    )
    q.awaitTermination(120)
    hits = spark.read.parquet(out)
    assert hits.filter(F.col("doc_id") == "doc-000000000002").count() == 1
