"""Fixed StructType schemas — the single source of truth for every table the
engine touches (the analog of the reference's `dynamic: strict` mappings)."""

from __future__ import annotations

from pyspark.sql import types as T

# Input: Iceberg-style table of interleaved text + media documents
# (BASELINE.json input_hint).
SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), True),
    ]
)

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
    ]
)

# Expanded token stream (the engine's "postings": one row per emitted token,
# duplicates from score buckets included, positions materialized).
TOKENS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("seq", T.IntegerType(), False),  # emission order
        T.StructField("token", T.StringType(), True),
        T.StructField("pos", T.IntegerType(), True),  # lattice position field
        T.StructField("rank", T.IntegerType(), True),
        T.StructField("score", T.FloatType(), True),  # float32 payload
        T.StructField("start_t", T.FloatType(), True),
        T.StructField("stop_t", T.FloatType(), True),
        T.StructField("pos_inc", T.IntegerType(), True),
        T.StructField("abs_pos", T.IntegerType(), True),  # running sum
    ]
)

# match_lattice output: per-doc hit row.
HITS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("n_spans", T.IntegerType(), False),
    ]
)

# Single-pass doc-scan composed scoring (include_span_score=True): per-doc
# row carrying BOTH the payload-score hit fields and the corpus-statistics
# raw material (document length, per-query-term term frequencies) so BM25
# composes from the same tokenize pass that matched — never a second
# tokenize of the corpus.  tf_tokens/tf_counts are parallel arrays (bounded
# by the query's term count + prefix expansions — a handful of entries, not
# per-span structures).
SPAN_STATS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("payload_score", T.DoubleType(), True),
        T.StructField("n_spans", T.IntegerType(), False),
        T.StructField("matched", T.BooleanType(), False),
        T.StructField("dl", T.LongType(), False),
        T.StructField("tf_tokens", T.ArrayType(T.StringType()), True),
        T.StructField("tf_counts", T.ArrayType(T.LongType()), True),
        # Lucene-flavor raw material (similarity="lucene"): float32 sloppy
        # span frequency; overlap-discounted document length (posinc>0
        # tokens only — what a Lucene norm stores before quantization)
        T.StructField("sloppy_freq", T.DoubleType(), True),
        T.StructField("dl_norm", T.LongType(), False),
    ]
)

# match_lattice(..., explain=True) output: per-doc hit row plus the per-span
# score breakdown (the analog of the reference's Explanation tree,
# LatticePayloadScoreQuery.java:316-326): doc-relative span boundaries and
# each span's payload score, in match-enumeration order.
EXPLAIN_HITS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("score", T.DoubleType(), True),
        T.StructField("n_spans", T.IntegerType(), False),
        T.StructField("span_start", T.ArrayType(T.LongType()), True),
        T.StructField("span_end", T.ArrayType(T.LongType()), True),
        T.StructField("span_score", T.ArrayType(T.DoubleType()), True),
    ]
)

# Extraction output (north_rule): ordered main-content spans per document.
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), True),
        T.StructField("n_spans", T.IntegerType(), True),
        T.StructField("n_text_chars", T.LongType(), True),
    ]
)

# Checkpoint table: per-partition lineage + metrics for idempotent resume.
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("run_id", T.StringType(), False),
        T.StructField("n_docs", T.LongType(), False),
        T.StructField("n_spans", T.LongType(), False),
        T.StructField("n_text_chars", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("wall_secs", T.DoubleType(), True),
    ]
)
