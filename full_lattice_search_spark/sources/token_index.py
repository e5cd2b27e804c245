"""Materialized token index — the engine's analog of the inverted index.

The reference rides on Lucene postings: a term query touches only that
term's postings list.  The Spark-native equivalent is a token table
*partitioned by a hash bucket of the token*: a `match_lattice` over the
index resolves its query terms to bucket ids at plan time, so the scan
prunes to |terms| partitions out of ``n_token_buckets`` — at 100 TB the
difference between reading everything and reading ~1/256 of the index per
term.  Within a bucket, `token IN (...)` still pushes into parquet
row-group stats.

Layout note: on a real deployment this is an Iceberg table with
``bucket(n, token)`` partition transform plus a secondary sort on
``(doc_id, abs_pos)``; plain parquet `partitionBy` reproduces the pruning
behavior in this sandbox.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from full_lattice_search_spark.config import LatticeConfig, MatchLatticeParams
from full_lattice_search_spark.functions.tokenizer import lattice_tokenize
from full_lattice_search_spark.operators.match import (
    analyze_query,
    match_lattice_tokens,
)

DEFAULT_TOKEN_BUCKETS = 64


def token_bucket_col(token_col: str, n_buckets: int) -> F.Column:
    return F.pmod(F.xxhash64(F.col(token_col)), F.lit(n_buckets)).cast("int")


def write_token_index(
    docs: DataFrame,
    path: str,
    config: LatticeConfig | None = None,
    n_token_buckets: int = DEFAULT_TOKEN_BUCKETS,
) -> None:
    """Tokenize the corpus and persist the postings partitioned by token
    bucket.  One shuffle (the partitionBy write redistribution is avoided —
    rows are appended under their partition directory per task).

    Also persists the per-document length table at ``{path}_doclen`` — the
    index-statistics analog (Lucene keeps norms/doc lengths at index time).
    Queries with ``include_span_score`` read BM25 stats from it instead of
    re-scanning the pruned postings (which would be both wrong and a full
    scan).  The table carries both ``dl`` (full token count — avgdl's
    basis) and ``dl_norm`` (overlap-discounted count, what a Lucene norm
    stores) so BOTH similarity flavors work over the pruned index."""
    config = config or LatticeConfig()
    tokens = lattice_tokenize(docs, config).withColumn(
        "token_bucket", token_bucket_col("token", n_token_buckets)
    )
    tokens.write.mode("overwrite").partitionBy("token_bucket").parquet(path)
    (
        docs.sparkSession.read.parquet(path)  # re-read, not re-tokenize
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("dl"),
            F.sum((F.col("pos_inc") > 0).cast("long")).alias("dl_norm"),
        )
        .write.mode("overwrite")
        .parquet(f"{path}_doclen")
    )


def match_lattice_indexed(
    spark: SparkSession,
    index_path: str,
    query: str,
    config: LatticeConfig | None = None,
    params: MatchLatticeParams | None = None,
    top_k: int | None = None,
    n_token_buckets: int = DEFAULT_TOKEN_BUCKETS,
) -> DataFrame:
    """match_lattice over the materialized index: plan-time bucket
    resolution → partition pruning → rowgroup pushdown → span DP."""
    config = config or LatticeConfig()
    params = params or MatchLatticeParams()
    terms = analyze_query(query, config)
    tokens = spark.read.parquet(index_path)
    if terms:
        # resolve buckets on the driver with the same hash the writer used
        bucket_df = spark.createDataFrame(
            [(t,) for t in terms], "token string"
        ).select(token_bucket_col("token", n_token_buckets).alias("b"))
        buckets = sorted({r["b"] for r in bucket_df.collect()})
        tokens = tokens.filter(F.col("token_bucket").isin(buckets))
    doclen = None
    if params.include_span_score:
        doclen = spark.read.parquet(f"{index_path}_doclen")
    return match_lattice_tokens(
        tokens, query, config, params, top_k=top_k, doclen=doclen
    )
