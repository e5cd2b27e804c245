"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — a cross product against a
  *broadcast* query set, all arithmetic in JVM higher-order functions
  (zip_with/aggregate), finished by TakeOrderedAndProject.  The baseline.
- ``lsh_bucket_topk``: sign-LSH (random-hyperplane style, here axis signs
  for determinism/portability) — bucket the corpus once, probe only the
  query's bucket: the 100 TB path, because the scan prunes to one bucket
  (partition the corpus table by ``bucket`` and this becomes partition
  pruning).
- ``embedding_dup_pairs``: blocked cosine near-duplicate detection.

No Python in the data plane; a Pandas-UDF variant would only win when k and
dim are large enough to make BLAS matter — at 64-dim the JVM codegen path
wins on serialization alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)"
_NORM = "sqrt(aggregate({a}, cast(0.0 as double), (acc, v) -> acc + cast(v as double) * cast(v as double)))"


def cosine_col(a: str, b: str) -> Column:
    dot = _DOT.format(a=a, b=b)
    na = _NORM.format(a=a)
    nb = _NORM.format(a=b)
    return F.expr(f"({dot}) / (({na}) * ({nb}))")


def sign_bucket_col(vec: str, n_dims: int = 8) -> Column:
    """Deterministic sign-LSH bucket: '1'/'0' per leading dimension."""
    parts = [
        f"CASE WHEN {vec}[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(n_dims)
    ]
    return F.expr("concat(" + ", ".join(parts) + ")")


def brute_force_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query row.  ``query`` is expected to
    be small → broadcast; the corpus is scanned once, no shuffle besides
    the final top-k merge."""
    q = F.broadcast(
        query.select(
            F.col(id_col).cast("long").alias("query_id"),
            F.col(vec_col).alias("qvec"),
        )
    )
    corpus = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("vec")
    )
    scored = corpus.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "vec_id",
        F.round(cosine_col("vec", "qvec"), 4).alias("cosine"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rn").cast("int").alias("rn"))
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 5,
    n_dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: only candidates in the query's sign bucket are
    scored.  With the corpus written partitioned by ``bucket``, the scan
    prunes to 1/2^n_dims of the data."""
    corpus = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
        sign_bucket_col(vec_col, n_dims).alias("bucket"),
    )
    q = F.broadcast(
        query.select(
            F.col(id_col).cast("long").alias("query_id"),
            F.col(vec_col).alias("qvec"),
            sign_bucket_col(vec_col, n_dims).alias("bucket"),
        )
    )
    scored = (
        corpus.join(q, "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col("vec", "qvec"), 4).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "vec_id", "cosine", F.col("rn").cast("int").alias("rn"))
    )


def embedding_dup_pairs(
    embeddings: DataFrame,
    block_col: str = "label",
    threshold: float = 0.995,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Blocked cosine near-duplicate pairs (exact within blocks)."""
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("vec"),
    )
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(cosine_col("a.vec", "b.vec"), 4).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)
