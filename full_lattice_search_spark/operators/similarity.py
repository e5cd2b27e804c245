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

Two brute-force physical strategies, tested bit-equal:
``brute_force_topk`` (pure JVM HOF expressions — best for 1-few queries),
and ``brute_force_topk_arrow`` (one numpy matmul per Arrow batch with
per-partition top-k — wins once |queries|×dim amortizes the Arrow
round-trip: 2.7× at 32 queries × 64 dims, and the gap grows with both).
Everything else keeps Python out of the data plane entirely.
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


def l2_score_col(vec_expr: str, cvec: list[float]) -> Column:
    """Negative-squared-L2 ranking score against a LITERAL centroid:
    argmin ||v−c||² == argmax (2·v·c − ||c||²) since ||v||² is constant
    per row.  ||c||² is folded on the driver (left-to-right float64 — the
    order a DuckDB ``list_sum`` reproduces).  Division-free, so zero
    vectors need no guard — the metric PQ/k-means should use when
    magnitudes carry signal (Jégou et al. product quantization is
    L2-based; cosine assignment is near-arbitrary among codewords that
    point the same way, which is exactly the clustered-corpus regime)."""
    lit = "array(" + ", ".join(
        f"cast({float(x)!r} as double)" for x in cvec
    ) + ")"
    dot = _DOT.format(a=vec_expr, b=lit)
    c2 = 0.0
    for x in cvec:
        c2 += float(x) * float(x)
    return F.expr(f"2.0d * ({dot}) - cast({c2!r} as double)")


def safe_cosine_col(a: str, b: str) -> Column:
    """Cosine with a zero-vector guard: similarity 0.0 when either norm
    is zero (ANSI mode turns the bare division into an error).  Needed by
    residual-PQ, where the coarse seeds' residuals are exactly zero; for
    nonzero vectors the ELSE branch is bit-identical to ``cosine_col``."""
    dot = _DOT.format(a=a, b=b)
    na = _NORM.format(a=a)
    nb = _NORM.format(a=b)
    return F.expr(
        f"CASE WHEN ({na}) * ({nb}) = 0 THEN cast(0.0 as double) "
        f"ELSE ({dot}) / (({na}) * ({nb})) END"
    )


def sign_bucket_col(vec: str, n_dims: int = 8) -> Column:
    """Deterministic sign-LSH bucket: '1'/'0' per leading dimension.

    Degenerate on non-centered embeddings (a dimension whose values are
    mostly one sign contributes no discrimination) — prefer
    ``hyperplane_bucket_col`` unless axis determinism across engines is
    the point (it is, for the DuckDB oracle entries)."""
    parts = [
        f"CASE WHEN {vec}[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(n_dims)
    ]
    return F.expr("concat(" + ", ".join(parts) + ")")


def hyperplane_coeffs(
    n_planes: int, dim: int, seed: int
) -> list[list[float]]:
    """Seed-derived random hyperplane normals (float32 → exact doubles).
    Deterministic: the same (n_planes, dim, seed) triple yields the same
    literal coefficients on every engine, so the bucket function can be
    reproduced verbatim in an oracle SQL string."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_planes, dim)).astype(np.float32)
    return [[float(c) for c in p] for p in planes]


def hyperplane_bucket_col(
    vec: str, n_planes: int = 8, dim: int = 64, seed: int = 42
) -> Column:
    """True random-hyperplane sign-LSH bucket (Charikar SimHash for
    cosine): bit i = sign(h_i · vec) for seed-derived normals h_i.

    Unlike ``sign_bucket_col`` this is distribution-free — buckets stay
    balanced on non-centered or correlated embeddings.  The coefficients
    are PLAN-TIME LITERALS (one flat multiply-add chain per bit, pure
    codegen — no HOF interpreter, no runtime randomness), so with the
    corpus written partitioned by bucket this is still the
    partition-pruning path at 100 TB."""
    parts = []
    for plane in hyperplane_coeffs(n_planes, dim, seed):
        terms = " + ".join(
            f"cast({vec}[{j}] as double) * ({c!r})"
            for j, c in enumerate(plane)
        )
        parts.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
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
    # the query norm is constant per query row: compute it ONCE on the
    # broadcast side instead of re-folding the interpreted HOF per corpus
    # row (r06; identical IEEE ops — same fold over the same array, same
    # multiply order — so cosines are bit-identical, oracle-checked)
    q = F.broadcast(
        query.select(
            F.col(id_col).cast("long").alias("query_id"),
            F.col(vec_col).alias("qvec"),
        ).withColumn("qnorm", F.expr(_NORM.format(a="qvec")))
    )
    corpus = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("vec")
    )
    scored = corpus.crossJoin(q).filter(F.col("vec_id") != F.col("query_id"))
    dot = _DOT.format(a="vec", b="qvec")
    nv = _NORM.format(a="vec")
    scored = scored.select(
        "query_id",
        "vec_id",
        F.round(F.expr(f"({dot}) / (({nv}) * qnorm)"), 4).alias("cosine"),
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


def _flip_bit(bucket_expr: str, i: int, n_dims: int) -> str:
    """SQL for ``bucket_expr`` with character ``i`` (0-based) flipped."""
    flipped = (
        f"CASE WHEN substr({bucket_expr}, {i + 1}, 1) = '1' "
        f"THEN '0' ELSE '1' END"
    )
    pre = f"substr({bucket_expr}, 1, {i})" if i > 0 else "''"
    post = (
        f"substr({bucket_expr}, {i + 2}, {n_dims - i - 1})"
        if i < n_dims - 1
        else "''"
    )
    return f"concat({pre}, {flipped}, {post})"


def lsh_bucket_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 5,
    n_dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multi_probe: bool = False,
    plane_seed: int | None = None,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: only candidates in the query's sign bucket are
    scored.  With the corpus written partitioned by ``bucket``, the scan
    prunes to 1/2^n_dims of the data.

    ``multi_probe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's (n_dims+1 probes total) — the standard
    recall fix for sign-LSH: a vector near a hyperplane lands on either
    side, so the single-flip neighbours hold most of the missed
    candidates.  The probe set stays on the tiny broadcast query side
    (exploded), so the corpus still prunes to n_dims+1 of 2^n_dims
    buckets.

    ``plane_seed``: use seed-derived random hyperplanes
    (``hyperplane_bucket_col``, needs ``dim``) instead of axis signs —
    recall measured at sf0.1 in BENCH/BASELINE.md §ANN recall."""
    if plane_seed is not None:
        bucket = hyperplane_bucket_col(vec_col, n_dims, dim, plane_seed)
    else:
        bucket = sign_bucket_col(vec_col, n_dims)
    corpus = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
        bucket.alias("bucket"),
    )
    q = query.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
        bucket.alias("bucket"),
    )
    if multi_probe:
        variants = ["bucket"] + [
            _flip_bit("bucket", i, n_dims) for i in range(n_dims)
        ]
        q = q.select(
            "query_id",
            "qvec",
            F.explode(F.expr("array(" + ", ".join(variants) + ")")).alias(
                "bucket"
            ),
        )
    q = F.broadcast(q)
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
    # per-VECTOR norms are computed below the self-join (O(n) folds), not
    # per pair (O(pairs)) — same fold over the same array and the same
    # multiply order, so cosines are bit-identical (r06)
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(block_col).alias("blk"),
        F.col(vec_col).alias("vec"),
    ).withColumn("nrm", F.expr(_NORM.format(a="vec")))
    a = base.alias("a")
    b = base.alias("b")
    dot = _DOT.format(a="a.vec", b="b.vec")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.round(
            F.expr(f"({dot})") / (F.col("a.nrm") * F.col("b.nrm")), 4
        ).alias("cosine"),
    )
    return pairs.filter(F.col("cosine") >= threshold)


def ivf_assign(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, vec, cluster): assign every vector to its nearest centroid
    by cosine (tie → lowest centroid id).

    Centroids are plan-time constants (a k-row table by construction), so
    they are collected once on the driver and inlined as literal arrays:
    the assignment is a pure projection over the corpus scan — ZERO
    shuffle, no join, no window.  (A crossJoin+window formulation shuffles
    vec_id × n_centroids rows — corpus-sized × k at the design point.)
    At scale the assignment is written partitioned by ``cluster`` so probes
    become partition pruning — the IVF layout."""
    cents = centroids.select("cluster_id", "cvec").collect()  # k rows
    scored = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    )
    # argmax via array_max over (sim, -cluster_id) structs: max sim wins,
    # ties resolve to the LOWEST cluster id (negation flips the tiebreak)
    entries = []
    for r in cents:
        lit = "array(" + ", ".join(
            f"cast({float(x)!r} as double)" for x in r["cvec"]
        ) + ")"
        sim = cosine_col("vec", lit)
        entries.append(
            F.struct(
                sim.alias("s"),
                F.lit(-int(r["cluster_id"])).alias("nc"),
            )
        )
    best = F.array_max(F.array(*entries))
    return scored.select(
        "vec_id", "vec", (-best["nc"]).cast("long").alias("cluster")
    )


def seed_centroids(
    embeddings: DataFrame,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid stand-in: the first ``n_centroids`` vectors
    by id.  A production deployment trains centroids offline (k-means over
    a sample — an iterative join+groupBy loop, or any external trainer) and
    hands them to ``ivf_assign`` as a table; the IVF *serving* layout and
    plans are independent of how the centroids were fit, and a seeded
    choice keeps the whole path exactly reproducible cross-engine."""
    return (
        embeddings.orderBy(F.col(id_col).cast("long"))
        .limit(n_centroids)
        .select(
            F.col(id_col).cast("long").alias("cluster_id"),
            F.col(vec_col).alias("cvec"),
        )
    )


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: score only vectors assigned to the query's
    ``n_probe`` nearest centroids.  The scale path for ANN: with the
    assignment table partitioned by cluster, each query reads
    n_probe/n_centroids of the corpus; centroids and the probe list stay
    broadcast-tiny."""
    from pyspark.sql import Window

    cents = seed_centroids(embeddings, n_centroids, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)

    q = query.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    )
    qs = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "qvec",
        "cluster_id",
        cosine_col("qvec", "cvec").alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("cluster_id")
    )
    probes = (
        qs.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qvec", F.col("cluster_id").alias("cluster"))
    )

    scored = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine_col("vec", "qvec"), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("rn").cast("int").alias("rn")
        )
    )


def kmeans_train(
    embeddings: DataFrame,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mean_decimals: int = 8,
    zero_safe: bool = False,
    metric: str = "cosine",
) -> DataFrame:
    """Deterministic Lloyd k-means for IVF centroid training — the
    engine's iterative-algorithm pattern: a driver-side loop of
    fully-declarative rounds (assign = zero-shuffle literal-centroid
    projection, update = one groupBy).

    Determinism contract (what makes this exactly replayable anywhere):
    seeds are the first ``k`` vectors by id; assignment ties break to the
    lowest cluster id; and the mean update sums components in
    ``decimal(28, mean_decimals)`` — decimal addition is associative, so
    the accumulated sum is bit-identical under any partitioning/engine
    (unlike a float sum whose partial order leaks into the result) — then
    divides once in double (a single correctly-rounded IEEE op).  Returns
    (cluster_id, cvec array<double>, n_members) after ``iterations``
    rounds.

    At scale each round is one corpus scan + one narrow groupBy (k rows
    out); the loop count is a small constant — no per-row Python, no
    lineage blow-up (each round re-plans from the literal centroids, so
    the plan size stays O(k·dim), not O(rounds)).
    """
    if iterations < 1:
        raise ValueError("kmeans_train needs iterations >= 1")
    dim_row = embeddings.select(
        F.size(vec_col).alias("d")
    ).head()
    dim = int(dim_row["d"])
    cents = [
        (int(r["cluster_id"]), [float(x) for x in r["cvec"]])
        for r in seed_centroids(embeddings, k, id_col, vec_col).collect()
    ]
    base = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    )
    dec = f"decimal(28,{mean_decimals})"
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    cos = safe_cosine_col if zero_safe else cosine_col
    for _ in range(iterations):
        entries = []
        for cid, cvec in cents:
            if metric == "l2":
                score = l2_score_col("vec", cvec)
            else:
                lit = "array(" + ", ".join(
                    f"cast({float(x)!r} as double)" for x in cvec
                ) + ")"
                score = cos("vec", lit)
            entries.append(
                F.struct(
                    score.alias("s"),
                    F.lit(-cid).alias("nc"),
                )
            )
        best = F.array_max(F.array(*entries))
        assigned = base.select(
            "vec_id", "vec", (-best["nc"]).cast("long").alias("cluster")
        )
        # decimal sums (associative → partitioning-invariant), ONE double
        # division — the whole mean is deterministic cross-engine
        means = assigned.groupBy("cluster").agg(
            F.count("*").alias("n"),
            *[
                (
                    F.sum(F.expr(f"cast(vec[{j}] as {dec})"))
                    .cast("double")
                    / F.count("*")
                ).alias(f"c{j}")
                for j in range(dim)
            ],
        )
        rows = means.collect()  # k rows — plan-time constants for the
        cents = [               # next round's zero-shuffle assignment
            (int(r["cluster"]), [float(r[f"c{j}"]) for j in range(dim)])
            for r in sorted(rows, key=lambda r: r["cluster"])
        ]
    out = [
        (cid, cvec, next(int(r["n"]) for r in rows if r["cluster"] == cid))
        for cid, cvec in cents
    ]
    return embeddings.sparkSession.createDataFrame(
        out, "cluster_id long, cvec array<double>, n_members long"
    )


def brute_force_topk_arrow(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """BLAS path for exact cosine top-k: one numpy matmul per Arrow batch
    against the (driver-collected, tiny) query matrix, per-partition top-k
    inside the UDF, global top-k merge after.

    Same results as ``brute_force_topk`` on the test fixtures — but that
    equality is EMPIRICAL, not arithmetic-guaranteed: numpy/BLAS accumulates
    the dot product in SIMD/blocked order while the HOF path folds strictly
    left-to-right, so the two can differ by ~1 ULP, and a ULP that lands
    exactly on a 0.00005 rounding boundary would flip the 4-decimal cosine
    (and with it top-k membership / tie order).  Use ``brute_force_topk``
    when bit-stability across backends is a requirement; the equivalence
    test tolerates exactly this boundary case.  Wins when dim × |queries|
    is large enough that vectorized FMA beats the per-element HOF
    interpreter — the crossover the module docstring describes.  Shuffle
    budget: zero until the final per-query merge of (num_partitions × k)
    candidate rows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import Window

    q_rows = query.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ).collect()
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["qvec"] for r in q_rows], dtype=np.float64)
    q_norm = np.sqrt((q_mat * q_mat).sum(axis=1))

    corpus = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"), F.col(vec_col).alias("vec")
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            m = np.array(list(pdf["vec"]), dtype=np.float64)
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            norms = np.sqrt((m * m).sum(axis=1))
            sims = (m @ q_mat.T) / np.outer(norms, q_norm)
            out_q, out_v, out_c = [], [], []
            for j in range(len(q_ids)):
                col = np.round(sims[:, j], 4)
                mask = ids != q_ids[j]
                cand_ids, cand_c = ids[mask], col[mask]
                if len(cand_ids) > k:
                    # per-partition top-k under (-cosine, vec_id); the
                    # global window re-ranks the surviving n_part*k rows
                    top = np.lexsort((cand_ids, -cand_c))[:k]
                    cand_ids, cand_c = cand_ids[top], cand_c[top]
                out_q.append(np.full(len(cand_ids), q_ids[j]))
                out_v.append(cand_ids)
                out_c.append(cand_c)
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "vec_id": np.concatenate(out_v),
                    "cosine": np.concatenate(out_c),
                }
            )

    partial = corpus.mapInPandas(
        run, schema="query_id long, vec_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id", "vec_id", "cosine", F.col("rn").cast("int").alias("rn")
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the ANN memory-compression path
# ---------------------------------------------------------------------------


def _sub_expr(vec_col: str, s: int, dsub: int) -> str:
    return f"slice({vec_col}, {s * dsub + 1}, {dsub})"


def _cvec_lit(cvec: list[float]) -> str:
    return "array(" + ", ".join(
        f"cast({float(x)!r} as double)" for x in cvec
    ) + ")"


def pq_train(
    embeddings: DataFrame,
    m: int = 4,
    k: int = 4,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    zero_safe: bool = False,
    metric: str = "cosine",
) -> list[list[tuple[int, list[float]]]]:
    """Product-quantization codebooks (Jégou et al., "Product
    Quantization for Nearest Neighbor Search"): the embedding space is
    split into ``m`` contiguous subspaces and the DETERMINISTIC
    ``kmeans_train`` runs on each slice — decimal-sum means, tie-to-
    lowest assignment, so codebooks are bit-identical under any
    partitioning (and independently recomputable by the DuckDB oracle).

    Returns ``[subspace][(cluster_id, centroid)]`` sorted by cluster_id
    — k·dim driver-side floats that become plan-time literals downstream
    (cluster ids are the seed vector ids, kept as-is: they ARE the
    codes, no re-indexing).  At 100 TB the codebooks are trained on a
    SAMPLE (pass ``embeddings.sample(...)``); training cost is
    ``iterations`` corpus scans per subspace, each a zero-shuffle
    literal-centroid projection + one k-row groupBy."""
    dim = int(embeddings.select(F.size(vec_col).alias("d")).head()["d"])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    books = []
    for s in range(m):
        sub = embeddings.select(
            F.col(id_col).alias(id_col),
            F.expr(_sub_expr(vec_col, s, dsub)).alias("embedding"),
        )
        if zero_safe:
            # residual mode: zero subvectors (a coarse seed's residual,
            # or a slice that happens to vanish) are excluded from
            # TRAINING — under cosine they have no direction (and would
            # divide by zero), and under ANY metric letting them seed
            # produces k identical zero seeds (the coarse seeds are the
            # first ids), collapsing the codebook to one live codeword.
            # Encode still covers every row.
            sub = sub.filter(
                F.expr(_NORM.format(a="embedding")) > F.lit(0.0)
            )
        cents = kmeans_train(
            sub, k=k, iterations=iterations, id_col=id_col,
            vec_col="embedding", zero_safe=zero_safe, metric=metric,
        )
        books.append(
            [
                (int(r["cluster_id"]), [float(x) for x in r["cvec"]])
                for r in cents.orderBy("cluster_id").collect()
            ]
        )
    return books


def pq_encode(
    embeddings: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    zero_safe: bool = False,
    metric: str = "cosine",
) -> DataFrame:
    """(vec_id, codes array<bigint>): per subspace, the cluster_id of the
    nearest codebook centroid (cosine by default, ``metric='l2'`` for
    magnitude-aware assignment; ties to the LOWEST cluster_id — the same
    deterministic rule as ``kmeans_train``'s assignment).

    100 TB shape: the codes are a zero-shuffle projection against
    plan-time centroid literals (m·k cosine folds per row, all codegen)
    — the corpus is scanned once and stored as m smallints per vector,
    a ~(4·dim/m)× memory compression for the ANN scan."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"unknown metric {metric!r}")
    m = len(books)
    dsub = len(books[0][0][1])
    cos = safe_cosine_col if zero_safe else cosine_col
    code_cols = []
    for s in range(m):
        sub = _sub_expr(vec_col, s, dsub)
        entries = [
            F.struct(
                (
                    l2_score_col(sub, cvec)
                    if metric == "l2"
                    else cos(sub, _cvec_lit(cvec))
                ).alias("s"),
                F.lit(-cid).alias("nc"),
            )
            for cid, cvec in books[s]
        ]
        best = F.array_max(F.array(*entries))
        code_cols.append((-best["nc"]).cast("long"))
    return embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.array(*code_cols).alias("codes"),
    )


def ann_pq(
    embeddings: DataFrame,
    query: DataFrame,
    m: int = 4,
    k_codebook: int = 4,
    iterations: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k by ESTIMATED dot product:
    ``dot(q, v) = Σ_s dot(q_s, v_s) ≈ Σ_s dot(q_s, centroid[code_s])``
    — the subspace decomposition makes the estimate additively exact
    over the quantized vectors.

    The per-(subspace, code) dot table is computed on the driver
    (m·k doubles, summed left-to-right so the DuckDB oracle reproduces
    it bit-exactly) and becomes a plan-time literal map: the ADC scan is
    a zero-shuffle projection of m ``element_at`` lookups + one top-k —
    no distance arithmetic per row at all, the PQ property that makes
    100 TB ANN scans memory- and compute-cheap.  Returns
    (query_id, vec_id, est_dot, rn)."""
    from pyspark.sql import Window

    books = pq_train(
        embeddings, m=m, k=k_codebook, iterations=iterations,
        id_col=id_col, vec_col=vec_col,
    )
    dsub = len(books[0][0][1])
    qrow = query.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ).head()
    qid = int(qrow["query_id"])
    qvec = [float(x) for x in qrow["qvec"]]

    est = _adc_estimate(books, qvec)
    encoded = pq_encode(embeddings, books, id_col=id_col, vec_col=vec_col)
    scored = (
        encoded.filter(F.col("vec_id") != F.lit(qid))
        .select(
            F.lit(qid).alias("query_id"),
            "vec_id",
            F.round(est, 4).alias("est_dot"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("est_dot"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id", "vec_id", "est_dot",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def _adc_estimate(
    books: list[list[tuple[int, list[float]]]],
    qvec: list[float],
    init=None,
):
    """Plan-time literal ADC dot table over a ``codes`` column: for each
    subspace, dot(q_sub, centroid) is computed on the driver with a
    left-to-right float64 sum (the order the DuckDB oracle reproduces)
    and inlined as a map literal; the per-row estimate is m ``element_at``
    lookups summed left-to-right.  ``init``: optional leading term folded
    FIRST (residual-PQ's coarse dot) — float addition is not associative,
    so the fold order must match the oracle's left-to-right sum."""
    m = len(books)
    dsub = len(books[0][0][1])
    est = init
    for s in range(m):
        qsub = qvec[s * dsub:(s + 1) * dsub]
        entries = []
        for cid, cvec in books[s]:
            d = 0.0
            for x, y in zip(qsub, cvec):  # left-to-right, oracle-exact
                d += x * y
            entries += [F.lit(cid), F.lit(d)]
        lookup = F.element_at(F.create_map(*entries), F.col("codes")[s])
        est = lookup if est is None else est + lookup
    return est


def ann_pq_many(
    encoded: DataFrame,
    queries: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch-query PQ ADC — the production surface: codebooks are trained
    ONCE (``pq_train``, possibly on a sample) and the corpus is encoded
    ONCE (``pq_encode``, persist it or write it out), then each query
    costs only a literal-dot-table scan over the m-byte codes.  The
    single-query ``ann_pq`` retrains per call — fine for an oracle,
    wasteful for serving.

    The query batch is collected driver-side (an ANN query batch is small
    by construction); each query's top-k is a ``TakeOrderedAndProject``
    (per-partition top-k, driver merge — NO full sort, no wide shuffle),
    and the per-query plans share one cached ``encoded`` scan.  Returns
    (query_id, vec_id, est_dot, rn) for all queries."""
    from pyspark.sql import Window

    q_rows = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ).collect()
    if not q_rows:
        raise ValueError("empty query batch")
    outs = []
    for r in q_rows:
        qid = int(r["query_id"])
        est = _adc_estimate(books, [float(x) for x in r["qvec"]])
        outs.append(
            encoded.filter(F.col("vec_id") != F.lit(qid))
            .select(
                F.lit(qid).alias("query_id"),
                "vec_id",
                F.round(est, 4).alias("est_dot"),
            )
            .orderBy(F.desc("est_dot"), F.asc("vec_id"))
            .limit(k)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    # rn re-derived over the k survivors per query (tiny)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("est_dot"), F.asc("vec_id")
    )
    return out.withColumn(
        "rn", F.row_number().over(w).cast("int")
    )


def ann_pq_rerank(
    encoded: DataFrame,
    queries: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    embeddings: DataFrame,
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC shortlist → EXACT re-rank: the two-stage retrieval every
    production PQ deployment runs.  Stage 1 (``ann_pq_many``) scans only
    m-byte codes and keeps ``shortlist`` candidates per query; stage 2
    fetches those candidates' RAW vectors (a vec_id equi-join — an index
    lookup against a corpus bucketed by vec_id, NOT a scan) and re-scores
    them with exact cosine.

    Why it exists: ADC precision is bounded by codebook resolution, so on
    tightly clustered corpora (where the true top-k differ by less than
    the quantization noise) raw ADC recall@10 plateaus around 0.35 —
    while ADC recall@``shortlist`` stays high.  Measured on the planted-
    cluster corpus: 0.35 → 0.98 at shortlist=50, 0.99 at 100
    (BENCH/BASELINE.md ladder).  Cost: |queries|·shortlist exact cosines
    instead of |corpus|·|queries|.

    Returns (query_id, vec_id, cosine, rn)."""
    from pyspark.sql import Window

    q_rows = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ).collect()
    short = ann_pq_many(
        encoded, queries, books, k=shortlist, id_col=id_col,
        vec_col=vec_col,
    )
    return _exact_rerank(
        short, q_rows, embeddings, k, id_col=id_col, vec_col=vec_col
    )


def _exact_rerank(
    short: DataFrame,
    q_rows: list,
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The refine stage shared by the rerank composites: fetch the
    shortlist's RAW vectors (vec_id equi-join — an index lookup against a
    corpus bucketed by vec_id, not a scan), broadcast-join the query
    vectors on query_id, score with exact cosine via ``zip_with`` on the
    joined qvec column, window top-k per query.

    r06: this was a CASE chain of literal query vectors — O(|queries|)
    plan size, so Catalyst analysis choked at a few thousand queries.
    The broadcast equi-join carries the same float64 values (a collected
    float32 vector widens to the same doubles the literals held, and the
    ``cast(y as double)`` in the cosine fold is an exact no-op widening),
    so the scores are bit-identical — oracle-checked — with O(1) plan
    size in the batch width."""
    from pyspark.sql import Window

    spark = embeddings.sparkSession
    corpus = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).alias("vec"),
    )
    qdf = spark.createDataFrame(
        [(int(r["query_id"]), [float(x) for x in r["qvec"]]) for r in q_rows],
        "query_id long, qvec array<double>",
    )
    joined = (
        short.select("query_id", "vec_id")
        .join(corpus, "vec_id")
        .join(F.broadcast(qdf), "query_id")
    )
    scored = joined.select(
        "query_id", "vec_id",
        F.round(cosine_col("vec", "qvec"), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id", "vec_id", "cosine",
            F.col("rn").cast("int").alias("rn"),
        )
    )


def _residual_col(
    vec: F.Column,
    cluster: F.Column,
    cents_list: list[tuple[int, list[float]]],
):
    """vec − coarse_centroid[cluster], as a chained-CASE of literal
    zip_with subtractions (k coarse clusters → k branches, all codegen)."""
    expr = None
    for cid, cvec in cents_list:
        sub = F.zip_with(
            vec, F.expr(_cvec_lit(cvec)), lambda x, y: x - y
        )
        expr = (
            F.when(cluster == F.lit(cid), sub)
            if expr is None
            else expr.when(cluster == F.lit(cid), sub)
        )
    return expr


def ann_ivfpq(
    embeddings: DataFrame,
    query: DataFrame,
    n_centroids: int = 8,
    n_probe: int = 2,
    m: int = 4,
    k_codebook: int = 4,
    iterations: int = 2,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: list[list[tuple[int, list[float]]]] | None = None,
    residual: bool = False,
    rerank: int = 0,
) -> DataFrame:
    """IVF-PQ — the production composite for web-scale ANN: a coarse
    IVF layer prunes the corpus to the query's ``n_probe`` nearest
    clusters (partition pruning when the assignment is written
    partitioned by cluster), and the surviving candidates are ranked by
    the PQ asymmetric-distance estimate (plan-time literal dot table —
    no per-row float math).  At 10^12 vectors this reads
    ``n_probe/n_centroids`` of the data and touches only m-byte codes.

    ``books``: pre-trained PQ codebooks (``pq_train``) — pass them to
    stop this call retraining on the full corpus (the serving shape;
    see also ``ann_pq_many`` for amortizing the encode).  Ignored with
    ``residual=True`` (residual codebooks depend on the coarse layer).

    ``residual=True`` is the Jégou et al. refinement: PQ codebooks are
    trained on (vec − coarse_centroid) so they only need to span one
    Voronoi cell's spread instead of the whole space — better recall at
    the same m — and the ADC estimate becomes
    ``dot(q, c_coarse) + Σ_s dot(q_s, residual_centroid[code_s])``
    (the coarse term is a per-cluster literal).  Residual training and
    assignment use ``metric='l2'`` (Jégou's metric — residual magnitude
    IS the signal; cosine assignment is near-arbitrary among codewords
    pointing the same way) with zero-residual rows excluded from
    training (the coarse seeds' residuals are exactly zero and would
    collapse the seed set).

    ``rerank=N``: the full production three-stage shape — coarse probe
    prune → ADC shortlist of N → EXACT cosine re-rank of only those N
    rows (see ``ann_pq_rerank`` for why ADC alone plateaus on tight
    clusters).  Returns (query_id, vec_id, cosine, rn) in that mode,
    (query_id, vec_id, est_dot, rn) otherwise.  Deterministic
    end-to-end either way, so the DuckDB oracle recomputes the whole
    coarse+fine(+refine) pipeline independently."""
    from pyspark.sql import Window

    cents = seed_centroids(embeddings, n_centroids, id_col, vec_col)
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    qrow = query.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    ).head()
    qid = int(qrow["query_id"])
    qvec = [float(x) for x in qrow["qvec"]]

    # probe list: the query's n_probe nearest coarse centroids (k-row
    # crossJoin + window — centroids are tiny by construction)
    q1 = query.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).alias("qvec"),
    )
    qs = q1.crossJoin(F.broadcast(cents)).select(
        "query_id", "cluster_id", cosine_col("qvec", "cvec").alias("sim")
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("cluster_id")
    )
    probe_ids = [
        int(r["cluster_id"])
        for r in qs.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .collect()
    ]

    if residual:
        cents_list = [
            (int(r["cluster_id"]), [float(x) for x in r["cvec"]])
            for r in cents.orderBy("cluster_id").collect()
        ]
        resid = assigned.select(
            F.col("vec_id").alias(id_col),
            "cluster",
            _residual_col(
                F.col("vec"), F.col("cluster"), cents_list
            ).alias(vec_col),
        )
        books = pq_train(
            resid, m=m, k=k_codebook, iterations=iterations,
            id_col=id_col, vec_col=vec_col, zero_safe=True, metric="l2",
        )
        cand = resid.filter(F.col("cluster").isin(probe_ids))
        encoded = pq_encode(
            cand, books, id_col=id_col, vec_col=vec_col, metric="l2",
        ).join(
            cand.select(F.col(id_col).cast("long").alias("vec_id"),
                        "cluster"),
            "vec_id",
        )
        # coarse term: dot(q, c_cluster) as a plan-time literal map
        # (left-to-right float64 — the order the oracle reproduces)
        entries = []
        for cid, cvec in cents_list:
            d = 0.0
            for x, y in zip(qvec, cvec):
                d += x * y
            entries += [F.lit(cid), F.lit(d)]
        coarse_dot = F.element_at(
            F.create_map(*entries), F.col("cluster")
        )
        est = _adc_estimate(books, qvec, init=coarse_dot)
    else:
        if books is None:
            books = pq_train(
                embeddings, m=m, k=k_codebook, iterations=iterations,
                id_col=id_col, vec_col=vec_col,
            )
        cand = assigned.filter(F.col("cluster").isin(probe_ids)).select(
            F.col("vec_id").alias(id_col), F.col("vec").alias(vec_col)
        )
        encoded = pq_encode(cand, books, id_col=id_col, vec_col=vec_col)
        est = _adc_estimate(books, qvec)
    scored = encoded.filter(F.col("vec_id") != F.lit(qid)).select(
        F.lit(qid).alias("query_id"),
        "vec_id",
        F.round(est, 4).alias("est_dot"),
    )
    if rerank:
        short = scored.orderBy(
            F.desc("est_dot"), F.asc("vec_id")
        ).limit(rerank)
        return _exact_rerank(
            short, [qrow], embeddings, k, id_col=id_col, vec_col=vec_col
        )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("est_dot"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id", "vec_id", "est_dot",
            F.col("rn").cast("int").alias("rn"),
        )
    )
