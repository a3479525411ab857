"""Similarity search over embedding columns (array<float>).

* cosine_topk       — exact brute-force top-k: broadcast the query
                      block, JVM-side dot products (zip_with +
                      aggregate), window top-k.  The correctness
                      baseline and perfectly adequate when queries are
                      a small block (the common batch-scoring shape).
* lsh_cosine_topk   — random-hyperplane LSH: deterministic seeded
                      planes, sign-bit bucket join, exact re-score of
                      candidates only.  The 100 TB path: candidate
                      generation is a bucket equi-join, not a cross
                      join; recall is tunable with tables × bits.
* ivf_cosine_topk   — inverted-file (IVF-flat) variant: items are
                      assigned to their nearest centroid once (the
                      index build), queries probe their nprobe nearest
                      centroid lists and re-score exactly.  Centroids
                      are a deterministic hash-min sample of the items
                      (the standard IVF bootstrap without the k-means
                      refinement sweeps), so the whole operator —
                      selection, assignment, probe, re-score — replays
                      value-for-value in portable SQL.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def _cosine(ivec, qvec, inorm, qnorm):
    """Guarded cosine: a zero-norm vector scores -1.0 instead of NaN —
    Spark orders NaN ABOVE every double, so unguarded zero vectors
    would rank first in every descending top-k."""
    den = inorm * qnorm
    return F.when(den > 0, _dot(ivec, qvec) / den).otherwise(F.lit(-1.0))


def cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """[query_id, vec_id, rank, sim] — exact cosine top-k per query.

    ``queries``: [query_id, embedding].  Items scan once; queries are
    broadcast.  Ties break deterministically by item id.
    """
    it = items.select(
        F.col(id_col), F.col(vec_col).alias("ivec"), _norm(F.col(vec_col)).alias("inorm")
    )
    qs = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("qvec"), _norm(F.col(vec_col)).alias("qnorm")
    )
    scored = it.crossJoin(F.broadcast(qs)).select(
        query_id_col,
        id_col,
        _cosine(F.col("ivec"), F.col("qvec"), F.col("inorm"), F.col("qnorm")).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("sim", 6).alias("sim"))
    )


def _hyperplanes(dim: int, bits: int, table: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed + 7919 * table)
    return rng.standard_normal((bits, dim)).tolist()


def _bucket_expr(vec_col, planes: list[list[float]]):
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in p])
        bucket = bucket + F.when(_dot(vec_col, arr) > 0, F.lit(2**i).cast("long")).otherwise(0)
    return bucket


def lsh_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bits: int = 12,
    tables: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Approximate cosine top-k: per table, items and queries hash to
    sign-bit buckets; candidates = bucket collisions in any table;
    exact cosine re-score + window top-k on candidates.

    Pass ``dim`` (embedding dimensionality) explicitly in pipelines —
    the None fallback runs a driver-side first() just to measure it."""
    if dim is None:
        dim = len(items.select(vec_col).first()[0])
    buckets_i = []
    buckets_q = []
    for t in range(tables):
        planes = _hyperplanes(dim, bits, t, seed)
        buckets_i.append(F.struct(F.lit(t).alias("t"), _bucket_expr(F.col(vec_col), planes).alias("b")))
        buckets_q.append(F.struct(F.lit(t).alias("t"), _bucket_expr(F.col("qvec"), planes).alias("b")))
    it = items.select(
        F.col(id_col),
        F.col(vec_col).alias("ivec"),
        _norm(F.col(vec_col)).alias("inorm"),
        F.explode(F.array(*buckets_i)).alias("bk"),
    ).select(id_col, "ivec", "inorm", "bk.t", "bk.b")
    qs = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("qnorm"),
    ).select(
        query_id_col, "qvec", "qnorm", F.explode(F.array(*buckets_q)).alias("bk")
    ).select(query_id_col, "qvec", "qnorm", "bk.t", "bk.b")
    cand = (
        it.join(F.broadcast(qs), ["t", "b"])
        .select(query_id_col, id_col, "ivec", "qvec", "inorm", "qnorm")
        .dropDuplicates([query_id_col, id_col])
    )
    scored = cand.select(
        query_id_col,
        id_col,
        _cosine(F.col("ivec"), F.col("qvec"), F.col("inorm"), F.col("qnorm")).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("sim", 6).alias("sim"))
    )


#: portable constants for the deterministic centroid sample (shared
#: with the dedup/sampling hash family — any SQL engine reproduces it)
IVF_MOD = 2_147_483_647
IVF_A = 1_103_515_245


def ivf_assign(
    items: DataFrame,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """(centroids [cid, cvec, cnorm], assigned [id, ivec, inorm, cid])
    — the IVF index build.  Centroids are the ``n_centroids`` items
    with the smallest portable hash of their id (deterministic,
    SQL-replayable); each item joins the broadcast centroid block once
    and keeps its best-cosine centroid (ties → lower cid).  One scan
    over the items; at corpus scale persist ``assigned`` as the index
    and reuse it across query batches."""
    cent = (
        items.select(F.col(id_col), F.col(vec_col))
        .withColumn(
            "_h",
            (F.lit(IVF_A) * F.pmod(F.col(id_col).cast("long"), F.lit(IVF_MOD))) % F.lit(IVF_MOD),
        )
        .orderBy("_h", id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("cvec"),
            _norm(F.col(vec_col)).alias("cnorm"),
        )
    )
    it = items.select(
        F.col(id_col), F.col(vec_col).alias("ivec"), _norm(F.col(vec_col)).alias("inorm")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("csim").desc(), F.col("cid").asc())
    assigned = (
        it.crossJoin(F.broadcast(cent))
        .select(
            id_col,
            "ivec",
            "inorm",
            "cid",
            _cosine(F.col("ivec"), F.col("cvec"), F.col("inorm"), F.col("cnorm")).alias("csim"),
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "ivec", "inorm", "cid")
    )
    return cent, assigned


def ivf_cosine_topk(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 64,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    assigned: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """[query_id, vec_id, rank, sim] — IVF-flat approximate top-k:
    each query probes its ``nprobe`` best centroids and exactly
    re-scores only the items assigned to them.  Work per query is
    O(n_centroids + Σ probed-list sizes) instead of O(N); recall
    rises with nprobe (nprobe = n_centroids is exhaustive = exact).
    Pass a persisted (``centroids``, ``assigned``) pair from
    :func:`ivf_assign` to reuse the index across query batches."""
    if assigned is None or centroids is None:
        centroids, assigned = ivf_assign(items, n_centroids, id_col, vec_col)
    qs = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("qvec"), _norm(F.col(vec_col)).alias("qnorm")
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("csim").desc(), F.col("cid").asc())
    probes = (
        qs.crossJoin(F.broadcast(centroids))
        .select(
            query_id_col,
            "qvec",
            "qnorm",
            "cid",
            _cosine(F.col("qvec"), F.col("cvec"), F.col("qnorm"), F.col("cnorm")).alias("csim"),
        )
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select(query_id_col, "qvec", "qnorm", "cid")
    )
    scored = assigned.join(F.broadcast(probes), "cid").select(
        query_id_col,
        id_col,
        _cosine(F.col("ivec"), F.col("qvec"), F.col("inorm"), F.col("qnorm")).alias("sim"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("sim").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "rank", F.round("sim", 6).alias("sim"))
    )
