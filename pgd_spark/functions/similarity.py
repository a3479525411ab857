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
