"""Deterministic synthetic graphs (no RNG state, pure column math).

Used by scale/scaling benchmarks: hash-based Erdős–Rényi-style graphs
with optional power-law skew on one endpoint.  Rebuilding with the same
parameters reproduces the same graph at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from pgd_spark.graph import Graph


def random_graph(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    seed: int = 42,
    skew: float = 0.0,
) -> Graph:
    """~n_edges distinct undirected edges over [0, n_vertices).

    ``skew`` > 0 biases the dst endpoint toward low ids with a
    power-law-ish CDF (u^(1+skew)), creating hub vertices so skew
    handling paths get exercised.
    """
    ids = spark.range(n_edges)
    u1 = (F.abs(F.xxhash64("id", F.lit(seed))) % 1_000_003) / 1_000_003.0
    u2 = (F.abs(F.xxhash64("id", F.lit(seed + 1))) % 1_000_003) / 1_000_003.0
    src = F.floor(u1 * n_vertices).cast("long")
    if skew > 0:
        dst = F.floor(F.pow(u2, F.lit(1.0 + skew)) * n_vertices).cast("long")
    else:
        dst = F.floor(u2 * n_vertices).cast("long")
    return Graph.from_edges(ids.select(src.alias("src"), dst.alias("dst")))
