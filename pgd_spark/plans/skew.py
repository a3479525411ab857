"""Skew-handling plan helpers.

The engine's primary skew defenses are structural (degree-oriented
edges bound kernel fan-out by the smaller endpoint; AQE skew-join
splits oversized shuffle partitions at runtime).  These helpers cover
the remaining case: joining a fact table against a key set with a few
pathological hub keys (e.g. adjacency rows of celebrity vertices).

``salted_join`` replicates the small side S ways and appends a salt to
the hot keys of the big side so one hub key spreads over S reducers —
the classic salting recipe, key-targeted so the non-skewed majority
pays nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pgd_spark.graph import Graph


def top_degree_vertices(g: Graph, threshold: int) -> DataFrame:
    """[v] — hub vertices with degree > threshold (the salting set)."""
    return g.degrees().filter(F.col("degree") > threshold).select("v")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: DataFrame,
    salt: int = 8,
    how: str = "inner",
    small_hint: str | None = None,
) -> DataFrame:
    """Join ``big ⋈ small`` on ``key`` with per-key salting for the keys
    in ``hot_keys`` ([key] one column).

    Hot rows of ``big`` get a random-but-deterministic salt in [0,S);
    hot rows of ``small`` are replicated S times.  Cold rows use salt 0
    on both sides, so the plan stays a single equi-join on (key, salt).

    ``small_hint`` (e.g. "SHUFFLE_HASH") marks the small side as the
    hash-build side of the final join — avoids sort-merge sorting the
    exploded big side, which dominates once the small side outgrows the
    broadcast threshold.
    """
    hk = hot_keys.select(F.col(hot_keys.columns[0]).alias(key)).withColumn("_hot", F.lit(True))
    # salt only over SCALAR columns: hashing array payloads per row is
    # pure overhead (any deterministic row spread works)
    scalar_cols = [
        f.name
        for f in big.schema.fields
        if f.dataType.typeName() not in ("array", "map", "struct")
    ] or list(big.columns)
    b = (
        big.join(F.broadcast(hk), key, "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_hot").isNotNull(),
                F.pmod(F.xxhash64(*[F.col(c) for c in scalar_cols]), F.lit(salt)),
            ).otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    s = (
        small.join(F.broadcast(hk), key, "left")
        .withColumn(
            "_salts",
            F.when(
                F.col("_hot").isNotNull(), F.sequence(F.lit(0), F.lit(salt - 1))
            ).otherwise(F.array(F.lit(0))),
        )
        .drop("_hot")
        .withColumn("_salt", F.explode("_salts"))
        .drop("_salts")
    )
    if small_hint:
        s = s.hint(small_hint)
    out = b.join(s, [key, "_salt"], how).drop("_salt")
    return out
