"""Edge-ordering features (reference parity, scheduling only).

The reference sorts its edge work queue by one of several strategies
(sort_edges cpp:853-867, get_ordering_value cpp:773-834; default
'degree').  In Spark, task scheduling makes this unnecessary for
correctness — we expose the same strategies as a feature column so
users can repartitionByRange on it (largest-work-first batches) and
for CLI flag parity.  Results never depend on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pgd_spark.graph import Graph

STRATEGIES = [
    "natural", "off", "rand", "random", "degree", "deg", "kcore",
    "kcore_degree", "kcore_deg", "degree_vol", "deg_vol", "kcore_vol",
    "deg_kcore_vol", "var",
]


def edge_ordering(g: Graph, strategy: str = "degree", s2l: bool = False) -> DataFrame:
    """[src, dst, order_value] with deterministic tie-break by (src,dst).

    degree-family values use deg(src)+deg(dst) (cpp:786-789);
    *_vol variants sum neighbor degrees; kcore uses core numbers.
    """
    e = g.edges
    strategy = {"deg": "degree", "off": "natural", "random": "rand", "kcore_deg": "kcore_degree"}.get(
        strategy, strategy
    )
    if strategy == "natural":
        out = e.withColumn("order_value", F.lit(0).cast("double"))
    elif strategy == "rand":
        out = e.withColumn(
            "order_value", (F.pmod(F.xxhash64("src", "dst"), F.lit(1 << 31))).cast("double")
        )
    elif strategy in ("degree", "var"):
        deg = g.degrees()
        out = (
            e.join(deg.withColumnRenamed("v", "src").withColumnRenamed("degree", "ds"), "src")
            .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("degree", "dd"), "dst")
            .withColumn("order_value", (F.col("ds") + F.col("dd")).cast("double"))
            .select("src", "dst", "order_value")
        )
    elif strategy in ("degree_vol", "deg_vol"):
        deg = g.degrees()
        vol = (
            g.symmetric()
            .join(deg.withColumnRenamed("v", "w").withColumnRenamed("degree", "dw"), "w")
            .groupBy("v")
            .agg(F.sum("dw").alias("vol"))
        )
        out = (
            e.join(vol.withColumnRenamed("v", "src").withColumnRenamed("vol", "vs"), "src")
            .join(vol.withColumnRenamed("v", "dst").withColumnRenamed("vol", "vd"), "dst")
            .withColumn("order_value", (F.col("vs") + F.col("vd")).cast("double"))
            .select("src", "dst", "order_value")
        )
    elif strategy in ("kcore", "kcore_degree", "kcore_vol", "deg_kcore_vol"):
        from pgd_spark.operators.kcore import kcore

        kc = kcore(g)
        base = (
            e.join(kc.withColumnRenamed("v", "src").withColumnRenamed("core", "ks"), "src")
            .join(kc.withColumnRenamed("v", "dst").withColumnRenamed("core", "kd"), "dst")
        )
        if strategy == "kcore":
            out = base.withColumn("order_value", (F.col("ks") + F.col("kd")).cast("double")).select(
                "src", "dst", "order_value"
            )
        else:
            deg = g.degrees()
            out = (
                base.join(deg.withColumnRenamed("v", "src").withColumnRenamed("degree", "ds"), "src")
                .join(deg.withColumnRenamed("v", "dst").withColumnRenamed("degree", "dd"), "dst")
                .withColumn(
                    "order_value",
                    (F.col("ks") + F.col("kd")).cast("double")
                    + (F.col("ds") + F.col("dd")) / F.lit(1e9),
                )
                .select("src", "dst", "order_value")
            )
    else:
        raise ValueError(f"unknown ordering strategy {strategy!r} (one of {STRATEGIES})")
    direction = F.col("order_value").asc() if s2l else F.col("order_value").desc()
    return out.orderBy(direction, "src", "dst")
