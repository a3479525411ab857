"""Graph statistics: assortativity, degree stats, univariate stats.

Reference parity:
* assortativity — edge-centric Pearson degree correlation, exactly the
  reference reduction (graphlet_core.cpp:1029-1057) including its
  clamps: NaN→1, out-of-[-1,1]→1, m=0→0.
* degree stats — max/avg degree with the reference's truncated int
  average (graphlet_core.h:103, cpp:889), plus the true double.
* univar stats — mean/median/quartiles/IQR/variance/std over any
  per-edge count column (graphlet_univar_stats.h:75-108); the driver
  prints these for local_4_clique (graphlet_driver.cpp:86-90).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from pgd_spark.graph import Graph


def assortativity(g: Graph) -> float:
    row = (
        g.oriented()
        .agg(
            F.sum(F.col("deg_v") * F.col("deg_u")).alias("mu"),
            F.sum((F.col("deg_v") + F.col("deg_u")) / 2.0).alias("jd"),
            F.sum((F.col("deg_v") * F.col("deg_v") + F.col("deg_u") * F.col("deg_u")) / 2.0).alias("psi"),
            F.count("*").alias("m"),
        )
        .first()
    )
    m = float(row["m"] or 0)
    if m == 0:
        return 0.0
    tau = (row["jd"] / m) ** 2
    denom = row["psi"] / m - tau
    r = float("nan") if denom == 0 else (row["mu"] / m - tau) / denom
    if math.isnan(r) or r < -1 or r > 1:
        r = 1.0
    return r


def degree_stats(g: Graph) -> dict:
    row = g.degrees().agg(
        F.count("*").alias("n"),
        F.max("degree").alias("max_degree"),
        F.avg("degree").alias("avg_degree"),
    ).first()
    m = g.num_edges()
    n = int(row["n"])
    return {
        "n_vertices": n,
        "n_edges": m,
        "max_degree": int(row["max_degree"]),
        "avg_degree": int(row["avg_degree"]),  # reference truncates (h:103)
        "avg_degree_exact": float(row["avg_degree"]),
        "density": 0.0 if n < 2 else 2.0 * m / (n * (n - 1)),
    }


def univar_stats(df: DataFrame, col: str) -> dict:
    """Exact univariate stats of a numeric column (median/quartiles via
    exact percentile — switch to percentile_approx at extreme scale)."""
    row = df.agg(
        F.count(col).alias("n"),
        F.mean(col).alias("mean"),
        F.min(col).alias("min"),
        F.max(col).alias("max"),
        F.var_pop(col).alias("var"),
        F.stddev_pop(col).alias("std"),
        F.expr(f"percentile({col}, 0.25)").alias("q1"),
        F.expr(f"percentile({col}, 0.5)").alias("median"),
        F.expr(f"percentile({col}, 0.75)").alias("q3"),
    ).first()
    out = {k: row[k] for k in ["n", "mean", "min", "max", "var", "std", "q1", "median", "q3"]}
    out["iqr"] = (out["q3"] or 0) - (out["q1"] or 0)
    return out
