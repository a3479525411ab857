"""Approximate (edge-sampled) graphlet census.

The reference README documents ``graphlet_approximation(frac)``
(README.md:290-307) but the snapshot only ships the sampled-edge
ordering plumbing (sort_edges overload, cpp:836-851).  We implement
the documented capability: run the exact per-edge kernels on a
deterministic Bernoulli sample of edges and scale the Σ-terms by 1/p
before the closure equations — an unbiased Horvitz-Thompson estimator
for every Σ-based total (n, m stay exact).

Sampling is hash-based (xxhash64(src,dst,seed)), so it is reproducible
across runs/partitions and pushes down as a cheap filter — at 100 TB
this samples at the scan, not after a materialization.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pgd_spark.graph import Graph


def approximate_macro_counts(
    g: Graph, fraction: float = 0.1, seed: int = 42, strategy: str = "auto"
) -> dict:
    from pgd_spark.operators.graphlets import edge_graphlet_counts, macro_counts

    if not (0 < fraction <= 1):
        raise ValueError("fraction in (0,1]")
    if fraction == 1.0:
        return macro_counts(g, strategy=strategy)

    n, m = g.num_vertices(), g.num_edges()
    denom = 1_000_003  # prime → near-uniform buckets
    limit = int(fraction * denom)

    from pgd_spark.operators.graphlets import _edge_counts_broadcast

    # kernels run ONLY on the sampled edges (counts stay full-graph-
    # relative).  The two strategies use different (both deterministic)
    # hash families; the estimator divides by the REALIZED inclusion
    # rate, so it is unbiased either way.
    if strategy == "distributed" or (strategy == "auto" and m > 5_000_000):
        keep = F.pmod(F.xxhash64("v", "u", F.lit(seed)), F.lit(denom)) < limit
        sampled = edge_graphlet_counts(g, strategy="distributed", edge_predicate=keep).persist()
    else:
        sampled = _edge_counts_broadcast(g, sample=(denom, limit, seed)).persist()
    p = sampled.count() / m if m else 1.0  # realized inclusion rate
    if p == 0:
        raise ValueError("sample empty — raise fraction")

    totals = _scaled_closure(g, sampled, n, m, scale=1.0 / p)
    totals["_sample_fraction"] = p
    return totals


def _scaled_closure(g: Graph, counts, n: int, m: int, scale: float) -> dict:
    """macro closure with every per-edge Σ multiplied by ``scale``."""
    from pgd_spark.operators.graphlets import macro_counts

    # reuse the exact machinery: aggregate the sample, then scale the
    # raw sums before closure by monkey-free parameterization — the
    # closure in macro_counts reads sums from the DataFrame, so we
    # scale columns up front (doubles; rounded to nearest int at the end).
    t = macro_counts(g, counts=counts)
    s = t["_nsums"]
    raw = {
        "s_tri": 3 * t["total_3_tris"],
        "s_star": 2 * t["total_2_star"],
        "s_disc": t["total_3_1edge"],
        "s_cliq": 6 * t["total_4_clique"],
        "s_cyc": 4 * t["total_4_cycle"],
        **s,
    }
    r = {k: v * scale for k, v in raw.items()}
    out: dict = {}
    out["total_2_1edge"] = m
    out["total_2_indep"] = n * (n - 1) // 2 - m
    out["total_3_tris"] = round(r["s_tri"] / 3)
    out["total_2_star"] = round(r["s_star"] / 2)
    out["total_3_1edge"] = round(r["s_disc"])
    out["total_3_indep"] = n * (n - 1) * (n - 2) // 6 - (
        out["total_3_tris"] + out["total_2_star"] + out["total_3_1edge"]
    )
    out["total_wedges"] = 3 * out["total_3_tris"] + out["total_2_star"]
    out["global_cc"] = (
        3 * out["total_3_tris"] / out["total_wedges"] if out["total_wedges"] else 0.0
    )
    out["total_4_clique"] = round(r["s_cliq"] / 6)
    out["total_4_chordcycle"] = round(r["n3"] - r["s_cliq"])
    out["total_4_cycle"] = round(r["s_cyc"] / 4)
    out["total_4_path"] = round(r["n5"] - r["s_cyc"])
    out["total_4_tailed_tris"] = round((r["n4"] - 4 * (r["n3"] - r["s_cliq"])) / 2)
    out["total_3_star"] = round((r["n6"] - out["total_4_tailed_tris"]) / 3)
    out["total_4_2edge"] = round(
        (
            r["n7"]
            - 6 * out["total_4_clique"]
            - 4 * out["total_4_cycle"]
            - 4 * out["total_4_chordcycle"]
            - 2 * out["total_4_path"]
            - 2 * out["total_4_tailed_tris"]
        )
        / 2
    )
    out["total_4_1edge"] = round(r["n8"] - 2 * out["total_4_2edge"])
    out["total_4_2star"] = round((r["n9"] - 2 * out["total_4_path"]) / 2)
    out["total_4_tri"] = round((r["n10"] - out["total_4_tailed_tris"]) / 3)
    k4 = [
        "total_4_clique", "total_4_chordcycle", "total_4_tailed_tris", "total_4_cycle",
        "total_3_star", "total_4_path", "total_4_1edge", "total_4_2edge",
        "total_4_2star", "total_4_tri",
    ]
    out["total_4_indep"] = n * (n - 1) * (n - 2) * (n - 3) // 24 - sum(out[x] for x in k4)
    return out
