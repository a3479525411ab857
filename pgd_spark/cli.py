"""CLI mirroring the reference's flag surface (graphlet_params.h:142-203).

    python -m pgd_spark -f graph.csv [--macro out.macro] [--micro out.micro]
                        [--gfd out.gfd] [-o degree] [--s2l] [-w N] ...

Flags with no Spark-side meaning (block size, representation, neighbor
ordering) are accepted for compatibility and logged as no-ops —
scheduling is Spark's job; orderings never change results (SURVEY §2.6).
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="pgd_spark",
        description="PySpark-native Parallel Parameterized Graphlet Decomposition",
    )
    p.add_argument("-f", "--file", "--graph", dest="file", required=True, help="input graph file")
    p.add_argument("-a", "--algorithm", default="exact", help="exact | approximate")
    p.add_argument("--fraction", type=float, default=0.1,
                   help="edge-sample fraction for -a approximate (README.md:290-307 capability)")
    p.add_argument("-w", "--workers", type=int, default=None, help="cores (local[w])")
    p.add_argument("-b", "--block_size", type=int, default=64, help="accepted; Spark schedules tasks")
    p.add_argument("-o", "--ordering", default="degree", help="degree|kcore|rand|natural (scheduling only)")
    p.add_argument("--s2l", action="store_true", help="order smallest-to-largest")
    p.add_argument("-n", "--neigh_ordering", default="degree", help="accepted; arrays are sorted")
    p.add_argument("--s2l_neigh", action="store_true")
    p.add_argument("-c", "--counts", "--macro", dest="macro", default=None, help="macro output file")
    p.add_argument("-m", "--micro", dest="micro", default=None, help="micro (per-edge) output file")
    p.add_argument("--gfd", default=None, help="GFD output file")
    p.add_argument("-r", "--rep", default="auto", help="auto|adj|csc → broadcast|distributed strategy")
    p.add_argument("-l", "--adj_limit", type=int, default=10000)
    p.add_argument("--strategy", default=None, help="broadcast|distributed|auto (overrides -r)")
    p.add_argument("--corrected-tailed", action="store_true",
                   help="emit the corrected per-edge tailed-triangle count instead of the reference quirk (always 0)")
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from pgd_spark.operators.graphlets import (
        check_identities,
        edge_graphlet_counts,
        macro_counts,
        micro_counts,
    )
    from pgd_spark.session import get_spark
    from pgd_spark.sinks import write_gfd, write_macro_stats, write_micro_stats
    from pgd_spark.sources.readers import read_graph

    master = f"local[{args.workers}]" if args.workers else None
    spark = get_spark(app_name="pgd_spark_cli", master=master)

    t0 = time.time()
    g = read_graph(spark, args.file)
    n, m = g.num_vertices(), g.num_edges()
    print(f"|V| = {n}, |E| = {m}, density = {g.density():.6f}  ({time.time()-t0:.2f}s read)")

    strategy = args.strategy or ({"adj": "broadcast", "csc": "distributed"}.get(args.rep, "auto"))
    t0 = time.time()
    if args.algorithm.startswith("approx"):
        from pgd_spark.operators.approximate import approximate_macro_counts

        counts = None
        totals = approximate_macro_counts(g, fraction=args.fraction, strategy=strategy)
        print(f"approximate census (fraction≈{totals['_sample_fraction']:.4f})")
    else:
        counts = edge_graphlet_counts(g, strategy=strategy).persist()
        totals = macro_counts(g, counts=counts)
    dt = time.time() - t0
    print(f"graphlet decomposition: {dt:.2f}s  ({m/max(dt,1e-9):.0f} edges/sec)")

    from pgd_spark.operators.graphlets import MACRO_KEYS

    for k in MACRO_KEYS:
        print(f"{k} = {totals[k]}")
    print(f"total_wedges = {totals['total_wedges']}")
    print(f"global_cc = {totals['global_cc']}")

    if args.verbose and "_nsums" in totals:
        checks = check_identities(totals)
        print("identity checks:", "ALL OK" if all(checks.values()) else checks)

    if args.macro:
        write_macro_stats(totals, args.macro)
        print(f"wrote macro stats → {args.macro}")
    if args.micro:
        mdf = micro_counts(g, counts=counts, pgd_quirk=not args.corrected_tailed).persist()
        write_micro_stats(mdf, args.micro)
        print(f"wrote micro stats → {args.micro}")
        # reference driver prints univar stats of the per-edge 4-clique
        # counts after micro output (graphlet_driver.cpp:86-90)
        from pgd_spark.operators.stats import univar_stats

        st = univar_stats(mdf, "clique4")
        print(
            "local_4_clique stats: "
            + ", ".join(f"{k}={st[k]}" for k in ["n", "mean", "median", "min", "max", "std", "iqr"])
        )
    if args.gfd:
        write_gfd(totals, args.gfd)
        print(f"wrote GFD → {args.gfd}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
