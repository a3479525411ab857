"""Two-cluster-size scaling protocol (BASELINE.json north_rule).

Runs the same fixed job at local[N] and local[4N] (fresh JVM each, via
subprocess) on identical input and reports throughput at both plus
scaling efficiency = (T_N / T_4N) / 4.  Writes BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [sf_dir] [N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

JOB = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cores = int(sys.argv[1]); sf_dir = sys.argv[2]
from pgd_spark.session import get_spark
from pgd_spark.sources.relational import copurchase_graph
from pgd_spark.sources.transcripts import generate_transcripts, edges_from_transcripts
from pgd_spark.operators.graphlets import edge_graphlet_counts, macro_counts
from pgd_spark.operators.pregel import pagerank, IterationLog

spark = get_spark(app_name=f"scaling_{cores}", master=f"local[{cores}]",
                  shuffle_partitions=cores)
res = {"cores": cores}

# warm the JVM/codegen so the measurement isn't startup-bound
g0 = copurchase_graph(spark, sf_dir, max_partkey=200)
macro_counts(g0, strategy="broadcast")

t0 = time.time()
g = copurchase_graph(spark, sf_dir)
m = g.num_edges()
res["derive_sec"] = time.time() - t0
res["edges"] = m

t0 = time.time()
counts = edge_graphlet_counts(g, strategy="broadcast").persist()
totals = macro_counts(g, counts=counts)
res["census_sec"] = time.time() - t0
res["census_edges_per_sec"] = m / res["census_sec"]
res["total_3_tris"] = totals["total_3_tris"]
res["total_4_clique"] = totals["total_4_clique"]

t0 = time.time()
log = IterationLog()
pagerank(g, tol=0.0, max_iter=20, log=log).count()
res["pagerank_sec"] = time.time() - t0
res["pagerank_iters"] = len(log.entries)
res["pagerank_iters_per_sec"] = len(log.entries) / res["pagerank_sec"]

t0 = time.time()
tr = generate_transcripts(spark, 200000)
tg, _ = edges_from_transcripts(tr)
tg.num_edges(); turns = tr.count()
res["transcript_sec"] = time.time() - t0
res["transcript_turns_per_sec"] = turns / res["transcript_sec"]

print("SCALING_RESULT " + json.dumps(res))
"""


def run(cores: int, sf_dir: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(JOB)
        path = f.name
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, path, str(cores), sf_dir],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALING_RESULT "):
            return json.loads(line[len("SCALING_RESULT "):])
    raise RuntimeError(f"no result from cores={cores}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    lo = run(n, sf_dir)
    hi = run(4 * n, sf_dir)

    def eff(key):
        # throughput-based: eff = (thr_4N / thr_N) / 4 == (T_N / T_4N) / 4
        return (lo[key] / hi[key]) / 4

    effs = {
        "census": eff("census_sec"),
        "pagerank": eff("pagerank_sec"),
        "transcript_derive": eff("transcript_sec"),
    }
    report = {"sf_dir": sf_dir, "N": n, "lo": lo, "hi": hi, "efficiency": effs}
    print(json.dumps(report, indent=2))

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/BASELINE.md", "w") as f:
        f.write("# BENCH/BASELINE — scaling protocol results\n\n")
        f.write(f"Input: co-purchase graph from `{sf_dir}/lineitem.parquet` "
                f"({lo['edges']} edges), identical at both parallelism levels.\n\n")
        f.write(f"Protocol (BASELINE.md / north_rule): same job at local[{n}] vs "
                f"local[{4*n}] in fresh JVMs; efficiency = (T_N / T_4N) / 4.\n\n")
        f.write("| job | local[%d] sec | local[%d] sec | thr@N | thr@4N | efficiency |\n" % (n, 4 * n))
        f.write("|---|---|---|---|---|---|\n")
        f.write("| graphlet census | %.2f | %.2f | %.0f e/s | %.0f e/s | %.3f |\n" % (
            lo["census_sec"], hi["census_sec"],
            lo["census_edges_per_sec"], hi["census_edges_per_sec"], effs["census"]))
        f.write("| pagerank (%d iters, tol 1e-6) | %.2f | %.2f | %.3f it/s | %.3f it/s | %.3f |\n" % (
            lo["pagerank_iters"], lo["pagerank_sec"], hi["pagerank_sec"],
            lo["pagerank_iters_per_sec"], hi["pagerank_iters_per_sec"], effs["pagerank"]))
        f.write("| transcript derive (200k convs) | %.2f | %.2f | %.0f turns/s | %.0f turns/s | %.3f |\n" % (
            lo["transcript_sec"], hi["transcript_sec"],
            lo["transcript_turns_per_sec"], hi["transcript_turns_per_sec"],
            effs["transcript_derive"]))
        f.write("\nCorrectness pinned across runs: total_3_tris=%d, total_4_clique=%d identical at both sizes: %s\n" % (
            lo["total_3_tris"], lo["total_4_clique"],
            lo["total_3_tris"] == hi["total_3_tris"] and lo["total_4_clique"] == hi["total_4_clique"]))
    print("wrote /root/repo/BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
