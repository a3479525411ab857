"""Medium-scale proof for the distributed census path (VERDICT item 1).

Runs both census strategies on a ≥5M-edge skewed synthetic graph under
an event log, asserts total-for-total equality, reports wall times and
the max/median task-time ratio of the distributed stages (skew
evidence: no task may run >10x the stage median).

Usage: python tools/distributed_census_proof.py [n_edges] [skew]
Writes BENCH/DISTRIBUTED_CENSUS.md.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def task_skew_from_eventlog(log_dir: str) -> list[dict]:
    """Per-stage [stage, n_tasks, median_ms, max_ms, ratio, submitted]
    from the newest Spark event log in ``log_dir``."""
    entries = sorted(glob.glob(os.path.join(log_dir, "*")), key=os.path.getmtime)
    if not entries:
        return []
    newest = entries[-1]
    # Spark 4 rolling format: eventlog_v2_<app>/events_* files in a dir
    files = (
        sorted(glob.glob(os.path.join(newest, "events_*")))
        if os.path.isdir(newest)
        else [newest]
    )
    stages: dict[int, list[float]] = {}
    names: dict[int, str] = {}
    submitted: dict[int, float] = {}
    for path in files:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    info = ev.get("Task Info", {})
                    dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                    stages.setdefault(sid, []).append(dur)
                elif ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    names[si["Stage ID"]] = si.get("Stage Name", "")
                    submitted[si["Stage ID"]] = si.get("Submission Time", 0)
    out = []
    for sid, durs in sorted(stages.items()):
        if len(durs) < 4:
            continue
        durs.sort()
        med = durs[len(durs) // 2]
        if med <= 50:  # ignore trivial stages
            continue
        out.append(
            {
                "stage": sid,
                "name": names.get(sid, "")[:40],
                "tasks": len(durs),
                "median_ms": med,
                "max_ms": durs[-1],
                "ratio": round(durs[-1] / max(med, 1), 2),
                "submitted": submitted.get(sid, 0),
            }
        )
    return out


def main() -> None:
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    skew = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    log_dir = "/dev/shm/pgd_eventlog"
    os.makedirs(log_dir, exist_ok=True)
    # pinned + PRE-TOUCHED heap, sized between the two legs' needs:
    # the Catalyst (distributed) leg measurably collapses on a lazily-
    # faulted heap (322.9 s at 48g no-pretouch vs 64.2 s at 14g
    # pretouch — the mmap_lock serialization documented in session.py),
    # while the numpy-kernel leg throttles below ~24g of JVM headroom
    # for its cached count tables (A/B: 100k e/s at 14g vs 146k+ at
    # 48g).  24g pretouches in ~3.5 min of unmeasured startup.
    os.environ.setdefault("PGD_SPARK_DRIVER_MEM", "24g")
    os.environ.setdefault("PGD_SPARK_PRETOUCH", "1")

    from pyspark.sql import functions as F

    from pgd_spark.operators.graphlets import edge_graphlet_counts, macro_counts
    from pgd_spark.session import get_spark
    from pgd_spark.sources.synthetic import random_graph

    spark = get_spark(
        app_name="dist_census_proof",
        master="local[32]",
        shuffle_partitions=64,
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{log_dir}",
            "spark.eventLog.compress": "false",
        },
    )
    n_vertices = max(n_edges // 12, 1000)  # avg degree ~24, hubs via skew
    g = random_graph(spark, n_vertices, n_edges, seed=11, skew=skew)
    g.edges.persist()
    m = g.num_edges()
    n = g.num_vertices()
    maxdeg = g.max_degree()
    print(f"graph: {m} edges, {n} vertices, max degree {maxdeg}", flush=True)

    t0 = time.time()
    cb = edge_graphlet_counts(g, strategy="broadcast").persist()
    tb = macro_counts(g, counts=cb)
    t_b = time.time() - t0
    cb.unpersist()
    print(f"broadcast: {t_b:.1f}s  ({m / t_b / 1000:.0f}k e/s)", flush=True)

    t0 = time.time()
    dist_window_start_ms = t0 * 1000
    cd = edge_graphlet_counts(g, strategy="distributed").persist()
    td = macro_counts(g, counts=cd)
    t_d = time.time() - t0
    cd.unpersist()
    print(f"distributed: {t_d:.1f}s  ({m / t_d / 1000:.0f}k e/s)", flush=True)

    keys = [k for k in tb if not k.startswith("_")]
    mismatch = [k for k in keys if tb[k] != td[k]]
    assert not mismatch, f"strategy mismatch on {mismatch}"
    print("strategy equality: OK (all 19 totals identical)", flush=True)

    spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(30000)
    spark.stop()
    time.sleep(2)
    skews = task_skew_from_eventlog(log_dir)
    # the skew gate certifies the DISTRIBUTED plan's balance: gate on
    # major stages submitted inside the distributed-leg window.  (The
    # broadcast leg's kernel stage routinely shows one long task — the
    # per-worker shared-CSR build — which is a one-time per-machine
    # setup cost, not reduce skew; it is still reported below.)
    # A stage "matters" when its longest task exceeds 2% of the leg wall
    # — a 1 s straggler in a 100 ms-median bookkeeping stage is noise.
    dist = [s for s in skews if s["submitted"] >= dist_window_start_ms]
    major = [s for s in dist if s["max_ms"] > 0.02 * t_d * 1000]
    worst = max((s["ratio"] for s in major), default=0.0)
    bcast_stages = [s for s in skews if s["submitted"] < dist_window_start_ms]
    worst_bcast = max(
        (s["ratio"] for s in bcast_stages if s["max_ms"] > 0.02 * t_b * 1000),
        default=0.0,
    )

    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/DISTRIBUTED_CENSUS.md", "w") as f:
        f.write("# Distributed census — medium-scale proof\n\n")
        f.write(
            f"Synthetic skewed graph: {m:,} edges, {n:,} vertices, max degree "
            f"{maxdeg:,} (skew={skew}), local[32], 64 shuffle partitions, "
            "AQE on.\n\n"
        )
        f.write("| strategy | wall | edges/s |\n|---|---|---|\n")
        f.write(f"| broadcast (numpy kernel) | {t_b:.1f} s | {m / t_b:,.0f} |\n")
        f.write(f"| distributed (Catalyst, pair-enumeration) | {t_d:.1f} s | {m / t_d:,.0f} |\n\n")
        f.write(
            f"Ratio distributed/broadcast: **{t_d / t_b:.2f}x**. All 19 macro "
            "totals identical across strategies.\n\n"
        )
        f.write(
            "Skew defense: cliques count via triangle-pair enumeration on "
            "canonical EDGE keys (near-uniform — no vertex, however hot, "
            "concentrates a reducer); cycles explode the provably-smaller "
            "W_v wedge set (degree orientation) and split by wedge-vertex "
            "temperature — cold x intersects N(x) with the carried W_u "
            "array, hot (celebrity) x routes through edge-key pair "
            "enumeration.\n\n"
        )
        f.write(
            "Task balance (event-log): worst max/median task-time ratio over "
            f"MAJOR distributed-leg stages (max task > 2% of leg wall) "
            f"**{worst:.2f}** (gate: <10). Broadcast-leg worst ratio "
            f"{worst_bcast:.2f} — its kernel stage carries the one-time "
            "per-worker shared-CSR build as a long first task (machine "
            "setup, not reduce skew). Full per-stage table below includes "
            "both legs and minor stages.\n\n"
        )
        f.write("| stage | leg | tasks | median | max | ratio |\n|---|---|---|---|---|---|\n")
        for s in skews:
            leg = "dist" if s["submitted"] >= dist_window_start_ms else "bcast"
            f.write(
                f"| {s['stage']} {s['name']} | {leg} | {s['tasks']} | {s['median_ms']} ms "
                f"| {s['max_ms']} ms | {s['ratio']} |\n"
            )
    print(f"worst task ratio {worst:.2f}; wrote BENCH/DISTRIBUTED_CENSUS.md", flush=True)


if __name__ == "__main__":
    main()
