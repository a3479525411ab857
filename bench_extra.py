"""Supplementary benchmarks (bench.py is FROZEN for measurement; extra
evidence lives here — guide §1.4 noop-sink isolation + the cross-size
scaling row VERDICT r6 #2 asked for).

Rows:
* census_1x   — broadcast census on the sf0.1 co-purchase graph
                (1.196M edges, avg deg ~120), same flow as bench.py.
* census_10x  — the SAME operator on a 10x graph of matching density
                (200k vertices / 12M edges ≈ the sf1.0 co-purchase
                shape), checking the C-kernel + broadcast path holds
                its edges/s when the graph is 10x the bench size.
* census_10x_distributed — the pure-Catalyst strategy on a 12M-edge
                sparse skewed graph (the >broadcast-cap regime).
* minhash/neardup/cc noop isolations at sf0.1.

Prints ONE JSON line; also written to BENCH/bench_extra_r07.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("PGD_SPARK_DRIVER_MEM", "14g")
    os.environ.setdefault("PGD_SPARK_PRETOUCH", "1")

    from pyspark.sql import functions as F

    from pgd_spark.functions.dedup import minhash_dedup
    from pgd_spark.functions.similarity import embedding_neardup_pairs
    from pgd_spark.operators.graphlets import (
        _edge_counts_broadcast,
        edge_graphlet_counts,
        macro_counts,
        release_internal_caches,
    )
    from pgd_spark.operators.pregel import connected_components
    from pgd_spark.session import get_spark
    from pgd_spark.sources.relational import copurchase_graph
    from pgd_spark.sources.synthetic import random_graph

    spark = get_spark(
        app_name="pgd_spark_bench_extra", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    sc = spark.sparkContext
    out: dict = {"metric": "pgd_spark supplementary rows", "unit": "sec", "cpus": cpus}

    def timed(name: str, fn, reps: int = 2):
        walls = []
        last = None
        for _ in range(reps):
            t0 = time.time()
            last = fn()
            walls.append(round(time.time() - t0, 2))
        out[name] = min(walls)
        out[f"{name}_walls"] = walls
        return last

    # warmup: workers + codegen
    macro_counts(random_graph(spark, 2000, 20000), strategy="broadcast")

    # ---- census at bench size (1x)
    sc.setJobDescription("census 1x")
    g = copurchase_graph(spark, sf_dir)
    m1 = g.num_edges()
    _edge_counts_broadcast(g, sample=(10_000, 1, 7)).count()  # warm CSR

    def census(graph):
        counts = edge_graphlet_counts(graph, strategy="broadcast").persist()
        t = macro_counts(graph, counts=counts)
        counts.unpersist()
        return t

    t1 = timed("census_1x", lambda: census(g))
    out["census_1x_edges"] = m1
    out["census_1x_edges_per_sec"] = round(m1 / out["census_1x"], 1)
    out["census_1x_tris"] = t1["total_3_tris"]

    # ---- census at 10x size, matching density (the sf1.0 shape)
    sc.setJobDescription("census 10x")
    g10 = random_graph(spark, 200_000, 12_000_000, seed=5)
    g10.edges.persist()
    m10 = g10.num_edges()
    _edge_counts_broadcast(g10, sample=(10_000, 1, 7)).count()
    t10 = timed("census_10x", lambda: census(g10))
    out["census_10x_edges"] = m10
    out["census_10x_edges_per_sec"] = round(m10 / out["census_10x"], 1)
    out["census_10x_tris"] = t10["total_3_tris"]
    g10.edges.unpersist()
    g10.unpersist()

    # ---- distributed strategy at 12M edges (sparse, skewed)
    sc.setJobDescription("census 10x distributed")
    gd = random_graph(spark, 1_440_000, 12_000_000, seed=11, skew=0.3)
    gd.edges.persist()
    md = gd.num_edges()

    def census_dist():
        cd = edge_graphlet_counts(gd, strategy="distributed").persist()
        t = macro_counts(gd, counts=cd)
        cd.unpersist()
        release_internal_caches(cd)
        return t

    census_dist()  # warm pass (same protocol as bench.py)
    timed("census_10x_distributed", census_dist, reps=2)
    out["census_10x_distributed_edges"] = md
    out["census_10x_distributed_edges_per_sec"] = round(
        md / out["census_10x_distributed"], 1
    )
    gd.edges.unpersist()
    gd.unpersist()

    # ---- noop-style isolations at sf0.1 (computation only, count sink)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sc.setJobDescription("minhash isolation")
    timed("minhash_dedup", lambda: minhash_dedup(docs, threshold=0.75).count(), reps=3)
    sc.setJobDescription("neardup isolation")
    timed(
        "emb_neardup",
        lambda: embedding_neardup_pairs(
            embs, threshold=0.45, bits=4, tables=8, dim=64, max_bucket=400
        ).count(),
        reps=3,
    )
    sc.setJobDescription("cc isolation")
    timed(
        "connected_components",
        lambda: connected_components(g).select("component").distinct().count(),
        reps=3,
    )

    # ---- real PNG decode end-to-end (VERDICT r6 #7): 1k synthetic
    # 64x64 RGB PNGs through decode_image_meta(use_real_codecs=True) —
    # in this sandbox that exercises the stdlib zlib fallback inside
    # the mapInPandas plumbing (incl. the r7-vectorized Sub filter)
    import struct
    import zlib

    import numpy as np

    def _png(px):
        h, w, ch = px.shape

        def chunk(t, d):
            return struct.pack(">I", len(d)) + t + d + struct.pack(
                ">I", zlib.crc32(t + d) & 0xFFFFFFFF
            )

        raw = bytearray()
        for y in range(h):
            raw.append(1 if y % 2 else 0)  # alternate None/Sub filters
            row = px[y].reshape(-1).astype(np.int64)
            if y % 2:
                # Sub-encode: d[x] = row[x] - row[x-ch]
                d = row.copy()
                d[ch:] -= row[:-ch]
                raw.extend((d & 0xFF).astype(np.uint8).tobytes())
            else:
                raw.extend(row.astype(np.uint8).tobytes())
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")
        )

    rng = np.random.RandomState(3)
    payloads = [
        (i, bytearray(_png(rng.randint(0, 256, (64, 64, 3), dtype=np.uint8))))
        for i in range(1000)
    ]
    media = spark.createDataFrame(payloads, "doc_id long, payload binary")
    from pgd_spark.functions.multimodal import decode_image_meta

    sc.setJobDescription("real png decode")
    out["png_decoded"] = timed(
        "png_decode_1k",
        lambda: decode_image_meta(media, use_real_codecs=True).count(),
        reps=2,
    )
    sc.setJobDescription(None)

    try:
        os.makedirs("/root/repo/BENCH", exist_ok=True)
        with open("/root/repo/BENCH/bench_extra_r07.json", "w") as f:
            json.dump(out, f, indent=2)
    except OSError:
        pass
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
