"""Output writers with reference format parity.

* macro  — ``name = value`` lines in the reference order
           (graphlet_core.cpp:2141-2162, write_macro_stats cpp:1830-1836).
* micro  — CSV with the reference header
           ``% src,dst,triangle,2-star,...`` (cpp:1674-1684); rows keyed
           by canonical (src,dst) — the reference emits E_ordered order
           with 1-based remapped ids, so consumers must match on keys,
           which our tests do (FIXTURES.md §4 note).
* GFD    — ``name\\tvalue`` lines (cpp:1955-2041).

Distributed variants write through Spark (parquet/csv) for cluster
runs; the single-file variants below serve CLI parity and small
outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pgd_spark.operators.graphlets import (
    CONNECTED_GFD_KEYS,
    DISCONNECTED_GFD_KEYS,
    MACRO_KEYS,
    compute_connected_gfd,
    compute_disconnected_gfd,
    compute_gfd,
)

MICRO_HEADER = (
    "% src,dst,triangle,2-star,4-clique,4-chordal-cycle,4-tailed-triangle,4-cycle,3-star,4-path"
)

_GFD_NAMES = [
    "4-clique", "4-chordal-cycle", "4-tailed-tri", "4-cycle", "3-star", "4-path",
    "4-node-1-tri", "4-node-2-star", "4-node-2-edge", "4-node-1-edge", "4-node-indep",
]


def write_macro_stats(totals: dict, path: str) -> None:
    with open(path, "w") as f:
        for k in MACRO_KEYS:
            f.write(f"{k} = {totals[k]}\n")


def write_micro_stats(micro_df: DataFrame, path: str, output_id: bool = True) -> None:
    """Single-file micro CSV (CLI parity).  For cluster-scale output use
    ``micro_df.write.csv`` / parquet instead."""
    cols = [
        "triangle", "two_star", "clique4", "chordal_cycle4",
        "tailed_tri4", "cycle4", "star3", "path4",
    ]
    with open(path, "w") as f:
        hdr = MICRO_HEADER if output_id else MICRO_HEADER.replace("% src,dst,", "% ")
        f.write(hdr + "\n")
        for r in micro_df.orderBy("src", "dst").toLocalIterator():
            vals = [str(r[c]) for c in cols]
            prefix = f"{r['src']},{r['dst']}," if output_id else ""
            f.write(prefix + ",".join(vals) + "\n")


def write_micro_distributed(micro_df: DataFrame, path: str, fmt: str = "parquet") -> None:
    w = micro_df.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    else:
        w.option("header", True).csv(path)


def write_gfd(totals: dict, path: str, which: str = "all") -> None:
    if which == "connected":
        vals = compute_connected_gfd(totals)
        names = _GFD_NAMES[:6]
    elif which == "disconnected":
        vals = compute_disconnected_gfd(totals)
        names = _GFD_NAMES[6:]
    else:
        vals = compute_gfd(totals)
        names = _GFD_NAMES
    with open(path, "w") as f:
        for name, v in zip(names, vals):
            f.write(f"{name}\t{v}\n")
