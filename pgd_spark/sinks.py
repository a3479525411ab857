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


_MICRO_COLS = [
    "triangle", "two_star", "clique4", "chordal_cycle4",
    "tailed_tri4", "cycle4", "star3", "path4",
]


def write_micro_stats(
    micro_df: DataFrame, path: str, output_id: bool = True, graph=None,
    reference_order: bool = False,
) -> None:
    """Single-file micro CSV (CLI parity).  For cluster-scale output use
    ``micro_df.write.csv`` / parquet instead.

    ``reference_order=True`` reproduces the reference binary's output
    byte-for-byte: rows in E_ordered order with 1-based dense internal
    ids (graphlet_core.cpp:1668-1761, ids printed +1 at cpp:1694).
    Requires ``graph`` read with ``track_lineage=True``.  Derivation of
    the order (all from the reference's default config):

    * dense ids: first-appearance relabel (cpp:393-403; MTX ids direct);
    * neighbor lists bucket-sorted by degree desc, ties in REVERSED
      insertion order (bucket_sort_neighbors_parallel, cpp:1846-1876:
      stable ascending counting sort then reversed);
    * edge ids: scan v ascending, neighbors in that order, keep v<u;
      the stored pair is (v,u) if deg(v)<deg(u) else (u,v)
      (create_edge_list_arrays, cpp:929-949);
    * E_ordered: sort by (deg_v+deg_u) DESC, edge id DESC
      (sort_edges deg default + decr_bound tie by id,
      cpp:855-867, graphlet_vertex.h:61-64).
    """
    with open(path, "w") as f:
        hdr = MICRO_HEADER if output_id else MICRO_HEADER.replace("% src,dst,", "% ")
        f.write(hdr + "\n")
        if reference_order:
            for r in _reference_ordered_micro(micro_df, graph).toLocalIterator():
                vals = [str(r[c]) for c in _MICRO_COLS]
                prefix = f"{r['pv']},{r['pu']}," if output_id else ""
                f.write(prefix + ",".join(vals) + "\n")
            return
        for r in micro_df.orderBy("src", "dst").toLocalIterator():
            vals = [str(r[c]) for c in _MICRO_COLS]
            prefix = f"{r['src']},{r['dst']}," if output_id else ""
            f.write(prefix + ",".join(vals) + "\n")


def _reference_ordered_micro(micro_df: DataFrame, graph) -> DataFrame:
    """micro rows + printed ids (pv, pu), sorted in E_ordered order."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if graph is None or graph.lineage is None or graph.fa_map is None:
        raise ValueError(
            "reference_order needs the source graph read with track_lineage=True"
        )
    deg = graph.degrees()  # original ids; same degrees after relabel
    fa = graph.fa_map
    e = (
        graph.lineage
        .join(fa.select(F.col("orig").alias("src"), F.col("id").alias("sid")), "src")
        .join(fa.select(F.col("orig").alias("dst"), F.col("id").alias("did")), "dst")
        .join(deg.select(F.col("v").alias("src"), F.col("degree").alias("dsrc")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("degree").alias("ddst")), "dst")
        .select(
            "src", "dst", "first_row",
            F.least("sid", "did").alias("x"),
            F.greatest("sid", "did").alias("y"),
            F.when(F.col("sid") < F.col("did"), F.col("dsrc")).otherwise(F.col("ddst")).alias("degx"),
            F.when(F.col("sid") < F.col("did"), F.col("ddst")).otherwise(F.col("dsrc")).alias("degy"),
        )
    )
    # edge id: v-scan order with (deg desc, insertion REVERSED) neighbor order
    w_eid = Window.orderBy(
        F.col("x").asc(), F.col("degy").desc(), F.col("first_row").desc()
    )
    e = e.withColumn("eid", F.row_number().over(w_eid))
    # printed endpoint order fixed at edge creation (tie → larger id first)
    e = e.select(
        "src", "dst",
        F.when(F.col("degx") < F.col("degy"), F.col("x") + 1).otherwise(F.col("y") + 1).alias("pv"),
        F.when(F.col("degx") < F.col("degy"), F.col("y") + 1).otherwise(F.col("x") + 1).alias("pu"),
        (F.col("degx") + F.col("degy")).alias("degsum"),
        "eid",
    )
    out = micro_df.join(e, ["src", "dst"]).orderBy(
        F.col("degsum").desc(), F.col("eid").desc()
    )
    return out


def write_micro_distributed(micro_df: DataFrame, path: str, fmt: str | None = None) -> None:
    """Cluster-scale micro output.  ``fmt=None`` → the durable-table
    format (PGD_SPARK_TABLE_FORMAT: parquet/delta/iceberg, see
    plans.tables); ``fmt="csv"`` stays for reference-style CSV dumps."""
    if fmt in (None, "parquet", "delta", "iceberg"):
        from pgd_spark.plans.tables import write_table

        write_table(micro_df, path, fmt=fmt)
    else:
        micro_df.write.mode("overwrite").option("header", True).csv(path)


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
