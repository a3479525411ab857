"""Graph file readers with the reference's normalization semantics.

Reproduces the flexible reader behavior (graphlet_core.cpp:291-522,
README.md:79-93): auto delimiter (comma/tab/space), comment lines
(# or %) skipped, optional third weight column parsed-then-ignored,
self-loops dropped, duplicate/parallel edges dropped, direction
ignored, ids may be 0-based, 1-based or gappy (all accepted; our
operators work on raw int64 ids — use Graph.densify() when dense ids
are wanted, which the reference always does via first-appearance
relabeling, cpp:393-403).

MatrixMarket (.mtx): symmetric coordinate format, header line
``n n m``, 1-based ids, '%' comments; self-loops dropped, no dedup
needed for valid files but we dedup anyway (distinct() is free at this
scale and makes the reader total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from pgd_spark.graph import Graph, normalize_edges


def _sniff_delimiter(path: str) -> str:
    """First data line decides: comma > tab > space (cpp:196-228)."""
    with open(path) as f:
        for line in f:
            s = line.strip()
            if not s or s.startswith(("#", "%")):
                continue
            if "," in s:
                return ","
            if "\t" in s:
                return "\t"
            return " "
    return ","


def read_edge_list(spark: SparkSession, path: str, delimiter: str | None = None) -> Graph:
    """Flexible edge-list reader → normalized Graph.

    Non-numeric tokens in the first two columns become nulls and the
    row is dropped — this matches the reference's atoi() semantics that
    turn a header row like ``src,dst`` into the self-loop (0,0), which
    is then dropped (see sample_graph.csv handling, Makefile:50-51).
    Extra columns (weights, counts) are ignored (cpp:266).
    """
    # Unify comma/tab/space runs into one space then split — a strict
    # superset of the reference's single-delimiter sniff (cpp:196-228)
    # that also tolerates mixed "1, 2" styles.
    df = spark.read.text(path)
    toks = F.split(F.trim(F.regexp_replace(F.col("value"), r"[,\t ]+", " ")), " ")
    parsed = (
        df.filter(~F.col("value").rlike(r"^\s*[#%]") & (F.trim("value") != ""))
        .select(
            F.element_at(toks, 1).try_cast("long").alias("src"),
            F.element_at(toks, 2).try_cast("long").alias("dst"),
        )
    )
    # atoi("src") == 0 → header lines become (0,0) self-loops → dropped,
    # but genuinely non-numeric tokens cast to null → treat as 0 first.
    parsed = parsed.select(
        F.coalesce("src", F.lit(0)).alias("src"), F.coalesce("dst", F.lit(0)).alias("dst")
    )
    return Graph.from_edges(parsed)


def read_mtx(spark: SparkSession, path: str) -> Graph:
    df = spark.read.text(path)
    toks = F.split(F.regexp_replace(F.trim(F.col("value")), r"\s+", " "), " ")
    data = (
        df.filter(~F.col("value").rlike(r"^\s*%") & (F.trim("value") != ""))
        .select(
            F.element_at(toks, 1).try_cast("long").alias("src"),
            F.element_at(toks, 2).try_cast("long").alias("dst"),
            F.monotonically_increasing_id().alias("_rid"),
        )
    )
    # drop the single dims header row "n n m" — it is the first
    # non-comment line; identify by min _rid.
    first = data.agg(F.min("_rid")).first()[0]
    edges = data.filter(F.col("_rid") != first).drop("_rid")
    return Graph.from_edges(edges)


def read_graph(spark: SparkSession, path: str) -> Graph:
    """Extension dispatch like the reference (cpp:259-283)."""
    if path.endswith(".mtx"):
        return read_mtx(spark, path)
    return read_edge_list(spark, path)


def write_edges(edges: DataFrame, path: str, fmt: str = "parquet") -> None:
    w = edges.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "csv":
        w.option("header", True).csv(path)
    else:
        raise ValueError(fmt)
