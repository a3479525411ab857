"""Exact 3/4-node graphlet decomposition (macro + micro) on Spark.

Semantics match the reference macro/micro loops exactly
(graphlet_core.cpp:1366-1474 macro, 1483-1623 micro):

* per edge e=(v,u), oriented so deg(v) <= deg(u):
    tri  = |N(v) ∩ N(u)|                                  (triangle nodes)
    cliq = #adjacent unordered pairs within the triangle-node set
           = #4-cliques containing e
    cyc  = #adjacent pairs (w, x), w ∈ N(u)\\N(v)\\{v},
           x ∈ N(v)\\N(u)\\{u}  = #induced 4-cycles containing e
* everything else is O(1) combinatorial closure
  (solve_graphlet_equations, cpp:1326-1364; totals cpp:1449-1472).

Two physical strategies (like the reference's dense-adjacency vs CSR
split at cpp:602-611):

* ``broadcast``   — graph fits comfortably in one executor: broadcast
  CSR arrays once, run an Arrow-batched numpy kernel per edge
  partition.  No shuffles beyond the initial degree/orientation pass.
* ``distributed`` — pure Catalyst plan: adjacency-array joins +
  ``array_intersect`` for triangles; explode-and-join second hops for
  cliques and cycles.  Everything stays JVM-side (no Python), shuffles
  hash on vertex keys, AQE handles residual skew, and the degree
  orientation bounds exploded fan-out by the smaller endpoint degree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pgd_spark.graph import Graph

# columns produced by both kernel strategies
EDGE_COUNT_COLS = ["v", "u", "deg_v", "deg_u", "tri", "cliq", "cyc"]

_DEC = "decimal(38,0)"


def edge_graphlet_counts(
    g: Graph,
    strategy: str = "auto",
    broadcast_max_edges: int = 5_000_000,
    edge_predicate=None,
    kernel_impl: str = "auto",
    distributed_hot_threshold: int | None = None,
    max_exact_degree: int = 20_000_000,
) -> DataFrame:
    """Per-edge raw kernel counts [v,u,deg_v,deg_u,tri,cliq,cyc].

    ``auto`` picks broadcast when the graph is small enough to ship to
    every executor (the common case for anything that fits PGD itself),
    else the fully distributed Catalyst plan.

    ``edge_predicate`` (Column over v/u/deg_v/deg_u) restricts which
    edges get kernel passes — counts stay relative to the FULL graph
    (used by the edge-sampled approximate census).

    ``kernel_impl`` (broadcast strategy only): "auto" picks the
    compiled C mark kernel when a toolchain is available (ckernel.py;
    measured 9x the numpy loop on dense, 100x the vectorized path on
    sparse), else the whole-batch vectorized numpy kernel when avg
    degree ≤ kernels.VEC_MAX_AVG_DEG (measured 5-13x faster there) and
    the per-edge mark kernel above it; "c"/"vec"/"loop" force one.
    """
    if strategy == "auto":
        strategy = "broadcast" if g.num_edges() <= broadcast_max_edges else "distributed"
    if strategy == "broadcast":
        return _edge_counts_broadcast(g, edge_predicate, impl=kernel_impl)
    if strategy == "distributed":
        return _edge_counts_distributed(
            g,
            edge_predicate,
            hot_degree_threshold=distributed_hot_threshold,
            max_exact_degree=max_exact_degree,
        )
    raise ValueError(f"unknown strategy {strategy!r}")


# ---------------------------------------------------------------- broadcast
def _edge_counts_broadcast(
    g: Graph,
    edge_predicate=None,
    sample: tuple[int, int, int] | None = None,
    impl: str = "auto",
) -> DataFrame:
    import numpy as np

    from pgd_spark.operators.kernels import VEC_MAX_AVG_DEG, make_range_kernel

    edges_pdf = g.edges.toPandas()
    src = edges_pdf["src"].to_numpy(dtype=np.int64)
    dst = edges_pdf["dst"].to_numpy(dtype=np.int64)
    m = len(src)
    if impl == "auto":
        # compiled C kernel first (measured 9x the numpy loop on the
        # dense sf0.1 co-purchase graph, 100x the vectorized kernel on
        # a 2M-edge sparse graph — see ckernel.py); hosts without a C
        # toolchain keep the old numpy density heuristic
        from pgd_spark.operators.ckernel import available as _c_available

        if _c_available():
            impl = "c"
        else:
            n_est = len(np.unique(np.concatenate([src, dst]))) or 1
            impl = "vec" if 2.0 * m / n_est <= VEC_MAX_AVG_DEG else "loop"
    # broadcast raw edge arrays; each worker builds + caches the CSR
    # and the degree-oriented edge view locally (in parallel).  The
    # parallelized input is just a row-id range -- no edge bytes cross
    # a shuffle, so repeat passes cost only kernel time.
    bc = g.spark.sparkContext.broadcast((src, dst))
    par = g.spark.sparkContext.defaultParallelism
    # 4 tasks per core: per-task kernel work is skewed (edges sorted by
    # src cluster hub regions together), so finer tasks cut the tail
    ids = g.spark.range(0, m, 1, min(4 * par, max(m, 1)))
    out = ids.mapInPandas(
        make_range_kernel(bc, sample=sample, impl=impl),
        schema="v long, u long, deg_v long, deg_u long, tri long, cliq long, cyc long",
    )
    if edge_predicate is not None:
        # generic Column predicates evaluate on the kernel OUTPUT --
        # pass `sample` instead when the point is to skip kernel work
        out = out.filter(edge_predicate)
    return out


# -------------------------------------------------------------- distributed
def _dist_plumbing(g: Graph):
    """Physical sizing shared by every distributed two-hop join in this
    module (the census and the corrected-tailed pass): shuffle width,
    the broadcast-vs-SHUFFLE_HASH chooser for the adjacency lookup
    side, and the sized edge-key probe side.

    Broadcast budgets derive from the session's broadcast threshold
    (the knob admins size to executor memory), charging HashedRelation
    all-in costs — ~48 B/row overhead + payload — rather than raw
    payload bytes (ADVICE r2).  The adjacency side (n rows, 2m array
    entries) broadcasts while it fits an executor; the payoff is
    structural, not just a cheaper join: with map-side adjacency joins
    the downstream tables keep a balanced (v,u) partitioning — a
    SHUFFLE_HASH join on u would place EVERY edge of a hub u (each
    carrying the hub's full array) in ONE partition.  Beyond the
    budget: SHUFFLE_HASH (sort-merge would sort the m-row edge stream
    for no benefit).  Edge keys cost ~64 B/edge all-in."""
    npart = int(g.spark.conf.get("spark.sql.shuffle.partitions", "32"))
    m = g.num_edges()
    n = max(g.num_vertices(), 1)
    bcast_bytes = max(
        int(g.spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "67108864")), 0
    )
    small_adj = 48 * n + 16 * 2 * m <= bcast_bytes

    def _side(df):
        return F.broadcast(df) if small_adj else df.hint("SHUFFLE_HASH")

    ekeys = g.edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    ekeys = F.broadcast(ekeys) if m * 64 <= bcast_bytes else ekeys.hint("SHUFFLE_HASH")
    return npart, m, n, small_adj, _side, ekeys


def _edge_counts_distributed(
    g: Graph,
    edge_predicate=None,
    hot_degree_threshold: int | None = None,
    max_exact_degree: int = 20_000_000,
) -> DataFrame:
    """Pure-Catalyst per-edge kernel, skew-defended for web-scale runs.

    * triangles: adjacency-array joins + array_intersect (degree
      orientation bounds the carried small-side arrays).
    * 4-cliques: TRIANGLE-PAIR ENUMERATION — explode the unordered
      pairs within each edge's triangle-node set, probe the edge-key
      set.  Keys are edge keys (near-uniform): no hot reducer.
    * 4-cycles: wedge rows (v,u,x∈W_v) — the SMALLER wedge set under
      degree orientation (|W_v| ≤ |W_u| always; same gather choice as
      the numpy kernel) — split by the far vertex's degree.  COLD x
      (deg ≤ hot_degree_threshold): join x's adjacency,
      array_intersect with the carried wu — array-native intersection,
      ~10x cheaper per element than exploded rows, and the x-keyed
      shuffle is balanced because the threshold bounds both the
      per-row cost AND any one x's total weight.  HOT x (celebrity
      vertices): explode (w, x) ∈ W_u × {x} and probe the edge keys —
      O(|wu|) per row on near-uniform keys, immune to hub degree.
      Routing EVERYTHING through pair enumeration was tried and is
      balanced but ~10x slower: the pair stream on a 2M-edge skew-1.5
      graph is 10^10 rows, almost all probe misses that the sorted
      intersect rejects at array speed.

    Two physical regimes per lookup side (edge keys, adjacency):
    BROADCAST while it fits an executor (the pair/wedge streams then
    never leave their mappers and partial aggs collapse in-pipeline);
    SHUFFLE_HASH beyond (sort-merge would sort the big streams).

    Hub feasibility gate (replaces r2's documented-only limit): the
    BASE adjacency join carries one array row per vertex, so a vertex
    of degree d is a ~8d-byte row.  Chunking those rows (pagerank-style)
    is NOT sound here — 4-clique counting explodes unordered pairs
    within each edge's triangle-node set, and pairs that straddle two
    chunks of a split array would be silently lost.  It is also
    unnecessary: exact census work is Θ(Σ_e deg(smaller endpoint)), so
    a degree-d hub alone costs Θ(d²) wedge visits — at the d ≈ 10^8
    where a row would break (~800 MB), the work is ~10^16 visits,
    infeasible for ANY exact engine (the reference's shared-memory CSR
    included).  The row-size wall is therefore strictly BEHIND the
    compute wall; we gate on the compute wall explicitly
    (``max_exact_degree``) with an actionable error instead of letting
    a quadratic-runtime job look like an engine row-size bug.
    """
    from pgd_spark.plans.skew import top_degree_vertices

    maxdeg = g.max_degree()
    if maxdeg > max_exact_degree:
        raise ValueError(
            f"max degree {maxdeg:,} exceeds the exact-census feasibility "
            f"gate ({max_exact_degree:,}): a hub of degree d costs Θ(d²) "
            "wedge visits in ANY exact 3/4-graphlet engine. Use "
            "pgd_spark.operators.approximate_macro_counts (edge-sampled "
            "Horvitz-Thompson totals), or restrict the pass with "
            "edge_predicate, or raise max_exact_degree deliberately."
        )

    adj = g.adjacency()
    ori = g.oriented()
    if edge_predicate is not None:
        ori = ori.filter(edge_predicate)

    npart, m, n, small_adj, _side, ekeys = _dist_plumbing(g)
    if small_adj:
        ori = ori.repartition(npart, "v", "u")

    base = (
        ori.join(
            _side(adj.select(F.col("v").alias("_v"), F.col("nbrs").alias("nv"))),
            ori.v == F.col("_v"),
        )
        .drop("_v")
        .join(
            _side(adj.select(F.col("v").alias("_u"), F.col("nbrs").alias("nu"))),
            ori.u == F.col("_u"),
        )
        .drop("_u")
        .select(
            "v",
            "u",
            "deg_v",
            "deg_u",
            F.array_intersect("nv", "nu").alias("tri_arr"),
            # W_u = N(u)\{v}\N(v)   (wedge nodes centered at u, marks==2)
            F.array_except(F.array_remove("nu", F.col("v")), "nv").alias("wu"),
            # N(v)\{u}\N(u)         (marks==1 side scanned by the cycle kernel)
            F.array_except(F.array_remove("nv", F.col("u")), "nu").alias("wv"),
        )
        .withColumn("tri", F.size("tri_arr").cast("long"))
        # null out arrays no downstream branch reads before persisting:
        # tri_arr only feeds the clique pair-explode (tri >= 2), wu/wv
        # only feed the cycle paths when BOTH are non-empty — on sparse
        # graphs that drops most of the cached array volume (the 5M-edge
        # skew-1.5 proof graph carries ~10^9 array entries otherwise)
        .select(
            "v",
            "u",
            "deg_v",
            "deg_u",
            "tri",
            F.when(F.col("tri") >= 2, F.col("tri_arr")).alias("tri_arr"),
            F.when((F.size("wu") > 0) & (F.size("wv") > 0), F.col("wu")).alias("wu"),
            F.when((F.size("wu") > 0) & (F.size("wv") > 0), F.col("wv")).alias("wv"),
        )
    )
    base = base.persist()

    # broadcast regime: base inherited the balanced (v,u) partitioning.
    # SHUFFLE_HASH regime: the u-keyed join clustered hub edges — spread
    # them (pays the hub-partition read once, then every explode below
    # is balanced).
    spread = base if small_adj else base.repartition(npart, "v", "u")

    # 4-cliques: unordered pairs within the triangle-node set that are
    # themselves edges.  tri_arr is sorted (array_intersect of sorted
    # inputs), so a < b pairs match canonical (src < dst) edge keys.
    cliq = (
        spread.filter(F.col("tri") >= 2)
        .select("v", "u", F.explode("tri_arr").alias("a"), F.col("tri_arr"))
        .select("v", "u", "a", F.explode("tri_arr").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .join(ekeys, ["a", "b"])
        .groupBy("v", "u")
        .agg(F.count("*").cast("long").alias("cliq"))
    )

    # 4-cycles: hybrid by wedge-vertex temperature (see docstring).
    # EXPLODE THE Wv SIDE: degree orientation (deg_v ≤ deg_u) makes
    # |Wv| = deg_v−tri−1 ≤ |Wu| unconditionally, so enumerating x ∈ Wv
    # and intersecting N(x) with the carried Wu array is the cheaper
    # gather — the same choice the numpy kernel makes per edge
    # (kernels.py:96-105); the r2 plan exploded Wu and its intersect
    # stage alone was half the 5M-edge proof wall time.  The carried
    # array is now the bigger Wu, but in the broadcast-adjacency regime
    # wedge rows never cross a shuffle (map-side join), and in the
    # SHUFFLE_HASH regime only the x-keyed repartition moves them once.
    # Threshold: a healthy multiple of the average degree — hot enough
    # to catch celebrity vertices, low enough that the cold intersect
    # cost per row stays bounded (the old 2m/npart default never fired:
    # a 15k-degree vertex stayed "cold" and one reducer ran 20+ min).
    if hot_degree_threshold is None:
        hot_degree_threshold = max(256, int(8 * (2.0 * m / n)))
    hot = top_degree_vertices(g, hot_degree_threshold)
    wedge_rows = spread.filter((F.size("wu") > 0) & (F.size("wv") > 0)).select(
        "v", "u", "wu", F.explode("wv").alias("x")
    )
    hot_x = F.broadcast(hot.withColumnRenamed("v", "x"))
    adj_x = _side(adj.select(F.col("v").alias("x"), F.col("nbrs").alias("nx")))
    cold_hits = (
        wedge_rows.join(hot_x, "x", "left_anti")
        .join(adj_x, "x")
        .select("v", "u", F.size(F.array_intersect("nx", "wu")).cast("long").alias("hits"))
    )
    hot_hits = (
        wedge_rows.join(hot_x, "x", "left_semi")
        .select("v", "u", "x", F.explode("wu").alias("w"))
        .select("v", "u", F.least("w", "x").alias("a"), F.greatest("w", "x").alias("b"))
        .join(ekeys, ["a", "b"])
        .select("v", "u", F.lit(1).cast("long").alias("hits"))
    )
    cyc = (
        cold_hits.unionByName(hot_hits)
        .groupBy("v", "u")
        .agg(F.sum("hits").cast("long").alias("cyc"))
    )

    out = (
        base.select("v", "u", "deg_v", "deg_u", "tri")
        .join(cliq, ["v", "u"], "left")
        .join(cyc, ["v", "u"], "left")
        .fillna(0, subset=["cliq", "cyc"])
    )
    # the persisted two-hop base must outlive this (lazy) frame — tag it
    # so terminal consumers can release it (release_internal_caches);
    # eagerly materializing `out` here instead would force the m-row
    # per-edge table onto executor storage even for totals-only callers
    out._pgd_internal_caches = [base]
    return out


def release_internal_caches(counts: DataFrame) -> None:
    """Unpersist lookup tables :func:`edge_graphlet_counts` persisted
    while building ``counts`` (the distributed strategy persists its
    two-hop base).  Call once the frame's consumers are done; a no-op
    for the broadcast strategy or frames derived by further transforms
    (best-effort hygiene, never required for correctness)."""
    for c in getattr(counts, "_pgd_internal_caches", []):
        c.unpersist()


# ------------------------------------------------------------------- micro
def micro_counts(
    g: Graph,
    strategy: str = "auto",
    pgd_quirk: bool = True,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Per-edge micro graphlet counts, reference output semantics.

    Columns mirror the reference micro CSV header
    (graphlet_core.cpp:1676-1684): src, dst, triangle, two_star,
    clique4, chordal_cycle4, tailed_tri4, cycle4, star3, path4.

    ``pgd_quirk=True`` reproduces the reference exactly: the
    ``local_4_tailed_tris`` vector is never assigned in the snapshot
    (resized cpp:1501, read cpp:1541/1575/1698) so ``tailed_tri4`` is
    always 0 and ``star3`` does not subtract it.  ``pgd_quirk=False``
    computes the corrected value: #induced tailed-triangles in which e
    is the tail edge (adjacent pairs within W_u plus within W_v — the
    unwired cycle_micro kernel, cpp:1193-1204, from both endpoints).
    """
    c = counts if counts is not None else edge_graphlet_counts(g, strategy)
    tri, dv, du = F.col("tri"), F.col("deg_v"), F.col("deg_u")
    rv = dv - tri - 1  # 2-star ends at v
    ru = du - tri - 1
    tailed = F.lit(0).cast("long")
    if not pgd_quirk:
        tailed = F.col("tailed_raw")
        c = _with_tailed_raw(g, c)
    out = c.select(
        F.least("v", "u").alias("src"),
        F.greatest("v", "u").alias("dst"),
        tri.alias("triangle"),
        (rv + ru).cast("long").alias("two_star"),
        F.col("cliq").alias("clique4"),
        ((tri * (tri - 1) / 2).cast("long") - F.col("cliq")).alias("chordal_cycle4"),
        tailed.alias("tailed_tri4"),
        F.col("cyc").alias("cycle4"),
        (
            (rv * (rv - 1) / 2).cast("long")
            + (ru * (ru - 1) / 2).cast("long")
            - tailed
        ).alias("star3"),
        (rv * ru - F.col("cyc")).cast("long").alias("path4"),
    )
    return out


def _with_tailed_raw(g: Graph, counts: DataFrame) -> DataFrame:
    """Adds ``tailed_raw``: adjacent pairs within W_u + within W_v
    (the corrected per-edge tailed-triangle count; e as tail edge).

    Physical plan mirrors the distributed census (same _dist_plumbing
    sizing and the same hot/cold wedge-vertex defense as its 4-cycle
    path): the old version re-derived the base ori ⋈ adjacency ⋈
    adjacency join with unconditional shuffle joins and joined EVERY
    exploded wedge vertex against the full adjacency — a celebrity
    vertex w then funneled all its rows into one reducer, each paying
    an O(deg(w)) intersect.  Cold w intersect N(w) with the carried
    side array; hot w (degree past the census threshold) explode the
    (w, x) pairs and probe the near-uniform edge keys instead."""
    from pgd_spark.plans.skew import top_degree_vertices

    npart, m, n, small_adj, _side, ekeys = _dist_plumbing(g)
    adj = g.adjacency()
    ori = g.oriented().select("v", "u")
    if small_adj:
        ori = ori.repartition(npart, "v", "u")
    base = (
        ori.join(
            _side(adj.select(F.col("v").alias("_v"), F.col("nbrs").alias("nv"))),
            F.col("v") == F.col("_v"),
        )
        .drop("_v")
        .join(
            _side(adj.select(F.col("v").alias("_u"), F.col("nbrs").alias("nu"))),
            F.col("u") == F.col("_u"),
        )
        .drop("_u")
        .select(
            "v",
            "u",
            F.array_except(F.array_remove("nu", F.col("v")), "nv").alias("wu"),
            F.array_except(F.array_remove("nv", F.col("u")), "nu").alias("wv"),
        )
    )
    base = base if small_adj else base.repartition(npart, "v", "u")

    hot_degree_threshold = max(256, int(8 * (2.0 * m / n)))
    hot_w = F.broadcast(top_degree_vertices(g, hot_degree_threshold).withColumnRenamed("v", "w"))
    adj_w = _side(adj.select(F.col("v").alias("w"), F.col("nbrs").alias("nw")))

    def _pairs(side: str):
        # ordered adjacent pairs within the side set: Σ_w |N(w) ∩ s|
        # over w ∈ s counts each unordered pair twice → /2.  Each w
        # contributes its own row's hits, so splitting the w-rows by
        # temperature keeps the total exact.
        rows = base.filter(F.size(side) >= 2).select(
            "v", "u", F.col(side).alias("s"), F.explode(side).alias("w")
        )
        cold = (
            rows.join(hot_w, "w", "left_anti")
            .join(adj_w, "w")
            .select("v", "u", F.size(F.array_intersect("nw", "s")).cast("long").alias("hits"))
        )
        hot = (
            rows.join(hot_w, "w", "left_semi")
            .select("v", "u", "w", F.explode("s").alias("x"))
            .filter(F.col("x") != F.col("w"))
            .select("v", "u", F.least("w", "x").alias("a"), F.greatest("w", "x").alias("b"))
            .join(ekeys, ["a", "b"])
            .select("v", "u", F.lit(1).cast("long").alias("hits"))
        )
        return (
            cold.unionByName(hot)
            .groupBy("v", "u")
            .agg((F.sum("hits") / 2).cast("long").alias("p"))
        )

    tu = _pairs("wu").withColumnRenamed("p", "tw_u")
    tv = _pairs("wv").withColumnRenamed("p", "tw_v")
    return (
        counts.join(tu, ["v", "u"], "left")
        .join(tv, ["v", "u"], "left")
        .fillna(0, subset=["tw_u", "tw_v"])
        .withColumn("tailed_raw", (F.col("tw_u") + F.col("tw_v")).cast("long"))
        .drop("tw_u", "tw_v")
    )


# ------------------------------------------------------------------- macro
MACRO_KEYS = [
    "total_2_1edge",
    "total_2_indep",
    "total_3_tris",
    "total_2_star",
    "total_3_1edge",
    "total_3_indep",
    "total_4_clique",
    "total_4_chordcycle",
    "total_4_tailed_tris",
    "total_4_cycle",
    "total_3_star",
    "total_4_path",
    "total_4_1edge",
    "total_4_2edge",
    "total_4_2star",
    "total_4_tri",
    "total_4_indep",
]


def _macro_terms(c: DataFrame, n: int, m: int, big: str) -> DataFrame:
    """Per-edge closed-form terms N1..N10 + raw kernel sums.

    When ``big`` is decimal, EVERY arithmetic step on the disconnected
    terms happens in decimal: Spark's ``/`` on long operands promotes
    to double (53-bit mantissa) BEFORE any outer cast, so e.g.
    disconn*(disconn-1)/2 would silently round once disconn exceeds
    ~1.3e8 — exactly the large-n regime the decimal branch exists for.
    x*(x-1) is always even, so decimal division by 2 (which keeps
    scale 6) is exact and the cast back to scale 0 loses nothing.
    """
    tri, dv, du = F.col("tri"), F.col("deg_v"), F.col("deg_u")
    star = (dv - tri - 1) + (du - tri - 1)
    disconn = F.lit(n) - (star + tri) - 2
    rv, ru = dv - tri - 1, du - tri - 1
    if big == _DEC:
        ts_d = (tri + star).cast(_DEC)
        disc_d = disconn.cast(_DEC)
        n1 = (ts_d * (ts_d - 1) / 2).cast(_DEC)
        n8 = (disc_d * (disc_d - 1) / 2).cast(_DEC)
        n9 = star.cast(_DEC) * disc_d
        n10 = tri.cast(_DEC) * disc_d
    else:
        n1 = ((tri + star) * (tri + star - 1) / 2).cast("long")
        n8 = (disconn * (disconn - 1) / 2).cast("long")
        n9 = (star * disconn).cast("long")
        n10 = (tri * disconn).cast("long")
    return c.select(
        tri.alias("t_tri"),
        star.alias("t_star"),
        disconn.cast(big).alias("t_disc"),
        F.col("cliq").alias("t_cliq"),
        F.col("cyc").alias("t_cyc"),
        n1.alias("n1"),
        (star * (star - 1) / 2).cast("long").alias("n2"),
        (tri * (tri - 1) / 2).cast("long").alias("n3"),
        (tri * star).cast("long").alias("n4"),
        (rv * ru).cast("long").alias("n5"),
        ((rv * (rv - 1) / 2) + (ru * (ru - 1) / 2)).cast("long").alias("n6"),
        (F.lit(m) - dv - du + 1).cast("long").alias("n7"),
        n8.alias("n8"),
        n9.alias("n9"),
        n10.alias("n10"),
    )


def macro_counts(
    g: Graph,
    strategy: str = "auto",
    counts: DataFrame | None = None,
    force_decimal: bool = False,
) -> dict:
    """All 17 graphlet totals + wedges/global_cc, exact.

    One pass: per-edge closed-form terms N1..N10 + raw kernel sums are
    aggregated in a single ``agg`` (Spark's partial aggregation is the
    analog of the reference's per-thread counters, cpp:1370-1374,
    1431-1448); the final closure (cpp:1449-1472) runs on the driver in
    exact Python ints — the disconnected terms overflow int64 on
    10^9-vertex graphs, hence decimal sums for N1/N8/N9/N10.
    """
    n = g.num_vertices()
    m = g.num_edges()
    own_counts = counts is None
    c = counts if counts is not None else edge_graphlet_counts(g, strategy)
    # decimal sums are only needed when Σ over m edges of ~n²-sized
    # terms can overflow int64; below that bound plain longs keep the
    # aggregation inside whole-stage codegen (decimal agg is ~3× slower)
    big = _DEC if (force_decimal or n * n * m >= (1 << 62)) else "long"
    terms = _macro_terms(c, n, m, big)
    row = terms.agg(*[F.sum(col).alias(col) for col in terms.columns]).first()
    if own_counts:
        # totals are final — drop any lookup table the distributed
        # kernel persisted for this one pass (callers who passed their
        # own counts frame release it themselves when done)
        release_internal_caches(c)
    s = {k: int(row[k] or 0) for k in terms.columns}

    # closure equations, exact ints (cpp:1449-1472)
    t: dict = {}
    t["total_2_1edge"] = m
    t["total_2_indep"] = n * (n - 1) // 2 - m
    t["total_3_tris"] = s["t_tri"] // 3
    t["total_2_star"] = s["t_star"] // 2
    t["total_3_1edge"] = s["t_disc"]
    t["total_3_indep"] = n * (n - 1) * (n - 2) // 6 - (
        t["total_3_tris"] + t["total_2_star"] + t["total_3_1edge"]
    )
    t["total_wedges"] = 3 * t["total_3_tris"] + t["total_2_star"]
    t["global_cc"] = (3 * t["total_3_tris"] / t["total_wedges"]) if t["total_wedges"] else 0.0
    t["total_4_clique"] = s["t_cliq"] // 6
    t["total_4_chordcycle"] = s["n3"] - 6 * t["total_4_clique"]
    t["total_4_cycle"] = s["t_cyc"] // 4
    t["total_4_path"] = s["n5"] - 4 * t["total_4_cycle"]
    t["total_4_tailed_tris"] = (s["n4"] - 4 * t["total_4_chordcycle"]) // 2
    t["total_3_star"] = (s["n6"] - t["total_4_tailed_tris"]) // 3
    t["total_4_2edge"] = (
        s["n7"]
        - 6 * t["total_4_clique"]
        - 4 * t["total_4_cycle"]
        - 4 * t["total_4_chordcycle"]
        - 2 * t["total_4_path"]
        - 2 * t["total_4_tailed_tris"]
    ) // 2
    t["total_4_1edge"] = s["n8"] - 2 * t["total_4_2edge"]
    t["total_4_2star"] = (s["n9"] - 2 * t["total_4_path"]) // 2
    t["total_4_tri"] = (s["n10"] - t["total_4_tailed_tris"]) // 3
    k4 = [
        "total_4_clique",
        "total_4_chordcycle",
        "total_4_tailed_tris",
        "total_4_cycle",
        "total_3_star",
        "total_4_path",
        "total_4_1edge",
        "total_4_2edge",
        "total_4_2star",
        "total_4_tri",
    ]
    t["total_4_indep"] = n * (n - 1) * (n - 2) * (n - 3) // 24 - sum(t[x] for x in k4)
    t["_nsums"] = {f"n{i}": s[f"n{i}"] for i in range(1, 11)}
    t["_ksums"] = {k: s[k] for k in ("t_tri", "t_star", "t_disc", "t_cliq", "t_cyc")}
    return t


# -------------------------------------------------------------------- GFD
CONNECTED_GFD_KEYS = [
    "total_4_clique",
    "total_4_chordcycle",
    "total_4_tailed_tris",
    "total_4_cycle",
    "total_3_star",
    "total_4_path",
]
DISCONNECTED_GFD_KEYS = [
    "total_4_tri",
    "total_4_2star",
    "total_4_2edge",
    "total_4_1edge",
    "total_4_indep",
]


def _gfd(totals: dict, keys: list[str], force_tail: bool) -> list[float]:
    vals = [totals[k] for k in keys]
    sm = sum(vals)
    out = [(v / sm if sm > 0 else 0.0) for v in vals]
    if force_tail and sm > 0:
        # reference forces the last element to 1 - cumsum (cpp:2002, 2037)
        out[-1] = 1.0 - sum(out[:-1])
    return out


def compute_connected_gfd(totals: dict) -> list[float]:
    return _gfd(totals, CONNECTED_GFD_KEYS, force_tail=False)


def compute_disconnected_gfd(totals: dict) -> list[float]:
    return _gfd(totals, DISCONNECTED_GFD_KEYS, force_tail=True)


def compute_gfd(totals: dict) -> list[float]:
    return _gfd(totals, CONNECTED_GFD_KEYS + DISCONNECTED_GFD_KEYS, force_tail=True)


# ------------------------------------------------------------- invariants
def check_identities(totals: dict) -> dict[str, bool]:
    """The ten ΣN_i ↔ closed-total identities the reference verifies
    under -v (test_graphlet_counts, cpp:1275-1305).  Returns per-
    identity booleans; all must be True on any graph."""
    s = totals["_nsums"]
    t = totals
    checks = {
        "n1": s["n1"]
        == 3 * t["total_3_star"]
        + 3 * t["total_4_tailed_tris"]
        + 4 * t["total_4_cycle"]
        + t["total_4_path"]
        + 5 * t["total_4_chordcycle"]
        + 6 * t["total_4_clique"],
        "n2": s["n2"]
        == 3 * t["total_3_star"]
        + t["total_4_tailed_tris"]
        + 4 * t["total_4_cycle"]
        + t["total_4_path"],
        "n3": s["n3"] == t["total_4_chordcycle"] + 6 * t["total_4_clique"],
        "n4": s["n4"] == 2 * t["total_4_tailed_tris"] + 4 * t["total_4_chordcycle"],
        "n5": s["n5"] == t["total_4_path"] + 4 * t["total_4_cycle"],
        "n6": s["n6"] == 3 * t["total_3_star"] + t["total_4_tailed_tris"],
        "n7": s["n7"]
        == 2 * t["total_4_2edge"]
        + 6 * t["total_4_clique"]
        + 4 * t["total_4_cycle"]
        + 4 * t["total_4_chordcycle"]
        + 2 * t["total_4_path"]
        + 2 * t["total_4_tailed_tris"],
        "n8": s["n8"] == t["total_4_1edge"] + 2 * t["total_4_2edge"],
        "n9": s["n9"] == 2 * t["total_4_2star"] + 2 * t["total_4_path"],
        "n10": s["n10"] == 3 * t["total_4_tri"] + t["total_4_tailed_tris"],
    }
    return checks
