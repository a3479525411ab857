"""Transcript table: deterministic synthetic generator + edge derivation.

Input shape (BASELINE input_hint): an Iceberg (here: parquet-backed,
identical layout) table of multi-turn conversation / agent transcripts

    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Edge derivation (axes A+B):
  A — turn adjacency: consecutive turns within a conversation link
      their actors: {actor(turn i), actor(turn i+1)}.
  B — tool invocation: a turn with a non-null tool links its actor to
      the tool vertex.

Vertices are participants ∪ tools; actor keys ("r", role) and tool
keys ("t", tool) are assigned dense int64 ids deterministically
(row_number over sorted kind+name).  The derived edges then pass
through the same normalization as every reader: undirected,
self-loop-free, deduplicated — matching the reference reader contract
(graphlet_core.cpp:291-457, README.md:79-93).

Everything is pure column math on spark.range — no RNG object, no
Python UDFs — so the same (seed-free) tables reproduce byte-identically
at any parallelism, and generation scales linearly with cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from pgd_spark.graph import Graph

ZIPF_S = 1.2
N_TOOLS = 50


def _zipf_cdf(n: int, s: float) -> list[float]:
    weights = [1.0 / (k**s) for k in range(1, n + 1)]
    tot = sum(weights)
    cdf, acc = [], 0.0
    for w in weights:
        acc += w / tot
        cdf.append(acc)
    return cdf


def generate_transcripts(spark: SparkSession, n_conv: int) -> DataFrame:
    """Deterministic synthetic transcripts (FIXTURES.md §1 recipe):
    turns per conv = 5 + (i*2654435761 % 28); roles alternate
    user/assistant with every 7th turn an agent; tool on turn_idx%3==1
    drawn Zipf(s≈1.2) over 50 tools via a hash — hub-tool skew is the
    point (north_rule skew handling must be exercised)."""
    cdf = _zipf_cdf(N_TOOLS, ZIPF_S)
    cdf_lit = F.array(*[F.lit(x) for x in cdf])
    conv = spark.range(n_conv).select(
        F.col("id").alias("i"),
        F.format_string("c%08d", F.col("id")).alias("conv_id"),
        ((F.col("id") * F.lit(2654435761)) % 28 + 5).alias("n_turns"),
    )
    turns = conv.select(
        "i",
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    role = (
        F.when(F.col("turn_idx") % 7 == 6, F.format_string("agent%d", F.col("i") % 5))
        .when(F.col("turn_idx") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    # uniform-in-[0,1) hash for the Zipf draw — portable integer mixing
    # (same arithmetic is expressible in ANSI SQL, so the whole
    # pipeline down to census totals is oracle-checkable); i*A stays
    # < 2^63 up to ~3.4e9 conversations
    u = (
        F.pmod(
            F.col("i").cast("long") * F.lit(2_654_435_761)
            + F.col("turn_idx").cast("long") * F.lit(1_103_515_245)
            + F.lit(12_345),
            F.lit(1_000_003),
        )
        / 1_000_003.0
    )
    tool_rank = F.size(F.filter(cdf_lit, lambda p: p < u))
    out = turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat_ws(":", "conv_id", F.col("turn_idx"), role).alias("text"),
        F.when(
            F.col("turn_idx") % 3 == 1, F.format_string("tool%02d", tool_rank)
        ).alias("tool"),
        (
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("i") * 60 + F.col("turn_idx")).cast("double"))
        ).alias("ts"),
    )
    return out


def vertex_map(transcripts: DataFrame) -> DataFrame:
    """[kind, name, vid] — dense deterministic ids for participants
    ('r', role) and tools ('t', tool)."""
    roles = transcripts.select(F.lit("r").alias("kind"), F.col("role").alias("name"))
    tools = transcripts.filter(F.col("tool").isNotNull()).select(
        F.lit("t").alias("kind"), F.col("tool").alias("name")
    )
    verts = roles.unionAll(tools).distinct()
    w = Window.orderBy("kind", "name")
    return verts.withColumn("vid", F.row_number().over(w).cast("long") - 1)


def edges_from_transcripts(
    transcripts: DataFrame, vmap: DataFrame | None = None
) -> tuple[Graph, DataFrame]:
    """Axes A+B edge derivation → (normalized Graph, vertex map).

    Pure DataFrame ops: two map-side broadcast joins translate
    role/tool strings to int64 vids, then one window (lead over
    (conv_id, turn_idx)) derives axis A and a filter derives axis B,
    then the standard normalization.  The source table is only read —
    the per-turn text invariant (stable (conv_id, turn_idx) ordering)
    is untouched by construction.
    """
    # Cache ownership: a vmap WE build is persisted here (it is
    # broadcast twice below and would otherwise re-scan the source per
    # build); a caller-provided vmap is used as-is — the caller owns its
    # caching (every in-repo caller .cache()es theirs).  Re-persisting a
    # caller's already-cached frame per call spammed "already cached"
    # CacheManager warnings in the per-microbatch streaming path.
    if vmap is not None:
        vm = vmap
    else:
        vm = vertex_map(transcripts).persist()
        vm.count()
    # Map role/tool strings to their int64 vids FIRST: the broadcast
    # joins are map-side (no shuffle), so the only large data movement
    # in this job carries (conv_id, turn_idx, rvid, tvid) instead of
    # repeated role/tool strings (lead/adjacency over a vid yields the
    # same edge as over the name — the vid map is 1:1 by construction).
    vr = vm.filter(F.col("kind") == "r").select(
        F.col("name").alias("role"), F.col("vid").alias("rvid")
    )
    vt = vm.filter(F.col("kind") == "t").select(
        F.col("name").alias("tool"), F.col("vid").alias("tvid")
    )
    # LEFT joins: a null/unmapped role must still occupy its adjacency
    # slot in the per-conversation sequence (its pairs then drop on the
    # null vid, exactly as the old post-window string join dropped them)
    mapped = (
        transcripts.select("conv_id", "turn_idx", "role", "tool")
        .join(F.broadcast(vr), "role", "left")
        .join(F.broadcast(vt), "tool", "left")
        .select("conv_id", "turn_idx", "rvid", "tvid")
    )
    # Turn adjacency via the window's binary external sort — KEPT after
    # a measured r7 experiment: a groupBy + collect_list(struct)
    # formulation (no sort, conv_id crossing the wire once per
    # conversation) won 10-20% at bench volume (3.7M turns) and even at
    # 37M turns, but COLLAPSED 5x at the certified-scaling volume (444M
    # turns / 24M conversations on a 12 GiB heap: the collected structs
    # are Java objects, so the aggregation degenerates into an
    # object-serialized sort-based fallback under GC pressure, while
    # the window externally sorts compact binary UnsafeRows and spills
    # gracefully).  At the 100 TB design point memory-robustness wins;
    # the int-vid payload below keeps the sort's shuffled bytes narrow
    # (r5) — the string partition key remains the residual cost.
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = mapped.select("rvid", "tvid", F.lead("rvid").over(w).alias("next_rvid"))
    a = t.filter(F.col("rvid").isNotNull() & F.col("next_rvid").isNotNull()).select(
        F.col("rvid").alias("src"), F.col("next_rvid").alias("dst")
    )
    b = t.filter(F.col("rvid").isNotNull() & F.col("tvid").isNotNull()).select(
        F.col("rvid").alias("src"), F.col("tvid").alias("dst")
    )
    edges = a.unionAll(b)
    return Graph.from_edges(edges), vm
