"""Transcript generator determinism, edge-derivation semantics, and the
per-turn text invariant (input_hint)."""

from pyspark.sql import functions as F

from pgd_spark.sources.transcripts import (
    edges_from_transcripts,
    generate_transcripts,
    vertex_map,
)


def test_generator_deterministic(spark):
    a = generate_transcripts(spark, 50).orderBy("conv_id", "turn_idx").collect()
    b = generate_transcripts(spark, 50).orderBy("conv_id", "turn_idx").collect()
    assert a == b
    assert len(a) > 50 * 5


def test_generator_schema_and_shape(spark):
    t = generate_transcripts(spark, 20)
    assert [f.name for f in t.schema.fields] == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    rows = t.collect()
    # (conv_id, turn_idx) unique, dense from 0
    keys = {(r["conv_id"], r["turn_idx"]) for r in rows}
    assert len(keys) == len(rows)
    per_conv = {}
    for r in rows:
        per_conv.setdefault(r["conv_id"], []).append(r["turn_idx"])
    for c, idxs in per_conv.items():
        assert sorted(idxs) == list(range(len(idxs)))
    # turns per conv follow the fixture recipe 5 + (i*2654435761 % 28)
    assert len(per_conv["c00000000"]) == 5 + (0 * 2654435761) % 28
    assert len(per_conv["c00000007"]) == 5 + (7 * 2654435761) % 28
    # tool present exactly when turn_idx % 3 == 1
    for r in rows:
        assert (r["tool"] is not None) == (r["turn_idx"] % 3 == 1)


def test_zipf_tool_skew(spark):
    t = generate_transcripts(spark, 400)
    counts = (
        t.filter(F.col("tool").isNotNull()).groupBy("tool").count().orderBy(F.desc("count")).collect()
    )
    top = counts[0]
    assert top["tool"] == "tool00"  # rank-1 tool dominates (Zipf)
    assert top["count"] > 3 * counts[len(counts) // 2]["count"]


def test_edge_derivation(spark):
    t = generate_transcripts(spark, 100)
    g, vm = edges_from_transcripts(t)
    # vertices = roles ∪ tools observed
    n_roles = t.select("role").distinct().count()
    n_tools = t.filter(F.col("tool").isNotNull()).select("tool").distinct().count()
    assert vm.count() == n_roles + n_tools
    # canonical edges: src<dst, no dupes
    e = g.edges.collect()
    assert all(r["src"] < r["dst"] for r in e)
    assert len({(r["src"], r["dst"]) for r in e}) == len(e)
    # every role that invoked a tool yields an edge to that tool vertex
    pair = (
        t.filter(F.col("tool").isNotNull()).select("role", "tool").distinct().count()
    )
    assert g.num_edges() >= min(pair, 1)


def test_per_turn_text_invariant(spark):
    """Deriving edges must not mutate/drop the source: the text column
    under stable (conv_id, turn_idx) ordering is unchanged."""
    t = generate_transcripts(spark, 60).cache()
    before = [r["text"] for r in t.orderBy("conv_id", "turn_idx").collect()]
    edges_from_transcripts(t)[0].edges.count()  # force full derivation
    after = [r["text"] for r in t.orderBy("conv_id", "turn_idx").collect()]
    assert before == after
    # and the text matches its own key (self-describing fixture)
    for r in t.collect():
        assert r["text"] == f"{r['conv_id']}:{r['turn_idx']}:{r['role']}"
