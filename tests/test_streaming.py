"""Structured-Streaming edge ingestion: transcript files land → edges
merge incrementally into the store; result equals the batch derivation."""

from pgd_spark.sources.transcripts import (
    edges_from_transcripts,
    generate_transcripts,
    vertex_map,
)
from pgd_spark.streaming.edges import streaming_edge_ingest


def test_streaming_matches_batch(spark, tmp_path):
    t_all = generate_transcripts(spark, 40).cache()
    vm = vertex_map(t_all).cache()
    in_dir = str(tmp_path / "in")
    store = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")

    # two file drops (conversations arrive whole per file)
    t_all.filter("conv_id < 'c00000020'").write.mode("overwrite").parquet(in_dir)
    q = streaming_edge_ingest(spark, in_dir, store, ckpt, vm)
    q.awaitTermination(120)

    t_all.filter("conv_id >= 'c00000020'").write.mode("append").parquet(in_dir)
    q2 = streaming_edge_ingest(spark, in_dir, store, ckpt, vm)
    q2.awaitTermination(120)

    got = {(r["src"], r["dst"]) for r in spark.read.parquet(store).collect()}
    # batch reference on the SAME per-file slices unioned: axis-A edges
    # never cross files (conversations arrive whole), so batch-on-all
    # equals union of per-batch derivations here.
    want_g, _ = edges_from_transcripts(t_all, vmap=vm)
    want = {(r["src"], r["dst"]) for r in want_g.edges.collect()}
    assert got == want
