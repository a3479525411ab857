"""Structured-Streaming edge ingestion: transcript files land → edges
merge incrementally into the epoch-partitioned store; result equals the
batch derivation; each batch writes only O(batch) new edges."""

import os

from pgd_spark.sources.transcripts import (
    edges_from_transcripts,
    generate_transcripts,
    vertex_map,
)
from pgd_spark.streaming.edges import read_edge_store, streaming_edge_ingest


def _dir_bytes(path):
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            total += os.path.getsize(os.path.join(root, fn))
    return total


def test_streaming_matches_batch_and_is_incremental(spark, tmp_path):
    t_all = generate_transcripts(spark, 40).cache()
    vm = vertex_map(t_all).cache()
    in_dir = str(tmp_path / "in")
    store = str(tmp_path / "edges")
    ckpt = str(tmp_path / "ckpt")

    # two file drops (conversations arrive whole per file)
    batch1 = t_all.filter("conv_id < 'c00000020'")
    batch2 = t_all.filter("conv_id >= 'c00000020'")
    batch1.write.mode("overwrite").parquet(in_dir)
    q = streaming_edge_ingest(spark, in_dir, store, ckpt, vm)
    q.awaitTermination(120)

    batch2.write.mode("append").parquet(in_dir)
    q2 = streaming_edge_ingest(spark, in_dir, store, ckpt, vm)
    q2.awaitTermination(120)

    got_rows = read_edge_store(spark, store).collect()
    got = {(r["src"], r["dst"]) for r in got_rows}
    assert len(got_rows) == len(got), "store contains duplicate edges"
    # batch reference on the SAME per-file slices unioned: axis-A edges
    # never cross files (conversations arrive whole), so batch-on-all
    # equals union of per-batch derivations here.
    want_g, _ = edges_from_transcripts(t_all, vmap=vm)
    want = {(r["src"], r["dst"]) for r in want_g.edges.collect()}
    assert got == want

    # incrementality: epoch=1 holds exactly the edges batch 2 added
    # beyond batch 1 — the store was NOT rewritten.
    g1, _ = edges_from_transcripts(batch1, vmap=vm)
    e1 = {(r["src"], r["dst"]) for r in g1.edges.collect()}
    g2, _ = edges_from_transcripts(batch2, vmap=vm)
    e2 = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    ep_dirs = sorted(d for d in os.listdir(store) if d.startswith("epoch="))
    assert len(ep_dirs) == 2, ep_dirs
    ep1 = {
        (r["src"], r["dst"])
        for r in spark.read.parquet(os.path.join(store, ep_dirs[1])).collect()
    }
    assert ep1 == e2 - e1
    # and batch-2 bytes are O(new edges), not O(store): on this tiny
    # graph most edges repeat across batches, so the delta must be a
    # small fraction of the full store
    assert len(ep1) < len(got)
    assert _dir_bytes(os.path.join(store, ep_dirs[1])) < _dir_bytes(store)


def test_streaming_retry_of_same_epoch_is_idempotent(spark, tmp_path):
    """Simulate a foreachBatch retry: running the merge for the same
    epoch twice (second time with the first attempt's output already in
    the store) must not lose or duplicate edges."""
    from pgd_spark.streaming import edges as E

    t = generate_transcripts(spark, 10).cache()
    vm = vertex_map(t).cache()
    store = str(tmp_path / "edges")

    # hand-drive the merge function the way foreachBatch would
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    t.write.mode("overwrite").parquet(in_dir)
    q = E.streaming_edge_ingest(spark, in_dir, store, ckpt, vm)
    q.awaitTermination(120)
    first = {(r["src"], r["dst"]) for r in read_edge_store(spark, store).collect()}

    # retry epoch 0: re-derive and re-merge the same batch
    g, _ = edges_from_transcripts(t, vmap=vm)
    from pyspark.sql import functions as F

    existing = (
        spark.read.schema(E._STORE_SCHEMA)
        .option("basePath", store)
        .parquet(store)
        .filter(F.col("epoch") != 0)
        .select("src", "dst")
    )
    again = g.edges.join(existing, ["src", "dst"], "left_anti")
    again.write.mode("overwrite").parquet(os.path.join(store, "epoch=0"))

    after = {(r["src"], r["dst"]) for r in read_edge_store(spark, store).collect()}
    assert after == first


def test_compaction_preserves_store_and_reduces_dirs(spark, tmp_path):
    """10 micro-batch epochs → compact → same edge set, fewer epoch
    dirs, and a subsequent ingest batch still anti-joins correctly."""
    from pgd_spark.streaming.edges import compact_edge_store
    from pgd_spark.streaming import edges as E
    from pyspark.sql import functions as F

    t_all = generate_transcripts(spark, 44).cache()
    vm = vertex_map(t_all).cache()
    store = str(tmp_path / "edges")

    # hand-drive 10 epochs of the merge the way foreachBatch would
    convs = sorted(r["conv_id"] for r in t_all.select("conv_id").distinct().collect())
    slices = [convs[i::11] for i in range(11)]

    def run_epoch(conv_ids, epoch):
        batch = t_all.filter(F.col("conv_id").isin(conv_ids))
        g, _ = edges_from_transcripts(batch, vmap=vm)
        new_edges = g.edges
        if os.path.isdir(store):
            existing = (
                spark.read.schema(E._STORE_SCHEMA)
                .option("basePath", store)
                .parquet(store)
                .filter(F.col("epoch") != epoch)
                .select("src", "dst")
            )
            new_edges = new_edges.join(existing, ["src", "dst"], "left_anti")
        new_edges.write.mode("overwrite").parquet(os.path.join(store, f"epoch={epoch}"))

    for i in range(10):
        run_epoch(slices[i], i)
    before = {(r["src"], r["dst"]) for r in read_edge_store(spark, store).collect()}
    n_dirs_before = len([d for d in os.listdir(store) if d.startswith("epoch=")])
    assert n_dirs_before == 10

    removed = compact_edge_store(spark, store, keep_last=1)
    assert removed == 9
    after_rows = read_edge_store(spark, store).collect()
    after = {(r["src"], r["dst"]) for r in after_rows}
    assert len(after_rows) == len(after), "compaction introduced duplicates"
    assert after == before
    dirs = sorted(d for d in os.listdir(store) if d.startswith("epoch="))
    assert dirs == ["epoch=0", "epoch=9"], dirs

    # the anti-join contract survives: ingest one more epoch
    run_epoch(slices[10], 10)
    final_rows = read_edge_store(spark, store).collect()
    final = {(r["src"], r["dst"]) for r in final_rows}
    assert len(final_rows) == len(final)
    want_g, _ = edges_from_transcripts(t_all, vmap=vm)
    want = {(r["src"], r["dst"]) for r in want_g.edges.collect()}
    assert final == want

    # idempotence / nothing-to-do path
    assert compact_edge_store(spark, store, keep_last=1, min_epochs=4) == 0


def test_compaction_roll_forward_after_crash(spark, tmp_path):
    """A compaction killed between the victim moves and the publish
    rename must be completed by the next call with no loss or dupes."""
    import json
    import shutil

    from pgd_spark.streaming import edges as E
    from pgd_spark.streaming.edges import compact_edge_store
    from pyspark.sql import functions as F

    store = str(tmp_path / "edges")
    for e in range(5):
        df = spark.range(e * 3, e * 3 + 3).select(
            F.col("id").alias("src"), (F.col("id") + 100).alias("dst")
        )
        df.write.mode("overwrite").parquet(os.path.join(store, f"epoch={e}"))
    before = {(r["src"], r["dst"]) for r in read_edge_store(spark, store).collect()}

    # simulate the crash window by hand: stage written + marker, one
    # victim moved to trash, one victim still in place, no publish
    victims = [0, 1, 2, 3]
    stage = os.path.join(store, E._STAGE)
    merged = (
        spark.read.schema(E._STORE_SCHEMA)
        .option("basePath", store)
        .parquet(*[os.path.join(store, f"epoch={e}") for e in victims])
        .select("src", "dst")
    )
    merged.write.mode("overwrite").parquet(stage)
    with open(os.path.join(stage, "_COMPACT_TARGET"), "w") as f:
        json.dump({"target": 0, "victims": victims}, f)
    trash = os.path.join(store, E._TRASH)
    os.makedirs(trash, exist_ok=True)
    os.rename(os.path.join(store, "epoch=1"), os.path.join(trash, "epoch=1"))
    shutil.rmtree(os.path.join(store, "epoch=0"))  # partially swapped

    # next maintenance call rolls the crashed compaction forward
    compact_edge_store(spark, store, keep_last=1)
    rows = read_edge_store(spark, store).collect()
    got = {(r["src"], r["dst"]) for r in rows}
    assert len(rows) == len(got)
    assert got == before
    dirs = sorted(d for d in os.listdir(store) if d.startswith("epoch="))
    assert dirs == ["epoch=0", "epoch=4"], dirs
    assert not os.path.isdir(stage) and not os.path.isdir(trash)


def _iceberg_on_classpath(spark) -> bool:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_streaming_iceberg_store(spark, tmp_path, monkeypatch):
    """Catalog-table variant of the epoch store: the streaming
    anti-join appends into an epoch-partitioned iceberg table via
    atomic overwritePartitions.  Skips unless the iceberg runtime jar
    is on the classpath (the sandbox ships none) — the parquet default
    covers the shared derivation/anti-join logic above."""
    import pytest

    if not _iceberg_on_classpath(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")
    wh = str(tmp_path / "wh")
    spark.conf.set(
        "spark.sql.catalog.pgdtest", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.pgdtest.type", "hadoop")
    spark.conf.set("spark.sql.catalog.pgdtest.warehouse", wh)
    monkeypatch.setenv("PGD_SPARK_TABLE_FORMAT", "iceberg")
    spark.sql("CREATE NAMESPACE IF NOT EXISTS pgdtest.db")

    t_all = generate_transcripts(spark, 30).cache()
    vm = vertex_map(t_all).cache()
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    table = "pgdtest.db.edges"

    batch1 = t_all.filter("conv_id < 'c00000015'")
    batch2 = t_all.filter("conv_id >= 'c00000015'")
    batch1.write.mode("overwrite").parquet(in_dir)
    streaming_edge_ingest(spark, in_dir, table, ckpt, vm).awaitTermination(120)
    batch2.write.mode("append").parquet(in_dir)
    streaming_edge_ingest(spark, in_dir, table, ckpt, vm).awaitTermination(120)

    got_rows = read_edge_store(spark, table).collect()
    got = {(r["src"], r["dst"]) for r in got_rows}
    assert len(got_rows) == len(got), "store contains duplicate edges"
    want_g, _ = edges_from_transcripts(t_all, vmap=vm)
    want = {(r["src"], r["dst"]) for r in want_g.edges.collect()}
    assert got == want
    # incrementality: epoch 1 holds only the batch-2 delta
    ep1 = {
        (r["src"], r["dst"])
        for r in spark.read.table(table).filter("epoch = 1").collect()
    }
    g1, _ = edges_from_transcripts(batch1, vmap=vm)
    e1 = {(r["src"], r["dst"]) for r in g1.edges.collect()}
    g2, _ = edges_from_transcripts(batch2, vmap=vm)
    e2 = {(r["src"], r["dst"]) for r in g2.edges.collect()}
    assert ep1 == e2 - e1
