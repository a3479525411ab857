"""Structured-Streaming ingestion of transcript turns → edge table.

The reference is batch-only; this is the incremental path a production
transcript pipeline needs: new transcript files land, edges derive
incrementally, and foreachBatch appends ONLY the not-yet-seen edges to
the canonical store.

Store layout: ``{edge_store}/epoch=<batch_id>/part-*.parquet`` — one
partition directory per microbatch.  Each batch costs one left-anti
join against the store plus one O(batch) write; the store is never
rewritten.  Crash safety: the write targets exactly the ``epoch=N``
directory of the batch being processed (mode=overwrite), so a retry of
batch N replaces only its own partial output, and the anti-join base
explicitly EXCLUDES epoch N — a half-written epoch can never mask its
own edges on retry.  (The same layout maps 1:1 onto an Iceberg/Delta
MERGE when those catalogs are available.)

Axis-A (turn adjacency) needs the previous turn: the stream applies
the same lead() per microbatch, so conversations must arrive whole per
file — the transcript export unit per the input_hint's stable
(conv_id, turn_idx) ordering contract.  A conversation split across
two files would silently lose the one edge spanning the boundary;
ingest files per conversation-complete export, or run the batch
deriver over the full table to repair.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from pgd_spark.sources.transcripts import edges_from_transcripts

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_STORE_SCHEMA = "src long, dst long, epoch int"


def read_edge_store(spark: SparkSession, edge_store: str) -> DataFrame:
    """The canonical edge view over the epoch-partitioned store
    (explicit schema: an empty/absent store reads as zero rows)."""
    return (
        spark.read.schema(_STORE_SCHEMA)
        .option("basePath", edge_store)
        .parquet(edge_store)
        .select("src", "dst")
    )


def streaming_edge_ingest(
    spark: SparkSession,
    input_dir: str,
    edge_store: str,
    checkpoint: str,
    vmap: DataFrame,
):
    """Start an availableNow stream: parquet transcript files →
    per-batch edge derivation → incremental anti-join append into the
    epoch-partitioned parquet edge store.

    Returns the StreamingQuery (caller awaits/stops).  The vertex map
    must be precomputed (streaming can't re-rank ids); unseen
    roles/tools in a batch are dropped with a counter, the batch
    pipeline's standard late-dimension policy.
    """
    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .format("parquet")
        .load(input_dir)
    )

    def merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        s = batch_df.sparkSession
        g, _ = edges_from_transcripts(batch_df, vmap=vmap)
        new_edges = g.edges
        if os.path.isdir(edge_store):
            existing = (
                s.read.schema(_STORE_SCHEMA)
                .option("basePath", edge_store)
                .parquet(edge_store)
                .filter(F.col("epoch") != int(epoch_id))  # never self-mask on retry
                .select("src", "dst")
            )
            new_edges = new_edges.join(existing, ["src", "dst"], "left_anti")
        new_edges.write.mode("overwrite").parquet(
            os.path.join(edge_store, f"epoch={int(epoch_id)}")
        )

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q
