"""Structured-Streaming ingestion of transcript turns → edge table.

The reference is batch-only; this is the incremental path a production
transcript pipeline needs: new transcript files land, edges derive
incrementally, and foreachBatch merges them into the canonical edge
store (dedup against what's already there) while degree counts stay
maintained.  Windowless axis-B derivation is exact per-batch; axis-A
(turn adjacency) needs the previous turn, so the stream carries a
conversation-windowed buffer via the same lead() applied per micro-
batch — conversations are assumed to arrive whole per file (the
transcript export unit), matching the input_hint's stable
(conv_id, turn_idx) ordering contract.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from pgd_spark.graph import normalize_edges
from pgd_spark.sources.transcripts import edges_from_transcripts, vertex_map

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)


def streaming_edge_ingest(
    spark: SparkSession,
    input_dir: str,
    edge_store: str,
    checkpoint: str,
    vmap: DataFrame,
):
    """Start an availableNow stream: parquet transcript files →
    per-batch edge derivation → merge into the parquet edge store.

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
        g, _ = edges_from_transcripts(batch_df, vmap=vmap)
        new_edges = g.edges
        if os.path.exists(edge_store):
            existing = batch_df.sparkSession.read.parquet(edge_store)
            merged = normalize_edges(existing.unionByName(new_edges))
        else:
            merged = new_edges
        merged.write.mode("overwrite").parquet(edge_store + ".tmp")
        tmp = batch_df.sparkSession.read.parquet(edge_store + ".tmp")
        tmp.write.mode("overwrite").parquet(edge_store)

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q
