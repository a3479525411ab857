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
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from pgd_spark.plans.tables import table_format
from pgd_spark.sources.transcripts import edges_from_transcripts

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_STORE_SCHEMA = "src long, dst long, epoch int"


def read_edge_store(spark: SparkSession, edge_store: str) -> DataFrame:
    """The canonical edge view over the epoch-partitioned store
    (explicit schema: an empty/absent store reads as zero rows).

    With ``PGD_SPARK_TABLE_FORMAT=iceberg`` the store is a CATALOG
    TABLE and ``edge_store`` is its identifier (e.g.
    ``cat.db.edges``), not a path."""
    fmt = table_format()
    if fmt == "iceberg":
        return spark.read.table(edge_store).select("src", "dst")
    if fmt != "parquet":
        return spark.read.format(fmt).load(edge_store).select("src", "dst")
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
        fmt = table_format()
        if fmt == "iceberg":
            # catalog-table store: edge_store is a TABLE IDENTIFIER in a
            # configured Spark catalog.  Same layout contract as the
            # path stores — one epoch partition per microbatch — but
            # retry idempotence comes from the table format itself:
            # overwritePartitions replaces exactly the partitions the
            # batch writes (epoch=N) in one atomic commit, and a
            # crashed attempt commits nothing, so the anti-join base
            # (which still excludes epoch N defensively) never sees a
            # half-written epoch.
            s.sql(
                f"CREATE TABLE IF NOT EXISTS {edge_store} "
                "(src BIGINT, dst BIGINT, epoch INT) "
                f"USING {fmt} PARTITIONED BY (epoch)"
            )
            existing = (
                s.read.table(edge_store)
                .filter(F.col("epoch") != int(epoch_id))
                .select("src", "dst")
            )
            new_edges = new_edges.join(existing, ["src", "dst"], "left_anti")
            (
                new_edges.withColumn("epoch", F.lit(int(epoch_id)))
                .writeTo(edge_store)
                .overwritePartitions()
            )
            return
        if os.path.isdir(edge_store):
            if fmt == "parquet":
                existing = (
                    s.read.schema(_STORE_SCHEMA)
                    .option("basePath", edge_store)
                    .parquet(edge_store)
                )
            else:
                existing = s.read.format(fmt).load(edge_store)
            existing = existing.filter(
                F.col("epoch") != int(epoch_id)  # never self-mask on retry
            ).select("src", "dst")
            new_edges = new_edges.join(existing, ["src", "dst"], "left_anti")
        if fmt == "parquet":
            # retry-idempotent by LAYOUT: overwrite targets exactly this
            # epoch's directory
            new_edges.write.mode("overwrite").parquet(
                os.path.join(edge_store, f"epoch={int(epoch_id)}")
            )
        else:
            # delta: same epoch-partitioned layout, retry-idempotent via
            # transactional overwrite-by-filter on this epoch only
            (
                new_edges.withColumn("epoch", F.lit(int(epoch_id)))
                .write.format(fmt)
                .mode("overwrite")
                .option("replaceWhere", f"epoch = {int(epoch_id)}")
                .partitionBy("epoch")
                .save(edge_store)
            )

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    return q


_STAGE = "_compact_stage"  # leading "_": invisible to Spark file listing
_TRASH = ".compact_trash"


def compact_edge_store(
    spark: SparkSession, edge_store: str, keep_last: int = 1, min_epochs: int = 4
) -> int:
    """Merge old epoch directories into one (parquet store maintenance).

    Many micro-batches leave many tiny ``epoch=N`` directories; each
    later anti-join then lists and opens every one.  Compaction rewrites
    all but the newest ``keep_last`` epochs into a single directory
    keyed by the OLDEST compacted epoch id.  The anti-join contract is
    preserved: the store's (src, dst) set is unchanged, and epoch ids
    only ever shrink toward older ids, so a future batch N (monotonic
    from the streaming checkpoint) can never collide with a compacted
    id.  Run it between streams or while the query is idle —
    ``keep_last ≥ 1`` keeps the newest epoch(s) untouched as the
    in-flight safety margin.

    Crash safety (no multi-dir atomic rename on a filesystem): write
    the merged data to a hidden staging dir first, then move victim
    epochs to a hidden trash dir, then publish the staging dir with one
    rename.  Every prefix of that sequence is recoverable — a fresh
    call ROLLS FORWARD a crashed compaction before starting a new one
    (hidden dirs are invisible to readers, so a crashed run is at worst
    temporarily-missing old epochs, never duplicates or corruption).

    Returns the number of epoch directories removed (0 = nothing to do).
    """
    if table_format() != "parquet":
        # This maintenance path is path-based parquet only: under
        # delta/iceberg the store is a (catalog) table and listing
        # epoch= dirs here would be wrong or fail confusingly
        # (ADVICE r4) — fail loudly and name the native command.
        raise NotImplementedError(
            f"compact_edge_store handles the parquet epoch-dir store only; "
            f"PGD_SPARK_TABLE_FORMAT={table_format()!r} stores compact with "
            "the table's own maintenance — iceberg: CALL "
            "system.rewrite_data_files(<table>), delta: OPTIMIZE <table>"
        )
    if not os.path.isdir(edge_store):
        return 0
    _roll_forward(edge_store)
    epochs = sorted(
        int(d.split("=")[1])
        for d in os.listdir(edge_store)
        if d.startswith("epoch=")
    )
    # clamp: keep_last > len(epochs) must mean "keep everything", not a
    # negative slice that silently compacts the newest epochs (the
    # documented in-flight safety margin)
    victims = epochs[: max(len(epochs) - max(keep_last, 0), 0)]
    if len(victims) < max(min_epochs, 2):
        return 0
    target = victims[0]
    stage = os.path.join(edge_store, _STAGE)
    # each epoch holds only never-before-seen edges (anti-join), so the
    # union is duplicate-free; coalesce-by-repartition keeps file count
    # proportional to data, not to batch count
    merged = (
        spark.read.schema(_STORE_SCHEMA)
        .option("basePath", edge_store)
        .parquet(*[os.path.join(edge_store, f"epoch={e}") for e in victims])
        .select("src", "dst")
    )
    merged.write.mode("overwrite").parquet(stage)
    # stage is complete (atomic _SUCCESS) — record intent, then swap
    import json

    with open(os.path.join(stage, "_COMPACT_TARGET"), "w") as f:
        json.dump({"target": target, "victims": victims}, f)
    trash = os.path.join(edge_store, _TRASH)
    os.makedirs(trash, exist_ok=True)
    for e in victims:
        os.rename(
            os.path.join(edge_store, f"epoch={e}"), os.path.join(trash, f"epoch={e}")
        )
    os.rename(stage, os.path.join(edge_store, f"epoch={target}"))
    shutil.rmtree(trash, ignore_errors=True)
    return len(victims)


def _roll_forward(edge_store: str) -> None:
    """Complete a compaction that crashed mid-swap (see above)."""
    import json

    stage = os.path.join(edge_store, _STAGE)
    trash = os.path.join(edge_store, _TRASH)
    marker = os.path.join(stage, "_COMPACT_TARGET")
    if os.path.exists(marker) and os.path.exists(os.path.join(stage, "_SUCCESS")):
        intent = json.load(open(marker))
        # the staged data supersedes EVERY victim — wherever the crash
        # landed (victims not yet moved, moved to trash, or a stale
        # target dir), remove them all, then publish the stage
        for e in intent["victims"]:
            for base in (edge_store, trash):
                d = os.path.join(base, f"epoch={e}")
                if os.path.isdir(d):
                    shutil.rmtree(d)
        os.rename(stage, os.path.join(edge_store, f"epoch={intent['target']}"))
    elif os.path.isdir(stage):
        # incomplete stage: compaction never committed, victims were
        # never touched (moves only happen after the marker lands)
        shutil.rmtree(stage)
    shutil.rmtree(trash, ignore_errors=True)
