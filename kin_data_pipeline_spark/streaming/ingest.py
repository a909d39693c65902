"""Streaming ingestion into the warehouse lifecycle — the streaming-native
form of the reference's incremental load loop (SURVEY.md §2.1 S6: poll →
append rows past the watermark). A micro-batch stream lands in the same
date-partitioned catalog tables the batch Runner maintains, so downstream
models read one table regardless of how rows arrived.

Delivery semantics: ``foreachBatch`` replays a batch after a failure, and a
plain parquet append would duplicate it. The sink records the last
committed batch id in a marker INSIDE the checkpoint directory — batch ids
are scoped to a checkpoint, so the marker must share its lifecycle (a
table-scoped marker would silently drop batch 0 of any fresh checkpoint) —
and the marker write is an atomic replace, so a crash can never leave it
corrupted. The one remaining window is inherent to non-transactional
storage: a crash between the parquet append and the marker replace
re-appends that batch on restart (at-least-once for exactly that batch);
transactional table formats (Delta/Iceberg) close it by committing data and
watermark in one transaction. At 100 TB each micro-batch append is a
partition-granular write, the same shape as the batch incremental loader.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from kin_data_pipeline_spark.plans.engine import Catalog

def _commit_marker(checkpoint_dir: str, table: str) -> str:
    return os.path.join(checkpoint_dir, f"__{table}.commits.json")

def last_committed_batch(checkpoint_dir: str, table: str) -> int:
    marker = _commit_marker(checkpoint_dir, table)
    if not os.path.exists(marker):
        return -1
    with open(marker) as f:
        return json.load(f)["batch_id"]

def _mark_committed(checkpoint_dir: str, table: str, batch_id: int) -> None:
    """Record ``batch_id`` as committed via atomic replace — the ONE
    implementation of the exactly-once marker write (a durability fix here,
    e.g. an fsync, reaches every sink at once instead of drifting)."""
    marker = _commit_marker(checkpoint_dir, table)
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"batch_id": batch_id}, f)
    os.replace(tmp, marker)  # atomic: never a torn/corrupt marker

def _run_available_now(
    stream: DataFrame, sink, query_name: str, checkpoint_dir: str, timeout_s: int
) -> None:
    """Drive a foreachBatch sink to completion under availableNow."""
    query = (
        stream.writeStream.foreachBatch(sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise RuntimeError(f"{query_name} did not finish in {timeout_s}s")

def ingest_to_catalog(
    stream: DataFrame,
    catalog: Catalog,
    table: str,
    date_col: str | None,
    query_name: str,
    checkpoint_dir: str,
    timeout_s: int = 300,
) -> None:
    """Run ``stream`` to completion (availableNow), appending each
    micro-batch to ``catalog.table(table)`` once per checkpoint lineage."""
    os.makedirs(checkpoint_dir, exist_ok=True)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(checkpoint_dir, table):
            return  # replayed batch after restart — already on disk
        catalog.write_append(table, batch_df, date_col)
        _mark_committed(checkpoint_dir, table, batch_id)

    _run_available_now(stream, _sink, query_name, checkpoint_dir, timeout_s)

def stream_corpus_increments(
    stream: DataFrame,
    catalog: Catalog,
    checkpoint_dir: str,
    query_name: str = "corpus_ingest",
    timeout_s: int = 600,
) -> list[dict]:
    """Dedup-gated streaming corpus ingestion: each micro-batch of documents
    runs ``models.corpus.ingest_increment`` — quality gate, broadcast probe
    of the STORED LSH band index, append-only-novel — under the same
    batch-id commit marker as ``ingest_to_catalog``.

    The marker matters for exactly-once here even though a replayed batch
    is CONTENT-idempotent once its bands are stored: a crash between the
    survivor append and the band append would otherwise re-append those
    survivors on replay (the probe wouldn't see their bands yet). Returns
    the per-batch ingest stats in completion order.
    """
    from kin_data_pipeline_spark.models.corpus import ingest_increment

    os.makedirs(checkpoint_dir, exist_ok=True)
    stats: list[dict] = []
    table = "corpus_increment"

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(checkpoint_dir, table):
            return
        result = ingest_increment(batch_df.sparkSession, catalog, batch_df)
        result["batch_id"] = batch_id
        stats.append(result)
        _mark_committed(checkpoint_dir, table, batch_id)

    _run_available_now(stream, _sink, query_name, checkpoint_dir, timeout_s)
    return stats

def ingest_changelog_to_catalog(
    stream: DataFrame,
    catalog: Catalog,
    table: str,
    key_cols: list[str],
    op_col: str = "op",
    seq_col: str = "seq",
    date_col: str | None = None,
    query_name: str = "cdc_ingest",
    checkpoint_dir: str | None = None,
    timeout_s: int = 300,
) -> list[dict]:
    """Streaming MERGE: a CDC changelog stream (I/U/D rows, Debezium shape)
    applied to a catalog table one micro-batch at a time through
    ``Catalog.apply_changelog`` — within a batch the per-key latest-``seq``
    change wins; across batches, batch order is log order.

    The commit marker is LOAD-BEARING for correctness here, not just for
    dedup: ``apply_changelog`` is idempotent for a lone batch, but a stale
    batch replayed AFTER a later batch has landed would roll keys back to
    older values (e.g. batch 3's update re-applied over batch 4's delete
    resurrects the row). ``batch_id <= last_committed`` makes replays of
    anything already merged a no-op, so restarts preserve log order.
    Returns the per-batch {upserts, deletes} counts in completion order.
    """
    if checkpoint_dir is None:
        raise ValueError("checkpoint_dir is required (batch ids scope to it)")
    os.makedirs(checkpoint_dir, exist_ok=True)
    applied: list[dict] = []

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(checkpoint_dir, table):
            return
        counts = catalog.apply_changelog(
            table, batch_df, key_cols, op_col=op_col, seq_col=seq_col,
            date_col=date_col,
        )
        counts["batch_id"] = batch_id
        applied.append(counts)
        _mark_committed(checkpoint_dir, table, batch_id)

    _run_available_now(stream, _sink, query_name, checkpoint_dir, timeout_s)
    return applied
