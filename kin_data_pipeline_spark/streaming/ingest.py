"""Streaming ingestion into the warehouse lifecycle — the streaming-native
form of the reference's incremental load loop (SURVEY.md §2.1 S6: poll →
append rows past the watermark). A micro-batch stream lands in the same
date-partitioned catalog tables the batch Runner maintains, so downstream
models read one table regardless of how rows arrived.

Exactly-once: ``foreachBatch`` replays a batch after a failure, and a plain
parquet append would duplicate it. The sink therefore records the last
committed batch id in a sidecar and skips replays — the standard idempotent
foreachBatch recipe (transactional sinks like Delta subsume this; plain
parquet needs the guard). At 100 TB each micro-batch append is a
partition-granular write, the same shape as the batch incremental loader.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame

from kin_data_pipeline_spark.plans.engine import Catalog

def _commit_marker(catalog: Catalog, table: str) -> str:
    return catalog.path(table) + ".stream_commits"

def last_committed_batch(catalog: Catalog, table: str) -> int:
    marker = _commit_marker(catalog, table)
    if not os.path.exists(marker):
        return -1
    with open(marker) as f:
        return json.load(f)["batch_id"]

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
    micro-batch to ``catalog.table(table)`` exactly once."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_committed_batch(catalog, table):
            return  # replayed batch after restart — already on disk
        catalog.write_append(table, batch_df, date_col)
        with open(_commit_marker(catalog, table), "w") as f:
            json.dump({"batch_id": batch_id}, f)

    query = (
        stream.writeStream.foreachBatch(_sink)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(timeout_s):
        query.stop()
        raise RuntimeError(f"{query_name} did not finish in {timeout_s}s")
