"""Training-shard export: the last step of a curation pipeline.

After filtering/dedup/selection, a training corpus ships as N
equal-weight shards consumed independently by data loaders. Two contracts
matter at 100 TB:

- **Deterministic placement** — shard(doc) must be a pure function of the
  document id (md5-based, like every sampling decision in
  ``queries/curation.py``), so re-exports after an incremental update move
  only the changed documents and any engine (or the oracle) can recompute
  the mapping.
- **One write pass** — assignment is a projection; the writer hash-
  repartitions on the shard id and writes ``partitionBy("shard")``, so
  the corpus streams to its shard directories in a single linear shuffle.
  No global sort, no per-shard scans.

The manifest (per-shard doc/token accounting a loader uses to schedule
epochs) is a one-aggregation DataFrame, exposed as the oracle-checked
query ``training_shard_manifest``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

def shard_assignment(df: DataFrame, id_col: str, n_shards: int) -> DataFrame:
    """Add a ``shard`` column: md5-u32 of the id, mod ``n_shards``.

    md5 (not Spark's ``hash``) so the mapping is engine-independent —
    DuckDB, a loader in Python, and Spark all agree on placement.
    """
    u32 = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    return df.withColumn("shard", (u32 % n_shards).cast("int"))

def write_training_shards(
    df: DataFrame, out_dir: str, id_col: str, n_shards: int
) -> DataFrame:
    """Write ``df`` to ``out_dir/shard=K/`` parquet, deterministically
    sharded on ``id_col``; returns the assigned frame (lazy, re-usable for
    the manifest without re-deriving the shard column).

    ``repartition(n_shards, shard)`` then ``partitionBy("shard")``: each
    task holds whole shards, so every shard directory receives a small
    number of large files (the loader-friendly layout) instead of
    ``input_partitions × n_shards`` fragments.
    """
    assigned = shard_assignment(df, id_col, n_shards)
    (
        assigned.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    return assigned

def shard_manifest(assigned: DataFrame, token_count_col: str) -> DataFrame:
    """Per-shard accounting: docs, tokens, and id-range fingerprint."""
    return assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(token_count_col).cast("long").alias("n_tokens"),
        F.min("doc_id").cast("long").alias("min_doc_id"),
        F.max("doc_id").cast("long").alias("max_doc_id"),
    )
