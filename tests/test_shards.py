"""Training-shard export: deterministic placement, layout, manifest parity.

The manifest query's oracle parity is covered by test_oracle_parity; here
we pin the writer's on-disk contract (what a data loader actually reads).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from kin_data_pipeline_spark.operators.shards import (
    shard_assignment,
    shard_manifest,
    write_training_shards,
)
from kin_data_pipeline_spark.sources.catalog import load_table

N = 8

def test_assignment_is_deterministic_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = shard_assignment(docs, "doc_id", N)
    b = shard_assignment(docs, "doc_id", N)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    stats = a.agg(
        F.min("shard").alias("lo"), F.max("shard").alias("hi"), F.count("*").alias("n")
    ).first()
    assert 0 <= stats["lo"] and stats["hi"] <= N - 1
    assert stats["n"] == docs.count()

def test_write_round_trip_matches_assignment(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "shards")
        assigned = write_training_shards(docs, out, "doc_id", N)
        # loader-facing layout: one directory per shard
        dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
        assert len(dirs) <= N and dirs
        back = spark.read.parquet(out).select("doc_id", "shard")
        expect = assigned.select("doc_id", "shard")
        assert back.exceptAll(expect).count() == 0
        assert expect.exceptAll(back).count() == 0

def test_manifest_totals_cover_the_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), " ")).cast("long").alias("n_tokens")
    )
    m = shard_manifest(shard_assignment(docs, "doc_id", N), "n_tokens")
    tot = m.agg(F.sum("n_docs").alias("d"), F.sum("n_tokens").alias("t")).first()
    base = docs.agg(F.count("*").alias("d"), F.sum("n_tokens").alias("t")).first()
    assert tot["d"] == base["d"] and tot["t"] == base["t"]
