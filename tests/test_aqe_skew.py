"""AQE skew-join pin: with a zipf-headed key, adaptive execution must
split the hot partition (skew=true in the join node) rather than leave one
straggler task — the runtime half of the engine's skew story (the authoring
half is operators/skew.py's salted rewrites)."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

@contextlib.contextmanager
def _skew_conf(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

def test_aqe_splits_skewed_join_partition(spark):
    # left side: 200k rows of key 0 (the zipf head) + a uniform tail
    left = spark.range(220000).select(
        F.when(F.col("id") < 200000, F.lit(0))
        .otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("payload"),
    )
    right = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("w"))
    with _skew_conf(spark):
        # the join must be TERMINAL: a downstream shuffle requirement (e.g.
        # a groupBy on the join key) pins the output partitioning and AQE
        # then refuses to split the skewed partition — itself a useful
        # property to know when authoring hot-key aggregations (that case
        # is what operators/skew.py's salted rewrites are for).
        joined = left.join(right, "k").select("payload", "w")
        # execute THIS frame (df.count() builds a separate plan whose
        # adaptive execution wouldn't finalize joined's own)
        assert len(joined.collect()) == 220000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
