"""Skew-salted aggregation correctness + MERGE-style upsert semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from kin_data_pipeline_spark.operators.skew import salted_agg, salted_count_distinct
from kin_data_pipeline_spark.plans.engine import Catalog
from kin_data_pipeline_spark.sources.catalog import load_table

def test_salted_agg_matches_plain(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r["event_type"],): (r["n"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total"),
        )
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], r["total"])
        for r in salted_agg(
            ev,
            keys=["event_type"],
            partial_aggs={
                "n": F.count(F.lit(1)),
                "total": F.sum(F.col("value").cast("decimal(18,2)")),
            },
            merge_aggs={
                "n": F.sum("n").cast("long"),
                "total": F.sum("total").cast("decimal(38,2)"),
            },
        ).collect()
    }
    for k, (n, total) in plain.items():
        sn, st = salted[k]
        assert sn == n and st == total

def test_salted_count_distinct_matches_exact(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    salted = {
        r["event_type"]: r["n_distinct"]
        for r in salted_count_distinct(ev, ["event_type"], "user_id").collect()
    }
    assert salted == exact

def test_upsert_replaces_matching_keys(spark, sf_dir, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(datetime.date(2024, 1, 1), "a", 1), (datetime.date(2024, 1, 2), "b", 2)],
        "date_key date, id string, v int",
    )
    cat.write_full("t", base, "date_key")
    patch = spark.createDataFrame(
        [(datetime.date(2024, 1, 2), "b", 99), (datetime.date(2024, 1, 3), "c", 3)],
        "date_key date, id string, v int",
    )
    cat.upsert_by_key("t", patch, ["id"], "date_key")
    rows = {r["id"]: r["v"] for r in cat.table("t").collect()}
    assert rows == {"a": 1, "b": 99, "c": 3}
