"""Plan guardrails at materialization time + the SQL view surface."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from kin_data_pipeline_spark.plans.engine import Catalog, Runner
from kin_data_pipeline_spark.plans.guard import PlanGuardError, assert_scalable_plan
from kin_data_pipeline_spark.plans.model import Model

RUN = datetime.date(2024, 2, 1)

def _frame(spark, n=10):
    return spark.range(n).select(
        F.lit(RUN - datetime.timedelta(days=1)).alias("date_key"),
        F.col("id").alias("k"),
    )

def test_guard_rejects_undeclared_nested_loop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    bad = Model(
        name="bad_cross",
        builder=lambda ctx: _frame(ctx.spark).crossJoin(
            _frame(ctx.spark).select(F.col("k").alias("k2"))
        ),
    )
    with pytest.raises(PlanGuardError, match="BroadcastNestedLoopJoin"):
        Runner(spark, cat).run([bad], RUN)
    assert not cat.exists("bad_cross")  # aborted before any write

def test_guard_rejects_cartesian_product(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _frame(spark).crossJoin(_frame(spark).select(F.col("k").alias("k2")))
        with pytest.raises(PlanGuardError, match="CartesianProduct"):
            assert_scalable_plan(df, "cp")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

def test_guard_accepts_declared_nested_loop(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    ok = Model(
        name="declared_scan",
        builder=lambda ctx: _frame(ctx.spark).crossJoin(
            F.broadcast(_frame(ctx.spark).select(F.col("k").alias("k2")))
        ),
        allow_nested_loop=True,
    )
    results = Runner(spark, cat).run([ok], RUN)
    assert results[0].action == "full"
    assert cat.table("declared_scan").count() == 100

def test_publish_views_exposes_tables_and_clones(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    cat.write_full("base_t", _frame(spark), date_col="date_key")
    cat.clone("clone_t", "base_t")
    published = cat.publish_views()
    assert set(published) == {"base_t", "clone_t"}
    joined = spark.sql(
        "SELECT COUNT(*) AS n FROM base_t b JOIN clone_t c ON b.k = c.k"
    ).first()
    assert joined["n"] == 10
    # a view snapshots the file listing — re-publish after the next run
    cat.write_full("base_t", _frame(spark, 7), date_col="date_key")
    cat.publish_views()
    assert spark.sql("SELECT COUNT(*) AS n FROM base_t").first()["n"] == 7

def test_run_report_records_durations_and_failures(spark, tmp_path):
    import json

    from kin_data_pipeline_spark.plans.engine import write_run_report  # noqa: F401

    cat = Catalog(spark, str(tmp_path / "wh"))
    report = str(tmp_path / "runs.jsonl")
    good = Model(name="good_t", builder=lambda ctx: _frame(ctx.spark))
    Runner(spark, cat).run([good], RUN, report_path=report)
    bad = Model(
        name="bad_cross",
        builder=lambda ctx: _frame(ctx.spark).crossJoin(
            _frame(ctx.spark).select(F.col("k").alias("k2"))
        ),
    )
    with pytest.raises(PlanGuardError):
        Runner(spark, cat).run([bad], RUN, report_path=report)
    lines = [json.loads(l) for l in open(report)]
    assert len(lines) == 2
    ok, failed = lines
    assert ok["ok"] is True and ok["models"][0]["action"] == "full"
    assert ok["models"][0]["duration_sec"] >= 0
    assert failed["ok"] is False
    assert failed["models"][0]["action"] == "failed"
    assert "BroadcastNestedLoopJoin" in failed["models"][0]["error"]
