"""Property tests (SURVEY.md §5 layer 4): KRE invariants the reference's
business rules imply, checked over the real testdata."""

from __future__ import annotations

from pyspark.sql import functions as F

from kin_data_pipeline_spark.models import kin as M

def test_payout_shares_sum_to_one(spark, sf_dir):
    payout = M.daily_kin_payout(spark, sf_dir)
    sums = payout.groupBy("date_key").agg(
        F.sum("pre_monopoly_share").alias("pre_sum"),
        F.sum("post_monopoly_app_share").alias("post_sum"),
    )
    for r in sums.collect():
        assert abs(r["pre_sum"] - 1.0) < 1e-4, f"pre shares sum {r['pre_sum']}"
        # post-monopoly redistribution must also conserve the pool
        assert abs(r["post_sum"] - 1.0) < 1e-4, f"post shares sum {r['post_sum']}"

def test_capped_aub_respects_user_cap(spark, sf_dir):
    aub = M.daily_active_user_balance_by_app(spark, sf_dir)
    violated = aub.filter(
        F.col("capped_aub_quark")
        > F.col("active_users") * M.AUB_CAP_QUARKS_PER_USER
    )
    assert violated.count() == 0
    # cap never increases the raw AUB
    assert aub.filter(F.col("capped_aub_quark") > F.col("aub_quark")).count() == 0

def test_active_users_threshold(spark, sf_dir):
    aub = M.daily_active_user_balance_by_app(spark, sf_dir)
    assert aub.filter(F.col("active_users") <= 0).count() == 0

def test_trailing_actives_bound_below_by_daily(spark, sf_dir):
    daily = (
        M.fact_kin_transaction(spark, sf_dir)
        .filter(F.col("txn_type").isin(2, 3))
        .groupBy("date_key", "app_id")
        .agg(F.countDistinct("from_wallet").alias("daily_spenders"))
    )
    trailing = M.daily_active_accounts_30d(spark, sf_dir)
    joined = trailing.join(daily, ["date_key", "app_id"], "inner")
    # a 30-day distinct count can never be below the same day's spender count
    assert joined.filter(F.col("active_accounts_30d") < F.col("daily_spenders")).count() == 0

def test_volatility_factor_nonnegative(spark, sf_dir):
    vf = M.daily_volatility_factor(spark, sf_dir)
    assert vf.filter(F.col("volatility_factor") < 0).count() == 0
    assert vf.filter(F.col("average_price") <= 0).count() == 0

def test_fact_complete_day_guard(spark, sf_dir):
    f = M.fact_kin_transaction(spark, sf_dir)
    assert f.filter(F.col("date_key") >= F.lit(M.RUN_DATE)).count() == 0

def test_fact_dedup_idempotent(spark, sf_dir):
    f = M.fact_kin_transaction(spark, sf_dir)
    assert f.count() == f.distinct().count()
