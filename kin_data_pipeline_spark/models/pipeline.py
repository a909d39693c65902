"""The Kin warehouse as a materialized DAG: wires the model library into the
plans engine (the reference's daily pipeline, sf_daily_pipeline.yaml:1-17,
with explicit dependencies instead of filename ordering).

``build_kin_models(sf_dir)`` returns the Model list; run with::

    runner.run(build_kin_models(sf_dir), run_date, "incremental")

Derived marts read their upstreams from the catalog (not by recomputing the
chain), so the DAG materializes each table exactly once per run — the
engine-level equivalent of the reference's mart ordering, plus clone
publication (S7) and the rename-only export layer (E3/P1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kin_data_pipeline_spark.models import kin as K
from kin_data_pipeline_spark.plans.model import Model

def build_kin_models(sf_dir: str) -> list[Model]:
    def fact_transactions(ctx):
        return K.fact_kin_transaction(ctx.spark, sf_dir, ctx.run_date)

    def fact_creations(ctx):
        return K.fact_kin_creations(ctx.spark, sf_dir, ctx.run_date)

    def daily_transactions(ctx):
        f = ctx.table("fact_kin_transaction")
        seg = lambda t: F.col("txn_type") == t  # noqa: E731
        return f.groupBy("date_key").agg(
            F.count(F.when(seg(1), 1)).alias("earn_count"),
            F.count(F.when(seg(2), 1)).alias("spend_count"),
            F.count(F.when(seg(3), 1)).alias("peer_count"),
            F.count(F.lit(1)).alias("total_count"),
            F.sum("amount_quark").cast("long").alias("total_volume_quark"),
            F.countDistinct("from_wallet").alias("active_wallets"),
        )

    def weekly_transactions(ctx):
        d = ctx.table("daily_kin_transactions")
        return (
            d.groupBy(F.trunc("date_key", "week").alias("date_key"))
            .agg(
                F.sum("total_count").cast("long").alias("total_count"),
                F.sum("total_volume_quark").cast("long").alias("total_volume_quark"),
            )
            # complete-week guard: watermark semantics freeze partial weeks
            .filter(F.date_add(F.col("date_key"), 7) <= F.lit(ctx.run_date))
        )

    def closing_balance(ctx):
        return K.closing_account_balance_per_day(ctx.spark, sf_dir, ctx.run_date)

    def export_daily_summary(ctx):
        # Postgres-replication layer: pure rename projection (E3, P1)
        return ctx.table("daily_kin_transactions").select(
            F.col("date_key").alias("date"),
            F.col("total_count").alias("transaction_count"),
            F.col("total_volume_quark").alias("volume_quark"),
            F.col("active_wallets").alias("active_wallet_count"),
        )

    return [
        Model("fact_kin_transaction", fact_transactions, cadence="daily"),
        Model("fact_kin_creations", fact_creations, cadence="daily"),
        Model(
            "daily_kin_transactions",
            daily_transactions,
            cadence="daily",
            depends_on=["fact_kin_transaction"],
        ),
        Model(
            "weekly_kin_transactions",
            weekly_transactions,
            cadence="weekly",
            depends_on=["daily_kin_transactions"],
        ),
        Model(
            "closing_account_balance_per_day",
            closing_balance,
            cadence="daily",
        ),
        Model(
            "daily_kin_transactions_clone",
            clone_of="daily_kin_transactions",
        ),
        Model(
            "export_daily_summary",
            export_daily_summary,
            cadence="daily",
            depends_on=["daily_kin_transactions"],
            date_col="date",
        ),
    ]
