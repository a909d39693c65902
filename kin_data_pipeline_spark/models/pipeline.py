"""The Kin warehouse as a materialized DAG: wires the model library into the
plans engine (the reference's daily pipeline, sf_daily_pipeline.yaml:1-17,
with explicit dependencies instead of filename ordering).

``build_kin_models(sf_dir)`` returns the FULL reference model surface (every
mart `models/kin.py` implements) as Model entries; run with::

    runner.run(build_kin_models(sf_dir), run_date, "incremental")

The reference injects the same watermark-append template into every model
(execute_snowflake_load.py:82-100, unit from the cadence directory), so the
Runner's uniform `date_trunc(unit, date_col) > watermark` append mirrors it
exactly; clone publication (S7) and the rename-only Postgres export layer
(E3/P1, postgres_replication/dailyAccountSummaryApp.sql) ride on top. Model
builders share the session frame cache, so the DAG materializes each chain
once per (run_date, sf_dir) even though marts self-compute their lineage.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kin_data_pipeline_spark.models import kin as K
from kin_data_pipeline_spark.plans import checks as C
from kin_data_pipeline_spark.plans.model import Model

FACT_T = "fact_kin_transaction"
FACT_C = "fact_kin_creations"

def build_kin_models(sf_dir: str) -> list[Model]:
    def _k(name: str, cadence: str = "daily", date_col: str = "date_key",
           deps: tuple[str, ...] = (FACT_T,), checks: tuple = (),
           bloom: tuple[str, ...] = ()) -> Model:
        fn = getattr(K, name)

        def builder(ctx, fn=fn):
            return fn(ctx.spark, sf_dir, ctx.run_date)

        return Model(name, builder, cadence=cadence, depends_on=list(deps),
                     date_col=date_col, checks=checks, bloom_filter_on=bloom)

    def _export(source: str, renames: dict[str, str]):
        # Postgres-replication layer: pure rename projections to the API's
        # camelCase convention (E3/P1, postgres_replication/*.sql — one
        # model per mart, nothing but column aliases).
        def builder(ctx):
            return ctx.table(source).select(
                *[F.col(a).alias(b) for a, b in renames.items()]
            )

        return builder

    _SUMMARY_RENAMES = {  # dailySummaryApp.sql:2-28 (shared tail with eco)
        "transaction_fees_sol": "transactionFees",
        "transaction_count": "totalDailyTransactions",
        "transaction_amount_kin": "totalDailyAmount",
        "transaction_amount_usd": "totalDailyAmountUsd",
        "earn_count": "dailyEarnTransactions",
        "earn_amount_kin": "dailyEarnAmount",
        "earn_amount_usd": "dailyEarnAmountUsd",
        "spend_count": "dailySpendTransactions",
        "spend_amount_kin": "dailySpendAmount",
        "spend_amount_usd": "dailySpendAmountUsd",
        "peer_count": "dailyPeerTransactions",
        "peer_amount_kin": "dailyPeerAmount",
        "peer_amount_usd": "dailyPeerAmountUsd",
        "daily_active_users": "dailyActiveUsers",
        "daily_active_earners": "dailyActiveEarners",
        "daily_active_spenders": "dailyActiveSpenders",
        "monthly_active_users": "monthlyActiveUsers",
        "monthly_active_earners": "monthlyActiveEarners",
        "monthly_active_spenders": "monthlyActiveSpenders",
    }

    export_daily_account_summary_app = _export(
        "daily_account_summary_by_app",
        {"date_key": "date", "app_id": "index",
         "accounts_created": "accountsCreated",
         "sol_cost": "solCost", "usd_cost": "usdCost"},
    )
    export_daily_account_summary_ecosystem = _export(
        "daily_account_summary_ecosystem",
        {"date_key": "date", "accounts_created": "accountsCreated",
         "sol_cost": "solCost", "usd_cost": "usdCost"},
    )
    export_daily_market_summary = _export(
        "daily_market_summary",
        {"date_key": "date", "kin_price": "price",
         "kin_market_cap": "marketCap", "kin_trade_volume": "tradeVolume",
         "kin_circulating_supply": "circulatingSupply"},
    )
    export_daily_summary_app = _export(
        "daily_summary_by_app",
        {"date_key": "date", "app_id": "index", "app_name": "name",
         "transaction_fees_usd": "transactionFeesUsd", **_SUMMARY_RENAMES},
    )
    export_daily_summary_ecosystem = _export(
        "daily_summary_ecosystem",
        {"date_key": "date", "app_count": "monthlyActiveApps",
         "transactions_fee_usd": "transactionFeesUsd", **_SUMMARY_RENAMES},
    )
    export_kre_summary = _export(
        "daily_kre_summary",
        {"date_key": "date", "active_apps": "activeApps",
         "active_user_balance": "activeUserBalance",
         "active_capped_user_balance": "activeCappedUserBalance",
         "active_users": "activeUsers",
         "volatility_factor": "dailyVolatilityFactor",
         "kin_payout": "dailyKinPayout", "usd_payout": "dailyUsdPayout",
         "transaction_count": "dailyTransactions",
         "monthly_active_earners": "monthlyActiveEarners",
         "monthly_active_spenders": "monthlyActiveSpenders",
         "monthly_active_users": "monthlyActiveUsers"},
    )
    export_kre_payout_summary = _export(
        "weekly_kre_payout_summary",
        {"date_key": "date", "kin_payout": "kin", "usd_payout": "usd",
         "top_app_list": "top10"},
    )

    return [
        # --- facts (kin_main_warehouse) ---
        # fact contracts gate the write: key integrity + value sanity
        # (one fused aggregation per fact; plans/checks.py)
        # facts are the tables ops point-probe by txn/account id (support
        # lookups, dedup audits), so they carry parquet bloom filters on
        # the id — row-group skipping for `id = X` beside the date
        # partition pruning (Model.bloom_filter_on; composes with append)
        _k(FACT_T, deps=(), checks=(
            C.not_null("id", "date_key", "from_wallet"),
            C.non_negative("fee_sol"),
            C.accepted_values("txn_type", ["1", "2", "3"]),
        ), bloom=("id",)),
        _k(FACT_C, deps=(), checks=(
            C.not_null("id", "date_key", "account_id"),
            C.non_negative("fee_lamports", "create_fee_lamports"),
        ), bloom=("id",)),
        # --- summary_stats / transactions marts ---
        _k("daily_kin_transactions"),
        _k("daily_counts_by_amount"),
        _k("daily_kin_blocks"),
        _k("daily_net_inflation",
           deps=("daily_kin_payout", "closing_account_balance_per_day",
                 "daily_churn_volume")),
        _k("daily_market_summary"),
        _k("kin_transactions_curated"),
        _k("weekly_kin_transactions", cadence="weekly", deps=(FACT_T,)),
        _k("monthly_kin_transactions", cadence="monthly", deps=(FACT_T,)),
        # --- balances chain (kre_mart active_user_and_vf) ---
        _k("closing_account_balance_per_day", deps=(FACT_T, FACT_C)),
        _k("average_account_balance_per_day", deps=(FACT_T,)),
        _k("account_balance_buckets_app",
           deps=("closing_account_balance_per_day",)),
        _k("daily_active_user_balance_by_app",
           deps=("closing_account_balance_per_day",)),
        _k("daily_volatility_factor",
           deps=("daily_active_user_balance_by_app",)),
        # --- payout chain (kre_mart payouts) ---
        _k("daily_kin_payout",
           deps=("daily_active_user_balance_by_app", "daily_volatility_factor")),
        _k("kre_weekly_payout", cadence="weekly",
           deps=("daily_kin_payout",)),
        _k("weekly_kre_payout_summary", cadence="weekly",
           deps=("daily_kin_payout",)),
        _k("daily_kre_summary", deps=("daily_kin_payout",)),
        # --- active accounts cadence matrix ---
        # the whole family is daily-grain: weekly/monthly are trailing
        # 7/30-day windows per date_key anchor (reference keeps them under
        # daily_models/…/active_accounts), not calendar rollups.
        _k("daily_active_accounts_30d"),
        _k("daily_active_accounts_app"),
        _k("daily_active_accounts_ecosystem"),
        _k("weekly_active_accounts_app"),
        _k("monthly_active_accounts_app"),
        _k("weekly_active_accounts_ecosystem"),
        _k("monthly_active_accounts_ecosystem"),
        # --- account transaction summaries ---
        _k("app_txn_summary_from_account_daily"),
        _k("app_txn_summary_to_account_daily"),
        _k("weekly_app_txn_summary_from_account", cadence="weekly"),
        _k("monthly_app_txn_summary_from_account", cadence="monthly"),
        _k("weekly_app_txn_summary_to_account", cadence="weekly"),
        _k("monthly_app_txn_summary_to_account", cadence="monthly"),
        # --- creates family ---
        _k("daily_kin_creations_by_app", deps=(FACT_C,)),
        _k("daily_create_fee_payers", deps=(FACT_C,)),
        _k("daily_account_creates_by_type", deps=(FACT_C,)),
        _k("daily_account_creates_by_close_authority", deps=(FACT_C,)),
        _k("daily_account_creates_by_program", deps=(FACT_C,)),
        # --- garbage collection / churn ---
        _k("daily_churn_volume", deps=(FACT_T, "closing_account_balance_per_day")),
        _k("multi_create_impacted_accounts", deps=(FACT_C, "closing_account_balance_per_day")),
        _k("gc_dust_wallets", cadence="monthly", date_col="last_seen_date",
           deps=("closing_account_balance_per_day",)),
        _k("monthly_inactive_wallets", cadence="monthly",
           deps=("closing_account_balance_per_day", FACT_T, FACT_C)),
        # --- API serving marts (kin_data) ---
        _k("daily_account_summary_by_app", deps=(FACT_C,)),
        _k("daily_account_summary_ecosystem", deps=(FACT_C,)),
        _k("daily_summary_by_app",
           deps=("daily_kin_transactions", "daily_active_accounts_app",
                 "monthly_active_accounts_app")),
        _k("daily_summary_ecosystem",
           deps=("daily_kin_transactions", "daily_active_accounts_ecosystem",
                 "monthly_active_accounts_ecosystem")),
        # --- clones (S7) + Postgres export (E3) ---
        Model("daily_kin_transactions_clone",
              clone_of="daily_kin_transactions"),
        Model("daily_kin_payout_clone", clone_of="daily_kin_payout"),
        Model(
            "export_daily_account_summary_app",
            export_daily_account_summary_app,
            cadence="daily",
            depends_on=["daily_account_summary_by_app"],
            date_col="date",
        ),
        Model("export_daily_account_summary_ecosystem",
              export_daily_account_summary_ecosystem, cadence="daily",
              depends_on=["daily_account_summary_ecosystem"], date_col="date"),
        Model("export_daily_market_summary", export_daily_market_summary,
              cadence="daily", depends_on=["daily_market_summary"],
              date_col="date"),
        Model("export_daily_summary_app", export_daily_summary_app,
              cadence="daily", depends_on=["daily_summary_by_app"],
              date_col="date"),
        Model("export_daily_summary_ecosystem", export_daily_summary_ecosystem,
              cadence="daily", depends_on=["daily_summary_ecosystem"],
              date_col="date"),
        Model("export_kre_summary", export_kre_summary, cadence="daily",
              depends_on=["daily_kre_summary"], date_col="date"),
        Model("export_kre_payout_summary", export_kre_payout_summary,
              cadence="weekly", depends_on=["weekly_kre_payout_summary"],
              date_col="date"),
    ]
