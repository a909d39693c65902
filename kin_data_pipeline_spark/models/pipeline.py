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
from kin_data_pipeline_spark.plans.model import DimJoin, IvmSpec, Model

FACT_T = "fact_kin_transaction"
FACT_C = "fact_kin_creations"

def build_kin_models(sf_dir: str, ivm: bool = False) -> list[Model]:
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

    models = [
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
    return _apply_ivm_overrides(models, sf_dir) if ivm else models


# ---------------------------------------------------------------------------
# IVM adoption for the production DAG (VERDICT r9 ask #2).
#
# ``build_kin_models(sf_dir, ivm=True)`` returns the SAME model surface,
# with the eligible single-fact rollup marts switched from per-run rebuild
# to DECLARED incremental view maintenance (Model.ivm): the facts opt into
# versioned writes (Model.versioned — each watermark append commits a
# changelog-sized version) and the rollups refresh in O(changes + agg)
# from the facts' change feed. The reference rebuilds every one of these
# marts per cron tick (execute_snowflake_load.py:89-91); the builders in
# models/kin.py stay the semantic oracle — the IVM twins are pinned
# byte-equal to them on the shared columns by tests/test_kin_ivm_dag.py.
#
# Eligibility = distributive/algebraic rollups of ONE fact, optionally
# dim-enriched (ΔF ⨝ broadcast dim_kin_app — daily_kin_transactions.sql:
# 93-99). Two documented deviations from the builder marts:
#   - maintenance substrate columns ride in-row (exact integer sums such
#     as total_quark_sum; an n_rows liveness count where the reference
#     mart had no count column) — the reference columns derive from them;
#   - the 3 median columns of daily_kin_transactions are HOLISTIC (not
#     incrementally maintainable — the documented IVM boundary) and split
#     into the companion builder mart daily_kin_transaction_medians,
#     which keeps the reference's watermark-append refresh.
# Everything else (multi-source joins, window chains, trailing-window
# actives, holistic marts) keeps its builder unchanged.


def _ivm_txn_shape(df):
    """Row-local derivation for the daily_kin_transactions IVM twin:
    per-type indicator + segmented quark columns (the A9 fused
    conditional aggregation, daily_kin_transactions.sql:30-88, expressed
    as maintainable SUMs)."""
    out = df
    for t, p in ((1, "earn"), (2, "spend"), (3, "peer")):
        out = out.withColumn(
            f"{p}_ind",
            F.when(F.col("txn_type") == t, F.lit(1)).otherwise(0).cast("long"),
        ).withColumn(
            f"{p}_quark",
            F.when(F.col("txn_type") == t, F.col("amount_quark")).otherwise(
                F.lit(0)
            ),
        )
    return out


def _ivm_amount_bucket_shape(df):
    """Row-local CASE bucketing (P8) — the same compat bucketize the
    builder uses (daily_kin_transaction_counts_by_amount.sql:5-13)."""
    from kin_data_pipeline_spark.functions.compat import bucketize
    from kin_data_pipeline_spark.models.kin import (
        AMOUNT_BUCKET_EDGES_QUARK,
        AMOUNT_BUCKET_LABELS,
    )

    return df.withColumn(
        "amount_range",
        bucketize(
            F.col("amount_quark"), AMOUNT_BUCKET_EDGES_QUARK, AMOUNT_BUCKET_LABELS
        ),
    )


def _ivm_wallet_shape(wallet_col: str):
    def shape(df):
        return df.withColumn("wallet_id", F.col(wallet_col))

    return shape


_APP_DIM = DimJoin(
    table="dim_kin_app", keys={"app_id": "id"}, select={"app_name": "name"}
)


def _seg_derived(p: str) -> dict[str, str]:
    # quark → Kin publication and the exact-ratio average, derived per
    # refresh from the maintained integer sums (same two IEEE ops as the
    # builder's _kin + single division — models/kin.py:190-197)
    return {
        f"daily_{p}_amounts": f"cast({p}_quark_sum as double) / 100000.0",
        f"daily_{p}_average": (
            f"case when daily_{p}_transactions = 0 then 0.0 else "
            f"cast({p}_quark_sum as double) / "
            f"cast(daily_{p}_transactions * 100000 as double) end"
        ),
    }


def _actives_30d_shape(df):
    """Row-local derivation for the trailing-30d actives IVM twin
    (r10 VERDICT ask #3): each fact row emits its spender (types 2,3 →
    from_wallet) and/or earner (types 1,3 → to_wallet) observation via an
    array concat + explode, then each observation fans out to the 30
    spine days it stays visible for — the exploded-date-spine rewrite of
    the trailing COUNT(DISTINCT) (operators/rangejoin.py:68), expressed
    entirely in row-local Generates so it commutes with the change
    feed's multiset diff. The builder's pre-explode DISTINCT is
    deliberately omitted: COUNT(DISTINCT wallet_id) rides the turnstile
    support's (group, value) grain, so duplicate observations only
    inflate support multiplicities, never the count."""
    return df.withColumn(
        "wallet_id",
        F.explode(
            F.concat(
                F.when(
                    F.col("txn_type").isin(2, 3),
                    F.array(F.col("from_wallet")),
                ).otherwise(F.array().cast("array<string>")),
                F.when(
                    F.col("txn_type").isin(1, 3),
                    F.array(F.col("to_wallet")),
                ).otherwise(F.array().cast("array<string>")),
            )
        ),
    ).withColumn(
        "spine_day",
        F.explode(
            F.sequence(
                F.col("date_key"),
                F.date_add(F.col("date_key"), 29),
                F.expr("interval 1 day"),
            )
        ),
    )


def actives_30d_ivm_model(name: str = "daily_active_accounts_30d_ivm") -> Model:
    """The trailing-window actives family's IVM twin: the most expensive
    rebuild-per-tick mart in the reference workload
    (daily_active_user_balance_by_app.sql:26-27 and the 13 range-join
    sites) becomes a maintained rollup at (spine_day, app_id) grain with
    an exact COUNT(DISTINCT wallet) support. State cost (documented like
    the quantile supports): the support table holds (spine_day, app_id,
    wallet) multiplicities — ~30× the distinct daily observation count —
    which is exactly the working set the builder's explode shuffles per
    rebuild; here it is paid once and rolled forward in O(changes × 30).
    The mart is a SUPERSET of the builder (spine days with no real
    activity day, up to +29 beyond the data's edge); serve it through
    ``serve_actives_30d`` (mart ⋈ live-fact day spine) for builder
    equality."""
    return Model(
        name,
        ivm=IvmSpec(
            source=FACT_T,
            group_by=["spine_day", "app_id"],
            count_col="n_obs",
            distinct_counts={"active_accounts_30d": "wallet_id"},
            row_transform=_actives_30d_shape,
        ),
        depends_on=[FACT_T],
        date_col=None,
    )


def serve_actives_30d(cat, mart_name: str = "daily_active_accounts_30d_ivm",
                      fact_name: str = FACT_T):
    """Builder-surface view of the actives IVM twin: restrict the
    maintained superset mart to the live fact's REAL reporting days
    (the builder's spine semi-join, models/kin.py:343) and rename to the
    reference columns. The spine is a broadcast-small distinct-dates
    frame."""
    from pyspark.sql import functions as F  # noqa: F811

    spine = cat.table(fact_name).select("date_key").distinct()
    return (
        cat.table(mart_name)
        .select(
            F.col("spine_day").alias("date_key"),
            "app_id",
            "active_accounts_30d",
        )
        .join(F.broadcast(spine), "date_key", "inner")
        .select("date_key", "app_id", "active_accounts_30d")
    )


def _ivm_kin_overrides(sf_dir: str) -> tuple[dict[str, Model], list[Model]]:
    """(by-name replacements, extra models) for the IVM DAG variant."""
    replacements = {
        # daily_kin_transactions.sql:1-99 minus the 3 holistic medians
        # (companion mart below): grain (date, app) + app_name via the
        # pre-agg broadcast dim join (:93-99), all counts/sums maintained,
        # Kin-scaled amounts and exact-ratio averages derived per refresh.
        "daily_kin_transactions": Model(
            name="daily_kin_transactions",
            ivm=IvmSpec(
                source=FACT_T,
                group_by=["date_key", "app_id", "app_name"],
                count_col="daily_total_transactions",
                measures={
                    "total_quark_sum": "amount_quark",
                    "daily_earn_transactions": "earn_ind",
                    "earn_quark_sum": "earn_quark",
                    "daily_spend_transactions": "spend_ind",
                    "spend_quark_sum": "spend_quark",
                    "daily_peer_transactions": "peer_ind",
                    "peer_quark_sum": "peer_quark",
                },
                derived={
                    # 0.00001 SOL per txn (reference :11) = count / 1e5
                    "daily_fee_sum": (
                        "cast(daily_total_transactions as double) / 100000.0"
                    ),
                    "daily_total_amounts": (
                        "cast(total_quark_sum as double) / 100000.0"
                    ),
                    **_seg_derived("earn"),
                    **_seg_derived("spend"),
                    **_seg_derived("peer"),
                },
                row_transform=_ivm_txn_shape,
                dims=(_APP_DIM,),
            ),
            depends_on=[FACT_T, "dim_kin_app"],
            date_col=None,
        ),
        # daily_kin_transaction_counts_by_amount.sql:5-13 — pure bucketed
        # count; transaction_count IS the maintained liveness count.
        "daily_counts_by_amount": Model(
            name="daily_counts_by_amount",
            ivm=IvmSpec(
                source=FACT_T,
                group_by=["date_key", "amount_range"],
                count_col="transaction_count",
                row_transform=_ivm_amount_bucket_shape,
            ),
            depends_on=[FACT_T],
            date_col=None,
        ),
        # daily_kin_blocks.sql:2-13 — exact COUNT(DISTINCT block) via a
        # persisted support table; n_rows is maintenance substrate.
        "daily_kin_blocks": Model(
            name="daily_kin_blocks",
            ivm=IvmSpec(
                source=FACT_T,
                group_by=["date_key"],
                distinct_counts={"block_count": "block"},
            ),
            depends_on=[FACT_T],
            date_col=None,
        ),
        # app_transaction_summary_{from,to}_account_by_day.sql:2-18 —
        # finest-grain marts (date, app, wallet) + app_name (:16-17).
        "app_txn_summary_from_account_daily": _ivm_app_txn_summary(
            "app_txn_summary_from_account_daily", "from_wallet"
        ),
        "app_txn_summary_to_account_daily": _ivm_app_txn_summary(
            "app_txn_summary_to_account_daily", "to_wallet"
        ),
        # …/creates/daily_kin_creations_by_app.sql:2-26 — FACT_C rollup,
        # app-dim enriched; lamport integer sums maintained, SOL doubles
        # derived once per refresh.
        "daily_kin_creations_by_app": Model(
            name="daily_kin_creations_by_app",
            ivm=IvmSpec(
                source=FACT_C,
                group_by=["date_key", "app_id", "app_name"],
                count_col="daily_transactions",
                measures={
                    "daily_opening_balance_quark": "balance_quark",
                    "fee_lamports_sum": "fee_lamports",
                    "create_fee_lamports_sum": "create_fee_lamports",
                },
                derived={
                    "daily_opening_balance_kin": (
                        "cast(daily_opening_balance_quark as double) / 100000.0"
                    ),
                    "daily_transaction_fee_sum": (
                        "cast(fee_lamports_sum as double) / 1e9"
                    ),
                    "daily_creation_fee_sum": (
                        "cast(create_fee_lamports_sum as double) / 1e9"
                    ),
                },
                dims=(_APP_DIM,),
            ),
            depends_on=[FACT_C, "dim_kin_app"],
            date_col=None,
        ),
    }

    def dim_builder(ctx):
        from kin_data_pipeline_spark.sources import kin_adapter as ka

        return ka.dim_kin_app(ctx.spark, sf_dir)

    def medians_builder(ctx):
        f = K.fact_kin_transaction(ctx.spark, sf_dir, ctx.run_date)
        seg = lambda t: F.col("txn_type") == t  # noqa: E731
        meds = [
            F.coalesce(
                F.round(
                    F.median(F.when(seg(t), F.col("amount_quark"))) / 100000.0,
                    6,
                ),
                F.lit(0.0),
            ).alias(f"daily_{p}_median")
            for t, p in ((1, "earn"), (2, "spend"), (3, "peer"))
        ]
        return f.groupBy("date_key", "app_id").agg(*meds)

    extras = [
        # the dim is materialized into the catalog so the IVM refresh can
        # fingerprint exactly the content the delta joined (a content-
        # identical rebuild does NOT trigger a mart rebuild)
        Model("dim_kin_app", dim_builder, depends_on=[], date_col=None),
        # the holistic boundary: the 3 median columns keep the
        # reference's builder/watermark refresh in a companion mart
        Model(
            "daily_kin_transaction_medians",
            medians_builder,
            depends_on=[FACT_T],
            date_col="date_key",
        ),
        # clone-surface parity (r10 ADVICE): daily_kin_transactions_clone
        # now clones the IVM twin (medians gone, substrate sums added), so
        # the companion mart gets its own clone — a clone consumer of the
        # pair sees every reference column across the two tables
        Model(
            "daily_kin_transaction_medians_clone",
            clone_of="daily_kin_transaction_medians",
        ),
        # the trailing-30d actives IVM TWIN (r10 VERDICT ask #3): the
        # builder mart daily_active_accounts_30d stays the reference
        # surface; this maintained superset (spine_day grain, exact
        # wallet distinct support) serves the same numbers through
        # serve_actives_30d without the per-tick 30x explode rebuild
        actives_30d_ivm_model(),
    ]
    return replacements, extras


def _ivm_app_txn_summary(name: str, wallet_col: str) -> Model:
    return Model(
        name=name,
        ivm=IvmSpec(
            source=FACT_T,
            group_by=["date_key", "app_id", "wallet_id", "app_name"],
            count_col="transaction_count",
            measures={"volume_quark": "amount_quark"},
            derived={"amount": "cast(volume_quark as double) / 100000.0"},
            row_transform=_ivm_wallet_shape(wallet_col),
            dims=(_APP_DIM,),
        ),
        depends_on=[FACT_T, "dim_kin_app"],
        date_col=None,
    )


def _apply_ivm_overrides(models: list[Model], sf_dir: str) -> list[Model]:
    import dataclasses

    replacements, extras = _ivm_kin_overrides(sf_dir)
    out: list[Model] = []
    for m in models:
        if m.name in replacements:
            out.append(replacements[m.name])
        elif m.name in (FACT_T, FACT_C):
            # facts opt into versioned writes: the Runner starts their
            # commit log on first materialization; each later watermark
            # append is a changelog-sized commit the IVM marts consume
            out.append(dataclasses.replace(m, versioned=True))
        else:
            out.append(m)
    return out + extras
