"""The reference warehouse's model library, re-expressed Spark-first.

Each builder is a pure function ``(spark, sf_dir, run_date) -> DataFrame``
over the Kin-shaped projections in ``sources/kin_adapter.py``. Reference
citations sit on each builder (paths relative to
/root/reference/kin-data-pipeline/load_scripts/).

FP-determinism rules (so DuckDB oracles hash-match): quark/cent integer
arithmetic end-to-end; Kin/SOL conversion happens once, at the output edge,
as ONE exact-int→double cast plus ONE division by an exact power of ten
(bit-identical on Spark and DuckDB for integers < 2^53 — every quark/cent
sum here is ≤ ~1e14). Terminal columns are DOUBLE or BIGINT, never DECIMAL:
the driver's canonicalization renders decimals float-style, so trailing-zero
DECIMAL strings can never hash-match. Unavoidable derived doubles are single
division chains + ROUND(x, 6).

Documented deviations from the reference (SURVEY.md §2.11):
- ``fee`` IS divided by 1e9 here (the reference forgot for transactions).
- rank windows carry an ``app_id``/wallet tiebreak (the reference's
  dense_rank is nondeterministic on ties).
- payout share sums use the algebraic identities Σshare=1, Σpayout=P
  (the reference sums FP shares; mathematically identical, order-stable).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kin_data_pipeline_spark.operators.rangejoin import trailing_distinct_count
from kin_data_pipeline_spark.operators.relational import top_k_per_group
from kin_data_pipeline_spark.sources import kin_adapter as ka
from kin_data_pipeline_spark.sources.catalog import frame_cached

RUN_DATE = datetime.date(2024, 1, 31)

# Session-scoped frame cache (sources/catalog.py::frame_cached): the
# standalone query entries each rebuild the model chain from raw; sharing
# the fact/AUB/VF/actives frames across queries turns ~10 rebuilds into 1
# (same effect the materialized warehouse has in production).

def _cached(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    run_date,
    build,
    truncate: bool = False,
) -> DataFrame:
    return frame_cached(
        spark, name, sf_dir, str(run_date), build=build, truncate=truncate
    )
KRE_DAILY_POOL = 250_000_000.0  # daily_kin_payout.sql:27-29 hardcoded pool
QUARKS_PER_KIN = 100_000
AUB_CAP_QUARKS_PER_USER = 100_000 * QUARKS_PER_KIN  # 100k Kin cap, :67-69
CHURN_LOOKBACK_DAYS = 40  # daily_churn_volume.sql:9,47
GC_DUST_QUARKS = 500 * QUARKS_PER_KIN  # "effectively empty" threshold
GC_CUTOFF = datetime.date(2024, 1, 20)  # month-end analog for the GC window

def _kin(col) -> F.Column:
    """Exact quark→Kin conversion published as DOUBLE.

    The quark input is an exact integer < 2^53 at every tested scale, so the
    int→double cast is exact and the single division by 1e5 (an exactly
    representable power of ten) is correctly rounded — the same two IEEE
    operations DuckDB's ``CAST(x AS DOUBLE) / 100000.0`` performs."""
    return col.cast("double") / F.lit(100000.0)

# ---------------------------------------------------------------------------
# kin_main_warehouse/daily_models/facts/fact_kin_transaction.sql:3-50

def fact_kin_transaction(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _cached(
        spark,
        "fact_kin_transaction",
        sf_dir,
        run_date,
        lambda: _fact_kin_transaction(spark, sf_dir, run_date),
    )

def _fact_kin_transaction(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    raw = ka.raw_kintransaction(spark, sf_dir).distinct()  # P10 feed dedup (:3-13)
    f = raw.filter(
        (F.col("status") == "Ok")  # :50
        & (F.to_date("date") < F.lit(run_date))  # complete-day guard (:11)
    )
    return f.select(
        F.to_date("date").alias("date_key"),
        F.timestamp_seconds("timestamp").alias("txn_ts"),
        "id",
        "block",
        F.col("transactionid").alias("transaction_id"),
        F.col("instructionidx").alias("instruction_idx"),
        "memo",  # :27 — kept for the curated export (memo_text)
        F.coalesce("amount", F.lit(0)).alias("amount_quark"),  # :26
        _kin(F.coalesce("amount", F.lit(0))).alias("amount_kin"),
        F.col("fromaccount").alias("from_wallet"),
        F.col("toaccount").alias("to_wallet"),
        F.col("fromaccountbalance").alias("from_balance_quark"),
        F.col("toaccountbalance").alias("to_balance_quark"),
        # Deviation: reference forgets the 1e9 fee divisor (§2.11); we divide.
        (F.col("fee").cast("double") / F.lit(1_000_000_000.0)).alias("fee_sol"),
        F.col("feepayer").alias("fee_payer"),
        F.coalesce("appindex", F.lit(0)).alias("app_id"),  # :39-42
        F.when(F.col("transactiontype") == "<NA>", F.lit(None))
        .otherwise(F.col("transactiontype"))
        .cast("long")
        .alias("txn_type"),  # sentinel → NULL → int (:44-47)
    )

# .../facts/fact_kin_creations.sql:3-53

def fact_kin_creations(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _cached(
        spark,
        "fact_kin_creations",
        sf_dir,
        run_date,
        lambda: _fact_kin_creations(spark, sf_dir, run_date),
    )

def _fact_kin_creations(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    raw = ka.raw_kincreateaccount(spark, sf_dir).distinct()
    f = raw.filter(
        (F.col("status") == "Ok") & (F.to_date("date") < F.lit(run_date))
    )
    return f.select(
        F.to_date("date").alias("date_key"),
        F.timestamp_seconds("timestamp").alias("created_ts"),
        "id",
        "program_id",
        "block",
        "tx_id",
        "instr_idx",
        "memo",
        "account_id",
        "account_owner",
        "close_account_authority",  # fact_kin_creations.sql:31
        "mint",
        "source_transfer",
        F.col("balance").alias("balance_quark"),
        _kin(F.coalesce("balance", F.lit(0))).alias("balance_kin"),
        # Exact lamport integers travel beside the converted SOL doubles so
        # downstream cost aggregations sum ints (order-free) and convert once.
        F.col("fee").alias("fee_lamports"),
        F.col("create_fee").alias("create_fee_lamports"),
        (F.col("fee").cast("double") / F.lit(1_000_000_000.0)).alias(
            "fee_sol"
        ),  # :38 divides — kept
        (F.col("create_fee").cast("double") / F.lit(1_000_000_000.0)).alias(
            "create_fee_sol"
        ),
        "fee_payer",
        F.coalesce("appindex", F.lit(0)).alias("app_id"),
        F.when(F.col("transactiontype") == "<NA>", F.lit(None))
        .otherwise(F.col("transactiontype"))
        .cast("long")
        .alias("txn_type"),
        F.col("version").cast("long").alias("version"),  # ::NUMBER(38,0) (:50)
    )

# ---------------------------------------------------------------------------
# metabase_mart/daily_models/reporting/daily_kin_transactions.sql:1-99 —
# per-(date, app) mart: totals + per-type count/amount/average/median + the
# hardcoded 0.00001-SOL-per-txn fee sum (:11), app_name from dim_kin_app
# (:93-99). The reference's four CTE scans + three self-joins fuse into ONE
# conditional aggregation pass (A9+A4) and a broadcast dim join; amounts are
# in Kin (fact amount = quark/1e5, fact_kin_transaction.sql:26).

def daily_kin_transactions(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    # Cached: this mart is the substrate of the weekly/monthly rollups, the
    # API summary marts, and the KRE summary — one aggregation per session.
    return _cached(
        spark,
        "daily_kin_transactions",
        sf_dir,
        run_date,
        lambda: _daily_kin_transactions(spark, sf_dir, run_date),
    )

def _daily_kin_transactions(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)
    seg = lambda t: F.col("txn_type") == t  # noqa: E731

    def seg_aggs(t: int, prefix: str):
        cnt = F.count(F.when(seg(t), F.lit(1)))
        quark = F.coalesce(F.sum(F.when(seg(t), F.col("amount_quark"))), F.lit(0))
        return [
            cnt.alias(f"{prefix}_transactions"),
            _kin(quark).alias(f"{prefix}_amounts"),
            # avg in Kin: exact int sum / exact int (count × 1e5) — ONE
            # correctly-rounded division, identical on both engines.
            F.when(cnt == 0, F.lit(0.0))
            .otherwise(quark.cast("double") / (cnt * 100000).cast("double"))
            .alias(f"{prefix}_average"),
            F.coalesce(
                F.round(F.median(F.when(seg(t), F.col("amount_quark"))) / 100000.0, 6),
                F.lit(0.0),
            ).alias(f"{prefix}_median"),
        ]

    mart = f.groupBy("date_key", "app_id").agg(
        # 0.00001 SOL per txn (reference :11) = count / 1e5, one division
        (F.count(F.lit(1)).cast("double") / F.lit(100000.0)).alias("daily_fee_sum"),
        F.count(F.lit(1)).alias("daily_total_transactions"),
        _kin(F.sum("amount_quark")).alias("daily_total_amounts"),
        *seg_aggs(1, "daily_earn"),
        *seg_aggs(2, "daily_spend"),
        *seg_aggs(3, "daily_peer"),
    )
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    return mart.join(F.broadcast(app), "app_id", "left")

# metabase_mart/.../daily_kin_transaction_counts_by_amount.sql:5-13 (P8).

# daily_kin_transaction_counts_by_amount.sql:5-13 — the reference's Kin
# ranges are half-open [lower, upper); amounts are exact quark integers, so
# "< upper" is "<= upper−1" and the compat bucketize (inclusive upper
# bounds) expresses the same CASE chain. Everything below 1 Kin — including
# the NULL amounts the fact COALESCEs to 0 — is 'N/A' (:13).
AMOUNT_BUCKET_EDGES_QUARK = [
    99_999,  # < 1 Kin → 'N/A'
    199_999,  # [1, 2)
    99_999_999,  # [2, 1000)
    999_999_999,  # [1000, 10000)
    9_999_999_999,  # [10000, 100000)
    99_999_999_999,  # [100000, 1000000)
]
AMOUNT_BUCKET_LABELS = [
    "N/A",
    "1-2",
    "2-1000",
    "1001-10000",
    "10001-100000",
    "100001-1000000",
    "1000001+",
]

def daily_counts_by_amount(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    from kin_data_pipeline_spark.functions.compat import bucketize

    f = fact_kin_transaction(spark, sf_dir, run_date)
    # the compat-layer P8 helper — identical chained CASE, one owner
    expr = bucketize(
        F.col("amount_quark"), AMOUNT_BUCKET_EDGES_QUARK, AMOUNT_BUCKET_LABELS
    )
    return (
        f.withColumn("amount_range", expr)
        .groupBy("date_key", "amount_range")
        .agg(F.count(F.lit(1)).alias("transaction_count"))
    )

# ---------------------------------------------------------------------------
# kre_mart/daily_models/active_user_and_vf/closing_account_balance_per_day.sql:32-89 —
# bare-UNION of from/to/created balance observations (U1), OR-join rewritten
# as an unpivot (J6), last-timestamp balance with max-on-tie (A5).

def closing_balance_observations(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    """Balance observations feeding the closing-balance mart, per
    closing_account_balance_per_day.sql:33-86:

    - NULL balances count as 0 observations (the reference fact COALESCEs
      balances to 0, fact_kin_transaction.sql:30,35, and the closing CASE
      coalesces again :71-76) — they are NOT dropped.
    - The balance CASE (:68-76) evaluates from-side before to-side per
      joined row, so a self-transfer contributes only its from-balance.
    - Transaction observations outrank creation observations at the same
      closing timestamp: the creation branch of the CASE is reachable only
      when the transaction join missed (kt IS NULL), because both joins
      fan out row-wise and the from/to branches fire first. `obs_tier`
      encodes that priority (1 = transaction, 0 = creation).
    """
    f = fact_kin_transaction(spark, sf_dir, run_date)
    frm = f.select(
        "date_key",
        F.col("from_wallet").alias("wallet_id"),
        F.col("txn_ts").alias("obs_ts"),
        F.coalesce("from_balance_quark", F.lit(0)).alias("balance_quark"),
        F.lit(1).alias("obs_tier"),
    )
    to = f.filter(F.col("to_wallet") != F.col("from_wallet")).select(
        "date_key",
        F.col("to_wallet").alias("wallet_id"),
        F.col("txn_ts").alias("obs_ts"),
        F.coalesce("to_balance_quark", F.lit(0)).alias("balance_quark"),
        F.lit(1).alias("obs_tier"),
    )
    cr = fact_kin_creations(spark, sf_dir, run_date).select(
        "date_key",
        F.col("account_id").alias("wallet_id"),
        F.col("created_ts").alias("obs_ts"),
        F.coalesce("balance_quark", F.lit(0)).alias("balance_quark"),
        F.lit(0).alias("obs_tier"),
    )
    return frm.unionByName(to).unionByName(cr).distinct()  # bare UNION (U1)

def closing_account_balance_per_day(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _cached(
        spark,
        "closing_account_balance_per_day",
        sf_dir,
        run_date,
        lambda: _closing_account_balance_per_day(spark, sf_dir, run_date),
        truncate=True,  # day/app-grain, many consumers: cut lineage
    )

def _closing_account_balance_per_day(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    obs = closing_balance_observations(spark, sf_dir, run_date)
    # Latest observation per wallet/day (:54-63); at the closing timestamp
    # transaction observations beat creation ones, then ties take the max
    # balance (:64-89) — one lexicographic max(struct) pass, no join-back.
    best = F.max(F.struct("obs_ts", "obs_tier", "balance_quark"))
    return obs.groupBy("date_key", "wallet_id").agg(
        best["balance_quark"].alias("closing_balance_quark"),
        _kin(best["balance_quark"]).alias("closing_balance_kin"),
    )

# ---------------------------------------------------------------------------
# metabase_mart/.../daily_active_accounts_app.sql + monthly/weekly variants —
# trailing-30d distinct actives per app via the exploded-date-spine rewrite (J4+A2).

def daily_active_accounts_30d(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)
    # active_users_raw UNION, shared with the active_accounts family; the
    # role column collapses under a second (small-frame) distinct.
    activity = (
        _actives_obs(spark, sf_dir, run_date, by_app=True)
        .drop("role")
        .distinct()
    )
    return trailing_distinct_count(
        activity,
        date_col="date_key",
        distinct_col="wallet_id",
        days=30,
        partition_by=["app_id"],
        out_col="active_accounts_30d",
        spine=f.select("date_key"),
    )

# kre_mart/.../daily_active_user_balance_by_app.sql:18-73 — KRE AUB:
# wallets with ≥3 spend txns in the trailing 30d per app (au_filtered also
# drops the null-appindex bucket, `app_id != 0`, :34-36), valued at their
# most recent CLOSING balance in the window (closing_dates/wallet_balances
# :38-60 read closing_account_balance_per_day — to-side and creation
# observations count, not just the last spend's from_balance), capped at
# 100k Kin per user.

def daily_active_user_balance_by_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _cached(
        spark,
        "daily_active_user_balance_by_app",
        sf_dir,
        run_date,
        lambda: _daily_active_user_balance_by_app(spark, sf_dir, run_date),
        truncate=True,  # day/app-grain, many consumers: cut lineage
    )

def _daily_active_user_balance_by_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)
    spend = f.filter(F.col("txn_type").isin(2, 3)).select(
        "date_key", "app_id", F.col("from_wallet").alias("wallet_id")
    )
    spine = f.select("date_key").distinct().select(
        F.col("date_key").alias("spine_day")
    )
    # Every spend observation is visible to spine days [d, d+29].
    exploded = spend.withColumn(
        "spine_day",
        F.explode(
            F.sequence(
                F.col("date_key"),
                F.date_add(F.col("date_key"), 29),
                F.expr("interval 1 day"),
            )
        ),
    ).join(spine, "spine_day", "inner")
    active = (
        exploded.groupBy("spine_day", "app_id", "wallet_id")
        .agg(F.count(F.lit(1)).alias("n_spend_txns"))
        # :34-36 au_filtered: ≥3 spends AND not the null-appindex bucket
        .filter((F.col("n_spend_txns") >= 3) & (F.col("app_id") != 0))
    )
    # Valuation (:38-60): the wallet's most recent CLOSING balance within
    # the same 30-day lookback — the closing table sees to-side and
    # creation observations, not just spends. Scale shape: semi-scope the
    # closing rows to active wallets BEFORE the 30× spine explode.
    bal = closing_account_balance_per_day(spark, sf_dir, run_date).select(
        "date_key", "wallet_id", "closing_balance_quark"
    )
    bal = bal.join(active.select("wallet_id").distinct(), "wallet_id", "left_semi")
    bal_win = bal.withColumn(
        "spine_day",
        F.explode(
            F.sequence(
                F.col("date_key"),
                F.date_add(F.col("date_key"), 29),
                F.expr("interval 1 day"),
            )
        ),
    ).join(spine, "spine_day", "inner")
    last_bal = bal_win.groupBy("spine_day", "wallet_id").agg(
        # argmax by balance date — one closing row per (date, wallet), so
        # the lexicographic struct max is unambiguous
        F.max(F.struct("date_key", "closing_balance_quark"))[
            "closing_balance_quark"
        ].alias("last_balance_quark")
    )
    # "By definition, this will always be true" (:44): an active wallet's
    # own spends put closing observations inside the window — inner join.
    agg = (
        active.join(last_bal, ["spine_day", "wallet_id"])
        .groupBy(F.col("spine_day").alias("date_key"), "app_id")
        .agg(
            F.count(F.lit(1)).alias("active_users"),
            F.sum("last_balance_quark").cast("long").alias("aub_quark"),
        )
    )
    capped = F.when(
        F.col("aub_quark") > F.col("active_users") * AUB_CAP_QUARKS_PER_USER,
        F.col("active_users") * AUB_CAP_QUARKS_PER_USER,
    ).otherwise(F.col("aub_quark"))
    return agg.select(
        "date_key",
        "app_id",
        "active_users",
        "aub_quark",
        capped.cast("long").alias("capped_aub_quark"),
        _kin(capped).alias("capped_aub_kin"),
    )

# ---------------------------------------------------------------------------
# kre_mart/.../daily_volatility_factor.sql:2-53 — trailing-30d price average
# and mean absolute deviation. Exact integer-cent formulation:
#   n, S  = trailing count / sum of daily closing prices (cents)
#   D     = Σ_window |p_c·n − S|   (integer; computed via the spine explode)
#   average_price           = S / (100 n)
#   average_price_deviation = D / (100 n²)
#   volatility_factor       = D / (n·S)      (dimensionless)

def daily_volatility_factor(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    # Cached: joined by the payout chain, both weekly KRE models, and the
    # KRE summary; day-grain output, negligible memory.
    return _cached(
        spark,
        "daily_volatility_factor",
        sf_dir,
        run_date,
        lambda: _daily_volatility_factor(spark, sf_dir, run_date),
        truncate=True,  # day/app-grain, many consumers: cut lineage
    )

def _daily_volatility_factor(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    prices = ka.dim_kin_price(spark, sf_dir).filter(
        F.col("date_key") < F.lit(run_date)
    )
    exploded = prices.select(
        "price_cents",
        F.explode(
            F.sequence(
                F.col("date_key"),
                F.date_add(F.col("date_key"), 29),
                F.expr("interval 1 day"),
            )
        ).alias("spine_day"),
    )
    spine = prices.select(F.col("date_key").alias("spine_day"))
    win = exploded.join(spine, "spine_day", "inner")
    ns = win.groupBy("spine_day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("price_cents").cast("long").alias("s_cents"),
    )
    dev = (
        win.join(ns, "spine_day")
        .groupBy("spine_day")
        .agg(
            F.sum(F.abs(F.col("price_cents") * F.col("n") - F.col("s_cents")))
            .cast("long")
            .alias("d_units"),
            F.min("n").alias("n"),
            F.min("s_cents").alias("s_cents"),
        )
    )
    return dev.select(
        F.col("spine_day").alias("date_key"),
        F.round(F.col("s_cents") / 100.0 / F.col("n"), 6).alias("average_price"),
        F.round(F.col("d_units") / 100.0 / (F.col("n") * F.col("n")), 6).alias(
            "average_price_deviation"
        ),
        F.round(F.col("d_units") * 1.0 / (F.col("n") * F.col("s_cents")), 6).alias(
            "volatility_factor"
        ),
    )

# ---------------------------------------------------------------------------
# kre_mart/daily_models/payouts/daily_kin_payout.sql:22-134 — the monopoly
# cascade, ported clause-by-clause. Shares/payouts are double math (as in
# the reference) but every input is an exact integer, so the FP ops are
# identical on both engines. Tiebreak on app_id added to the rank (§2.11).

def daily_kin_payout(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _cached(
        spark,
        "daily_kin_payout",
        sf_dir,
        run_date,
        lambda: _daily_kin_payout(spark, sf_dir, run_date),
        truncate=True,  # day/app-grain, many consumers: cut lineage
    )

def _daily_kin_payout(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    aub = daily_active_user_balance_by_app(spark, sf_dir, run_date)
    vf = daily_volatility_factor(spark, sf_dir, run_date).select(
        "date_key", "volatility_factor", "average_price"
    )
    total = aub.groupBy("date_key").agg(
        F.sum("capped_aub_quark").cast("long").alias("total_aub_quark")
    )
    pre = (
        aub.join(total, "date_key")
        .join(vf, "date_key")
        .select(
            "date_key",
            "app_id",
            (F.col("capped_aub_quark") * 1.0 / F.col("total_aub_quark")).alias(
                "app_aub_share"
            ),
            "volatility_factor",
            "average_price",
        )
        .withColumn(
            "payout",
            F.col("app_aub_share")
            * (KRE_DAILY_POOL * (1.0 - F.col("volatility_factor"))),
        )
        .withColumn(
            "payout_rank",
            F.dense_rank().over(
                Window.partitionBy("date_key").orderBy(
                    F.desc("payout"), F.asc("app_id")
                )
            ),
        )
        # `pre` feeds the rank-1/rank-2 extracts AND the staging join (the
        # reference's triple self-join, :66-70,114-117) — cache it so the
        # plan references one materialization instead of re-expanding the
        # whole AUB chain four times.
        .cache()
    )
    top = pre.filter(F.col("payout_rank") == 1).select(
        "date_key", F.col("app_aub_share").alias("s1")
    )
    second = pre.filter(F.col("payout_rank") == 2).select(
        "date_key", F.col("app_aub_share").alias("s2")
    )
    # post_monopoly_share_adjustments (:36-71). Deviation from the
    # reference, per SURVEY §2.11: daily_kin_payout.sql:115 inner-joins
    # the rank-2 extract, silently dropping any day with fewer than two
    # ranked apps — exactly the monopoly days (share = 1.0) the cascade
    # targets. Here a missing rank-2 is a LEFT join with share 0: the
    # rank-1 cap still applies (s1 = 1.0 → adjusted 2/3) and the day
    # stays in the payout (and so in daily_kre_summary downstream).
    adj = (
        top.join(second, "date_key", "left")
        .withColumn("s2", F.coalesce("s2", F.lit(0.0)))
        .withColumn(
            "s1_adj_initial",
            F.when(
                F.col("s1") > 0.5,
                0.5 + ((F.col("s1") - 0.5) / 0.5) * ((2.0 / 3.0) - (1.0 / 2.0)),
            ).otherwise(F.col("s1")),
        )
        .withColumn(
            "s2_adj",
            F.when(
                F.col("s1_adj_initial") + F.col("s2") > 0.9,
                (F.col("s2") / (F.col("s1") + F.col("s2"))) * 0.9,
            ).otherwise(F.col("s2")),
        )
        .withColumn(
            "s1_adj",
            F.when(
                F.col("s1_adj_initial")
                < (
                    F.col("s1_adj_initial")
                    / (F.col("s1_adj_initial") + F.col("s2"))
                )
                * 0.9,
                F.col("s1_adj_initial"),
            ).otherwise(
                (
                    F.col("s1_adj_initial")
                    / (F.col("s1_adj_initial") + F.col("s2"))
                )
                * 0.9
            ),
        )
    )
    # daily_payout_staging (:95-118). Deviation (documented): Σshare = 1 and
    # Σpayout = pool·(1−vf) are used algebraically instead of re-summing FP.
    staged = (
        pre.join(adj, "date_key")
        .withColumn("single_monopoly_sum", 1.0 - F.col("s1"))
        .withColumn("double_monopoly_sum", 1.0 - F.col("s1") - F.col("s2"))
        .withColumn(
            "post_monopoly_app_share",
            F.when(
                (F.col("s2") != F.col("s2_adj")) & (F.col("payout_rank") > 2),
                (F.col("app_aub_share") / F.col("double_monopoly_sum")) * 0.1,
            )
            .when(
                (F.col("s2") == F.col("s2_adj"))
                & (F.col("s1_adj") > 0.5)
                & (F.col("payout_rank") > 1),
                (F.col("app_aub_share") / F.col("single_monopoly_sum"))
                * (1.0 - F.col("s1_adj")),
            )
            .when(
                (F.col("payout_rank") == 1)
                & (F.col("app_aub_share") != F.col("s1_adj")),
                F.col("s1_adj"),
            )
            .otherwise(F.col("app_aub_share")),
        )
        .withColumn(
            "pool_after_vf", KRE_DAILY_POOL * (1.0 - F.col("volatility_factor"))
        )
        .withColumn(
            "post_monopoly_payout",
            F.col("pool_after_vf") * F.col("post_monopoly_app_share"),
        )
    )
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    return (
        staged.join(F.broadcast(app), "app_id", "left")
        .select(
            "date_key",
            "app_id",
            "app_name",
            F.round("app_aub_share", 6).alias("pre_monopoly_share"),
            F.round("payout", 4).alias("pre_monopoly_payout"),
            F.round("post_monopoly_app_share", 6).alias("post_monopoly_app_share"),
            F.round("post_monopoly_payout", 4).alias("post_monopoly_payout"),
            # USD value from the exact integer cross-multiply of the
            # quantized payout (1e-4) and price (1e-6): both integers are
            # < 2^53 so their int→double casts are exact, and the single
            # multiply + single divide are bit-identical IEEE ops on both
            # engines. (ROUNDing the raw double product instead would land on
            # decimal rounding boundaries where the engines disagree, and the
            # e10-scaled integer itself can exceed 2^63.)
            (
                F.round(F.round(F.col("post_monopoly_payout"), 4) * 10000.0)
                .cast("long")
                .cast("double")
                * F.round(F.col("average_price") * 1000000.0)
                .cast("long")
                .cast("double")
                / F.lit(1e10)
            ).alias("post_monopoly_payout_usd"),
            F.col("payout_rank").cast("int").alias("payout_rank"),
        )
    )

# kin_data/weekly_models/api/weekly_kre_payout_summary.sql:1-41 — weekly
# payout totals + the dense-ranked top-10 apps serialized as a JSON array
# (W2 + A11). The JSON payload carries exact integer units (micro-Kin,
# USD cents) instead of the reference's raw doubles so the serialized
# canon is engine-stable, and is sorted (rank, app_id) — Snowflake's
# array_agg order is unspecified (§2.11).

def weekly_kre_payout_summary(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    kw = _kre_weekly_payout_base(spark, sf_dir, run_date)
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    ranked = kw.join(F.broadcast(app), "app_id", "left").withColumn(
        "payout_rank",
        F.dense_rank().over(
            Window.partitionBy("date_key").orderBy(F.desc("kin_quanta"))
        ),
    )
    return ranked.groupBy("date_key").agg(
        (F.sum("kin_quanta").cast("double") / 10000.0).alias("kin_payout"),
        (F.sum("usd_cents").cast("double") / 100.0).alias("usd_payout"),
        F.to_json(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("payout_rank") <= 10,
                            F.struct(
                                "payout_rank",
                                "app_id",
                                "app_name",
                                (F.col("kin_quanta") * 100).alias("kin_micro"),
                                "usd_cents",
                            ),
                        )
                    )
                ),
                lambda s: F.struct(
                    s["app_id"].alias("id"),
                    s["app_name"].alias("name"),
                    s["kin_micro"].alias("kinPayoutMicro"),
                    s["usd_cents"].alias("usdPayoutCents"),
                ),
            )
        ).alias("top_app_list"),
    )

# ---------------------------------------------------------------------------
# metabase_mart/monthly_models/gc/monthly_inactive_wallets.sql analog —
# wallets whose LATEST balance observation is dust and never recovers
# (W3 rank=1 + J9 anti join).

def gc_dust_wallets(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    """Wallets whose latest balance AS OF the GC cutoff is dust, excluding
    any that recover (a non-dust balance) after the cutoff — the reference's
    month-end NOT-IN shape (:10-12,31)."""
    bal = closing_account_balance_per_day(spark, sf_dir, run_date)
    w = Window.partitionBy("wallet_id").orderBy(
        F.desc("date_key"), F.desc("closing_balance_quark")
    )
    latest = (
        bal.filter(F.col("date_key") <= F.lit(GC_CUTOFF))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("wallet_id", "date_key", "closing_balance_quark")
    )
    dust = latest.filter(F.col("closing_balance_quark") < GC_DUST_QUARKS)
    recovered = (
        bal.filter(
            (F.col("date_key") > F.lit(GC_CUTOFF))
            & (F.col("closing_balance_quark") >= GC_DUST_QUARKS)
        )
        .select("wallet_id")
        .distinct()
    )
    joined = dust.join(recovered, "wallet_id", "left_anti")
    return joined.select(
        "wallet_id",
        F.col("date_key").alias("last_seen_date"),
        "closing_balance_quark",
    )

# metabase_mart/daily_models/gc/multi_create_impacted_accounts.sql:1-46 —
# Step 1 (:3-10): HAVING multi-instruction creates (A7, counted over ALL
# creation rows of a transaction — no fee_payer predicate there).
# Step 2 (:12-21): impacted accounts = DISTINCT account_id of the
# AGORA-PAID rows of those transactions (the fee_payer filter applies at
# the ACCOUNT step, not the count).
# Step 3 (:22-33): closure candidates = impacted accounts with a
# closing_balance <= 0 row. The dense_rank/balance_rank=1 filter keeps one
# row per wallet, but every ranked wallet HAS a rank-1 row, so the wallet
# set is "ever zeroed", NOT "currently zero" — replicated as-is.
# Step 4 (:34-45): output = every CREATION ROW of those accounts as
# (run date, account_id, account_owner) — creation-row multiplicity is
# preserved (`select *` over the creations scan, no DISTINCT).

def multi_create_impacted_accounts(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    cr = fact_kin_creations(spark, sf_dir, run_date)
    multi = (
        cr.groupBy("tx_id")
        .agg(F.count("instr_idx").alias("instruction_count"))
        .filter(F.col("instruction_count") > 1)  # HAVING (:5-10)
        .select("tx_id")
    )
    impacted = (
        cr.join(multi, "tx_id", "left_semi")
        .filter(F.col("fee_payer") == ka.AGORA_FEE_PAYER)  # :19-20
        .select(F.col("account_id").alias("wallet_id"))
        .distinct()
    )
    zeroed = (
        closing_account_balance_per_day(spark, sf_dir, run_date)
        .filter(F.col("closing_balance_quark") <= 0)  # :31
        .join(impacted, "wallet_id", "left_semi")
        .select(F.col("wallet_id").alias("account_id"))
        .distinct()
    )
    return cr.join(zeroed, "account_id", "left_semi").select(
        F.lit(run_date).alias("date_key"),  # current_date as date_key (:39)
        "account_id",
        "account_owner",
    )

# metabase_mart/.../accounts/average_account_balance_per_day.sql:1-42 —
# per-(date, wallet) role averages (from-side :2-11, to-side :12-20),
# UNION ALL (U2, :22-34 — both role rows kept deliberately), then the avg
# of the one-or-two role averages (:36-41). The reference fact's balances
# are COALESCEd to 0 (fact_kin_transaction.sql:30,35), so NULL raw
# balances participate as zeros. Exactness: each role average is one
# double division of exact integers (sum-quark / (count × 1e5)); the final
# avg of two doubles is (f+t)/2 — addition is commutative, so both engines
# agree bit-for-bit; ROUND(…, 6) terminal.

def average_account_balance_per_day(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)

    def _role_avg(wallet_col: str, balance_col: str) -> DataFrame:
        return (
            f.groupBy("date_key", F.col(wallet_col).alias("wallet_id"))
            .agg(
                (
                    F.sum(F.coalesce(balance_col, F.lit(0)))
                    .cast("long")
                    .cast("double")
                    / (F.count(F.lit(1)) * 100000).cast("double")
                ).alias("balance_average")
            )
        )

    both = _role_avg("from_wallet", "from_balance_quark").unionByName(
        _role_avg("to_wallet", "to_balance_quark")
    )  # UNION ALL — keeps both role rows deliberately (:28)
    return both.groupBy("date_key", "wallet_id").agg(
        F.round(
            F.sum("balance_average") / F.count(F.lit(1)), 6
        ).alias("account_balance_average")
    )

# metabase_mart/.../daily_market_summary.sql:4-9 analog — price dim joined
# to daily volume (J1), USD conversion (P2).

def daily_market_summary(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    """kin_data/daily_models/api/daily_market_summary.sql:1-19 — pure
    dim_kin_price projection: price, market cap, trade volume, and
    circulating supply = market_caps / prices (:8). The cents→USD
    conversions and the cap/price ratio are single correctly-rounded
    divisions of exact integers — identical on both engines. The reference
    applies NO complete-day guard here (`where True`, :11) — the
    in-progress day ships; replicated."""
    price = ka.dim_kin_price(spark, sf_dir)
    return price.select(
        "date_key",
        (F.col("price_cents").cast("double") / 100.0).alias("kin_price"),
        (F.col("market_cap_cents").cast("double") / 100.0).alias("kin_market_cap"),
        (F.col("volume_cents").cast("double") / 100.0).alias("kin_trade_volume"),
        (
            F.col("market_cap_cents").cast("double")
            / F.col("price_cents").cast("double")
        ).alias("kin_circulating_supply"),
    )

# metabase_mart/.../summary_stats/daily_net_inflation.sql:1-56 —
#   net_inflation = daily_payout − (balance_d − balance_{d−1}) − churn_d
# where payout = Σ post_monopoly_payout (kre_mart.daily_kin_payout, :2-11),
# balance = Σ closing_balance per day (:13-23), churn = Σ churned wallet
# balances per day (:24-35); every input is cut to complete days
# (date_key < run − lookback), the day-before balance comes from a second
# LEFT join at d−1 (:53-54, J7), missing sides IFNULL to 0 (:43-45), and
# the flag is 'Inflation'/'Contraction'/'None' by sign (:46-51). Exactness:
# payout rides as 1e-4-Kin quanta ints (×10 → 1e-5 grid), balances/churn as
# quark ints, so net_inflation is one exact integer expression with a
# single final /1e5 — the doubles the reference sums are order-dependent.
# `lookback_days` defaults to the reference's hardcoded 40 (:9); the
# registered query passes 2 for the 30-day driver fixture (churn note).

def daily_net_inflation(
    spark: SparkSession,
    sf_dir: str,
    run_date=RUN_DATE,
    lookback_days: int = CHURN_LOOKBACK_DAYS,
) -> DataFrame:
    cutoff = run_date - datetime.timedelta(days=lookback_days)
    pay = (
        daily_kin_payout(spark, sf_dir, run_date)
        .filter(F.col("date_key") < F.lit(cutoff))
        .groupBy("date_key")
        .agg(
            F.sum(F.round(F.col("post_monopoly_payout") * 10000).cast("long"))
            .cast("long")
            .alias("payout_quanta")
        )
    )
    bal = (
        closing_account_balance_per_day(spark, sf_dir, run_date)
        .filter(F.col("date_key") < F.lit(cutoff))
        .groupBy("date_key")
        .agg(F.sum("closing_balance_quark").cast("long").alias("balance_quark"))
    )
    churn = (
        daily_churn_volume(spark, sf_dir, run_date, lookback_days=lookback_days)
        .filter(F.col("date_key") < F.lit(cutoff))
        .groupBy("date_key")
        .agg(F.sum("balance_quark").cast("long").alias("churn_quark"))
    )
    prev = bal.select(
        F.date_add("date_key", 1).alias("date_key"),
        F.col("balance_quark").alias("prev_balance_quark"),
    )
    j = (
        pay.join(bal, "date_key", "left")
        .join(prev, "date_key", "left")
        .join(churn, "date_key", "left")
        .select(
            "date_key",
            F.col("payout_quanta"),
            F.coalesce("balance_quark", F.lit(0)).alias("balance_quark"),
            F.coalesce("prev_balance_quark", F.lit(0)).alias("prev_balance_quark"),
            F.coalesce("churn_quark", F.lit(0)).alias("churn_quark"),
        )
        .withColumn(
            "net_inflation_quark",
            F.col("payout_quanta") * 10
            - (F.col("balance_quark") - F.col("prev_balance_quark"))
            - F.col("churn_quark"),
        )
    )
    return j.select(
        "date_key",
        (F.col("payout_quanta").cast("double") / 10000.0).alias("daily_payout"),
        _kin(F.col("balance_quark")).alias("current_balance"),
        _kin(F.col("prev_balance_quark")).alias("prev_balance"),
        _kin(F.col("churn_quark")).alias("churn_amount"),
        _kin(F.col("net_inflation_quark")).alias("net_inflation"),
        F.when(F.col("net_inflation_quark") > 0, F.lit("Inflation"))
        .when(F.col("net_inflation_quark") < 0, F.lit("Contraction"))
        .otherwise(F.lit("None"))
        .alias("inflation_flag"),
    )

# ---------------------------------------------------------------------------
# Phase-2 model family (SURVEY §7): creates, rollups, curated export,
# summaries, block counts — the "easy 60%" of the mart surface.

# metabase_mart/daily_models/reporting/creates/daily_account_creates_by_app
# .sql:1-30 — per-(date, app) creations: count, opening-balance sum, and the
# transaction/creation fee sums (A1+J2). Balances ride as exact quark longs
# beside the Kin doubles; fees sum exact lamports and convert once.

def daily_kin_creations_by_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    cr = fact_kin_creations(spark, sf_dir, run_date)
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    return (
        cr.groupBy("date_key", "app_id")
        .agg(
            F.count(F.lit(1)).alias("daily_transactions"),
            F.sum(F.coalesce("balance_quark", F.lit(0)))
            .cast("long")
            .alias("daily_opening_balance_quark"),
            _kin(F.sum(F.coalesce("balance_quark", F.lit(0)))).alias(
                "daily_opening_balance_kin"
            ),
            (F.sum("fee_lamports").cast("double") / F.lit(1e9)).alias(
                "daily_transaction_fee_sum"
            ),
            (F.sum("create_fee_lamports").cast("double") / F.lit(1e9)).alias(
                "daily_creation_fee_sum"
            ),
        )
        .join(F.broadcast(app), "app_id", "left")
    )

# …/creates/daily_account_creates_by_program.sql:1-26 — the (date, app,
# program) grain twin: count + opening-balance sum, app dim enrichment.

def daily_account_creates_by_program(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _daily_creates_grouped(spark, sf_dir, run_date, "program_id", "program_id")

# metabase_mart/weekly_models/reporting/weekly_kin_transactions.sql:4 and
# monthly twin — cadence rollups from the fact (complete periods only).

def _period_kin_transactions(spark, sf_dir, run_date, unit: str, complete_before) -> DataFrame:
    """metabase_mart/{weekly,monthly}_models/reporting/
    {weekly,monthly}_kin_transactions.sql — (period, app_id) rollups of the
    daily transactions mart, COMPLETE periods only (`where date_key <
    date_trunc(unit, current_date)` — the same boundary constants as the
    app_txn_summary cadence family). Counts/amounts sum the daily mart's
    per-(day, app) counts and amounts; since those are themselves sums over
    the fact, the rollup aggregates the fact directly on the exact quark
    base with ONE final Kin division (sum-of-daily-sums == direct sum,
    without accumulating per-day float divisions)."""
    prefix = "weekly" if unit == "week" else "monthly"
    f = fact_kin_transaction(spark, sf_dir, run_date)
    agg = (
        f.filter(F.col("date_key") < F.lit(complete_before))
        .groupBy(F.trunc("date_key", unit).alias("date_key"), "app_id")
        .agg(
            F.count(F.lit(1)).alias(f"{prefix}_count"),
            F.sum("amount_quark").cast("long").alias("volume_quark"),
            _kin(F.sum("amount_quark")).alias(f"{prefix}_amount"),
        )
    )
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    return agg.join(F.broadcast(app), "app_id", "left")

def weekly_kin_transactions(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _period_kin_transactions(spark, sf_dir, run_date, "week", WEEK_COMPLETE_BEFORE)

def monthly_kin_transactions(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _period_kin_transactions(spark, sf_dir, run_date, "month", MONTH_COMPLETE_BEFORE)

def kin_transactions_curated(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)
    # data_studio_mart/.../transactions/kin_transactions_curated.sql:2-33 —
    # the full rename projection (:4-24), app-attributed rows only
    # (`app_id != 0`, :31). Deviations (SURVEY §2.11): transaction_status
    # is a real literal 'Ok' (the reference selects a tx_status column its
    # fact never produces — every fact row IS status Ok); fee is the
    # 1e9-divided SOL value; the synthetic feed has no account-owner
    # fields, so source_owner/destination_owner are typed NULLs.
    null_str = F.lit(None).cast("string")
    return f.filter(F.col("app_id") != 0).select(
        F.col("id").alias("transaction_id"),
        F.col("transaction_id").alias("transaction_hash"),
        "date_key",
        "app_id",
        F.lit("Ok").alias("transaction_status"),
        F.col("txn_type").alias("type"),
        F.col("amount_kin").alias("amount"),
        F.col("amount_quark").alias("quarks"),
        "block",
        F.col("instruction_idx").alias("instruction_offset"),
        F.col("memo").alias("memo_text"),
        F.col("txn_ts").alias("date_time"),
        F.col("from_wallet").alias("source"),
        null_str.alias("source_owner"),
        _kin(F.coalesce("from_balance_quark", F.lit(0))).alias("source_balance"),
        F.col("to_wallet").alias("destination"),
        null_str.alias("destination_owner"),
        _kin(F.coalesce("to_balance_quark", F.lit(0))).alias(
            "destination_balance"
        ),
        F.col("fee_payer").alias("subsidizer"),
        F.col("fee_sol").alias("fee"),
    )

# kin_data/daily_models/api/daily_kin_blocks.sql:2-13 — count(distinct block).

def daily_kin_blocks(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    # metabase_mart/.../summary_stats/daily_kin_blocks.sql:2-13 — exactly
    # (date_key, block_count); no other columns in the reference mart.
    f = fact_kin_transaction(spark, sf_dir, run_date)
    return f.groupBy("date_key").agg(
        F.countDistinct("block").alias("block_count"),
    )

# metabase_mart/.../app_transaction_summary_from_account_by_day.sql:2-13 —
# finest-grain mart (date, app, wallet).

def app_txn_summary_from_account_daily(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _app_txn_summary_daily(spark, sf_dir, run_date, "from_wallet")

def _app_txn_summary_daily(spark, sf_dir, run_date, wallet_col: str) -> DataFrame:
    # app_transaction_summary_{from,to}_account_by_day.sql:2-18 — grain
    # (date, app, wallet); reference columns transaction_count / amount
    # (Kin) / app_name (LEFT dim join, :16-17); volume_quark rides as the
    # exact integer the cadence rollups re-aggregate.
    f = fact_kin_transaction(spark, sf_dir, run_date)
    g = f.groupBy(
        "date_key", "app_id", F.col(wallet_col).alias("wallet_id")
    ).agg(
        F.count(F.lit(1)).alias("transaction_count"),
        F.sum("amount_quark").cast("long").alias("volume_quark"),
        _kin(F.sum("amount_quark")).alias("amount"),
    )
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    return g.join(F.broadcast(app), "app_id", "left")

# kre_mart/.../daily_kre_summary.sql:2-83 analog — ecosystem-day rollup
# joining the KRE marts (J1 date-key alignment of derived series).

def daily_kre_summary(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    """kin_data/daily_models/api/daily_kre_summary.sql:1-84 — the KRE API
    mart: active apps + transaction totals (from daily_kin_transactions),
    AUB ecosystem sums, volatility factor, daily payout, and the monthly
    actives breakdown. All joins INNER per the reference (:77-83).
    Deviation (§2.11): the reference's payouts CTE selects per-app
    daily_kin_payout rows unaggregated, fanning the day-grain select out to
    one row per app; here the payout is summed to ecosystem grain in exact
    quanta/cent integers."""
    txn = (
        daily_kin_transactions(spark, sf_dir, run_date)
        .groupBy("date_key")
        .agg(
            F.countDistinct("app_id").alias("active_apps"),
            F.sum("daily_total_transactions").cast("long").alias(
                "transaction_count"
            ),
        )
    )
    aub = (
        daily_active_user_balance_by_app(spark, sf_dir, run_date)
        .groupBy("date_key")
        .agg(
            F.sum("aub_quark").cast("long").alias("aub_quark"),
            F.sum("capped_aub_quark").cast("long").alias("capped_aub_quark"),
            F.sum("active_users").cast("long").alias("active_users"),
        )
    )
    vf = daily_volatility_factor(spark, sf_dir, run_date).select(
        "date_key", "average_price", "volatility_factor"
    )
    pay = (
        daily_kin_payout(spark, sf_dir, run_date)
        .join(vf.select("date_key", "average_price"), "date_key", "inner")
        .select(
            "date_key",
            F.round(F.col("post_monopoly_payout") * 10000).cast("long").alias(
                "payout_quanta"
            ),
            F.round(F.col("average_price") * 10000).cast("long").alias("price_e4"),
        )
        .withColumn(
            "usd_cents",
            F.expr(
                "(CAST(payout_quanta AS DECIMAL(20,0)) * CAST(price_e4 AS DECIMAL(18,0))"
                " + 500000) DIV 1000000"
            ),
        )
        .groupBy("date_key")
        .agg(
            F.sum("payout_quanta").cast("long").alias("kin_quanta"),
            F.sum("usd_cents").cast("long").alias("usd_cents"),
        )
    )
    mu = monthly_active_accounts_ecosystem(spark, sf_dir, run_date).select(
        "date_key",
        F.col("active_earners").alias("monthly_active_earners"),
        F.col("active_spenders").alias("monthly_active_spenders"),
        F.col("active_users").alias("monthly_active_users"),
    )
    return (
        txn.join(aub, "date_key", "inner")
        .join(vf.select("date_key", "volatility_factor"), "date_key", "inner")
        .join(pay, "date_key", "inner")
        .join(mu, "date_key", "inner")
        .select(
            "date_key",
            "active_apps",
            _kin(F.col("aub_quark")).alias("active_user_balance"),
            _kin(F.col("capped_aub_quark")).alias("active_capped_user_balance"),
            "active_users",
            "volatility_factor",
            (F.col("kin_quanta").cast("double") / 10000.0).alias("kin_payout"),
            (F.col("usd_cents").cast("double") / 100.0).alias("usd_payout"),
            "transaction_count",
            "monthly_active_earners",
            "monthly_active_spenders",
            "monthly_active_users",
        )
    )

# metabase_mart/.../creates/daily_account_create_fee_payers.sql:1-40 —
# (date, app, fee_payer)-grain creation cost accounting: counts, the
# transaction-fee and creation-fee sums kept SEPARATE (:9-10), USD legs
# from a LEFT join to dim_solana_price (:57 — a missing price day leaves
# the USD columns NULL, not 0), and app_name from the app dim (:56). Fees
# sum exact lamports (order-free) and convert once; each USD value is one
# exact cross-multiply (lamports × price_cents / 1e11).

def daily_create_fee_payers(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    cr = fact_kin_creations(spark, sf_dir, run_date)
    g = cr.groupBy("date_key", "app_id", "fee_payer").agg(
        F.count(F.lit(1)).alias("daily_transactions"),
        F.sum("fee_lamports").cast("long").alias("txn_fee_lamports"),
        F.sum("create_fee_lamports").cast("long").alias("create_fee_lamports_sum"),
    )
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    sol = ka.dim_solana_price(spark, sf_dir).select("date_key", "sol_price_cents")
    usd = lambda c: (  # noqa: E731
        F.col(c).cast("double") * F.col("sol_price_cents").cast("double") / F.lit(1e11)
    )
    return (
        g.join(F.broadcast(app), "app_id", "left")
        .join(sol, "date_key", "left")
        .select(
            "date_key",
            "app_id",
            "fee_payer",
            "daily_transactions",
            (F.col("txn_fee_lamports").cast("double") / F.lit(1e9)).alias(
                "daily_transaction_fees_sol"
            ),
            usd("txn_fee_lamports").alias("daily_transaction_fees_usd"),
            (F.col("create_fee_lamports_sum").cast("double") / F.lit(1e9)).alias(
                "daily_creation_fees_sol"
            ),
            usd("create_fee_lamports_sum").alias("daily_creation_fees_usd"),
            "app_name",
        )
    )

# metabase_mart/.../summary_stats/daily_churn_volume.sql:1-56 — wallet-grain
# churn: for each complete day d (date_key < run − lookback, :9), the
# from-side transactors of app-attributed (app_id != 0, :20) transactions
# that have a closing-balance row that day (:14-22) and NO closing-balance
# observation in (d, d+lookback] (:45-48, the null-producing left range
# join, J5/J10). Output grain is (date_key, app_id, wallet_id, balance) —
# the reference stores wallet rows, not an aggregate; a wallet transacting
# under several apps the same day appears once per app. The reference
# hardcodes lookback = 40 days ("based on the amount of dates we have to
# look back on"); `lookback_days` keeps that default, and the registered
# query passes 2 — the driver fixture spans only 30 dense days over 40
# wallets (run 2024-01-31), so 40 censors every day and at 7 every wallet
# re-observes within the horizon (vacuously empty either way).

def daily_churn_volume(
    spark: SparkSession,
    sf_dir: str,
    run_date=RUN_DATE,
    lookback_days: int = CHURN_LOOKBACK_DAYS,
) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)
    bal = closing_account_balance_per_day(spark, sf_dir, run_date)
    cutoff = run_date - datetime.timedelta(days=lookback_days)
    # distinct_dates (:2-12): complete days only
    dates = (
        f.select("date_key").distinct().filter(F.col("date_key") < F.lit(cutoff))
    )
    # transacted_accounts (:13-26): from-side wallets of app txns that have
    # a balance row the same day, at (date, app, wallet) grain
    txn = (
        f.filter(F.col("app_id") != 0)
        .join(dates, "date_key", "left_semi")
        .select("date_key", "app_id", F.col("from_wallet").alias("wallet_id"))
    )
    transacted = (
        txn.join(bal.select("date_key", "wallet_id"), ["date_key", "wallet_id"])
        .groupBy("date_key", "app_id", "wallet_id")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    # accounts_with_balances (:27-37): attach the day's closing balance
    awb = transacted.join(
        bal.select(
            "date_key", "wallet_id", "closing_balance_quark", "closing_balance_kin"
        ),
        ["date_key", "wallet_id"],
    )
    # daily_churn_summary (:38-52): no balance observation in (d, d+lookback]
    future = bal.select(
        F.col("date_key").alias("f_date"), F.col("wallet_id").alias("f_wallet")
    )
    churned = awb.join(
        future,
        (F.col("wallet_id") == F.col("f_wallet"))
        & (F.col("f_date") > F.col("date_key"))
        & (F.col("f_date") <= F.date_add("date_key", lookback_days)),
        "left_anti",
    )
    return churned.select(
        "date_key",
        "app_id",
        "wallet_id",
        F.col("closing_balance_quark").alias("balance_quark"),
        F.col("closing_balance_kin").alias("balance_kin"),
    )

# metabase_mart/.../app_transaction_summary_to_account_by_day.sql — the
# to-account twin of the from-account mart.

def app_txn_summary_to_account_daily(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _app_txn_summary_daily(spark, sf_dir, run_date, "to_wallet")

# metabase_mart/.../active_accounts/daily/daily_active_accounts_ecosystem.sql
# — per-day users/spenders/earners distinct counts (the faithful 3-column
# shape; see _active_accounts_breakdown for the family template).

def daily_active_accounts_ecosystem(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _active_accounts_breakdown(spark, sf_dir, run_date, days=1, by_app=False)

# metabase_mart/daily_models/reporting/daily_summary_by_app.sql analog —
# the wide reporting join: txn metrics ⨝ creations ⨝ payout ⨝ dim ⨝ price
# (J1/J2 + P2 USD conversion). USD value is an exact integer cross-multiply
# (quark × cents = 1e-7 USD units) published as DECIMAL(38,0).

def _price_frames(spark, sf_dir):
    """USD-per-unit price series as doubles (cents / 100, one division)."""
    kp = ka.dim_kin_price(spark, sf_dir).select(
        "date_key", (F.col("price_cents").cast("double") / 100.0).alias("kin_price")
    )
    sp = ka.dim_solana_price(spark, sf_dir).select(
        "date_key",
        (F.col("sol_price_cents").cast("double") / 100.0).alias("sol_price"),
    )
    return kp, sp

def daily_summary_by_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    """kin_data/daily_models/api/daily_summary_by_app.sql:1-75 — the API
    serving mart: daily_kin_transactions metrics priced in USD, joined to
    the daily and monthly active_accounts_app breakdowns. Price joins are
    INNER (reference :72-73); actives joins are LEFT with 0 fill."""
    txns = daily_kin_transactions(spark, sf_dir, run_date)

    def _actives(df, prefix, keys):
        return df.select(
            *keys,
            F.col("active_users").alias(f"{prefix}_active_users"),
            F.col("active_earners").alias(f"{prefix}_active_earners"),
            F.col("active_spenders").alias(f"{prefix}_active_spenders"),
        )

    keys = ["date_key", "app_id"]
    du = _actives(daily_active_accounts_app(spark, sf_dir, run_date), "daily", keys)
    mu = _actives(
        monthly_active_accounts_app(spark, sf_dir, run_date), "monthly", keys
    )
    kp, sp = _price_frames(spark, sf_dir)
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)  # noqa: E731
    return (
        txns.join(du, keys, "left")
        .join(mu, keys, "left")
        .join(kp, "date_key", "inner")
        .join(sp, "date_key", "inner")
        .select(
            "date_key",
            "app_id",
            F.coalesce(F.col("app_name"), F.col("app_id").cast("string")).alias(
                "app_name"
            ),
            F.col("daily_fee_sum").alias("transaction_fees_sol"),
            (F.col("daily_fee_sum") * F.col("sol_price")).alias(
                "transaction_fees_usd"
            ),
            F.col("daily_total_transactions").alias("transaction_count"),
            F.col("daily_total_amounts").alias("transaction_amount_kin"),
            (F.col("daily_total_amounts") * F.col("kin_price")).alias(
                "transaction_amount_usd"
            ),
            F.col("daily_earn_transactions").alias("earn_count"),
            F.col("daily_earn_amounts").alias("earn_amount_kin"),
            (F.col("daily_earn_amounts") * F.col("kin_price")).alias(
                "earn_amount_usd"
            ),
            F.col("daily_spend_transactions").alias("spend_count"),
            F.col("daily_spend_amounts").alias("spend_amount_kin"),
            (F.col("daily_spend_amounts") * F.col("kin_price")).alias(
                "spend_amount_usd"
            ),
            F.col("daily_peer_transactions").alias("peer_count"),
            F.col("daily_peer_amounts").alias("peer_amount_kin"),
            (F.col("daily_peer_amounts") * F.col("kin_price")).alias(
                "peer_amount_usd"
            ),
            *[zero(f"daily_active_{k}") for k in ("users", "earners", "spenders")],
            *[zero(f"monthly_active_{k}") for k in ("users", "earners", "spenders")],
        )
    )

# kin_data/daily_models/api/daily_summary_ecosystem.sql:1-70 — the
# ecosystem API mart. The reference SUMs the per-app mart's exact decimal
# columns per day; rather than summing the published doubles (order-
# dependent), re-aggregate the fact's exact quark integers per day — the
# identical values the reference's decimal arithmetic yields — then price
# in USD. `transactions_fee_usd` keeps the reference's misspelled name
# (:43). Price joins INNER (:67-68), actives LEFT with 0 fill.

def daily_summary_ecosystem(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)
    seg = lambda t: F.col("txn_type") == t  # noqa: E731

    def seg_aggs(t: int, prefix: str):
        return [
            F.count(F.when(seg(t), F.lit(1))).alias(f"{prefix}_count"),
            _kin(
                F.coalesce(F.sum(F.when(seg(t), F.col("amount_quark"))), F.lit(0))
            ).alias(f"{prefix}_amount_kin"),
        ]

    txn = f.groupBy("date_key").agg(
        F.countDistinct("app_id").alias("app_count"),
        (F.count(F.lit(1)).cast("double") / F.lit(100000.0)).alias(
            "transaction_fees_sol"
        ),
        F.count(F.lit(1)).alias("transaction_count"),
        _kin(F.sum("amount_quark")).alias("transaction_amount_kin"),
        *seg_aggs(1, "earn"),
        *seg_aggs(2, "spend"),
        *seg_aggs(3, "peer"),
    )

    def _actives(df, prefix):
        return df.select(
            "date_key",
            F.col("active_users").alias(f"{prefix}_active_users"),
            F.col("active_earners").alias(f"{prefix}_active_earners"),
            F.col("active_spenders").alias(f"{prefix}_active_spenders"),
        )

    du = _actives(daily_active_accounts_ecosystem(spark, sf_dir, run_date), "daily")
    mu = _actives(
        monthly_active_accounts_ecosystem(spark, sf_dir, run_date), "monthly"
    )
    kp, sp = _price_frames(spark, sf_dir)
    usd = lambda c: (F.col(c) * F.col("kin_price")).alias(  # noqa: E731
        c.replace("_amount_kin", "_amount_usd")
    )
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).alias(c)  # noqa: E731
    return (
        txn.join(du, "date_key", "left")
        .join(mu, "date_key", "left")
        .join(kp, "date_key", "inner")
        .join(sp, "date_key", "inner")
        .select(
            "date_key",
            "app_count",
            "transaction_fees_sol",
            (F.col("transaction_fees_sol") * F.col("sol_price")).alias(
                "transactions_fee_usd"
            ),
            "transaction_count",
            "transaction_amount_kin",
            usd("transaction_amount_kin"),
            "earn_count",
            "earn_amount_kin",
            usd("earn_amount_kin"),
            "spend_count",
            "spend_amount_kin",
            usd("spend_amount_kin"),
            "peer_count",
            "peer_amount_kin",
            usd("peer_amount_kin"),
            *[zero(f"daily_active_{k}") for k in ("users", "earners", "spenders")],
            *[zero(f"monthly_active_{k}") for k in ("users", "earners", "spenders")],
        )
    )

# metabase_mart/weekly_models/.../weekly_active_accounts_app.sql:19-20 and
# monthly twin — period-grain distinct actives per app (the reference's
# 7-/30-day trailing joins collapse to within-period distinct counts at
# period grain).

def weekly_active_accounts_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    # weekly_active_accounts_app.sql: trailing-7d window per date_key anchor
    # (dateadd -6), NOT a calendar-week rollup.
    return _active_accounts_breakdown(spark, sf_dir, run_date, days=7, by_app=True)

def monthly_active_accounts_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    # monthly_active_accounts_app.sql: trailing-30d window (dateadd -29).
    return _active_accounts_breakdown(spark, sf_dir, run_date, days=30, by_app=True)

# kre_mart/weekly_models/payouts/kre_weekly_payout.sql:4,21-25 — weekly
# payout per app (micro-Kin ints) with rank; feeds the JSON summary.

def _kre_weekly_payout_base(spark, sf_dir, run_date) -> DataFrame:
    # Cached: shared by kre_weekly_payout and weekly_kre_payout_summary.
    return _cached(
        spark,
        "kre_weekly_payout_base",
        sf_dir,
        run_date,
        lambda: _build_kre_weekly_payout_base(spark, sf_dir, run_date),
        truncate=True,  # day/app-grain, many consumers: cut lineage
    )

def _build_kre_weekly_payout_base(spark, sf_dir, run_date) -> DataFrame:
    """Exact-integer weekly payout window shared by ``kre_weekly_payout``
    and ``weekly_kre_payout_summary``.

    kre_weekly_payout.sql:2-28: for each Monday anchor w present in the
    payout dates (w < date_trunc('week', run_date)), sum app payouts over
    [w-8, w-2] — dateadd(week,-1,dateadd(day,-1,w)) .. dateadd(day,-2,w),
    i.e. previous-week Sunday through Saturday. Each payout day maps to
    exactly ONE anchor (Mon–Sat → next Monday; Sunday → the Monday 8 days
    out), so the reference's range join collapses to a derived-key groupBy.

    The reference sums the daily payout/USD doubles (order-dependent);
    here Kin rides as exact 1e-4-quanta integers and USD as integer cents
    from the overflow-proof DECIMAL product (quanta × 1e-4-price, half-up
    at cent resolution) — same values, deterministic under any
    aggregation order."""
    payout = daily_kin_payout(spark, sf_dir, run_date)
    vf = daily_volatility_factor(spark, sf_dir, run_date).select(
        "date_key", "average_price"
    )
    p = payout.join(vf, "date_key", "inner").select(
        "date_key",
        "app_id",
        F.round(F.col("post_monopoly_payout") * 10000).cast("long").alias(
            "payout_quanta"
        ),
        F.round(F.col("average_price") * 10000).cast("long").alias("price_e4"),
    )
    monday = F.trunc("date_key", "week")
    anchored = p.withColumn(
        "date_key",
        F.when(
            F.col("date_key") == F.date_add(monday, 6), F.date_add(monday, 14)
        ).otherwise(F.date_add(monday, 7)),
    )
    week_cut = run_date - datetime.timedelta(days=run_date.weekday())
    weeks = (
        payout.select(monday.alias("date_key"))
        .distinct()
        .filter(F.col("date_key") < F.lit(week_cut))
    )
    # usd cents = quanta(1e-4 Kin) × price_e4(1e-4 USD) → 1e-8 USD units,
    # half-up to cents via exact integer DIV (the DECIMAL product cannot
    # overflow; the cent-scaled outputs stay far below 2^53).
    usd_cents = F.expr(
        "(CAST(payout_quanta AS DECIMAL(20,0)) * CAST(price_e4 AS DECIMAL(18,0))"
        " + 500000) DIV 1000000"
    )
    return (
        anchored.join(weeks, "date_key", "left_semi")
        .withColumn("usd_cents", usd_cents)
        .groupBy("date_key", "app_id")
        .agg(
            F.sum("payout_quanta").cast("long").alias("kin_quanta"),
            F.sum("usd_cents").cast("long").alias("usd_cents"),
        )
    )

def kre_weekly_payout(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    """kre_mart/weekly_models/kre_weekly_payout.sql:1-39 — previous-week
    payout per app with the run/from/to window columns and the app dim's
    name + public wallet."""
    kw = _kre_weekly_payout_base(spark, sf_dir, run_date)
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"),
        F.col("name").alias("app_name"),
        F.col("public_wallet").alias("wallet"),
    )
    return kw.join(F.broadcast(app), "app_id", "left").select(
        "date_key",
        "app_id",
        (F.col("kin_quanta").cast("double") / 10000.0).alias("weekly_kin_payout"),
        (F.col("usd_cents").cast("double") / 100.0).alias("weekly_usd_payout"),
        F.col("date_key").alias("run_date"),
        F.date_sub("date_key", 8).alias("from_date"),
        F.date_sub("date_key", 2).alias("to_date"),
        "app_name",
        "wallet",
    )

# ---------------------------------------------------------------------------
# Round-2 model family: the reference marts previously missing from the repo
# (VERDICT r1 "What's missing" items 1-7).

# metabase_mart/daily_models/reporting/accounts/account_balance_buckets_app.sql:1-80 —
# from/to account bare-UNION (U1) ⨝ closing balances (J1) → 9-way CASE
# bucketing (P8) → counts. Bucket edges are the reference's Kin thresholds
# (:48-70) expressed in exact quark integers.

BALANCE_BUCKET_EDGES = [  # (exclusive upper bound in quark, bucket id, label)
    (1 * QUARKS_PER_KIN, 1, "0 - 1"),
    (10 * QUARKS_PER_KIN, 2, "1 - 10"),
    (1_000 * QUARKS_PER_KIN, 3, "10 - 1,000"),
    (10_000 * QUARKS_PER_KIN, 4, "1,000 - 10,000"),
    (1_000_000 * QUARKS_PER_KIN, 5, "10,000 - 1,000,000"),
    (10_000_000 * QUARKS_PER_KIN, 6, "1,000,000 - 10,000,000"),
    (100_000_000 * QUARKS_PER_KIN, 7, "10,000,000 - 100,000,000"),
]

def account_balance_buckets_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)
    frm = f.select("date_key", "app_id", F.col("from_wallet").alias("account_id"))
    to = f.select("date_key", "app_id", F.col("to_wallet").alias("account_id"))
    accounts = frm.unionByName(to).distinct()  # bare UNION (:22-34)
    bal = closing_account_balance_per_day(spark, sf_dir, run_date).select(
        "date_key",
        F.col("wallet_id").alias("account_id"),
        "closing_balance_quark",
    )
    joined = accounts.join(bal, ["date_key", "account_id"], "inner")
    b = F.col("closing_balance_quark")
    bucket_id = F.when(b < 0, F.lit(0))
    bucket_label = F.when(b < 0, F.lit("Unknown"))
    for upper, bid, label in BALANCE_BUCKET_EDGES:
        bucket_id = bucket_id.when(b < upper, F.lit(bid))
        bucket_label = bucket_label.when(b < upper, F.lit(label))
    bucket_id = bucket_id.otherwise(F.lit(8))
    bucket_label = bucket_label.otherwise(F.lit("100,000,000+"))
    return joined.groupBy(
        "date_key",
        "app_id",
        bucket_id.cast("int").alias("account_balance_range_bucket_id"),
        bucket_label.alias("account_balance_range_bucket"),
    ).agg(F.count(F.lit(1)).alias("balance_range_count"))

# metabase_mart/monthly_models/reporting/garbage_collection/monthly_inactive_wallets.sql —
# the faithful GC model (vs the gc_dust_wallets analog): wallets whose LAST
# zero closing balance falls in the GC month window and who never show a
# positive balance afterwards. The reference's NOT IN (:31) is a left-anti
# here — wallet_id is non-null on both sides, so the two are identical; with
# a nullable subquery column NOT IN would empty the result (§1.4 NULL
# semantics), which is never the intended GC behavior.

GC_MONTH_RUN = datetime.date(2024, 3, 1)  # "runs a month behind" (:2) — GCs January

def _month_floor(d: datetime.date, months_back: int) -> datetime.date:
    m = d.month - 1 - months_back
    return datetime.date(d.year + m // 12, m % 12 + 1, 1)

def monthly_inactive_wallets(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    bal = closing_account_balance_per_day(spark, sf_dir, run_date)
    lower = _month_floor(GC_MONTH_RUN, 2)  # 2024-01-01
    upper = _month_floor(GC_MONTH_RUN, 1)  # 2024-02-01
    zeros = bal.filter(
        (F.col("closing_balance_quark") <= 0)
        & (F.col("date_key") >= F.lit(lower))
        & (F.col("date_key") < F.lit(upper))
    )
    last_zero = zeros.groupBy("wallet_id").agg(F.max("date_key").alias("max_date"))
    recovered = (
        last_zero.join(bal, "wallet_id")
        .filter(
            (F.col("date_key") > F.col("max_date"))
            & (F.col("closing_balance_quark") > 0)
        )
        .select("wallet_id")
        .distinct()
    )
    return last_zero.join(recovered, "wallet_id", "left_anti").select(
        F.add_months(F.trunc("max_date", "month"), 1).alias("date_key"),
        "wallet_id",
    )

# metabase_mart/daily_models/reporting/active_accounts/{weekly,monthly}/
# …_ecosystem.sql — DAILY-grain trailing 7-/30-day ecosystem actives with
# separate spender/earner/user counts (the reference's three raw CTEs fused
# into one role-tagged stream + one conditional count-distinct pass).

def _actives_obs(spark, sf_dir, run_date, by_app: bool) -> DataFrame:
    """Deduped activity observations (date_key[, app_id], wallet_id, role):
    spenders = from_account of type 2,3; earners = to_account of type 1,3.

    Cached at app grain — the substrate of all six active_accounts cadence
    models, both API summary marts, and the KRE summary. The ecosystem
    variant is a second distinct over the (much smaller) app-grain frame,
    cached separately, so the fact-wide union+distinct shuffle happens once
    per session rather than once per model."""
    app_obs = _cached(
        spark,
        "actives_obs_app",
        sf_dir,
        run_date,
        lambda: _build_actives_obs(spark, sf_dir, run_date),
    )
    if by_app:
        return app_obs
    return _cached(
        spark,
        "actives_obs_eco",
        sf_dir,
        run_date,
        lambda: app_obs.drop("app_id").distinct(),
    )

def _build_actives_obs(spark, sf_dir, run_date) -> DataFrame:
    f = fact_kin_transaction(spark, sf_dir, run_date)
    spend = f.filter(F.col("txn_type").isin(2, 3)).select(
        "date_key", "app_id", F.col("from_wallet").alias("wallet_id"),
        F.lit("s").alias("role"),
    )
    earn = f.filter(F.col("txn_type").isin(1, 3)).select(
        "date_key", "app_id", F.col("to_wallet").alias("wallet_id"),
        F.lit("e").alias("role"),
    )
    return spend.unionByName(earn).distinct()

def _active_accounts_breakdown(
    spark, sf_dir, run_date, days: int, by_app: bool
) -> DataFrame:
    # Day-grain output with many consumers (the cadence twins, both summary
    # marts, the KRE summary): cache the RESULT, not just the exploded obs,
    # so each consumer reuses the countDistinct aggregation instead of
    # re-running it over the 30× exploded wallet-grain frame.
    return _cached(
        spark,
        f"actives_breakdown_{days}d_{'app' if by_app else 'eco'}",
        sf_dir,
        run_date,
        lambda: _build_active_accounts_breakdown(
            spark, sf_dir, run_date, days, by_app
        ),
        truncate=True,
    )

def _build_active_accounts_breakdown(
    spark, sf_dir, run_date, days: int, by_app: bool
) -> DataFrame:
    """users/spenders/earners distinct counts — the whole reference
    active_accounts family (metabase_mart/daily_models/reporting/
    active_accounts/{daily,weekly,monthly}/…_{app,ecosystem}.sql) is this
    one template: spenders = from_account of type 2,3; earners = to_account
    of type 1,3; users = their union; window is 1 (daily), trailing 7
    (weekly, dateadd -6) or trailing 30 (monthly, dateadd -29) days
    evaluated per date_key anchor. Rewritten J4+A2-style: dedup to
    (date, key, wallet, role) grain, explode each observation over the
    spine days it stays visible for, then ONE aggregation with three
    conditional distinct counts — no per-anchor range join.

    The exploded frame is cached once per window length at app grain and
    aggregated at either grain from there: COUNT(DISTINCT wallet) at
    ecosystem grain is unaffected by the per-app duplication, so the app
    and ecosystem cadence twins (plus the summary marts) share one explode
    instead of two."""
    keys = ["app_id"] if by_app else []
    f = fact_kin_transaction(spark, sf_dir, run_date)
    if days > 1:
        obs = _cached(
            spark,
            f"actives_exploded_{days}d",
            sf_dir,
            run_date,
            lambda: _actives_obs(spark, sf_dir, run_date, by_app=True).withColumn(
                "date_key",
                F.explode(
                    F.sequence(
                        F.col("date_key"),
                        F.date_add(F.col("date_key"), days - 1),
                        F.expr("interval 1 day"),
                    )
                ),
            ),
        )
    else:
        obs = _actives_obs(spark, sf_dir, run_date, by_app)
    grouped = obs.groupBy("date_key", *keys).agg(
        F.countDistinct("wallet_id").alias("active_users"),
        F.countDistinct(F.when(F.col("role") == "s", F.col("wallet_id"))).alias(
            "active_spenders"
        ),
        F.countDistinct(F.when(F.col("role") == "e", F.col("wallet_id"))).alias(
            "active_earners"
        ),
    )
    if days > 1:
        # only real reporting days (the reference's date_anchor CTE)
        spine = f.select("date_key").distinct()
        grouped = grouped.join(spine, "date_key", "inner")
    return grouped

def daily_active_accounts_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _active_accounts_breakdown(spark, sf_dir, run_date, days=1, by_app=True)

def weekly_active_accounts_ecosystem(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _active_accounts_breakdown(spark, sf_dir, run_date, days=7, by_app=False)

def monthly_active_accounts_ecosystem(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _active_accounts_breakdown(spark, sf_dir, run_date, days=30, by_app=False)

# metabase_mart/{weekly,monthly}_models/reporting/accounts/
# app_transaction_summary_{from,to}_account_by_{week,month}.sql — cadence
# rollups of the daily fine-grain marts, complete periods only. The weekly
# boundary is the Monday of the run week; the monthly boundary is the first
# of the run month (reference monthly jobs run on the 1st — with testdata
# ending 2024-01-30, January is the last complete month).

WEEK_COMPLETE_BEFORE = datetime.date(2024, 1, 29)  # date_trunc('week', run)
MONTH_COMPLETE_BEFORE = datetime.date(2024, 2, 1)

def _period_app_txn_summary(spark, sf_dir, run_date, side: str, unit: str, complete_before) -> DataFrame:
    daily = (
        app_txn_summary_from_account_daily(spark, sf_dir, run_date)
        if side == "from"
        else app_txn_summary_to_account_daily(spark, sf_dir, run_date)
    )
    # app_transaction_summary_{from,to}_account_by_{week,month}.sql:2-17 —
    # the reference sums the DAILY mart's columns per period and re-joins
    # the app dim; output column names date_key / transaction_count /
    # amount / app_name match it, quark rides as the exact substrate.
    agg = (
        daily.filter(F.col("date_key") < F.lit(complete_before))
        .groupBy(F.trunc("date_key", unit).alias("date_key"), "app_id", "wallet_id")
        .agg(
            F.sum("transaction_count").cast("long").alias("transaction_count"),
            F.sum("volume_quark").cast("long").alias("volume_quark"),
            _kin(F.sum("volume_quark")).alias("amount"),
        )
    )
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    return agg.join(F.broadcast(app), "app_id", "left").select(
        "date_key",
        "app_id",
        "wallet_id",
        "transaction_count",
        "volume_quark",
        "amount",
        "app_name",
    )

def weekly_app_txn_summary_from_account(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _period_app_txn_summary(spark, sf_dir, run_date, "from", "week", WEEK_COMPLETE_BEFORE)

def monthly_app_txn_summary_from_account(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _period_app_txn_summary(spark, sf_dir, run_date, "from", "month", MONTH_COMPLETE_BEFORE)

def weekly_app_txn_summary_to_account(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _period_app_txn_summary(spark, sf_dir, run_date, "to", "week", WEEK_COMPLETE_BEFORE)

def monthly_app_txn_summary_to_account(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _period_app_txn_summary(spark, sf_dir, run_date, "to", "month", MONTH_COMPLETE_BEFORE)

# metabase_mart/daily_models/reporting/creates/daily_account_creates_by_type.sql:1-26
# and …_by_close_authority.sql:1-26 — creates segmented by transaction type /
# close authority, dim-enriched. The reference's summed `balance` is Kin
# (fact divides by 1e5); published here as the exact quark integer plus its
# Kin double twin.

def _daily_creates_grouped(spark, sf_dir, run_date, group_col: str, out_name: str) -> DataFrame:
    cr = fact_kin_creations(spark, sf_dir, run_date)
    app = ka.dim_kin_app(spark, sf_dir).select(
        F.col("id").alias("app_id"), F.col("name").alias("app_name")
    )
    g = cr.groupBy("date_key", "app_id", F.col(group_col).alias(out_name)).agg(
        F.count(F.lit(1)).alias("daily_transactions"),
        F.sum(F.coalesce("balance_quark", F.lit(0)))
        .cast("long")
        .alias("daily_opening_balance_quark"),
        _kin(F.sum(F.coalesce("balance_quark", F.lit(0)))).alias(
            "daily_opening_balance_kin"
        ),
    )
    return g.join(F.broadcast(app), "app_id", "left")

def daily_account_creates_by_type(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _daily_creates_grouped(spark, sf_dir, run_date, "txn_type", "transaction_type")

def daily_account_creates_by_close_authority(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _daily_creates_grouped(
        spark, sf_dir, run_date, "close_account_authority", "close_authority"
    )

# kin_data/daily_models/api/daily_account_summary_by_app.sql and
# …_ecosystem.sql — the API serving marts: accounts created + SOL/USD cost
# per day (⨝ dim_solana_price). Costs sum exact lamports and convert once;
# usd_cost is (lamports × price_cents) / 1e11 computed as two exact
# int→double casts + one multiply + one divide (engine-identical).

def _daily_account_summary(spark, sf_dir, run_date, by_app: bool) -> DataFrame:
    cr = fact_kin_creations(spark, sf_dir, run_date)
    keys = ["date_key", "app_id"] if by_app else ["date_key"]
    creates = cr.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("accounts_created"),
        F.sum(F.col("fee_lamports") + F.col("create_fee_lamports"))
        .cast("long")
        .alias("cost_lamports"),
    )
    sol = ka.dim_solana_price(spark, sf_dir)
    return creates.join(sol, "date_key", "inner").select(
        *keys,
        "accounts_created",
        (F.col("cost_lamports").cast("double") / F.lit(1e9)).alias("sol_cost"),
        (
            F.col("cost_lamports").cast("double")
            * F.col("sol_price_cents").cast("double")
            / F.lit(1e11)
        ).alias("usd_cost"),
    )

def daily_account_summary_by_app(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _daily_account_summary(spark, sf_dir, run_date, by_app=True)

def daily_account_summary_ecosystem(spark: SparkSession, sf_dir: str, run_date=RUN_DATE) -> DataFrame:
    return _daily_account_summary(spark, sf_dir, run_date, by_app=False)
