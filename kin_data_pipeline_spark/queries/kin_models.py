"""Kin warehouse model queries: each reference model registered with a full
DuckDB oracle that recomputes the ENTIRE chain (raw projection → fact →
mart) in SQL. This is the model-level golden-test layer of SURVEY.md §5.
"""

from __future__ import annotations

from kin_data_pipeline_spark.models import kin as M
from kin_data_pipeline_spark.queries.registry import register
from kin_data_pipeline_spark.sources.kin_adapter import (
    DIM_KIN_APP_SQL,
    DIM_KIN_PRICE_SQL,
    DIM_SOLANA_PRICE_SQL,
    RAW_KINCREATEACCOUNT_SQL,
    RAW_KINTRANSACTION_SQL,
)

RUN = "DATE '2024-01-31'"
# Exact quark→Kin as DOUBLE: one exact int→double cast + one division by an
# exact power of ten — bit-identical to Spark's `col.cast(double) / 1e5` for
# quark integers < 2^53 (terminal DECIMALs would hash-fail the driver canon).
KIN = lambda expr: f"(CAST({expr} AS DOUBLE) / 100000.0)"  # noqa: E731

FACT_TXN_SQL = f"""
fact_kin_transaction AS (
  SELECT
    CAST(date_trunc('day', date) AS DATE) AS date_key,
    make_timestamp(timestamp * 1000000) AS txn_ts,
    id, block, transactionid AS transaction_id, instructionidx AS instruction_idx,
    memo,
    COALESCE(amount, 0) AS amount_quark,
    {KIN('COALESCE(amount, 0)')} AS amount_kin,
    fromaccount AS from_wallet, toaccount AS to_wallet,
    fromaccountbalance AS from_balance_quark, toaccountbalance AS to_balance_quark,
    (CAST(fee AS DOUBLE) / 1000000000.0) AS fee_sol,
    feepayer AS fee_payer,
    COALESCE(appindex, 0) AS app_id,
    CAST(NULLIF(transactiontype, '<NA>') AS BIGINT) AS txn_type
  FROM (SELECT DISTINCT * FROM raw_kintransaction)
  WHERE status = 'Ok' AND CAST(date_trunc('day', date) AS DATE) < {RUN}
)
"""

FACT_CREATIONS_SQL = f"""
fact_kin_creations AS (
  SELECT
    CAST(date_trunc('day', date) AS DATE) AS date_key,
    make_timestamp(timestamp * 1000000) AS created_ts,
    id, program_id, block, tx_id, instr_idx, memo, account_id, account_owner,
    close_account_authority, mint, source_transfer,
    balance AS balance_quark,
    {KIN('COALESCE(balance, 0)')} AS balance_kin,
    fee AS fee_lamports,
    create_fee AS create_fee_lamports,
    (CAST(fee AS DOUBLE) / 1000000000.0) AS fee_sol,
    (CAST(create_fee AS DOUBLE) / 1000000000.0) AS create_fee_sol,
    fee_payer,
    COALESCE(appindex, 0) AS app_id,
    CAST(NULLIF(transactiontype, '<NA>') AS BIGINT) AS txn_type,
    CAST(version AS BIGINT) AS version
  FROM (SELECT DISTINCT * FROM raw_kincreateaccount)
  WHERE status = 'Ok' AND CAST(date_trunc('day', date) AS DATE) < {RUN}
)
"""

# closing_account_balance_per_day.sql:33-89 — NULL balances ride as 0
# (the reference fact COALESCEs, the closing CASE coalesces again); the
# per-row CASE evaluates from-side before to-side (self-transfers
# contribute only from_balance) and the creation branch is reachable only
# when no transaction matched at the closing timestamp, so transaction
# observations outrank creation ones (obs_tier). Latest timestamp wins,
# then tier, then max balance — one lexicographic struct-MAX.
CLOSING_SQL = """
closing_obs AS (
  SELECT DISTINCT * FROM (
    SELECT date_key, from_wallet AS wallet_id, txn_ts AS obs_ts,
           COALESCE(from_balance_quark, 0) AS balance_quark, 1 AS obs_tier
    FROM fact_kin_transaction
    UNION ALL
    SELECT date_key, to_wallet, txn_ts, COALESCE(to_balance_quark, 0), 1
    FROM fact_kin_transaction WHERE to_wallet <> from_wallet
    UNION ALL
    SELECT date_key, account_id, created_ts, COALESCE(balance_quark, 0), 0
    FROM fact_kin_creations
  )
),
closing AS (
  SELECT date_key, wallet_id,
         struct_extract(MAX(ROW(obs_ts, obs_tier, balance_quark)), 3) AS closing_balance_quark
  FROM closing_obs
  GROUP BY 1, 2
)
"""

# daily_churn_volume.sql:1-56 with lookback = 2 instead of the reference's
# hardcoded 40 — the driver fixture spans 30 dense days over 40 wallets, so
# at 40 every day is censored and at 7 every wallet re-observes within the
# horizon (vacuously empty either way); 2 is the largest horizon that
# yields non-trivial churn rows at every SF. The code path is identical
# and the model's default stays 40 (CHURN_LOOKBACK_DAYS).
CHURN_SQL = f"""
churn_dates AS (
  SELECT DISTINCT date_key FROM fact_kin_transaction WHERE date_key < {RUN} - 2
),
churn_transacted AS (
  SELECT t.date_key, t.app_id, b.wallet_id
  FROM churn_dates d
  JOIN fact_kin_transaction t ON d.date_key = t.date_key
  JOIN closing b ON t.date_key = b.date_key AND t.from_wallet = b.wallet_id
  WHERE t.app_id != 0
  GROUP BY 1, 2, 3
),
churn_awb AS (
  SELECT ta.date_key, ta.app_id, ta.wallet_id, b.closing_balance_quark
  FROM churn_transacted ta
  JOIN closing b ON ta.date_key = b.date_key AND ta.wallet_id = b.wallet_id
),
churn_summary AS (
  SELECT a.date_key, a.app_id, a.wallet_id, a.closing_balance_quark
  FROM churn_awb a
  LEFT JOIN closing f ON f.wallet_id = a.wallet_id
    AND f.date_key > a.date_key AND f.date_key <= a.date_key + 2
  WHERE f.wallet_id IS NULL
)
"""


# Faithful to daily_active_user_balance_by_app.sql: au_filtered keeps
# wallets with >= 3 spends per (day, app) AND app_id != 0 (:34-36); each
# wallet is valued at its most recent CLOSING balance within the same
# 30-day lookback (:38-60 — closing_account_balance_per_day, so to-side
# and creation observations count). Requires CLOSING_SQL (and therefore
# FACT_CREATIONS_SQL) in the composition.
AUB_SQL = """
spend AS (
  SELECT date_key, app_id, from_wallet AS wallet_id
  FROM fact_kin_transaction WHERE txn_type IN (2, 3)
),
aub_spine AS (SELECT DISTINCT date_key AS spine_day FROM fact_kin_transaction),
aub_active AS (
  SELECT s.spine_day, sp.app_id, sp.wallet_id,
         CAST(COUNT(*) AS BIGINT) AS n_spend_txns
  FROM aub_spine s
  JOIN spend sp ON sp.date_key BETWEEN s.spine_day - 29 AND s.spine_day
  GROUP BY 1, 2, 3
  HAVING COUNT(*) >= 3
),
aub_balwin AS (
  SELECT s.spine_day, c.wallet_id, c.date_key AS bal_date, c.closing_balance_quark
  FROM aub_spine s
  JOIN closing c ON c.date_key BETWEEN s.spine_day - 29 AND s.spine_day
),
aub_balance AS (
  WITH mb AS (
    SELECT spine_day, wallet_id, MAX(bal_date) AS bd
    FROM aub_balwin GROUP BY 1, 2
  )
  SELECT b.spine_day, b.wallet_id, b.closing_balance_quark AS last_balance_quark
  FROM aub_balwin b
  JOIN mb ON b.spine_day = mb.spine_day AND b.wallet_id = mb.wallet_id
    AND b.bal_date = mb.bd
),
aub AS (
  SELECT a.spine_day AS date_key, a.app_id,
         CAST(COUNT(*) AS BIGINT) AS active_users,
         CAST(SUM(bal.last_balance_quark) AS BIGINT) AS aub_quark,
         CAST(CASE WHEN SUM(bal.last_balance_quark) > COUNT(*) * 10000000000
                   THEN COUNT(*) * 10000000000
                   ELSE SUM(bal.last_balance_quark) END AS BIGINT) AS capped_aub_quark
  FROM aub_active a
  JOIN aub_balance bal
    ON a.spine_day = bal.spine_day AND a.wallet_id = bal.wallet_id
  WHERE a.app_id != 0
  GROUP BY 1, 2
)
"""

VF_SQL = f"""
vf_prices AS (SELECT * FROM dim_kin_price WHERE date_key < {RUN}),
vf_spine AS (SELECT date_key AS spine_day FROM vf_prices),
vf_win AS (
  SELECT s.spine_day, p.price_cents FROM vf_spine s
  JOIN vf_prices p ON p.date_key BETWEEN s.spine_day - 29 AND s.spine_day
),
vf_ns AS (
  SELECT spine_day, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(price_cents) AS BIGINT) AS s_cents
  FROM vf_win GROUP BY 1
),
vf AS (
  SELECT w.spine_day AS date_key,
         ROUND(MIN(ns.s_cents) / 100.0 / MIN(ns.n), 6) AS average_price,
         ROUND(CAST(SUM(ABS(w.price_cents * ns.n - ns.s_cents)) AS BIGINT) / 100.0
               / (MIN(ns.n) * MIN(ns.n)), 6) AS average_price_deviation,
         ROUND(CAST(SUM(ABS(w.price_cents * ns.n - ns.s_cents)) AS BIGINT) * 1.0
               / (MIN(ns.n) * MIN(ns.s_cents)), 6) AS volatility_factor
  FROM vf_win w JOIN vf_ns ns ON w.spine_day = ns.spine_day
  GROUP BY 1
)
"""

PAYOUT_SQL = """
payout_total AS (
  SELECT date_key, CAST(SUM(capped_aub_quark) AS BIGINT) AS total_aub_quark
  FROM aub GROUP BY 1
),
payout_pre0 AS (
  SELECT a.date_key, a.app_id,
         a.capped_aub_quark * 1.0 / t.total_aub_quark AS app_aub_share,
         v.volatility_factor, v.average_price,
         (a.capped_aub_quark * 1.0 / t.total_aub_quark)
           * (250000000.0 * (1.0 - v.volatility_factor)) AS payout
  FROM aub a
  JOIN payout_total t ON a.date_key = t.date_key
  JOIN vf v ON a.date_key = v.date_key
),
payout_pre AS (
  SELECT *, DENSE_RANK() OVER (PARTITION BY date_key ORDER BY payout DESC, app_id ASC) AS payout_rank
  FROM payout_pre0
),
payout_adj AS (
  SELECT t.date_key, t.s1, COALESCE(sec.s2, 0.0) AS s2,
         CASE WHEN t.s1 > 0.5
              THEN 0.5 + ((t.s1 - 0.5) / 0.5) * ((2.0 / 3.0) - (1.0 / 2.0))
              ELSE t.s1 END AS s1_adj_initial,
         CASE WHEN s1_adj_initial + COALESCE(sec.s2, 0.0) > 0.9
              THEN (COALESCE(sec.s2, 0.0) / (t.s1 + COALESCE(sec.s2, 0.0))) * 0.9
              ELSE COALESCE(sec.s2, 0.0) END AS s2_adj,
         CASE WHEN s1_adj_initial
                   < (s1_adj_initial / (s1_adj_initial + COALESCE(sec.s2, 0.0))) * 0.9
              THEN s1_adj_initial
              ELSE (s1_adj_initial / (s1_adj_initial + COALESCE(sec.s2, 0.0))) * 0.9
              END AS s1_adj
  FROM (SELECT date_key, app_aub_share AS s1 FROM payout_pre WHERE payout_rank = 1) t
  -- deviation per SURVEY 2.11: a day with ONE ranked app keeps its payout
  -- row (missing rank-2 = share 0) instead of being inner-join-dropped
  LEFT JOIN (SELECT date_key, app_aub_share AS s2 FROM payout_pre WHERE payout_rank = 2) sec
    ON t.date_key = sec.date_key
),
payout_staged AS (
  SELECT p.*, a.s1, a.s2, a.s2_adj, a.s1_adj,
         1.0 - a.s1 AS single_monopoly_sum,
         1.0 - a.s1 - a.s2 AS double_monopoly_sum,
         CASE WHEN a.s2 != a.s2_adj AND p.payout_rank > 2
              THEN (p.app_aub_share / (1.0 - a.s1 - a.s2)) * 0.1
              WHEN a.s2 = a.s2_adj AND a.s1_adj > 0.5 AND p.payout_rank > 1
              THEN (p.app_aub_share / (1.0 - a.s1)) * (1.0 - a.s1_adj)
              WHEN p.payout_rank = 1 AND p.app_aub_share != a.s1_adj
              THEN a.s1_adj
              ELSE p.app_aub_share END AS post_monopoly_app_share,
         250000000.0 * (1.0 - p.volatility_factor) AS pool_after_vf,
         (250000000.0 * (1.0 - p.volatility_factor)) * (
           CASE WHEN a.s2 != a.s2_adj AND p.payout_rank > 2
                THEN (p.app_aub_share / (1.0 - a.s1 - a.s2)) * 0.1
                WHEN a.s2 = a.s2_adj AND a.s1_adj > 0.5 AND p.payout_rank > 1
                THEN (p.app_aub_share / (1.0 - a.s1)) * (1.0 - a.s1_adj)
                WHEN p.payout_rank = 1 AND p.app_aub_share != a.s1_adj
                THEN a.s1_adj
                ELSE p.app_aub_share END) AS post_monopoly_payout
  FROM payout_pre p JOIN payout_adj a ON p.date_key = a.date_key
),
payout AS (
  SELECT s.date_key, s.app_id, dka.name AS app_name,
         ROUND(s.app_aub_share, 6) AS pre_monopoly_share,
         ROUND(s.payout, 4) AS pre_monopoly_payout,
         ROUND(s.post_monopoly_app_share, 6) AS post_monopoly_app_share,
         ROUND(s.post_monopoly_payout, 4) AS post_monopoly_payout,
         CAST(CAST(round(ROUND(s.post_monopoly_payout, 4) * 10000.0) AS BIGINT) AS DOUBLE)
              * CAST(CAST(round(s.average_price * 1000000.0) AS BIGINT) AS DOUBLE)
              / 1e10 AS post_monopoly_payout_usd,
         CAST(s.payout_rank AS INT) AS payout_rank
  FROM payout_staged s LEFT JOIN dim_kin_app dka ON s.app_id = dka.id
)
"""

GC_SQL = """
gc_latest AS (
  SELECT wallet_id, date_key, closing_balance_quark FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY wallet_id ORDER BY date_key DESC, closing_balance_quark DESC
    ) AS rn FROM closing WHERE date_key <= DATE '2024-01-20'
  ) WHERE rn = 1
),
gc AS (
  SELECT d.wallet_id, d.date_key AS last_seen_date, d.closing_balance_quark
  FROM (SELECT * FROM gc_latest WHERE closing_balance_quark < 50000000) d
  WHERE d.wallet_id NOT IN (
    SELECT DISTINCT wallet_id FROM closing
    WHERE date_key > DATE '2024-01-20' AND closing_balance_quark >= 50000000
  )
)
"""

def _with(*ctes: str) -> str:
    return "WITH " + ",\n".join(c.strip().strip(",") for c in ctes)

_BASE = (
    RAW_KINTRANSACTION_SQL,
    RAW_KINCREATEACCOUNT_SQL,
    DIM_KIN_APP_SQL,
    DIM_KIN_PRICE_SQL,
    DIM_SOLANA_PRICE_SQL,
)

def _q(fn):
    """Adapt a models.kin builder to the (spark, sf_dir) query signature."""
    return lambda spark, sf_dir: fn(spark, sf_dir, M.RUN_DATE)

# The reference active_accounts family (metabase_mart/daily_models/
# reporting/active_accounts/{daily,weekly,monthly}/…_{app,ecosystem}.sql)
# is one template: 3 distinct counts (users/spenders/earners) over a
# 1/7/30-day trailing window per date_key anchor, with or without app_id.
_ACTIVES_OBS_SQL = """
, act3_obs AS (
  SELECT DISTINCT date_key, app_id, wallet_id, role FROM (
    SELECT date_key, app_id, from_wallet AS wallet_id, 's' AS role
    FROM fact_kin_transaction WHERE txn_type IN (2, 3)
    UNION ALL
    SELECT date_key, app_id, to_wallet, 'e' FROM fact_kin_transaction WHERE txn_type IN (1, 3)
  )
), act3_spine AS (SELECT DISTINCT date_key AS spine_day FROM fact_kin_transaction)
"""

def _actives_select(back: int, by_app: bool) -> str:
    """Bare SELECT over the act3_obs/act3_spine CTEs — embeddable either as
    a standalone query tail or as a CTE body inside the summary marts."""
    app_sel = "o.app_id, " if by_app else ""
    group = "1, 2" if by_app else "1"
    return f"""
SELECT s.spine_day AS date_key, {app_sel}
       CAST(COUNT(DISTINCT o.wallet_id) AS BIGINT) AS active_users,
       CAST(COUNT(DISTINCT CASE WHEN o.role = 's' THEN o.wallet_id END) AS BIGINT) AS active_spenders,
       CAST(COUNT(DISTINCT CASE WHEN o.role = 'e' THEN o.wallet_id END) AS BIGINT) AS active_earners
FROM act3_spine s JOIN act3_obs o ON o.date_key BETWEEN s.spine_day - {back} AND s.spine_day
GROUP BY {group}
"""

def _actives_sql(back: int, by_app: bool) -> str:
    return _ACTIVES_OBS_SQL + _actives_select(back, by_app)

# ---------------------------------------------------------------------------

register(
    "kin_fact_transactions",
    _with(*_BASE, FACT_TXN_SQL) + "\nSELECT * FROM fact_kin_transaction",
    doc="fact build: feed dedup, sentinel→NULL, quark→Kin decimals, complete-day guard",
)(_q(M.fact_kin_transaction))

register(
    "kin_fact_creations",
    _with(*_BASE, FACT_CREATIONS_SQL) + "\nSELECT * FROM fact_kin_creations",
    doc="creations fact: dedup + casts + lamport→SOL fees",
)(_q(M.fact_kin_creations))

def _seg_mart_sql(t: int, p: str) -> str:
    cnt = f"COUNT(CASE WHEN txn_type = {t} THEN 1 END)"
    quark = f"COALESCE(SUM(CASE WHEN txn_type = {t} THEN amount_quark END), 0)"
    return f"""    CAST({cnt} AS BIGINT) AS {p}_transactions,
    {KIN(quark)} AS {p}_amounts,
    CASE WHEN {cnt} = 0 THEN 0.0
         ELSE CAST({quark} AS DOUBLE) / CAST({cnt} * 100000 AS DOUBLE) END AS {p}_average,
    COALESCE(ROUND(MEDIAN(CASE WHEN txn_type = {t} THEN amount_quark END) / 100000.0, 6), 0.0) AS {p}_median"""

# metabase_mart daily_kin_transactions.sql mart: per-(date, app) totals +
# per-type count/amount/average/median + the 0.00001-SOL fee sum (:11).
DAILY_TXN_MART_SQL = f"""
daily_txn_mart AS (
  SELECT date_key, app_id,
    CAST(COUNT(*) AS DOUBLE) / 100000.0 AS daily_fee_sum,
    CAST(COUNT(*) AS BIGINT) AS daily_total_transactions,
    {KIN('SUM(amount_quark)')} AS daily_total_amounts,
{_seg_mart_sql(1, 'daily_earn')},
{_seg_mart_sql(2, 'daily_spend')},
{_seg_mart_sql(3, 'daily_peer')}
  FROM fact_kin_transaction GROUP BY 1, 2
)
"""

register(
    "kin_daily_transactions",
    _with(*_BASE, FACT_TXN_SQL, DAILY_TXN_MART_SQL)
    + """
SELECT m.*, dka.name AS app_name
FROM daily_txn_mart m LEFT JOIN dim_kin_app dka ON m.app_id = dka.id
""",
    doc="per-(date, app) mart: totals, per-type metrics, fee sum (A9+A4 fusion of daily_kin_transactions.sql)",
)(_q(M.daily_kin_transactions))

register(
    "kin_daily_counts_by_amount",
    _with(*_BASE, FACT_TXN_SQL)
    + """
SELECT date_key,
  CASE WHEN amount_quark <= 99999 THEN 'N/A'
       WHEN amount_quark <= 199999 THEN '1-2'
       WHEN amount_quark <= 99999999 THEN '2-1000'
       WHEN amount_quark <= 999999999 THEN '1001-10000'
       WHEN amount_quark <= 9999999999 THEN '10001-100000'
       WHEN amount_quark <= 99999999999 THEN '100001-1000000'
       ELSE '1000001+' END AS amount_range,
  CAST(COUNT(*) AS BIGINT) AS transaction_count
FROM fact_kin_transaction GROUP BY 1, 2
""",
    doc="amount-histogram bucketing on the fact (P8, daily_kin_transaction_counts_by_amount.sql:5-13 ranges)",
)(_q(M.daily_counts_by_amount))

register(
    "kin_closing_balance_per_day",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL)
    + f"""
SELECT date_key, wallet_id, closing_balance_quark,
       {KIN('closing_balance_quark')} AS closing_balance_kin
FROM closing
""",
    doc="bare-UNION balance streams + last-ts/max-on-tie closing balance (U1/J6/A5)",
)(_q(M.closing_account_balance_per_day))

register(
    "kin_daily_active_accounts_30d",
    _with(*_BASE, FACT_TXN_SQL)
    + """
, activity AS (
  SELECT date_key, app_id, from_wallet AS wallet_id FROM fact_kin_transaction WHERE txn_type IN (2, 3)
  UNION
  SELECT date_key, app_id, to_wallet FROM fact_kin_transaction WHERE txn_type IN (1, 3)
), act_spine AS (SELECT DISTINCT date_key FROM fact_kin_transaction)
SELECT s.date_key, a.app_id, CAST(COUNT(DISTINCT a.wallet_id) AS BIGINT) AS active_accounts_30d
FROM act_spine s JOIN activity a ON a.date_key BETWEEN s.date_key - 29 AND s.date_key
GROUP BY 1, 2
""",
    doc="trailing-30d distinct actives per app (J4+A2 exploded spine)",
)(_q(M.daily_active_accounts_30d))

register(
    "kin_daily_aub_by_app",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL, AUB_SQL)
    + f"""
SELECT date_key, app_id, active_users, aub_quark, capped_aub_quark,
       {KIN('capped_aub_quark')} AS capped_aub_kin
FROM aub
""",
    doc="KRE active-user balance: ≥3 spend txns in 30d, as-of balances, 100k-Kin cap",
)(_q(M.daily_active_user_balance_by_app))

register(
    "kin_daily_volatility_factor",
    _with(*_BASE, VF_SQL) + "\nSELECT * FROM vf",
    doc="trailing-30d price volatility in exact integer cents (J4+A6)",
)(_q(M.daily_volatility_factor))

register(
    "kin_daily_payout",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL, AUB_SQL, VF_SQL, PAYOUT_SQL)
    + "\nSELECT * FROM payout",
    doc="KRE payout monopoly cascade: rank + share caps + redistribution (W1/J7)",
)(_q(M.daily_kin_payout))

# kre_weekly_payout.sql:2-28 window: Monday anchors present in the payout
# dates, summing [anchor-8, anchor-2] (prev-week Sunday..Saturday). Each
# payout day maps to exactly one anchor; Kin as 1e-4-quanta ints, USD as
# half-up integer cents from the overflow-proof HUGEINT product.
KRE_WEEKLY_BASE_SQL = f"""
kw_anchored AS (
  SELECT CASE WHEN p.date_key = CAST(date_trunc('week', p.date_key) AS DATE) + 6
              THEN CAST(date_trunc('week', p.date_key) AS DATE) + 14
              ELSE CAST(date_trunc('week', p.date_key) AS DATE) + 7 END AS date_key,
         p.app_id,
         CAST(round(p.post_monopoly_payout * 10000) AS BIGINT) AS payout_quanta,
         CAST(round(v.average_price * 10000) AS BIGINT) AS price_e4
  FROM payout p JOIN vf v ON p.date_key = v.date_key
),
kw_weeks AS (
  SELECT DISTINCT CAST(date_trunc('week', date_key) AS DATE) AS date_key FROM payout
  WHERE CAST(date_trunc('week', date_key) AS DATE) < CAST(date_trunc('week', {RUN}) AS DATE)
),
kwb AS (
  SELECT a.date_key, a.app_id,
         CAST(SUM(a.payout_quanta) AS BIGINT) AS kin_quanta,
         CAST(SUM((CAST(a.payout_quanta AS HUGEINT) * a.price_e4 + 500000) // 1000000) AS BIGINT) AS usd_cents
  FROM kw_anchored a JOIN kw_weeks w ON a.date_key = w.date_key
  GROUP BY 1, 2
)
"""

register(
    "kin_weekly_payout_summary",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL, AUB_SQL, VF_SQL, PAYOUT_SQL, KRE_WEEKLY_BASE_SQL)
    + """
, kw_ranked AS (
  SELECT k.*, dka.name AS app_name,
         DENSE_RANK() OVER (PARTITION BY k.date_key ORDER BY k.kin_quanta DESC) AS payout_rank
  FROM kwb k LEFT JOIN dim_kin_app dka ON k.app_id = dka.id
)
SELECT date_key,
       CAST(CAST(SUM(kin_quanta) AS BIGINT) AS DOUBLE) / 10000.0 AS kin_payout,
       CAST(CAST(SUM(usd_cents) AS BIGINT) AS DOUBLE) / 100.0 AS usd_payout,
       '[' || string_agg(
         CASE WHEN payout_rank <= 10 THEN CAST(json_object(
           'id', app_id, 'name', app_name,
           'kinPayoutMicro', kin_quanta * 100, 'usdPayoutCents', usd_cents) AS VARCHAR) END,
         ',' ORDER BY payout_rank, app_id) || ']' AS top_app_list
FROM kw_ranked GROUP BY 1
""",
    doc="weekly payout totals + dense-ranked top-10 JSON (weekly_kre_payout_summary.sql:1-41)",
)(_q(M.weekly_kre_payout_summary))

register(
    "kin_gc_dust_wallets",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL, GC_SQL)
    + "\nSELECT * FROM gc",
    doc="GC: wallets whose latest balance is dust and never recovers (W3+J9)",
)(_q(M.gc_dust_wallets))

register(
    "kin_multi_create_impacted",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL)
    + f"""
, multi AS (
  SELECT tx_id FROM fact_kin_creations
  GROUP BY tx_id HAVING COUNT(instr_idx) > 1
), impacted AS (
  -- fee_payer applies at the ACCOUNT step, never the instruction count
  -- (multi_create_impacted_accounts.sql steps 1-2)
  SELECT DISTINCT account_id AS wallet_id FROM fact_kin_creations
  WHERE tx_id IN (SELECT tx_id FROM multi)
    AND fee_payer = 'AgoraFeePayer11111'
), zeroed AS (
  -- step 3: ever-zeroed impacted wallets (every ranked wallet has a
  -- rank-1 row, so balance_rank = 1 does not narrow the wallet set)
  SELECT DISTINCT wallet_id FROM closing
  WHERE closing_balance_quark <= 0
    AND wallet_id IN (SELECT wallet_id FROM impacted)
)
-- step 4: every creation row of those accounts, run date stamped
SELECT {RUN} AS date_key, c.account_id, c.account_owner
FROM fact_kin_creations c
WHERE c.account_id IN (SELECT wallet_id FROM zeroed)
""",
    doc="multi-create GC chain: HAVING (A7) + semi joins (J8); ever-zeroed wallets, creation-row multiplicity (multi_create_impacted_accounts.sql:1-46)",
)(_q(M.multi_create_impacted_accounts))

register(
    "kin_average_balance_per_day",
    _with(*_BASE, FACT_TXN_SQL)
    + """
, role_avgs AS (
  -- from-side per-(date, wallet) average (:2-11); NULL balances are the
  -- fact's COALESCEd zeros
  SELECT date_key, from_wallet AS wallet_id,
         CAST(CAST(SUM(COALESCE(from_balance_quark, 0)) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) * 100000 AS DOUBLE) AS balance_average
  FROM fact_kin_transaction GROUP BY 1, 2
  UNION ALL
  SELECT date_key, to_wallet,
         CAST(CAST(SUM(COALESCE(to_balance_quark, 0)) AS BIGINT) AS DOUBLE)
           / CAST(COUNT(*) * 100000 AS DOUBLE)
  FROM fact_kin_transaction GROUP BY 1, 2
)
SELECT date_key, wallet_id,
       ROUND(SUM(balance_average) / COUNT(*), 6) AS account_balance_average
FROM role_avgs GROUP BY 1, 2
""",
    doc="per-(date, wallet) role averages, UNION ALL, avg-of-avgs (average_account_balance_per_day.sql:1-42)",
)(_q(M.average_account_balance_per_day))

register(
    "kin_daily_market_summary",
    _with(*_BASE)
    + f"""
SELECT date_key,
       CAST(price_cents AS DOUBLE) / 100.0 AS kin_price,
       CAST(market_cap_cents AS DOUBLE) / 100.0 AS kin_market_cap,
       CAST(volume_cents AS DOUBLE) / 100.0 AS kin_trade_volume,
       CAST(market_cap_cents AS DOUBLE) / CAST(price_cents AS DOUBLE) AS kin_circulating_supply
FROM dim_kin_price
""",
    doc="market dim projection, no complete-day guard (daily_market_summary.sql:1-19, `where True`)",
)(_q(M.daily_market_summary))

register(
    "kin_daily_net_inflation",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL, AUB_SQL, VF_SQL, PAYOUT_SQL, CHURN_SQL)
    + f"""
, ni_pay AS (
  SELECT date_key,
         CAST(SUM(CAST(round(post_monopoly_payout * 10000) AS BIGINT)) AS BIGINT) AS payout_quanta
  FROM payout WHERE date_key < {RUN} - 2 GROUP BY 1
),
ni_bal AS (
  SELECT date_key, CAST(SUM(closing_balance_quark) AS BIGINT) AS balance_quark
  FROM closing WHERE date_key < {RUN} - 2 GROUP BY 1
),
ni_churn AS (
  SELECT date_key, CAST(SUM(closing_balance_quark) AS BIGINT) AS churn_quark
  FROM churn_summary WHERE date_key < {RUN} - 2 GROUP BY 1
),
ni AS (
  SELECT p.date_key,
         p.payout_quanta,
         COALESCE(ub.balance_quark, 0) AS balance_quark,
         COALESCE(prev.balance_quark, 0) AS prev_balance_quark,
         COALESCE(c.churn_quark, 0) AS churn_quark,
         p.payout_quanta * 10
           - (COALESCE(ub.balance_quark, 0) - COALESCE(prev.balance_quark, 0))
           - COALESCE(c.churn_quark, 0) AS net_inflation_quark
  FROM ni_pay p
  LEFT JOIN ni_bal ub ON p.date_key = ub.date_key
  LEFT JOIN ni_bal prev ON p.date_key - 1 = prev.date_key
  LEFT JOIN ni_churn c ON p.date_key = c.date_key
)
SELECT date_key,
       CAST(payout_quanta AS DOUBLE) / 10000.0 AS daily_payout,
       {KIN('balance_quark')} AS current_balance,
       {KIN('prev_balance_quark')} AS prev_balance,
       {KIN('churn_quark')} AS churn_amount,
       {KIN('net_inflation_quark')} AS net_inflation,
       CASE WHEN net_inflation_quark > 0 THEN 'Inflation'
            WHEN net_inflation_quark < 0 THEN 'Contraction'
            ELSE 'None' END AS inflation_flag
FROM ni
""",
    doc="payout − Δbalance − churn with IFNULL-0 sides and prev-day left join (daily_net_inflation.sql:1-56, lookback 2 for the 30-day fixture)",
)(lambda spark, sf_dir: M.daily_net_inflation(spark, sf_dir, M.RUN_DATE, lookback_days=2))

# ---------------------------------------------------------------------------
# Phase-2 model family (SURVEY §7): creates, cadence rollups, curated
# projection, block counts, fine-grain summaries, KRE ecosystem rollup.

register(
    "kin_daily_creations_by_app",
    _with(*_BASE, FACT_CREATIONS_SQL)
    + f"""
SELECT c.date_key, c.app_id,
       CAST(COUNT(*) AS BIGINT) AS daily_transactions,
       CAST(SUM(COALESCE(c.balance_quark, 0)) AS BIGINT) AS daily_opening_balance_quark,
       {KIN('SUM(COALESCE(c.balance_quark, 0))')} AS daily_opening_balance_kin,
       CAST(CAST(SUM(c.fee_lamports) AS BIGINT) AS DOUBLE) / 1e9 AS daily_transaction_fee_sum,
       CAST(CAST(SUM(c.create_fee_lamports) AS BIGINT) AS DOUBLE) / 1e9 AS daily_creation_fee_sum,
       ANY_VALUE(dka.name) AS app_name
FROM fact_kin_creations c LEFT JOIN dim_kin_app dka ON c.app_id = dka.id
GROUP BY 1, 2
""",
    doc="per-app daily creations: count/balance/fee sums (daily_account_creates_by_app.sql:1-30)",
)(_q(M.daily_kin_creations_by_app))

register(
    "kin_weekly_transactions",
    _with(*_BASE, FACT_TXN_SQL)
    + f"""
SELECT CAST(date_trunc('week', t.date_key) AS DATE) AS date_key,
       t.app_id,
       CAST(COUNT(*) AS BIGINT) AS weekly_count,
       CAST(SUM(t.amount_quark) AS BIGINT) AS volume_quark,
       {KIN('SUM(t.amount_quark)')} AS weekly_amount,
       ANY_VALUE(a.name) AS app_name
FROM fact_kin_transaction t
LEFT JOIN dim_kin_app a ON t.app_id = a.id
WHERE t.date_key < DATE '2024-01-29'
GROUP BY 1, 2
""",
    doc="weekly (period, app) cadence rollup — complete Monday weeks only",
)(_q(M.weekly_kin_transactions))

register(
    "kin_monthly_transactions",
    _with(*_BASE, FACT_TXN_SQL)
    + f"""
SELECT CAST(date_trunc('month', t.date_key) AS DATE) AS date_key,
       t.app_id,
       CAST(COUNT(*) AS BIGINT) AS monthly_count,
       CAST(SUM(t.amount_quark) AS BIGINT) AS volume_quark,
       {KIN('SUM(t.amount_quark)')} AS monthly_amount,
       ANY_VALUE(a.name) AS app_name
FROM fact_kin_transaction t
LEFT JOIN dim_kin_app a ON t.app_id = a.id
WHERE t.date_key < DATE '2024-02-01'
GROUP BY 1, 2
""",
    doc="monthly (period, app) cadence rollup — complete months only",
)(_q(M.monthly_kin_transactions))

register(
    "kin_transactions_curated",
    _with(*_BASE, FACT_TXN_SQL)
    + f"""
SELECT id AS transaction_id, transaction_id AS transaction_hash,
       date_key, app_id,
       'Ok' AS transaction_status,
       txn_type AS type,
       amount_kin AS amount, amount_quark AS quarks,
       block, instruction_idx AS instruction_offset, memo AS memo_text,
       txn_ts AS date_time,
       from_wallet AS source, CAST(NULL AS VARCHAR) AS source_owner,
       {KIN('COALESCE(from_balance_quark, 0)')} AS source_balance,
       to_wallet AS destination, CAST(NULL AS VARCHAR) AS destination_owner,
       {KIN('COALESCE(to_balance_quark, 0)')} AS destination_balance,
       fee_payer AS subsidizer, fee_sol AS fee
FROM fact_kin_transaction
WHERE app_id != 0
""",
    doc="curated rename projection, app rows only (kin_transactions_curated.sql:2-33; phantom tx_status + fee divisor per SURVEY 2.11; no owner fields in the synthetic feed)",
)(_q(M.kin_transactions_curated))

register(
    "kin_daily_blocks",
    _with(*_BASE, FACT_TXN_SQL)
    + """
SELECT date_key,
       CAST(COUNT(DISTINCT block) AS BIGINT) AS block_count
FROM fact_kin_transaction GROUP BY 1
""",
    doc="count(distinct block) per day (A2, daily_kin_blocks.sql:2-13 — exactly two columns)",
)(_q(M.daily_kin_blocks))

register(
    "kin_app_txn_summary_from_account_daily",
    _with(*_BASE, FACT_TXN_SQL)
    + f"""
SELECT t.date_key, t.app_id, t.from_wallet AS wallet_id,
       CAST(COUNT(*) AS BIGINT) AS transaction_count,
       CAST(SUM(t.amount_quark) AS BIGINT) AS volume_quark,
       {KIN('SUM(t.amount_quark)')} AS amount,
       ANY_VALUE(dka.name) AS app_name
FROM fact_kin_transaction t LEFT JOIN dim_kin_app dka ON t.app_id = dka.id
GROUP BY 1, 2, 3
""",
    doc="finest-grain (date, app, wallet) mart (A1 multi-key)",
)(_q(M.app_txn_summary_from_account_daily))

register(
    "kin_daily_kre_summary",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL, AUB_SQL, VF_SQL, PAYOUT_SQL, DAILY_TXN_MART_SQL)
    + _ACTIVES_OBS_SQL
    + f", kre_mu AS ({_actives_select(29, False)})"
    + f"""
, kre_txn AS (
  SELECT date_key, CAST(COUNT(DISTINCT app_id) AS BIGINT) AS active_apps,
         CAST(SUM(daily_total_transactions) AS BIGINT) AS transaction_count
  FROM daily_txn_mart GROUP BY 1
),
kre_aub AS (
  SELECT date_key,
         CAST(SUM(aub_quark) AS BIGINT) AS aub_quark,
         CAST(SUM(capped_aub_quark) AS BIGINT) AS capped_aub_quark,
         CAST(SUM(active_users) AS BIGINT) AS active_users
  FROM aub GROUP BY 1
),
kre_pay AS (
  SELECT p.date_key,
         CAST(SUM(CAST(round(p.post_monopoly_payout * 10000) AS BIGINT)) AS BIGINT) AS kin_quanta,
         CAST(SUM((CAST(CAST(round(p.post_monopoly_payout * 10000) AS BIGINT) AS HUGEINT)
                   * CAST(round(v.average_price * 10000) AS BIGINT) + 500000) // 1000000) AS BIGINT) AS usd_cents
  FROM payout p JOIN vf v ON p.date_key = v.date_key GROUP BY 1
)
SELECT t.date_key, t.active_apps,
       {KIN('a.aub_quark')} AS active_user_balance,
       {KIN('a.capped_aub_quark')} AS active_capped_user_balance,
       a.active_users,
       v.volatility_factor,
       CAST(p.kin_quanta AS DOUBLE) / 10000.0 AS kin_payout,
       CAST(p.usd_cents AS DOUBLE) / 100.0 AS usd_payout,
       t.transaction_count,
       mu.active_earners AS monthly_active_earners,
       mu.active_spenders AS monthly_active_spenders,
       mu.active_users AS monthly_active_users
FROM kre_txn t
JOIN kre_aub a ON t.date_key = a.date_key
JOIN vf v ON t.date_key = v.date_key
JOIN kre_pay p ON t.date_key = p.date_key
JOIN kre_mu mu ON t.date_key = mu.date_key
""",
    doc="KRE API mart: actives/AUB/VF/payout/monthly-actives inner-join chain (daily_kre_summary.sql:1-84; payout aggregated to eco grain, §2.11)",
)(_q(M.daily_kre_summary))

register(
    "kin_daily_create_fee_payers",
    _with(*_BASE, FACT_CREATIONS_SQL)
    + """
, fp AS (
  SELECT date_key, app_id, fee_payer,
         CAST(COUNT(*) AS BIGINT) AS daily_transactions,
         CAST(SUM(fee_lamports) AS BIGINT) AS txn_fee_lamports,
         CAST(SUM(create_fee_lamports) AS BIGINT) AS create_fee_lamports_sum
  FROM fact_kin_creations GROUP BY 1, 2, 3
)
SELECT fp.date_key, fp.app_id, fp.fee_payer, fp.daily_transactions,
       CAST(fp.txn_fee_lamports AS DOUBLE) / 1e9 AS daily_transaction_fees_sol,
       CAST(fp.txn_fee_lamports AS DOUBLE) * CAST(sp.sol_price_cents AS DOUBLE) / 1e11
         AS daily_transaction_fees_usd,
       CAST(fp.create_fee_lamports_sum AS DOUBLE) / 1e9 AS daily_creation_fees_sol,
       CAST(fp.create_fee_lamports_sum AS DOUBLE) * CAST(sp.sol_price_cents AS DOUBLE) / 1e11
         AS daily_creation_fees_usd,
       dka.name AS app_name
FROM fp
LEFT JOIN dim_kin_app dka ON fp.app_id = dka.id
LEFT JOIN dim_solana_price sp ON fp.date_key = sp.date_key
""",
    doc="(date, app, fee_payer) creation costs, split fees + USD legs (daily_account_create_fee_payers.sql:1-40)",
)(_q(M.daily_create_fee_payers))

register(
    "kin_daily_churn_volume",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL, CHURN_SQL)
    + f"""
SELECT date_key, app_id, wallet_id,
       closing_balance_quark AS balance_quark,
       {KIN('closing_balance_quark')} AS balance_kin
FROM churn_summary
""",
    doc="wallet-grain churn: app transactors with no balance row in (d, d+N] (daily_churn_volume.sql:1-56, J5/J10)",
)(lambda spark, sf_dir: M.daily_churn_volume(spark, sf_dir, M.RUN_DATE, lookback_days=2))

register(
    "kin_app_txn_summary_to_account_daily",
    _with(*_BASE, FACT_TXN_SQL)
    + f"""
SELECT t.date_key, t.app_id, t.to_wallet AS wallet_id,
       CAST(COUNT(*) AS BIGINT) AS transaction_count,
       CAST(SUM(t.amount_quark) AS BIGINT) AS volume_quark,
       {KIN('SUM(t.amount_quark)')} AS amount,
       ANY_VALUE(dka.name) AS app_name
FROM fact_kin_transaction t LEFT JOIN dim_kin_app dka ON t.app_id = dka.id
GROUP BY 1, 2, 3
""",
    doc="to-account twin of the fine-grain mart",
)(_q(M.app_txn_summary_to_account_daily))

register(
    "kin_daily_active_accounts_ecosystem",
    _with(*_BASE, FACT_TXN_SQL) + _actives_sql(back=0, by_app=False),
    doc="per-day users/spenders/earners ecosystem counts (daily_active_accounts_ecosystem.sql)",
)(_q(M.daily_active_accounts_ecosystem))

register(
    "kin_daily_active_accounts_app",
    _with(*_BASE, FACT_TXN_SQL) + _actives_sql(back=0, by_app=True),
    doc="per-day users/spenders/earners per app (daily_active_accounts_app.sql)",
)(_q(M.daily_active_accounts_app))

# USD-per-unit price CTEs shared by the API summary marts (cents / 100,
# one correctly-rounded division on both engines).
_PRICE_CTES_SQL = """
, px AS (SELECT date_key, CAST(price_cents AS DOUBLE) / 100.0 AS kin_price FROM dim_kin_price)
, sx AS (SELECT date_key, CAST(sol_price_cents AS DOUBLE) / 100.0 AS sol_price FROM dim_solana_price)
"""

def _usd_cols_sql() -> str:
    cols = ["m.daily_fee_sum AS transaction_fees_sol",
            "m.daily_fee_sum * sx.sol_price AS {fee_usd}",
            "m.daily_total_transactions AS transaction_count",
            "m.daily_total_amounts AS transaction_amount_kin",
            "m.daily_total_amounts * px.kin_price AS transaction_amount_usd"]
    for p in ("earn", "spend", "peer"):
        cols += [
            f"m.daily_{p}_transactions AS {p}_count",
            f"m.daily_{p}_amounts AS {p}_amount_kin",
            f"m.daily_{p}_amounts * px.kin_price AS {p}_amount_usd",
        ]
    return ",\n       ".join(cols)

_ACTIVES_OUT_SQL = """
       COALESCE(du.active_users, 0) AS daily_active_users,
       COALESCE(du.active_earners, 0) AS daily_active_earners,
       COALESCE(du.active_spenders, 0) AS daily_active_spenders,
       COALESCE(mu.active_users, 0) AS monthly_active_users,
       COALESCE(mu.active_earners, 0) AS monthly_active_earners,
       COALESCE(mu.active_spenders, 0) AS monthly_active_spenders"""

register(
    "kin_daily_summary_by_app",
    _with(*_BASE, FACT_TXN_SQL, DAILY_TXN_MART_SQL)
    + _ACTIVES_OBS_SQL
    + f", du AS ({_actives_select(0, True)}), mu AS ({_actives_select(29, True)})"
    + _PRICE_CTES_SQL
    + f"""
SELECT m.date_key, m.app_id,
       COALESCE(dka.name, CAST(m.app_id AS VARCHAR)) AS app_name,
       {_usd_cols_sql().format(fee_usd='transaction_fees_usd')},
{_ACTIVES_OUT_SQL}
FROM daily_txn_mart m
LEFT JOIN du ON m.date_key = du.date_key AND m.app_id = du.app_id
LEFT JOIN mu ON m.date_key = mu.date_key AND m.app_id = mu.app_id
JOIN px ON m.date_key = px.date_key
JOIN sx ON m.date_key = sx.date_key
LEFT JOIN dim_kin_app dka ON m.app_id = dka.id
""",
    doc="API mart: priced txn metrics ⨝ daily+monthly actives ⨝ dims (daily_summary_by_app.sql:1-75)",
)(_q(M.daily_summary_by_app))

register(
    "kin_daily_summary_ecosystem",
    _with(*_BASE, FACT_TXN_SQL)
    + f"""
, daily_txn_mart AS (
  SELECT date_key, 0 AS app_id,
    CAST(COUNT(DISTINCT app_id) AS BIGINT) AS app_count,
    CAST(COUNT(*) AS DOUBLE) / 100000.0 AS daily_fee_sum,
    CAST(COUNT(*) AS BIGINT) AS daily_total_transactions,
    {KIN('SUM(amount_quark)')} AS daily_total_amounts,
    CAST(COUNT(CASE WHEN txn_type = 1 THEN 1 END) AS BIGINT) AS daily_earn_transactions,
    {KIN('COALESCE(SUM(CASE WHEN txn_type = 1 THEN amount_quark END), 0)')} AS daily_earn_amounts,
    CAST(COUNT(CASE WHEN txn_type = 2 THEN 1 END) AS BIGINT) AS daily_spend_transactions,
    {KIN('COALESCE(SUM(CASE WHEN txn_type = 2 THEN amount_quark END), 0)')} AS daily_spend_amounts,
    CAST(COUNT(CASE WHEN txn_type = 3 THEN 1 END) AS BIGINT) AS daily_peer_transactions,
    {KIN('COALESCE(SUM(CASE WHEN txn_type = 3 THEN amount_quark END), 0)')} AS daily_peer_amounts
  FROM fact_kin_transaction GROUP BY 1
)"""
    + _ACTIVES_OBS_SQL
    + f", du AS ({_actives_select(0, False)}), mu AS ({_actives_select(29, False)})"
    + _PRICE_CTES_SQL
    + f"""
SELECT m.date_key, m.app_count,
       {_usd_cols_sql().format(fee_usd='transactions_fee_usd')},
{_ACTIVES_OUT_SQL}
FROM daily_txn_mart m
LEFT JOIN du ON m.date_key = du.date_key
LEFT JOIN mu ON m.date_key = mu.date_key
JOIN px ON m.date_key = px.date_key
JOIN sx ON m.date_key = sx.date_key
""",
    doc="ecosystem API mart; exact quark re-agg = the reference's decimal per-app sums (daily_summary_ecosystem.sql:1-70, incl. the transactions_fee_usd name quirk)",
)(_q(M.daily_summary_ecosystem))

register(
    "kin_weekly_active_accounts_app",
    _with(*_BASE, FACT_TXN_SQL) + _actives_sql(back=6, by_app=True),
    doc="trailing-7d users/spenders/earners per app (weekly_active_accounts_app.sql dateadd -6)",
)(_q(M.weekly_active_accounts_app))

register(
    "kin_monthly_active_accounts_app",
    _with(*_BASE, FACT_TXN_SQL) + _actives_sql(back=29, by_app=True),
    doc="trailing-30d users/spenders/earners per app (monthly_active_accounts_app.sql dateadd -29)",
)(_q(M.monthly_active_accounts_app))

register(
    "kin_kre_weekly_payout",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL, AUB_SQL, VF_SQL, PAYOUT_SQL, KRE_WEEKLY_BASE_SQL)
    + """
SELECT k.date_key, k.app_id,
       CAST(k.kin_quanta AS DOUBLE) / 10000.0 AS weekly_kin_payout,
       CAST(k.usd_cents AS DOUBLE) / 100.0 AS weekly_usd_payout,
       k.date_key AS run_date,
       k.date_key - 8 AS from_date,
       k.date_key - 2 AS to_date,
       dka.name AS app_name, dka.public_wallet AS wallet
FROM kwb k LEFT JOIN dim_kin_app dka ON k.app_id = dka.id
""",
    doc="previous-week payout window per app with run/from/to + wallet (kre_weekly_payout.sql:1-39)",
)(_q(M.kre_weekly_payout))

# ---------------------------------------------------------------------------
# Round-2 model family (VERDICT r1 missing-models list): balance buckets,
# faithful GC, ecosystem cadence actives, period account summaries, creates
# segmentations, API cost summaries.

register(
    "kin_account_balance_buckets",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL)
    + """
, abb_accounts AS (
  SELECT date_key, app_id, from_wallet AS account_id FROM fact_kin_transaction
  UNION
  SELECT date_key, app_id, to_wallet FROM fact_kin_transaction
), abb AS (
  SELECT a.date_key, a.app_id, c.closing_balance_quark AS bq
  FROM abb_accounts a
  JOIN closing c ON a.date_key = c.date_key AND a.account_id = c.wallet_id
)
SELECT date_key, app_id,
  CAST(CASE WHEN bq < 0 THEN 0
            WHEN bq < 100000 THEN 1
            WHEN bq < 1000000 THEN 2
            WHEN bq < 100000000 THEN 3
            WHEN bq < 1000000000 THEN 4
            WHEN bq < 100000000000 THEN 5
            WHEN bq < 1000000000000 THEN 6
            WHEN bq < 10000000000000 THEN 7
            ELSE 8 END AS INT) AS account_balance_range_bucket_id,
  CASE WHEN bq < 0 THEN 'Unknown'
       WHEN bq < 100000 THEN '0 - 1'
       WHEN bq < 1000000 THEN '1 - 10'
       WHEN bq < 100000000 THEN '10 - 1,000'
       WHEN bq < 1000000000 THEN '1,000 - 10,000'
       WHEN bq < 100000000000 THEN '10,000 - 1,000,000'
       WHEN bq < 1000000000000 THEN '1,000,000 - 10,000,000'
       WHEN bq < 10000000000000 THEN '10,000,000 - 100,000,000'
       ELSE '100,000,000+' END AS account_balance_range_bucket,
  CAST(COUNT(*) AS BIGINT) AS balance_range_count
FROM abb GROUP BY 1, 2, 3, 4
""",
    doc="balance-histogram mart: from/to UNION ⨝ closing balance → 9-bucket CASE (U1/J1/P8)",
)(_q(M.account_balance_buckets_app))

register(
    "kin_monthly_inactive_wallets",
    _with(*_BASE, FACT_TXN_SQL, FACT_CREATIONS_SQL, CLOSING_SQL)
    + """
, gci_zero AS (
  SELECT date_key, wallet_id FROM closing
  WHERE closing_balance_quark <= 0
    AND date_key >= DATE '2024-01-01' AND date_key < DATE '2024-02-01'
), gci_last AS (
  SELECT wallet_id, MAX(date_key) AS max_date FROM gci_zero GROUP BY 1
), gci_recovered AS (
  SELECT DISTINCT z.wallet_id
  FROM gci_last z JOIN closing c ON z.wallet_id = c.wallet_id
  WHERE c.date_key > z.max_date AND c.closing_balance_quark > 0
)
SELECT CAST(date_trunc('month', z.max_date) + INTERVAL 1 MONTH AS DATE) AS date_key,
       z.wallet_id
FROM gci_last z
WHERE z.wallet_id NOT IN (SELECT wallet_id FROM gci_recovered)
""",
    doc="faithful GC: last zero-balance in the GC month, never recovered (NOT-IN → anti join, §1.4)",
)(_q(M.monthly_inactive_wallets))

register(
    "kin_weekly_active_accounts_ecosystem",
    _with(*_BASE, FACT_TXN_SQL) + _actives_sql(back=6, by_app=False),
    doc="trailing-7d ecosystem actives with spender/earner split (J4+A2 spine)",
)(_q(M.weekly_active_accounts_ecosystem))

register(
    "kin_monthly_active_accounts_ecosystem",
    _with(*_BASE, FACT_TXN_SQL) + _actives_sql(back=29, by_app=False),
    doc="trailing-30d ecosystem actives with spender/earner split",
)(_q(M.monthly_active_accounts_ecosystem))

_PERIOD_SUMMARY_SQL = """
, ps AS (
  SELECT CAST(date_trunc('{unit}', date_key) AS DATE) AS date_key, app_id,
         {wallet} AS wallet_id,
         CAST(COUNT(*) AS BIGINT) AS transaction_count,
         CAST(SUM(amount_quark) AS BIGINT) AS volume_quark
  FROM fact_kin_transaction
  WHERE date_key < DATE '{before}'
  GROUP BY 1, 2, 3
)
SELECT ps.date_key, ps.app_id, ps.wallet_id, ps.transaction_count, ps.volume_quark,
       {kin} AS amount, dka.name AS app_name
FROM ps LEFT JOIN dim_kin_app dka ON ps.app_id = dka.id
"""

def _period_summary_sql(unit: str, wallet: str, before: str) -> str:
    return _PERIOD_SUMMARY_SQL.format(
        unit=unit, wallet=wallet, before=before, kin=KIN("ps.volume_quark")
    )

register(
    "kin_app_txn_summary_from_account_weekly",
    _with(*_BASE, FACT_TXN_SQL)
    + _period_summary_sql("week", "from_wallet", "2024-01-29"),
    doc="weekly rollup of the from-account fine-grain mart (complete weeks)",
)(_q(M.weekly_app_txn_summary_from_account))

register(
    "kin_app_txn_summary_from_account_monthly",
    _with(*_BASE, FACT_TXN_SQL)
    + _period_summary_sql("month", "from_wallet", "2024-02-01"),
    doc="monthly rollup of the from-account fine-grain mart",
)(_q(M.monthly_app_txn_summary_from_account))

register(
    "kin_app_txn_summary_to_account_weekly",
    _with(*_BASE, FACT_TXN_SQL)
    + _period_summary_sql("week", "to_wallet", "2024-01-29"),
    doc="weekly rollup of the to-account fine-grain mart",
)(_q(M.weekly_app_txn_summary_to_account))

register(
    "kin_app_txn_summary_to_account_monthly",
    _with(*_BASE, FACT_TXN_SQL)
    + _period_summary_sql("month", "to_wallet", "2024-02-01"),
    doc="monthly rollup of the to-account fine-grain mart",
)(_q(M.monthly_app_txn_summary_to_account))

_CREATES_GROUPED_SQL = """
SELECT c.date_key, c.app_id, c.{group_col} AS {out_name},
       CAST(COUNT(*) AS BIGINT) AS daily_transactions,
       CAST(SUM(COALESCE(c.balance_quark, 0)) AS BIGINT) AS daily_opening_balance_quark,
       {kin} AS daily_opening_balance_kin,
       ANY_VALUE(dka.name) AS app_name
FROM fact_kin_creations c LEFT JOIN dim_kin_app dka ON c.app_id = dka.id
GROUP BY 1, 2, 3
"""

register(
    "kin_daily_account_creates_by_type",
    _with(*_BASE, FACT_CREATIONS_SQL)
    + _CREATES_GROUPED_SQL.format(
        group_col="txn_type",
        out_name="transaction_type",
        kin=KIN("SUM(COALESCE(c.balance_quark, 0))"),
    ),
    doc="creates segmented by transaction type (daily_account_creates_by_type.sql:1-26)",
)(_q(M.daily_account_creates_by_type))

register(
    "kin_daily_account_creates_by_close_authority",
    _with(*_BASE, FACT_CREATIONS_SQL)
    + _CREATES_GROUPED_SQL.format(
        group_col="close_account_authority",
        out_name="close_authority",
        kin=KIN("SUM(COALESCE(c.balance_quark, 0))"),
    ),
    doc="creates segmented by close authority (…_by_close_authority.sql:1-26)",
)(_q(M.daily_account_creates_by_close_authority))

register(
    "kin_daily_account_creates_by_program",
    _with(*_BASE, FACT_CREATIONS_SQL)
    + _CREATES_GROUPED_SQL.format(
        group_col="program_id",
        out_name="program_id",
        kin=KIN("SUM(COALESCE(c.balance_quark, 0))"),
    ),
    doc="creates at (date, app, program) grain (daily_account_creates_by_program.sql:1-26)",
)(_q(M.daily_account_creates_by_program))

_API_SUMMARY_SQL = """
, api_creates AS (
  SELECT date_key{app_sel}, CAST(COUNT(*) AS BIGINT) AS accounts_created,
         CAST(SUM(fee_lamports + create_fee_lamports) AS BIGINT) AS cost_lamports
  FROM fact_kin_creations GROUP BY {groups}
)
SELECT c.date_key{app_out}, c.accounts_created,
       CAST(c.cost_lamports AS DOUBLE) / 1000000000.0 AS sol_cost,
       CAST(c.cost_lamports AS DOUBLE) * CAST(s.sol_price_cents AS DOUBLE) / 1e11 AS usd_cost
FROM api_creates c JOIN dim_solana_price s ON c.date_key = s.date_key
"""

register(
    "kin_daily_account_summary_by_app",
    _with(*_BASE, FACT_CREATIONS_SQL)
    + _API_SUMMARY_SQL.format(app_sel=", app_id", groups="1, 2", app_out=", c.app_id"),
    doc="API mart: accounts created + SOL/USD cost per app-day (⨝ dim_solana_price)",
)(_q(M.daily_account_summary_by_app))

register(
    "kin_daily_account_summary_ecosystem",
    _with(*_BASE, FACT_CREATIONS_SQL)
    + _API_SUMMARY_SQL.format(app_sel="", groups="1", app_out=""),
    doc="API mart: ecosystem-day accounts created + SOL/USD cost",
)(_q(M.daily_account_summary_ecosystem))
