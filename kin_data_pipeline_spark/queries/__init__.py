"""Query registry: every implemented operator exposed as a (Spark, oracle-SQL)
pair over the driver testdata tables.

Each entry maps a SURVEY.md §2 operator (or a beyond-reference LLM-pipeline
operator) to:
- a callable ``(spark, sf_dir) -> DataFrame`` built on the engine's
  operator/function modules, and
- an ANSI-SQL oracle string DuckDB runs on the same parquet tables.

Column names and final types are aligned on both sides (the driver's compare
sorts columns by name and value-hashes them). Aggregates over doubles are
cast to DECIMAL before summing so results are exact and order-independent
under Spark's parallel aggregation.
"""

from __future__ import annotations

from kin_data_pipeline_spark.queries.registry import QUERIES, QuerySpec, register  # noqa: F401
import kin_data_pipeline_spark.queries.relational  # noqa: F401,E402
import kin_data_pipeline_spark.queries.llmops  # noqa: F401,E402
import kin_data_pipeline_spark.queries.kin_models  # noqa: F401,E402
import kin_data_pipeline_spark.queries.extended  # noqa: F401,E402
import kin_data_pipeline_spark.queries.curation  # noqa: F401,E402
import kin_data_pipeline_spark.queries.filtering  # noqa: F401,E402
import kin_data_pipeline_spark.queries.retrieval  # noqa: F401,E402
import kin_data_pipeline_spark.queries.timeseries  # noqa: F401,E402

# The external correctness gate verifies only the FIRST 50 registry entries,
# so ordering is a coverage decision. The manifests are round-agnostic
# (VERDICT r4 ask #5): bump ROUND and recompose CURRENT_WINDOW_HEAD /
# NEXT_WINDOW_BACKLOG each round — the invariants in
# tests/test_registry_window.py key off CORRECTNESS-file discovery, so the
# round prep is a data change only.
ROUND = 6

# Round-6 window (VERDICT r5 asks #1 + #3): the round-6 fidelity pass
# re-read every remaining reference model clause-by-clause and re-ported
# the drifted ones (closing-balance NULL→0 + priority tiers, wallet-grain
# churn, payout−Δbalance−churn net inflation, avg-of-role-avgs balance,
# (date,app,fee_payer) fee costs, ever-zeroed multi-create output, curated
# projection, counts-by-amount ranges, blocks/app-summary contracts).
# PLAN_MANIFEST.json advanced `since` to 6 for the 37 fingerprint-changed
# kin queries, so they are all effectively never-green and lead the
# window: the 6 r5-backlog media/relational queries first, then the 33
# value- or contract-changed kin queries (the 4 weekly/monthly app-txn
# rollups — rename-only rollups of re-verified daily marts — wait in
# NEXT_WINDOW_BACKLOG), then the 11 r1-green queries at the staleness
# bound.
CURRENT_WINDOW_HEAD = [
    # --- 1..6: the r5 backlog, never driver-checked (contractual head)
    "jpeg_pixel_stats",  # baseline-JPEG entropy decode round trip
    "video_frame_stats",  # AVI-MJPG container + sampled-frame decode
    "purchase_view_full_outer_daily",  # full outer join, key coalescing
    "customer_order_lifecycle_sets",  # INTERSECT/EXCEPT lifecycle segments
    "customer_rolling_order_stats",  # bounded sliding ROWS frame
    "small_quantity_revenue_q17",  # TPC-H Q17 decorrelated-average shape
    # --- 7..15: the KRE/AUB chain (reworked in r5 post-green, values
    #     shifted again by the r6 closing-balance fidelity fix)
    "kin_daily_aub_by_app",
    "kin_daily_payout",
    "kin_weekly_payout_summary",
    "kin_daily_kre_summary",
    "kin_kre_weekly_payout",
    "kin_weekly_transactions",
    "kin_monthly_transactions",
    "kin_multi_create_impacted",
    "kin_daily_counts_by_amount",
    # --- 16..39: the remaining round-6 fidelity-pass queries (since = 6)
    "kin_closing_balance_per_day",
    "kin_average_balance_per_day",
    "kin_daily_churn_volume",
    "kin_daily_net_inflation",
    "kin_daily_create_fee_payers",
    "kin_transactions_curated",
    "kin_daily_blocks",
    "kin_daily_market_summary",
    "kin_account_balance_buckets",
    "kin_gc_dust_wallets",
    "kin_monthly_inactive_wallets",
    "kin_fact_transactions",
    "kin_daily_transactions",
    "kin_daily_active_accounts_30d",
    "kin_daily_active_accounts_app",
    "kin_daily_active_accounts_ecosystem",
    "kin_weekly_active_accounts_app",
    "kin_weekly_active_accounts_ecosystem",
    "kin_monthly_active_accounts_app",
    "kin_monthly_active_accounts_ecosystem",
    "kin_daily_summary_by_app",
    "kin_daily_summary_ecosystem",
    "kin_app_txn_summary_from_account_daily",
    "kin_app_txn_summary_to_account_daily",
    # --- 40..50: the 11 queries last green in r1 (staleness bound hit)
    "embedding_lsh_ann_top5",
    "language_id_confusion",
    "minhash_signatures",
    "part_shipment_churn_90d",
    "props_json_stats",
    "purchase_or_click_users",
    "returnflag_normalized",
    "signup_purchase_funnel",
    "simhash_signatures",
    "term_document_frequency",
    "token_counts_by_source",
]

# Queries registered after the current window filled go here at registration
# time (test-enforced, round-agnostic rule in tests/test_registry_window.py)
# and must lead the next round's window. This round: the 4 cadence rollups
# of the re-verified daily app-txn marts — their round-6 change is the
# reference column contract (date_key/transaction_count/amount/app_name),
# not the aggregation, and the window is full.
NEXT_WINDOW_BACKLOG: list[str] = [
    "progressive_jpeg_pixel_stats",  # SOF2 spectral-selection decode (r6 stretch)
    "bpe_apply_token_counts",  # columnar BPE tokenizer application (r6 stretch)
    "kin_app_txn_summary_from_account_weekly",
    "kin_app_txn_summary_from_account_monthly",
    "kin_app_txn_summary_to_account_weekly",
    "kin_app_txn_summary_to_account_monthly",
]

def _ordered() -> dict[str, QuerySpec]:
    out = {n: QUERIES[n] for n in CURRENT_WINDOW_HEAD if n in QUERIES}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out

def queries():
    return {name: spec.fn for name, spec in _ordered().items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
