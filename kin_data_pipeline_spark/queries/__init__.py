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
import kin_data_pipeline_spark.queries.tpch_partsupp  # noqa: F401,E402

# The external correctness gate verifies only the FIRST 50 registry entries,
# so ordering is a coverage decision. The manifests are round-agnostic
# (VERDICT r4 ask #5): bump ROUND and recompose CURRENT_WINDOW_HEAD /
# NEXT_WINDOW_BACKLOG each round — the invariants in
# tests/test_registry_window.py key off CORRECTNESS-file discovery, so the
# round prep is a data change only.
ROUND = 11

# Round-11 window (recomposed after the optimization-round engine work
# re-planned 5 queries — 4 CDF/time-travel read shapes plus the kmeans
# literal-centroid assignment — PLAN_MANIFEST since=11 discounts their old
# green rows): all 11 never-green queries lead (the 3 r10-backlog entries,
# the 3 r11 IVM additions, and the 5 re-planned), then padding
# oldest-green-first per scripts/compose_window.py.
CURRENT_WINDOW_HEAD = [
    "cdf_incremental_aggregate",
    "cdf_incremental_distinct_count",
    "cdf_incremental_minmax",
    "kmeans_cluster_profile",
    "restart_jpeg_pixel_stats",
    "runner_ivm_hll_distinct_rollup",
    "runner_kin_actives_ivm_30d",
    "runner_kin_dag_ivm_mart",
    "runner_stream_union_ivm_rollup",
    "runner_union_ivm_net_rollup",
    "time_travel_changes",
    "kin_kre_weekly_payout",
    "kin_monthly_active_accounts_app",
    "kin_monthly_active_accounts_ecosystem",
    "kin_monthly_inactive_wallets",
    "kin_monthly_transactions",
    "kin_multi_create_impacted",
    "kin_transactions_curated",
    "kin_weekly_active_accounts_app",
    "kin_weekly_active_accounts_ecosystem",
    "kin_weekly_payout_summary",
    "kin_weekly_transactions",
    "language_id_confusion",
    "minhash_signatures",
    "part_shipment_churn_90d",
    "props_json_stats",
    "purchase_or_click_users",
    "purchase_view_full_outer_daily",
    "returnflag_normalized",
    "signup_purchase_funnel",
    "simhash_signatures",
    "small_quantity_revenue_q17",
    "term_document_frequency",
    "token_counts_by_source",
    "video_frame_stats",
    "api_dim_seed",
    "api_timeseries_seed",
    "benchmark_decontamination",
    "bpe_apply_token_counts",
    "curated_corpus_stats",
    "dedup_keep_best_survivors",
    "dedup_survivor_stats",
    "doc_length_percentiles",
    "doc_repetition_profile",
    "embedding_cosine_near_dups",
    "embedding_ivf_ann_top5",
    "events_column_profile",
    "frame_sample_plan_stats",
    "gopher_quality_flags",
    "incremental_dedup_check",
]

# Queries registered after the current window filled go here at registration
# time (test-enforced, round-agnostic rule in tests/test_registry_window.py)
# and must lead the next round's window. Empty: the recomposed r11 window
# absorbed the 3 r11 additions alongside the 5 re-planned queries.
NEXT_WINDOW_BACKLOG: list[str] = []

def _ordered() -> dict[str, QuerySpec]:
    out = {n: QUERIES[n] for n in CURRENT_WINDOW_HEAD if n in QUERIES}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out

def queries():
    return {name: spec.fn for name, spec in _ordered().items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
