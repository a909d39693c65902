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
ROUND = 9

# Round-9 window (VERDICT r8 ask #1, composed by scripts/compose_window.py):
# the 10 never-green r8 additions lead (judge-pre-verified 10/10 at sf0.01 in
# the r8 session: 5 unadapted partsupp TPC-H shapes, progressive/multi-scan
# 4:2:0 JPEG profiles, and the 3 CDF-driven incremental-view-maintenance
# queries), then padding oldest-green-first (r4/r5 rows).
CURRENT_WINDOW_HEAD = [
    "ps_min_cost_supplier_q2",
    "ps_nation_profit_q9",
    "ps_important_stock_q11",
    "ps_excess_stock_suppliers_q20",
    "progressive_ycbcr420_jpeg_pixel_stats",
    "cdf_incremental_aggregate",
    "streaming_incremental_aggregate",
    "ps_part_supplier_counts_q16",
    "cdf_incremental_distinct_count",
    "multiscan_ycbcr420_jpeg_pixel_stats",
    "monthly_order_revenue",
    "multi_item_orders",
    "per_domain_quality_profile",
    "pricing_summary",
    "revenue_by_region",
    "sequence_packing_index",
    "source_vocab_overlap",
    "top_customers_per_nation",
    "top_shingle_heavy_hitters",
    "user_day_purchase_vs_activity",
    "weekly_order_revenue",
    "acctbal_opportunity_q22",
    "approx_daily_active_users",
    "approx_length_percentiles",
    "bm25_doc_scores",
    "bpe_pair_frequencies",
    "cdc_chunk_dedup_stats",
    "closing_value_per_user_day",
    "countmin_token_estimates",
    "customers_without_orders",
    "daily_active_users",
    "disjunctive_predicate_revenue_q19",
    "doc_quality_scores",
    "dsir_log_importance_scores",
    "embedding_knn_top5",
    "exact_dedup_docs",
    "gapfill_locf_interpolate",
    "hard_negative_candidates",
    "hashed_bigram_logprob",
    "hashed_token_rarity_scores",
    "hll_user_rollup_weekly",
    "ivf_recall_audit",
    "lang_stopword_profile",
    "latest_event_per_user",
    "levenshtein_near_dup_verify",
    "median_value_by_type",
    "minhash_estimate_audit",
    "minhash_lsh_candidates",
    "monthly_revenue_volatility",
    "nation_pair_trade_q7",
]

# Queries registered after the current window filled go here at registration
# time (test-enforced, round-agnostic rule in tests/test_registry_window.py)
# and must lead the next round's window.
NEXT_WINDOW_BACKLOG: list[str] = [
    "cdf_incremental_minmax",  # hybrid MIN/MAX IVM, rebuild branch exercised
    "runner_ivm_status_rollup",  # Runner IVM strategy + distinct support
    "runner_stream_ivm_extrema",  # stream-triggered IVM, minmax + derived
]

def _ordered() -> dict[str, QuerySpec]:
    out = {n: QUERIES[n] for n in CURRENT_WINDOW_HEAD if n in QUERIES}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out

def queries():
    return {name: spec.fn for name, spec in _ordered().items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
