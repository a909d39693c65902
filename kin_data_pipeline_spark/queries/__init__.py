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
ROUND = 7

# Round-7 window (VERDICT r6 ask #1, composed by scripts/compose_window.py):
# the 6 never-green r6-backlog queries lead (the two r6 stretch additions
# plus the 4 rename-only app-txn cadence rollups, all judge-pre-verified at
# sf0.01 in the r6 session), then the 10 queries whose last green row would
# hit the MAX_STALENESS=4 bound at round 7 (r2 greens), then padding
# oldest-green-first (r3 rows).
CURRENT_WINDOW_HEAD = [
    # --- 1..6: the r6 backlog, never driver-checked (contractual head)
    "progressive_jpeg_pixel_stats",  # SOF2 spectral-selection decode (r6 stretch)
    "bpe_apply_token_counts",  # columnar BPE tokenizer application (r6 stretch)
    "kin_app_txn_summary_from_account_weekly",
    "kin_app_txn_summary_from_account_monthly",
    "kin_app_txn_summary_to_account_weekly",
    "kin_app_txn_summary_to_account_monthly",
    # --- 7..16: stale-bound (last green r2; must re-verify this round)
    "kin_daily_account_creates_by_close_authority",
    "kin_daily_account_creates_by_program",
    "kin_daily_account_creates_by_type",
    "kin_daily_account_summary_by_app",
    "kin_daily_account_summary_ecosystem",
    "media_metadata_stats",
    "near_dup_clusters",
    "ngram_jaccard_capped",
    "streaming_daily_rollup",
    "trailing_7d_revenue",
    # --- 17..50: padding, oldest-green-first (r3 rows)
    "api_dim_seed",
    "api_timeseries_seed",
    "benchmark_decontamination",
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
    "knn_label_agreement",
    "local_supplier_revenue_q5",
    "media_decoded_stats",
    "monthly_priority_pivot",
    "near_dup_clusters_deep",
    "ngram_jaccard_near_dups",
    "order_value_deciles",
    "redaction_stats_props",
    "regex_token_stats",
    "region_segment_grouping_sets",
    "repeated_chunk_stats",
    "revenue_rollup_region_nation",
    "rolling_hash_fingerprints",
    "semantic_dedup_pairs",
    "semantic_dedup_survivor_stats",
    "shingle_containment_pairs",
    "shipping_priority_q3",
    "simhash_near_dups",
    "skew_distinct_users_by_event_type",
    "skew_salted_value_sum_by_type",
]

# Queries registered after the current window filled go here at registration
# time (test-enforced, round-agnostic rule in tests/test_registry_window.py)
# and must lead the next round's window. This round: the Delta-style
# time-travel query added after the round-7 window was composed.
NEXT_WINDOW_BACKLOG: list[str] = [
    "time_travel_orders_versions",  # versioned catalog reads (r7 stretch)
    "sa_progressive_jpeg_pixel_stats",  # full Annex G SA decode (r7 stretch)
    "time_travel_changes",  # CDF between versions (r7 stretch)
    "bpe_train_merges",  # iterative BPE merge training (r7 stretch)
    "sole_late_supplier_q21",  # EXISTS + NOT EXISTS chain, decorrelated
    "dominant_part_suppliers_q20",  # correlated half-of-total threshold
    "priority_late_orders_q4",  # correlated EXISTS as semi join + residual
    "top_supplier_revenue_q15",  # scalar-max view, ties kept
    "customer_order_distribution_q13",  # join-condition filter + count histogram
    "national_market_share_q8",  # conditional fraction of exact cent sums
    "returned_item_customers_q10",  # top-k over an aggregate, decimal sort key
    "late_shipment_priority_q12",  # date-inequality residual + CASE-pair counts
    "promo_revenue_share_q14",  # conditional fraction at decimal grain
    "large_volume_customers_q18",  # IN-(HAVING subquery) via broadcast agg
    "min_cost_part_suppliers_q2",  # correlated per-group MIN, ties kept
    "part_supplier_counts_q16",  # NOT IN blocklist + distinct counts
    "nation_profit_q9",  # revenue-minus-cost decimal expression, LIKE filter
    "important_part_values_q11",  # global-aggregate HAVING threshold
    "time_travel_restore",  # RESTORE VERSION AS OF over the versioned catalog
    "kmeans_cluster_profile",  # distributed Lloyd k-means, integer-exact oracle
    "ycbcr420_jpeg_pixel_stats",  # 4:2:0 chroma-subsampled color JPEG decode
    "streaming_table_changes",  # streaming CDF via custom Python Data Source
    "length_distribution_ks",  # exact two-sample KS drift per source
    "time_travel_as_of_timestamps",  # TIMESTAMP AS OF floor-resolution reads
]

def _ordered() -> dict[str, QuerySpec]:
    out = {n: QUERIES[n] for n in CURRENT_WINDOW_HEAD if n in QUERIES}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out

def queries():
    return {name: spec.fn for name, spec in _ordered().items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
