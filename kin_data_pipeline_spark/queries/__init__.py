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
# so ordering is a coverage decision. Round-4 window goal: VERIFICATION
# CLOSURE — after this round, every one of the 149 registered queries has a
# green (or rows-green) driver row in some round. The head is composed as:
#   1..12  the 12 relational queries whose ONLY driver record is a round-1
#          hash-FAIL (fixed in round 2, locally green ever since, but the
#          driver's last word on them is FAIL — the rotation invariant used
#          to count those FAIL rows as "covered", which is why they never
#          rotated back; fixed this round, see tests/test_registry_window.py)
#   13     sequence_packing_index — the one red r3 row; the bug was
#          ORACLE-side (uncast DuckDB HUGEINT window sum -> decimal
#          terminal), fixed + guarded by tests/test_oracle_schema_guard.py
#   14..20 the 7 oracle-bearing ROUND4_WINDOW_BACKLOG queries (registered
#          after the r3 window filled)
#   21..23 the 3 rows-only sketch queries from the backlog (driver records
#          the weaker rows-check; estimates are pinned against exact twins
#          with published error bounds in tests/test_sketches.py)
#   24..50 27 kin-chain representatives, facts first so the session frame
#          cache warms in the order the chain reads it — cheap insurance
#          that the chain (last driver-checked in r2) still hash-matches
#          under the code that keeps evolving around it.
ROUND4_WINDOW_HEAD = [
    # r1-stale-red relational tier (fixed in r2, never re-windowed)
    "pricing_summary",
    "revenue_by_region",
    "daily_order_revenue",
    "weekly_order_revenue",
    "monthly_order_revenue",
    "day_over_day_revenue",
    "daily_event_segments",
    "entity_role_activity",
    "lineitems_of_big_orders",
    "multi_item_orders",
    "top_customers_per_nation",
    "user_day_purchase_vs_activity",
    # the one red r3 row (oracle-side decimal bug, fixed this round)
    "sequence_packing_index",
    # round-3 backlog: oracle-bearing
    "top_shingle_heavy_hitters",
    "cross_source_dup_matrix",
    "embedding_cell_outliers",
    "per_domain_quality_profile",
    "line_dedup_retention",
    "dsir_importance_scores",
    "source_vocab_overlap",
    # round-3 backlog: rows-only sketch tier
    "hll_user_rollup_weekly",
    "approx_length_percentiles",
    "streaming_approx_daily_users",
    # kin representatives, chain order (facts warm the frame cache first)
    "kin_fact_transactions",
    "kin_fact_creations",
    "kin_transactions_curated",
    "kin_daily_transactions",
    "kin_daily_counts_by_amount",
    "kin_closing_balance_per_day",
    "kin_daily_active_accounts_30d",
    "kin_daily_aub_by_app",
    "kin_daily_volatility_factor",
    "kin_daily_payout",
    "kin_weekly_payout_summary",
    "kin_gc_dust_wallets",
    "kin_multi_create_impacted",
    "kin_average_balance_per_day",
    "kin_daily_market_summary",
    "kin_daily_net_inflation",
    "kin_daily_creations_by_app",
    "kin_weekly_transactions",
    "kin_monthly_transactions",
    "kin_daily_blocks",
    "kin_daily_kre_summary",
    "kin_daily_churn_volume",
    "kin_daily_active_accounts_ecosystem",
    "kin_daily_summary_by_app",
    "kin_monthly_inactive_wallets",
    "kin_account_balance_buckets",
    "kin_daily_create_fee_payers",
]

# Queries registered after the round-4 window filled go here at registration
# time (test-enforced, round-agnostic rule in tests/test_registry_window.py)
# and must lead the round-5 window.
ROUND5_WINDOW_BACKLOG: list[str] = [
    # round-4 additions (registered after the r4 window filled with the
    # verification-closure set):
    "hashed_token_rarity_scores",   # bounded-vocab CCNet scoring
    "dsir_log_importance_scores",   # faithful DSIR log-ratio weights
    "png_pixel_stats",              # stdlib pixel-level PNG decode round trip
    "scd2_user_event_type_history",  # warehouse SCD2 interval build
    "streaming_static_enrichment_join",  # §2.9 tier 7: stream-static dim join
    "ngram_jaccard_prefix_filtered",  # EXACT Jaccard, AllPairs/PPJoin pruned
    "scd2_point_in_time_enrichment",  # PIT join against the SCD2 history
    "source_temperature_weights",  # alpha-temperature source mixing weights
    "cdc_chunk_dedup_stats",  # content-defined chunking dedup stats
    "hashed_bigram_logprob",  # bounded-model bigram-LM sequence quality
    "bm25_doc_scores",  # inverted-index BM25 retrieval scoring
    "ivf_recall_audit",  # recall@5 of IVF ANN vs brute-force exact
    "minhash_estimate_audit",  # signature agreement vs exact Jaccard
    "near_dup_pagerank_3iter",  # integer PageRank over the LSH graph
    "wav_sample_stats",  # sample-level WAV PCM decode round trip
    "streaming_purchase_view_left_join",  # stream-stream LEFT OUTER join
    "nation_pair_trade_q7",  # double-alias dim join, pair predicate
    "disjunctive_predicate_revenue_q19",  # OR-of-conjuncts predicate
    "acctbal_opportunity_q22",  # scalar-subquery threshold + anti join
    "countmin_token_estimates",  # oracle-exact count-min sketch + audit
    "bpe_pair_frequencies",  # BPE tokenizer-training pair counting pass
    "priority_status_cube",  # CUBE subtotal lattice (A10 superset)
    "levenshtein_near_dup_verify",  # character-grain edit-distance verify
    "pq_compression_audit",  # product-quantization LUT ranking + exact audit
    "gapfill_locf_interpolate",  # hypertable gap-fill: LOCF + linear interp
    "rolling_zscore_anomalies",  # trailing 7d integer-exact |z|>2 flags
    "hard_negative_candidates",  # contrastive-training cross-label top-k
    "weekly_retention_cohorts",  # first-purchase cohort retention matrix
    "weighted_doc_sample_top50",  # deterministic priority (weighted) sampling
    "time_weighted_avg_per_user",  # TWAP: duration-weighted series average
]

def _ordered() -> dict[str, QuerySpec]:
    out = {n: QUERIES[n] for n in ROUND4_WINDOW_HEAD if n in QUERIES}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out

def queries():
    return {name: spec.fn for name, spec in _ordered().items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
