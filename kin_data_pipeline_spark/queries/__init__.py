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
ROUND = 5

# Round-5 window goal (VERDICT r4 ask #1): FULL verification closure — the
# 30 queries registered after the r4 window filled (the declared r5 backlog,
# all pre-verified at sf0.01) lead; then the 4 sketch queries, reworked this
# round to emit exact-value + within-error-bound integer terminals so the
# driver can finally hash-check them (ask #2, they replace their permanent
# `err: no_oracle` rows); then 16 of the 27 queries whose last green driver
# row is round 1 — the true oldest tier (the freshness padding of ask #6;
# the remaining 11 r1 + the r2 kin long-tail are the round-6 padding pool,
# forced by the max-staleness invariant).
CURRENT_WINDOW_HEAD = [
    # --- 1..30: the round-4 additions, never driver-checked (contractual head)
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
    # --- 31..34: the sketch tier, now oracle-bearing (exact + within_bound
    #     terminals) — their prior driver rows were rows-only `no_oracle`
    "hll_user_rollup_weekly",
    "approx_length_percentiles",
    "streaming_approx_daily_users",
    "approx_daily_active_users",
    # --- 35..50: freshness padding — 16 of the 27 queries last green in r1
    "closing_value_per_user_day",
    "customers_without_orders",
    "daily_active_users",
    "doc_quality_scores",
    "embedding_knn_top5",
    "exact_dedup_docs",
    "lang_stopword_profile",
    "latest_event_per_user",
    "median_value_by_type",
    "minhash_lsh_candidates",
    "monthly_revenue_volatility",
    "order_value_buckets",
    "orders_high_watermark",
    "purchase_with_last_view",
    "trailing_7d_active_users",
    "weekly_top3_buyers_json",
]

# Queries registered after the current window filled go here at registration
# time (test-enforced, round-agnostic rule in tests/test_registry_window.py)
# and must lead the next round's window.
NEXT_WINDOW_BACKLOG: list[str] = [
    "jpeg_pixel_stats",  # baseline-JPEG entropy decode round trip (r5 stretch)
    "purchase_view_full_outer_daily",  # full outer join, key coalescing
    "customer_order_lifecycle_sets",  # INTERSECT/EXCEPT lifecycle segments
    "customer_rolling_order_stats",  # bounded sliding ROWS frame
    "small_quantity_revenue_q17",  # TPC-H Q17 decorrelated-average shape
    "video_frame_stats",  # AVI-MJPG container + sampled-frame decode
]

def _ordered() -> dict[str, QuerySpec]:
    out = {n: QUERIES[n] for n in CURRENT_WINDOW_HEAD if n in QUERIES}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out

def queries():
    return {name: spec.fn for name, spec in _ordered().items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
