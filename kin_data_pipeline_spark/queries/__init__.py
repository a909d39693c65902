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

# The external correctness gate verifies only the FIRST 50 registry entries,
# so ordering is a coverage decision. Round-3 window goal: every registered
# query has a green driver row in at least one round. Rounds 1+2 covered the
# whole kin chain (45 green r02 rows) plus the r1 representatives, so this
# round's head is:
#   1..5   the queries added latest in round 3 (training-shard manifest +
#          the web-corpus filtering tier) — they displaced the kin
#          representatives of the earlier draft, which all hold green r02
#          rows and stay covered by the local parity suite
#   6..50  the 30 queries that had never had a driver CORRECTNESS row
#          (curation tier, 4 streaming tiers, API sources, embedding/
#          simhash near-dups, text analysis, TPC-H-ish extended) plus this
#          round's 8 new-or-changed entries: the now-capped
#          ngram_jaccard_near_dups, media_decoded_stats (real header
#          decode), near_dup_clusters_deep (star contraction), the two
#          skew-tier salted rewrites, the SemDeDup tier
#          (semantic_dedup_pairs / semantic_dedup_survivor_stats), and the
#          bounded-state streaming dedup
#          (streaming_dedup_within_watermark), the round-3 relational
#          breadth additions (region_segment_grouping_sets,
#          local_supplier_revenue_q5, order_value_deciles), and the
#          asymmetric containment dedup tier (shingle_containment_pairs) and
#          per-source token-budget selection (token_budget_selection) and
#          winnowing (MOSS) fingerprints (winnowing_fingerprints) and the
#          fused one-pass column profiler (events_column_profile).
# Everything after slot 50 passed driver verification in r1/r2 and is
# re-checked continuously by the local parity suite
# (tests/test_oracle_parity.py), which applies the identical comparison at
# sf0.001/sf0.01/sf0.1.
ROUND3_WINDOW_HEAD = [
    # The five kin representatives of the earlier round-3 draft (all green
    # in r02) yielded their slots to queries added later in the round —
    # every NEW query must enter the window or it never earns a driver
    # row, while the kin chain keeps its r01/r02 rows and the local parity
    # suite re-checks it continuously.
    "training_shard_manifest",
    # web-corpus filtering tier (new this round)
    "url_domain_filter_stats",
    "token_rarity_scores",
    "repeated_chunk_stats",
    "dedup_keep_best_survivors",
    # text/dedup tier (shingle substrate warms once, reused downstream)
    "ngram_jaccard_near_dups",
    "shingle_containment_pairs",
    "doc_length_percentiles",
    "regex_token_stats",
    "rolling_hash_fingerprints",
    "winnowing_fingerprints",
    "gopher_quality_flags",
    "doc_repetition_profile",
    "simhash_near_dups",
    "near_dup_clusters_deep",
    "dedup_survivor_stats",
    # embedding tier
    "embedding_cosine_near_dups",
    "embedding_ivf_ann_top5",
    "knn_label_agreement",
    "semantic_dedup_pairs",
    "semantic_dedup_survivor_stats",
    # curation tier
    "curated_corpus_stats",
    "benchmark_decontamination",
    "stratified_sample_split",
    "redaction_stats_props",
    "sequence_packing_index",
    "source_cap_sample",
    "source_mix_resample",
    "token_budget_selection",
    "incremental_dedup_check",
    # multimodal
    "media_decoded_stats",
    "frame_sample_plan_stats",
    # skew tier
    "skew_distinct_users_by_event_type",
    "skew_salted_value_sum_by_type",
    "events_column_profile",
    # sources
    "api_dim_seed",
    "api_timeseries_seed",
    # extended/TPC-H-ish + sessionization + sketch
    "revenue_rollup_region_nation",
    "region_segment_grouping_sets",
    "local_supplier_revenue_q5",
    "order_value_deciles",
    "shipping_priority_q3",
    "monthly_priority_pivot",
    "user_sessions_batch",
    "approx_daily_active_users",
    # streaming tiers (engine overhead amortizes at the tail)
    "streaming_running_balance",
    "streaming_user_sessions",
    "streaming_feed_dedup",
    "streaming_dedup_within_watermark",
    "streaming_purchase_view_join",
]

# Queries registered AFTER the round-3 window filled its 50 slots: they are
# verified by the local parity suite at sf0.001/0.01/0.1 this round and are
# the designated head of the ROUND-4 driver window (the same rotation
# discipline that gave every round-2 addition its row this round). The
# window-invariant test pins that this backlog is exactly the set of
# registered queries with no prior driver row and no round-3 slot — no
# query ever falls through the rotation untracked.
#
# Round-4 window recipe: this backlog first, then any round-4 additions,
# then pad to 50 with kin representatives (facts first, so the session
# frame cache warms in the order the chain reads it) — see the r3 head
# below for the pattern.
ROUND4_WINDOW_BACKLOG = [
    "top_shingle_heavy_hitters",
    "cross_source_dup_matrix",
    "embedding_cell_outliers",
    "per_domain_quality_profile",
    "line_dedup_retention",
    "hll_user_rollup_weekly",
    "approx_length_percentiles",
    "streaming_approx_daily_users",
    "dsir_importance_scores",
    "source_vocab_overlap",
]

def _ordered() -> dict[str, QuerySpec]:
    out = {n: QUERIES[n] for n in ROUND3_WINDOW_HEAD if n in QUERIES}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out

def queries():
    return {name: spec.fn for name, spec in _ordered().items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
