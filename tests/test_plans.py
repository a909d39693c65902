"""Physical-plan assertions: the properties that keep these queries fast at
100 TB must hold in the compiled plan, not just in intent — filter/column
pushdown into the parquet scan, broadcast joins for dims, and no cartesian
products anywhere in the registered inventory."""

from __future__ import annotations

import pytest

from kin_data_pipeline_spark.queries import QUERIES

def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()

def test_date_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1][:300]
    assert "l_shipdate" in pushed, f"shipdate filter not pushed: {pushed}"

def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "daily_order_revenue")
    # only the two needed columns should be read
    read = plan.split("ReadSchema:", 1)[1][:200]
    assert "o_orderdate" in read and "o_totalprice" in read
    assert "o_orderpriority" not in read and "o_custkey" not in read

def test_dim_joins_broadcast(spark, sf_dir):
    for q in ("revenue_by_region", "top_customers_per_nation"):
        plan = _plan(spark, sf_dir, q)
        assert "BroadcastHashJoin" in plan, q
        assert "SortMergeJoin" not in plan, f"{q} fell back to sort-merge"

# The only registered plans allowed a BroadcastNestedLoopJoin: each is a
# LINEAR corpus scan against a broadcast small side (IVF centroid table,
# brute-force top-k query set) — the documented ANN shapes. Anything else
# showing a BNLJ or CartesianProduct is a scale bug.
ALLOWED_BNLJ = {
    "embedding_ivf_ann_top5",  # corpus × broadcast centroids (K ≈ √N)
    "embedding_knn_top5",  # corpus × broadcast query set (baseline)
    "knn_label_agreement",  # corpus × broadcast query set (baseline)
    "semantic_dedup_pairs",  # corpus × broadcast centroids (cell assignment)
    "semantic_dedup_survivor_stats",  # same cell assignment underneath
    "embedding_cell_outliers",  # corpus × broadcast centroids (cell assignment)
    "ivf_recall_audit",  # composes the two exempted ANN paths above
    "bm25_doc_scores",  # |Q|-row term frame × 1-row corpus-stats frame
    "acctbal_opportunity_q22",  # scalar subquery: 1-row threshold × customers
    "important_part_values_q11",  # 1-row global total × per-part values
    "ps_important_stock_q11",  # 1-row global total × per-part stock values
    "length_distribution_ks",  # |sources| × |distinct lengths| spine + 1-row N
    # (top_supplier_revenue_q15 needs no exemption: its scalar-max filter
    # is an EQUALITY, which Catalyst pushes into the cross join as a
    # BroadcastHashJoin condition — only inequality thresholds like Q22's
    # compile to BNLJ)
    "pq_compression_audit",  # query set × 64-row codebook LUT (both bounded)
    "hard_negative_candidates",  # corpus × broadcast query set (knn shape)
}

# Global (unpartitioned) windows single-partition-sort their input — fine
# only when the input is bounded by construction. Every entry documents the
# bound; anything else showing a global windowspec is a scale bug (the class
# that made shipping_priority_q3 / term_document_frequency rank-then-filter
# over unbounded frames until round 4 rewrote them as TakeOrdered + rank).
ALLOWED_GLOBAL_WINDOW = {
    "bpe_pair_frequencies",  # rank over the k rows TakeOrdered selected
    "shipping_priority_q3",  # rank over the 10 rows TakeOrdered selected
    "term_document_frequency",  # rank over the 20 rows TakeOrdered selected
    "weighted_doc_sample_top50",  # rank over the 50 sampled rows
    "day_over_day_revenue",  # lag over the daily series (calendar-bounded)
    "trailing_7d_revenue",  # RANGE frame over the daily series
    "dsir_log_importance_scores",  # 4096-bucket hashed model (bounded)
    "source_temperature_weights",  # per-source frame (|sources| rows)
}

def _global_window_specs(plan: str) -> list[str]:
    """windowspecdefinition(...) entries with no partition column: every
    argument before the frame spec carries a sort direction (or the spec is
    entirely empty)."""
    import re

    out = []
    for m in re.finditer(
        r"windowspecdefinition\(([^()]*(?:\([^()]*\))?[^()]*?)specifiedwindowframe",
        plan,
    ):
        head = m.group(1).strip().rstrip(",").strip()
        parts = [p.strip() for p in head.split(",") if p.strip()]
        if not parts or all((" ASC" in p or " DESC" in p) for p in parts):
            out.append(head[:80] or "<empty spec>")
    return out

def test_no_cartesian_nested_loop_or_global_window_anywhere(spark, sf_dir):
    cartesian, bnlj, gwin = [], [], []
    seen_gwin = set()
    for name in sorted(QUERIES):
        plan = _plan(spark, sf_dir, name)
        if "CartesianProduct" in plan:
            cartesian.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOWED_BNLJ:
            bnlj.append(name)
        if _global_window_specs(plan):
            seen_gwin.add(name)
            if name not in ALLOWED_GLOBAL_WINDOW:
                gwin.append(name)
    assert not cartesian, f"cartesian products in: {cartesian}"
    assert not bnlj, f"undocumented nested-loop joins in: {bnlj}"
    assert not gwin, f"undocumented GLOBAL windows in: {gwin}"
    # anti-rot: the exemption list must not outlive the windows it excuses
    stale = sorted(ALLOWED_GLOBAL_WINDOW - seen_gwin)
    assert not stale, f"global-window exemptions no longer needed: {stale}"

def test_allowed_bnlj_list_is_current(spark, sf_dir):
    # The exemption list must not rot: every exempted query still exists
    # and still relies on the broadcast nested-loop shape.
    for name in ALLOWED_BNLJ:
        assert name in QUERIES, f"{name} exempted but not registered"
        assert "BroadcastNestedLoopJoin" in _plan(spark, sf_dir, name), name

def test_heavy_hitters_take_ordered_not_global_sort(spark, sf_dir):
    # Corpus-wide top-k must compile to TakeOrderedAndProject (per-partition
    # heaps + a k-row driver merge), never a full sort shuffle of the
    # shingle-frequency table.
    plan = _plan(spark, sf_dir, "top_shingle_heavy_hitters")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan

def test_segmented_agg_is_single_pass(spark, sf_dir):
    # A9 fusion: one aggregate over events, not four joined subqueries
    plan = _plan(spark, sf_dir, "daily_event_segments")
    assert plan.count("Scan parquet") == 1

def test_whole_stage_codegen_active(spark, sf_dir):
    import contextlib
    import io

    df = QUERIES["pricing_summary"].fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    assert "WholeStageCodegen" in buf.getvalue()

def test_capped_jaccard_single_postings_pass(spark, sf_dir):
    # The grouped pair expansion must not re-derive the postings chain per
    # join side: at most one documents scan in the whole plan (zero when an
    # earlier query in the session already materialized the cached shingle
    # substrate — then the plan reads InMemoryTableScan instead).
    plan = _plan(spark, sf_dir, "ngram_jaccard_capped")
    # Everything under InMemoryRelation is the cached substrate's display-
    # only build plan; only scans above it actually execute in this query.
    live = plan.split("InMemoryRelation")[0]
    assert live.count("Scan parquet") <= 1
    assert live.count("Scan parquet") + live.count("InMemoryTableScan") >= 1

def test_embedding_near_dup_broadcast_reattach(spark, sf_dir):
    plan = _plan(spark, sf_dir, "embedding_cosine_near_dups")
    assert "BroadcastHashJoin" in plan  # embedding re-attach after pair dedup
    assert "CartesianProduct" not in plan

def test_grouped_pair_formers_single_chain_traversal(spark, sf_dir):
    # Every banded pair-former (simhash, minhash-LSH, embedding sign-LSH)
    # forms candidates via grouped bucket-list expansion, so the expensive
    # chain above it (tokenize/signature/hyperplane hashing) appears ONCE:
    # no join of two copies of the same source scan before the verify step.
    for name, source in (
        ("simhash_near_dups", "documents"),
        ("minhash_lsh_candidates", "documents"),
    ):
        plan = _plan(spark, sf_dir, name)
        live = plan.split("InMemoryRelation")[0]
        n_scans = live.count("Scan parquet")
        assert n_scans <= 1, f"{name}: {n_scans} live scans of {source}"

def test_packing_prefix_sum_shards_by_source(spark, sf_dir):
    # Concat-and-chunk packing must not force a global single-partition
    # sort: the prefix sum shards on source (one hash exchange, no range
    # partitioning / SinglePartition anywhere).
    plan = _plan(spark, sf_dir, "sequence_packing_index")
    assert "hashpartitioning(source" in plan
    assert "SinglePartition" not in plan and "rangepartitioning" not in plan

def test_source_cap_uses_group_limit_pushdown(spark, sf_dir):
    # rank<=cap compiles to WindowGroupLimit partial+final: each map task
    # pre-trims to the cap before the shuffle, so the exchange carries at
    # most cap rows per (source, task), not the corpus.
    plan = _plan(spark, sf_dir, "source_cap_sample")
    assert plan.count("WindowGroupLimit") >= 2
    assert "SinglePartition" not in plan

def test_redaction_stats_partial_aggregates(spark, sf_dir):
    # Scrubbing stats: regex work happens once per row map-side; only
    # per-group partial sums cross the exchange, and the scan reads just
    # (group, text) columns.
    plan = _plan(spark, sf_dir, "redaction_stats_props")
    assert plan.count("Scan parquet") == 1
    assert "partial_count" in plan or "partial_sum" in plan
    read = plan.split("ReadSchema:", 1)[1][:200]
    assert "props" in read and "value" not in read


def test_full_outer_daily_aggregates_before_join(spark, sf_dir):
    # both event streams reduce to per-(user, day) counts BEFORE the full
    # outer join — the join carries two aggregated frames, never raw events
    plan = _plan(spark, sf_dir, "purchase_view_full_outer_daily")
    assert "FullOuter" in plan
    assert plan.count("Scan parquet") == 2
    join_pos = plan.index("FullOuter")
    # each side shows a partial aggregate below the join
    assert plan[join_pos:].count("HashAggregate") >= 2


def test_set_ops_compile_to_semi_and_counted_difference(spark, sf_dir):
    # INTERSECT -> null-safe left-semi join; EXCEPT ALL -> the counted-
    # difference form (sum of +1/-1 multiplicities + replicaterows), both
    # linear-shuffle shapes — never a cartesian expansion
    plan = _plan(spark, sf_dir, "customer_order_lifecycle_sets")
    assert "LeftSemi" in plan
    assert "replicaterows" in plan.lower()


def test_rolling_frame_single_window_single_exchange(spark, sf_dir):
    # the bounded ROWS frame + row_number fuse into ONE window operator
    # over ONE hash exchange on the partition key — no global sort
    plan = _plan(spark, sf_dir, "customer_rolling_order_stats")
    assert plan.count("Window ") == 1
    assert plan.count("Exchange ") == 1
    assert "rangepartitioning" not in plan


def test_q17_part_dim_broadcasts(spark, sf_dir):
    # the filtered part dim must reach the lineitem probe as a broadcast
    # hash join (the per-part aggregate side is AQE's choice — broadcast
    # here, co-partitioned shuffle at scale)
    plan = _plan(spark, sf_dir, "small_quantity_revenue_q17")
    broadcast_lines = [
        line for line in plan.splitlines()
        if "BroadcastHashJoin" in line and "p_partkey" in line
    ]
    assert broadcast_lines, "part dim fell out of the broadcast join"


def test_video_pipeline_one_scan_three_arrow_stages(spark, sf_dir):
    # synthesize -> header parse -> sampled decode is three Arrow-batched
    # stages over ONE scan of the id column, spread across the session's
    # parallelism before the codec work (the single-row-group guard)
    plan = _plan(spark, sf_dir, "video_frame_stats")
    assert plan.count("MapInPandas") == 3
    assert plan.count("Scan parquet") == 1
    assert "RoundRobinPartitioning" in plan
