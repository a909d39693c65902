"""Skew-handling operators for hot keys (SURVEY.md §4 partitioning notes).

AQE's skew-join splitting covers joins automatically; these helpers cover
the aggregation side, where one hot key (a zipf-headed wallet, the NULL/0
app bucket) funnels an entire partition through one task:

- ``salted_agg``       — two-phase aggregation: salt the key, partial-agg
  per (key, salt), then merge. Works for any algebraic aggregate
  (sum/count/min/max); pass the merge expressions explicitly.
- ``salted_count_distinct`` — exact distinct counts under skew: dedup at
  (key, salt, value) grain first (the heavy shuffle spreads over salts),
  then count the deduped stream.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def with_salt(df: DataFrame, n_salts: int, salt_col: str = "__salt") -> DataFrame:
    """Uniform random salt (sprayed row placement, not key semantics)."""
    return df.withColumn(salt_col, (F.rand(seed=42) * n_salts).cast("int"))

def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs``: name → aggregate over raw rows (per key+salt).
    ``merge_aggs``:   name → aggregate over the partial columns (per key).
    Example: sum → partial {s: sum(x)}, merge {s: sum(s)}.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(name) for name, expr in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in merge_aggs.items()]
    )

def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    distinct_col: str,
    out_col: str = "n_distinct",
    n_salts: int = 16,
) -> DataFrame:
    """Exact COUNT(DISTINCT x) under key skew.

    Phase 1 dedups (key, salt(value), value) — the expensive shuffle is
    spread across salts derived from the VALUE (same value → same salt, so
    dedup stays correct). Phase 2 counts the now-distinct stream per key.
    """
    salted = df.select(
        *keys,
        F.col(distinct_col).alias("__v"),
        (F.xxhash64(distinct_col) % n_salts).alias("__salt"),
    ).distinct()  # grain: keys × salt × value — spread by value-hash salt
    return salted.groupBy(*keys).agg(F.count("__v").alias(out_col))
