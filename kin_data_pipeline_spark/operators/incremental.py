"""Incremental aggregate maintenance from change-data-feed rows — the
production CONSUMER of the versioned catalog's CDF (Delta's "incrementally
refresh a downstream aggregate from readChangeFeed" pattern; classic
incremental view maintenance for distributive aggregates).

Given a grouped aggregate table (COUNT + SUM measures) and the CDF rows
between two versions (`Catalog.table_changes` / the `catalog_changes`
source: base columns + ``_change_type`` insert/delete), the maintained
aggregate is computed WITHOUT rescanning the base table: inserts add,
deletes subtract, groups whose row count reaches zero disappear, and
groups first seen in the changes appear. Work is O(|changes| + |agg|),
both usually orders of magnitude smaller than the base — at 100 TB this
is the difference between a full-table re-aggregation per refresh and a
changelog-sized merge.

Semantic boundaries (stated, not silent):
- Supported measures are COUNT(*) plus SUMs — the distributive aggregates
  that admit subtraction. MIN/MAX are NOT maintainable under deletes
  (losing the current extremum needs the base) and are refused upstream
  by construction (this module simply doesn't offer them); rebuild those
  or keep a heap-sketch elsewhere.
- SUM measures are maintained as SUM(COALESCE(col, 0)): a pure delta
  stream cannot distinguish "sums to 0" from "all contributing values
  were NULL" without a per-measure non-null count. Build the base
  aggregate with the same COALESCE (``aggregate_base`` does) and the
  maintained and recomputed forms agree exactly.

Reference: the kin warehouse rebuilds every daily mart from scratch each
cron run (execute_snowflake_load.py drives full CREATE OR REPLACE
passes); this operator is the engine's incremental upgrade for the
rollup-shaped ones, exact by construction instead of by re-run.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregate_base(
    df: DataFrame,
    group_cols: Sequence[str],
    measures: Mapping[str, str],
    count_col: str = "n_rows",
) -> DataFrame:
    """The base aggregate in the exact shape ``maintain_aggregate``
    preserves: COUNT(*) plus SUM(COALESCE(src, 0)) per measure."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias(count_col),
        *[
            F.sum(F.coalesce(F.col(src), F.lit(0))).alias(out)
            for out, src in measures.items()
        ],
    )


def maintain_aggregate(
    agg: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    measures: Mapping[str, str],
    count_col: str = "n_rows",
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Apply CDF rows to a grouped COUNT+SUM aggregate, returning the
    maintained aggregate (equal to recomputing ``aggregate_base`` over
    the post-change base — pinned by tests/test_incremental.py).

    ``agg`` carries ``group_cols`` + ``count_col`` + the measure output
    columns; ``changes`` carries the base columns + ``change_type_col``
    with values 'insert'/'delete' (exactly what ``table_changes``
    emits — an update is a delete+insert pair, which nets correctly).

    Plan shape: one aggregation over the CHANGES (map-side combinable),
    one null-safe full-outer join against the aggregate on the group
    keys (both frames are group-grain — the base table is never read),
    then a count>0 filter so emptied groups vanish. NULL group keys are
    matched null-safely (<=>), mirroring GROUP BY's NULL-is-one-group
    semantics.
    """
    sign = (
        F.when(F.col(change_type_col) == "insert", F.lit(1))
        .when(F.col(change_type_col) == "delete", F.lit(-1))
        .otherwise(F.lit(None))
    )
    # a malformed change type must fail loudly, not silently skew sums —
    # the guard aggregates to ONE row (bounded driver probe)
    bad = (
        changes.filter(~F.col(change_type_col).isin("insert", "delete"))
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"unknown change type {bad[0][change_type_col]!r}; expected "
            "'insert'/'delete' (the table_changes contract)"
        )
    delta = changes.groupBy(*group_cols).agg(
        F.sum(sign).cast("long").alias("__dn"),
        *[
            F.sum(sign * F.coalesce(F.col(src), F.lit(0))).alias(f"__d_{out}")
            for out, src in measures.items()
        ],
    )
    a, d = agg.alias("a"), delta.alias("d")
    cond = None
    for c in group_cols:
        term = F.col(f"a.{c}").eqNullSafe(F.col(f"d.{c}"))
        cond = term if cond is None else (cond & term)
    joined = a.join(d, cond, "full_outer")
    keys = [
        F.coalesce(F.col(f"a.{c}"), F.col(f"d.{c}")).alias(c)
        for c in group_cols
    ]
    n = (
        F.coalesce(F.col(f"a.{count_col}"), F.lit(0))
        + F.coalesce(F.col("__dn"), F.lit(0))
    ).cast("long")
    sums = [
        (
            F.coalesce(F.col(f"a.{out}"), F.lit(0))
            + F.coalesce(F.col(f"__d_{out}"), F.lit(0))
        ).alias(out)
        for out in measures
    ]
    return joined.select(*keys, n.alias(count_col), *sums).filter(
        F.col(count_col) > 0
    )


def distinct_support(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    support_col: str = "n_support",
) -> DataFrame:
    """The auxiliary state that makes COUNT(DISTINCT value) maintainable
    under deletes: the (group, value) -> multiplicity table. A plain
    distinct count is NOT distributive (a delete can't tell whether other
    rows still carry the value), but the support multiset is — classic
    IVM. NULL values are excluded, matching COUNT(DISTINCT)'s NULL rule."""
    return df.filter(F.col(value_col).isNotNull()).groupBy(
        *group_cols, value_col
    ).agg(F.count(F.lit(1)).cast("long").alias(support_col))


def maintain_distinct_support(
    support: DataFrame,
    changes: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    support_col: str = "n_support",
    change_type_col: str = "_change_type",
) -> DataFrame:
    """Roll the support table forward from CDF rows — exactly
    ``maintain_aggregate`` at (group, value) grain with no SUM measures:
    a value's support reaching zero drops its row, so the derived
    distinct count shrinks precisely when the LAST row carrying the
    value is deleted."""
    return maintain_aggregate(
        support,
        changes.filter(F.col(value_col).isNotNull()),
        [*group_cols, value_col],
        {},
        count_col=support_col,
        change_type_col=change_type_col,
    )


def distinct_count_from_support(
    support: DataFrame,
    group_cols: Sequence[str],
    out_col: str = "n_distinct",
) -> DataFrame:
    """COUNT(DISTINCT value) per group, derived from the support table:
    one row per surviving (group, value) pair, so the count is a plain
    row count — support-table-sized, never touching the base."""
    return support.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias(out_col)
    )
