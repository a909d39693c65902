"""Core relational operator building blocks (SURVEY.md §2.2–§2.7).

Each helper is a declarative DataFrame composition — Catalyst handles the
physical strategy (broadcast vs sort-merge joins, partial aggregation,
whole-stage codegen). Nothing here collects to the driver or drops to RDDs.

Reference parity citations (paths relative to /root/reference/kin-data-pipeline/):
- top-k per group       → weekly_kre_payout_summary.sql:9,32 (W2/O2)
- argmax (rank=1)       → multi_create_impacted_accounts.sql:27,42 (W3/O3)
- UNION-dedup           → closing_account_balance_per_day.sql:32-53 (U1)
- semi/anti join        → multi_create_impacted_accounts.sql:17, monthly_inactive_wallets.sql:31 (J8/J9)
- OR-join unpivot       → closing_account_balance_per_day.sql:79-84 (J6)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
    dense: bool = True,
    keep_rank: bool = False,
) -> DataFrame:
    """Per-group top-k via a rank window + filter.

    Scales: the window is a single shuffle on ``partition_by``; no global
    sort, no driver collect. Use ``dense=False`` (row_number) when exactly k
    rows per group are required regardless of ties.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = F.dense_rank() if dense else F.row_number()
    out = df.withColumn(rank_col, fn.over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)

def argmax_rows(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
) -> DataFrame:
    """Keep the single best row per group (rank = 1, row_number semantics).

    Pass a deterministic tiebreak in ``order_by`` — the reference's
    ``balance_rank = 1`` pattern relies on it.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

def union_dedup(*dfs: DataFrame) -> DataFrame:
    """Snowflake bare ``UNION`` = union + dedup (the reference uses it 9×
    deliberately as a dedup step). ``unionByName`` guards column-order drift.
    """
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out.distinct()

def semi_join(df: DataFrame, keys_df: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """``WHERE x IN (subquery)`` → left-semi join (Catalyst's own rewrite)."""
    return df.join(keys_df, on=on, how="left_semi")

def anti_join(df: DataFrame, keys_df: DataFrame, on: Sequence[str] | Column) -> DataFrame:
    """``WHERE x NOT IN (subquery)`` → left-anti join.

    NULL-semantics note (SURVEY §1.4): SQL NOT IN with NULLs in the subquery
    yields no rows; left-anti keeps non-matching rows. Callers must ensure
    the key side is non-null (true for every reference use) or pre-filter.
    """
    return df.join(keys_df, on=on, how="left_anti")

def unpivot_roles(
    df: DataFrame,
    role_cols: dict[str, str],
    carry_cols: Sequence[str],
    key_name: str = "entity_id",
    role_name: str = "role",
) -> DataFrame:
    """Rewrite an OR-join (``wallet = from_account OR wallet = to_account``)
    into a stack + equi-join form.

    Emits one row per (row, role) with ``key_name`` holding the role column's
    value — the downstream join becomes a plain equi-join, which shuffles
    once on the key instead of falling back to a broadcast-nested-loop OR
    join (O(n·m) at 100 TB).
    """
    stack_expr = ", ".join(f"'{role}', `{col}`" for role, col in role_cols.items())
    n = len(role_cols)
    return df.selectExpr(
        *carry_cols,
        f"stack({n}, {stack_expr}) as ({role_name}, {key_name})",
    )
