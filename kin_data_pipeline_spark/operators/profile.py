"""One-pass table profiling: per-column null counts and exact distinct
cardinalities in a single fused aggregation.

The ANALYZE-style statistics a warehouse needs for layout decisions
(bucket counts, broadcast candidacy, skew suspects) — computed the same
way `plans/checks.py` fuses data-quality checks: ONE aggregation pass over
the table, one row out, then unpivoted to long form. Exact
`count(distinct)` per column is a full-width shuffle at 100 TB; pass
``approx=True`` to switch every cardinality to HyperLogLog
(`approx_count_distinct`, rsd=0.02) for the linear-scan form — same output
schema, ±2% relative standard deviation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def profile_table(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Returns long-form rows ``(column, n_rows, n_nulls, n_distinct)`` —
    NULLs are excluded from the distinct count (matching SQL
    COUNT(DISTINCT col) semantics on both engines).
    """
    cols = columns if columns is not None else df.columns
    if not cols:
        raise ValueError("profile_table: no columns to profile")
    distinct_of = (
        (lambda c: F.approx_count_distinct(c, rsd=0.02))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        # df[c] resolves the exact column name (F.col would parse dots as
        # struct-field access)
        aggs.append(F.count(F.when(df[c].isNull(), 1)).alias(f"__null_{i}"))
        aggs.append(distinct_of(df[c]).alias(f"__dist_{i}"))
    row = df.agg(*aggs)
    # unpivot the single stats row to long form JVM-side (stack), keeping
    # everything in one job: profile = one scan + one 1-row exchange.
    # Generated aliases are positional and the column NAME enters only as
    # an escaped string literal, so arbitrary identifiers (spaces, dots,
    # quotes) profile safely.
    pairs = ", ".join(
        "'{}', __null_{}, __dist_{}".format(c.replace("'", "''"), i, i)
        for i, c in enumerate(cols)
    )
    return row.selectExpr(
        "__n",
        f"stack({len(cols)}, {pairs}) as (column, n_nulls, n_distinct)",
    ).select(
        "column",
        F.col("__n").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )
