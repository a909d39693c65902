"""One-pass table profiling: per-column null counts and exact distinct
cardinalities in a single fused aggregation.

The ANALYZE-style statistics a warehouse needs for layout decisions
(bucket counts, broadcast candidacy, skew suspects) — computed the same
way `plans/checks.py` fuses data-quality checks: ONE aggregation pass over
the table, one row out, then unpivoted to long form. Exact
`count(distinct)` per column is a full-width shuffle at 100 TB; pass
``approx=True`` to switch every cardinality to HyperLogLog
(`approx_count_distinct`) for the linear-scan form — same output schema,
documented ±2% standard error.
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
    distinct_of = (
        (lambda c: F.approx_count_distinct(c))
        if approx
        else (lambda c: F.countDistinct(c))
    )
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        aggs.append(distinct_of(c).alias(f"__dist_{c}"))
    row = df.agg(*aggs)
    # unpivot the single stats row to long form JVM-side (stack), keeping
    # everything in one job: profile = one scan + one 1-row exchange
    pairs = ", ".join(f"'{c}', __null_{c}, __dist_{c}" for c in cols)
    return row.selectExpr(
        "__n",
        f"stack({len(cols)}, {pairs}) as (column, n_nulls, n_distinct)",
    ).select(
        "column",
        F.col("__n").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
    )
