"""Range / interval / as-of join family (SURVEY.md §2.3 J4/J5, §4).

The reference's 13 trailing-window range joins (e.g.
``daily_active_user_balance_by_app.sql:26-27``: date spine ⨝ facts over
``fact.date >= spine.date - 29 AND fact.date <= spine.date``) degenerate to
O(n·m) broadcast-nested-loop joins if translated literally — Spark has no
native range-join optimization. We rewrite at authoring time:

1. **Sums/avgs/counts over a trailing window** → a window frame
   ``rangeBetween(-days+1, 0)`` over the day-number — one shuffle on the
   partition key, no join at all (``trailing_window_agg``).
2. **COUNT(DISTINCT …) over a trailing window** (not expressible as a Spark
   window frame — distinct aggregates are disallowed in windows) → explode
   each fact row to every spine day it covers, then a plain hash
   aggregation (``trailing_distinct_count``). Shuffle volume = rows ×
   window_days, but each exploded row is just (day, key) — still far
   cheaper at scale than the nested-loop fallback, and AQE coalesces the
   post-explode partitions.
3. **As-of join** (hand-rolled in the reference as max-date-then-equi-join,
   ``daily_active_user_balance_by_app.sql:38-60``) → union both sides and
   take ``last(value, ignorenulls)`` over an ordered window — one shuffle,
   no self-join (``asof_join``).
4. **Forward-inactivity anti join** (churn: no activity in the next N days,
   ``daily_churn_volume.sql:45-48``) → ``lead`` over an ordered window
   (``forward_inactivity_anti``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def trailing_window_agg(
    df: DataFrame,
    date_col: str,
    aggs: dict[str, Column],
    days: int,
    partition_by: Sequence[str] = (),
) -> DataFrame:
    """Per-day trailing-``days`` aggregates via a RANGE window frame.

    PRECONDITION: ``df`` must already be AT (partition_by, date_col) daily
    grain — this helper adds the window columns only and performs no
    aggregation itself. Callers pre-aggregate (see queries/relational.py's
    daily rollups), which keeps the frame sliding over one row per day so
    the frame scan is O(days) per row; feeding event-grain input would
    yield per-row output with row-weighted (not day-weighted) averages.
    ``aggs`` maps output name → aggregate over the daily columns.

    INVARIANT: with empty ``partition_by`` the window sorts on a single
    partition, which is correct ONLY for day-grain series (≤ a few thousand
    rows at any horizon). For per-entity grains (wallet, app) pass the
    entity in ``partition_by`` so the sort distributes.
    """
    day_num = F.datediff(F.col(date_col), F.lit("1970-01-01"))
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(day_num)
        .rangeBetween(-(days - 1), 0)
    )
    out = df
    for name, expr in aggs.items():
        out = out.withColumn(name, expr.over(w))
    return out

def trailing_distinct_count(
    df: DataFrame,
    date_col: str,
    distinct_col: str,
    days: int,
    partition_by: Sequence[str] = (),
    out_col: str = "active_count",
    spine: DataFrame | None = None,
) -> DataFrame:
    """COUNT(DISTINCT x) over a trailing window — exploded-date-spine rewrite.

    Each (day, key) observation is expanded to the ``days`` spine days it
    remains visible for (``F.sequence`` + ``explode``), then counted with a
    plain distinct aggregation. Dedup to (day, partition, distinct) grain
    BEFORE exploding so the explode factor applies to distinct observations,
    not raw rows. If ``spine`` is given (one ``date_col`` row per reporting
    day), results are semi-joined to it so only real days are emitted.
    """
    base = df.select(
        F.to_date(date_col).alias(date_col), *partition_by, distinct_col
    ).distinct()
    exploded = base.withColumn(
        date_col,
        F.explode(
            F.sequence(
                F.col(date_col),
                F.date_add(F.col(date_col), days - 1),
                F.expr("interval 1 day"),
            )
        ),
    )
    out = exploded.groupBy(date_col, *partition_by).agg(
        F.countDistinct(distinct_col).alias(out_col)
    )
    if spine is not None:
        out = out.join(spine.select(F.to_date(date_col).alias(date_col)).distinct(), date_col, "inner")
    return out

def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    tolerance_days: int | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row at-or-before its
    time (per ``on`` keys) — without a range join.

    Union both sides tagged by origin, sort within key by time, and carry
    the right values forward with ``last(..., ignorenulls=True)``. Single
    shuffle on ``on``; no nested loop. ``tolerance_days`` additionally nulls
    matches older than the lookback (the reference's 30-day balance
    lookback, ``daily_active_user_balance_by_app.sql:26-27``).
    """
    on = list(on)
    collide = set(value_cols) & set(left.columns)
    if collide:
        # a left column named like a value_col would feed its own (stale)
        # values into the ignorenulls carry-forward and be attached as if
        # it were a right-side observation — silent corruption, so refuse
        raise ValueError(
            f"asof_join value_cols {sorted(collide)} already exist on the "
            "left frame; drop or rename them before joining"
        )
    lhs = left.withColumn("__t", F.col(left_time)).withColumn("__is_left", F.lit(1))
    rhs = (
        right.select(
            *on,
            F.col(right_time).alias("__t"),
            *[F.col(c) for c in value_cols],
        )
        .withColumn("__is_left", F.lit(0))
    )
    for c in lhs.columns:
        if c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None))
    for c in rhs.columns:
        if c not in lhs.columns:
            lhs = lhs.withColumn(c, F.lit(None))
    merged = lhs.unionByName(rhs.select(*lhs.columns))
    # Right rows sort before left rows at the same timestamp: at-or-before.
    w = Window.partitionBy(*on).orderBy(F.col("__t").asc(), F.col("__is_left").asc())
    carried = merged
    for c in value_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    if tolerance_days is not None:
        t_src = Window.partitionBy(*on).orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        carried = carried.withColumn(
            "__src_t",
            F.last(F.when(F.col("__is_left") == 0, F.col("__t")), ignorenulls=True).over(t_src),
        )
        stale = F.datediff(F.col("__t"), F.col("__src_t")) > tolerance_days
        for c in value_cols:
            carried = carried.withColumn(c, F.when(stale, F.lit(None)).otherwise(F.col(c)))
        carried = carried.drop("__src_t")
    return carried.filter(F.col("__is_left") == 1).drop("__t", "__is_left")

def forward_inactivity_anti(
    df: DataFrame,
    date_col: str,
    horizon_days: int,
    partition_by: Sequence[str],
    run_date_col: Column | None = None,
) -> DataFrame:
    """Rows with NO subsequent activity within ``horizon_days`` (churn).

    ``lead(date)`` over the per-key ordered window replaces the reference's
    left range join + IS NULL (``daily_churn_volume.sql:45-48``): a row
    churns iff the next observation for its key is more than ``horizon_days``
    later (or absent). ``run_date_col`` optionally censors rows whose horizon
    has not yet fully elapsed (the reference's complete-horizon guard).
    """
    w = Window.partitionBy(*partition_by).orderBy(F.col(date_col).asc())
    out = df.withColumn("__next", F.lead(date_col).over(w))
    churned = out.filter(
        F.col("__next").isNull()
        | (F.datediff(F.col("__next"), F.col(date_col)) > horizon_days)
    )
    if run_date_col is not None:
        churned = churned.filter(
            F.date_add(F.col(date_col), horizon_days) < run_date_col
        )
    return churned.drop("__next")
