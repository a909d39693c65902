"""Hypertable operator cores: per-entity gap-fill (spine + LOCF + linear
interpolation) and time-weighted averaging over irregular series.

These are the reusable frames behind the registered queries in
``queries/timeseries.py`` (which add the table loading, cents
quantization and terminal naming). Both partition by the entity key and
never introduce a global order — a corpus of 10⁸ entities is 10⁸
independent short windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def gapfill_locf_interpolate_frame(
    daily: DataFrame, entity_col: str, day_col: str, value_col: str
) -> DataFrame:
    """Densify ``daily`` (one row per entity per OBSERVED day, integer
    ``value_col``) to one row per entity per day across each entity's
    own min..max span, carrying LOCF and an exact-rational linear
    interpolation (``interp_num``/``interp_den``; observed rows collapse
    to value/1). Returns
    (entity, day, is_observed, value, locf, interp_num, interp_den)."""
    spine = (
        daily.groupBy(entity_col)
        .agg(F.min(day_col).alias("__mn"), F.max(day_col).alias("__mx"))
        .select(
            entity_col, F.explode(F.sequence("__mn", "__mx")).alias(day_col)
        )
    )
    g = spine.join(daily, [entity_col, day_col], "left")
    w_prev = (
        Window.partitionBy(entity_col)
        .orderBy(day_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy(entity_col)
        .orderBy(day_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col(value_col).isNotNull(), F.col(day_col))
    f = g.select(
        entity_col,
        day_col,
        value_col,
        F.last(value_col, ignorenulls=True).over(w_prev).alias("locf"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("__pd"),
        F.first(value_col, ignorenulls=True).over(w_next).alias("__nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("__nd"),
    )
    den0 = F.datediff("__nd", "__pd")
    num = F.when(den0 == 0, F.col(value_col)).otherwise(
        F.col("locf") * F.datediff(F.col("__nd"), F.col(day_col))
        + F.col("__nv") * F.datediff(F.col(day_col), F.col("__pd"))
    )
    den = F.when(den0 == 0, F.lit(1)).otherwise(den0)
    return f.select(
        entity_col,
        day_col,
        F.col(value_col).isNotNull().alias("is_observed"),
        value_col,
        "locf",
        num.cast("long").alias("interp_num"),
        den.cast("long").alias("interp_den"),
    )

def time_weighted_avg(
    obs: DataFrame, entity_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Duration-weighted (LOCF-integral) average per entity over an
    irregular integer series: each observation is weighted by the time to
    the next one (open tail excluded). Exact integer rational
    ``twa_num``/``twa_den``; entities with fewer than two observations
    produce no row (no interval to integrate). ``ts_col`` must be an
    integral clock (e.g. epoch micros)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col)
    o = obs.withColumn("__nxt", F.lead(ts_col).over(w)).filter(
        F.col("__nxt").isNotNull()
    )
    dur = F.col("__nxt") - F.col(ts_col)
    return o.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum(F.col(value_col) * dur).cast("long").alias("twa_num"),
        F.sum(dur).cast("long").alias("twa_den"),
    )

def rolling_zscore(
    df: DataFrame,
    entity_col: str,
    day_col: str,
    value_col: str,
    window_days: int = 7,
    z_num: int = 2,
    z_den: int = 1,
) -> DataFrame:
    """Trailing ``window_days`` z-score over an integer daily series, with
    the |z| > z_num/z_den anomaly decision evaluated ENTIRELY in integers:
    dev = n·x − Σx and n²σ² = n·Σx² − (Σx)², so |z| > t ⟺ z_den²·dev² >
    z_num²·(n·Σx² − (Σx)²). The frame is RANGE over the epoch-day number —
    calendar holes shrink n instead of silently stretching the window —
    and the flag only fires on a full window. Returns (entity, day, value,
    n_window, dev_scaled, var_scaled, is_anomaly)."""
    d = df.withColumn("__dn", F.datediff(day_col, F.lit("1970-01-01")))
    win = (
        Window.partitionBy(entity_col)
        .orderBy("__dn")
        .rangeBetween(-(window_days - 1), 0)
    )
    # square in 64-bit regardless of the input's integer width: an
    # IntegerType series overflows x*x at |x| >= 46341 (ANSI abort, or a
    # silently wrong anomaly flag with ANSI off)
    x = F.col(value_col).cast("long")
    w = d.select(
        entity_col,
        day_col,
        value_col,
        F.count(F.lit(1)).over(win).cast("long").alias("n_window"),
        F.sum(x).over(win).alias("__s1"),
        F.sum(x * x).over(win).alias("__s2"),
    )
    dev = F.col("n_window") * x - F.col("__s1")
    var2 = F.col("n_window") * F.col("__s2") - F.col("__s1") * F.col("__s1")
    return w.select(
        entity_col,
        day_col,
        value_col,
        "n_window",
        dev.cast("long").alias("dev_scaled"),
        var2.cast("long").alias("var_scaled"),
        (
            (F.col("n_window") == window_days)
            & (F.lit(z_den * z_den) * dev * dev > F.lit(z_num * z_num) * var2)
        ).alias("is_anomaly"),
    )
