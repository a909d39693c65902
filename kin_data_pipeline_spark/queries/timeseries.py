"""Hypertable-style time-series operators: gap-fill with LOCF + linear
interpolation, and rolling z-score anomaly detection.

The reference's range-join family (daily_volatility_factor.sql,
daily_active_accounts_*.sql) densifies *aggregates* over trailing windows;
what it never needed — and a metrics/training-telemetry pipeline does — is
densifying the *series itself*: emitting one row per entity per day across
each entity's observed span, carrying last-observation-carried-forward and
linearly interpolated values through the gaps (the TimescaleDB
``time_bucket_gapfill``/``locf``/``interpolate`` surface, re-expressed as
DataFrame ops).

Scale shape: everything partitions by the series key (``user_id`` /
``event_type``). The spine is generated per entity from its own
``min(day)..max(day)`` span (``sequence`` + ``explode`` — no driver-side
date loop, no global calendar cross join), so a 100 TB corpus with 10⁸
entities becomes 10⁸ independent short windows; no stage shuffles anything
wider than the daily aggregate.

Cross-engine exactness (house rules, see queries/curation.py): the series
is exact integer cents (``DECIMAL(18,2)*100 → BIGINT``); LOCF and the
interpolation numerator/denominator are pure integer arithmetic; each
floating terminal is a fixed two-op IEEE expression (one divide chain, one
correctly-rounded ``sqrt``) evaluated identically by Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kin_data_pipeline_spark.queries.registry import register
from kin_data_pipeline_spark.sources.catalog import load_table

def _cents():
    return (F.col("value").cast("decimal(18,2)") * 100).cast("long")

# ---------------------------------------------------------------------------
# Gap-fill: per-user daily purchase series, LOCF + linear interpolation.
#
# The purchase feed is sparse per user (at sf0.01, 150 users / 3990 spine
# days / 2386 gaps), so the fill is non-vacuous at every SF. Interpolation
# is emitted as an exact integer rational (numerator = locf·(next_day−day)
# + next·(day−prev_day), denominator = next_day−prev_day) alongside one
# double terminal derived from it by a fixed division chain — observed rows
# collapse to num=value, den=1 so the rational is exact everywhere.
# ---------------------------------------------------------------------------
@register(
    "gapfill_locf_interpolate",
    """
    WITH e AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS value_cents
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(day) AS mn, MAX(day) AS mx FROM e GROUP BY 1
    ), spine AS (
      SELECT user_id, CAST(gs AS DATE) AS day
      FROM span, UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS t(gs)
    ), g AS (
      SELECT s.user_id, s.day, e.value_cents
      FROM spine s LEFT JOIN e ON e.user_id = s.user_id AND e.day = s.day
    ), f AS (
      SELECT user_id, day, value_cents,
             last_value(value_cents IGNORE NULLS) OVER w_prev AS locf_cents,
             last_value(CASE WHEN value_cents IS NOT NULL THEN day END
                        IGNORE NULLS) OVER w_prev AS prev_day,
             first_value(value_cents IGNORE NULLS) OVER w_next AS next_cents,
             first_value(CASE WHEN value_cents IS NOT NULL THEN day END
                         IGNORE NULLS) OVER w_next AS next_day
      FROM g
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY day
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day, value_cents IS NOT NULL AS is_observed, value_cents,
           locf_cents,
           CASE WHEN date_diff('day', prev_day, next_day) = 0 THEN value_cents
                ELSE locf_cents * date_diff('day', day, next_day)
                     + next_cents * date_diff('day', prev_day, day)
           END AS interp_num,
           CASE WHEN date_diff('day', prev_day, next_day) = 0 THEN 1
                ELSE date_diff('day', prev_day, next_day)
           END AS interp_den,
           ROUND((CAST(CASE WHEN date_diff('day', prev_day, next_day) = 0
                            THEN value_cents
                            ELSE locf_cents * date_diff('day', day, next_day)
                                 + next_cents * date_diff('day', prev_day, day)
                       END AS DOUBLE)
                  / CASE WHEN date_diff('day', prev_day, next_day) = 0 THEN 1
                         ELSE date_diff('day', prev_day, next_day) END)
                 / 100.0, 6) AS interp_value
    FROM f
    """,
    doc="hypertable gap-fill: per-entity daily spine + LOCF + exact-rational linear interpolation",
)
def gapfill_locf_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.timeseries import (
        gapfill_locf_interpolate_frame,
    )

    daily = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(F.sum(_cents()).alias("value_cents"))
    )
    out = gapfill_locf_interpolate_frame(daily, "user_id", "day", "value_cents")
    return out.select(
        "user_id",
        "day",
        "is_observed",
        "value_cents",
        F.col("locf").alias("locf_cents"),
        "interp_num",
        "interp_den",
        F.round(
            (F.col("interp_num").cast("double") / F.col("interp_den")) / 100.0, 6
        ).alias("interp_value"),
    )

# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection: trailing 7-day mean/σ per event type,
# flag days where |x − μ| > 2σ. The test is evaluated entirely in integers
# — dev = n·x − Σx and n²σ² = n·Σx² − (Σx)², so |z| > 2 ⟺ dev² > 4·(n·Σx²
# − (Σx)²) with no float in the decision path. Window is RANGE over the
# epoch-day number, so holes in the calendar shrink n instead of silently
# stretching the frame; the flag only fires on a full 7-day window.
#
# Bounds: daily cents at sf0.1 ≈ 5·10⁶, so n·Σx² ≲ 1.2·10¹⁵ — 10³ headroom
# inside int64. At a corpus where daily cents exceed ~10⁹, pre-scale the
# series (dollars) or lift s2 to DECIMAL; the shape is unchanged.
# ---------------------------------------------------------------------------
@register(
    "rolling_zscore_anomalies",
    """
    WITH d AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS value_cents,
             date_diff('day', DATE '1970-01-01', CAST(date_trunc('day', ts) AS DATE)) AS dn
      FROM events GROUP BY 1, 2, 4
    ), w AS (
      SELECT event_type, day, value_cents,
             CAST(COUNT(*) OVER win AS BIGINT) AS n_window,
             CAST(SUM(value_cents) OVER win AS BIGINT) AS s1,
             CAST(SUM(value_cents * value_cents) OVER win AS BIGINT) AS s2
      FROM d
      WINDOW win AS (PARTITION BY event_type ORDER BY dn
                     RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, day, value_cents, n_window,
           CAST(n_window * value_cents - s1 AS BIGINT) AS dev_scaled,
           CAST(n_window * s2 - s1 * s1 AS BIGINT) AS var_scaled,
           CASE WHEN n_window * s2 - s1 * s1 > 0 THEN
             ROUND(CAST(n_window * value_cents - s1 AS DOUBLE)
                   / sqrt(CAST(n_window * s2 - s1 * s1 AS DOUBLE)), 6)
           END AS zscore,
           n_window = 7 AND
             (n_window * value_cents - s1) * (n_window * value_cents - s1)
               > 4 * (n_window * s2 - s1 * s1) AS is_anomaly
    FROM w
    """,
    doc="trailing 7d z-score anomaly flags; integer-exact |z|>2 decision (dev² > 4·n²σ²)",
)
def rolling_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.timeseries import rolling_zscore

    d = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(_cents()).alias("value_cents"))
    )
    out = rolling_zscore(
        d, "event_type", "day", "value_cents", window_days=7, z_num=2, z_den=1
    )
    dev = F.col("dev_scaled")
    var2 = F.col("var_scaled")
    return out.select(
        "event_type",
        "day",
        "value_cents",
        "n_window",
        "dev_scaled",
        "var_scaled",
        F.when(
            var2 > 0, F.round(dev.cast("double") / F.sqrt(var2.cast("double")), 6)
        ).alias("zscore"),
        "is_anomaly",
    )

# ---------------------------------------------------------------------------
# Time-weighted average (TWAP): the irregular-series companion to gap-fill.
# A plain AVG over observations overweights bursty periods; weighting each
# observation by its holding duration (microseconds to the next observation,
# exclusive of the open tail) gives the value's true time integral — the
# TimescaleDB ``time_weight('locf', ...)`` / finance TWAP semantics. All
# integer until one final division: Σ(cents·Δus) ≤ max_cents·span_us ≈
# 5·10⁴·2.6·10¹² ≈ 1.3·10¹⁷ per user at sf0.1 — inside int64 for any
# per-entity span below ~50 years. Partitions by user_id; one window pass.
# ---------------------------------------------------------------------------
@register(
    "time_weighted_avg_per_user",
    """
    WITH e AS (
      SELECT user_id, epoch_us(ts) AS t_us,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ), o AS (
      SELECT user_id, cents, t_us,
             lead(t_us) OVER (PARTITION BY user_id ORDER BY t_us) AS nxt
      FROM e
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(cents * (nxt - t_us)) AS BIGINT) AS twa_num,
           CAST(SUM(nxt - t_us) AS BIGINT) AS twa_den,
           ROUND((CAST(CAST(SUM(cents * (nxt - t_us)) AS BIGINT) AS DOUBLE)
                  / CAST(SUM(nxt - t_us) AS BIGINT)) / 100.0, 6) AS twa_value
    FROM o WHERE nxt IS NOT NULL GROUP BY user_id
    """,
    doc="time-weighted average per entity (duration-weighted LOCF integral, exact rational + one division)",
)
def time_weighted_avg_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kin_data_pipeline_spark.operators.timeseries import time_weighted_avg

    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t_us"), _cents().alias("cents")
    )
    out = time_weighted_avg(e, "user_id", "t_us", "cents")
    return out.select(
        "user_id",
        "n_obs",
        "twa_num",
        "twa_den",
        F.round(
            (F.col("twa_num").cast("double") / F.col("twa_den")) / 100.0, 6
        ).alias("twa_value"),
    )
