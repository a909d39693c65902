"""Scalar compat layer pins (SURVEY.md §1.4 dialect quirks)."""

from __future__ import annotations

import datetime

import duckdb
from pyspark.sql import functions as F

from kin_data_pipeline_spark.functions.compat import (
    bucketize,
    date_trunc_month,
    date_trunc_week,
    dateadd,
    normalize_sentinel,
)

def test_week_truncation_is_monday_and_matches_duckdb(spark):
    days = [datetime.date(2024, 1, d) for d in range(1, 15)]
    df = spark.createDataFrame([(d,) for d in days], "d date")
    got = {r["d"]: r["w"] for r in df.select("d", date_trunc_week("d").alias("w")).collect()}
    con = duckdb.connect()
    for d in days:
        expect = con.execute(
            f"SELECT CAST(date_trunc('week', DATE '{d}') AS DATE)"
        ).fetchone()[0]
        assert got[d] == expect, f"{d}: spark {got[d]} vs duckdb {expect}"
        assert got[d].weekday() == 0  # Monday start

def test_month_truncation(spark):
    df = spark.createDataFrame([(datetime.date(2024, 2, 29),)], "d date")
    assert df.select(date_trunc_month("d").alias("m")).first()["m"] == datetime.date(2024, 2, 1)

def test_dateadd_units(spark):
    df = spark.createDataFrame([(datetime.date(2024, 1, 31),)], "d date")
    row = df.select(
        dateadd("day", -40, F.col("d")).alias("day"),
        dateadd("week", 2, F.col("d")).alias("week"),
        dateadd("month", 1, F.col("d")).alias("month"),
    ).first()
    assert row["day"] == datetime.date(2023, 12, 22)
    assert row["week"] == datetime.date(2024, 2, 14)
    assert row["month"] == datetime.date(2024, 2, 29)  # month-end clamp

def test_sentinel_normalization(spark):
    df = spark.createDataFrame([("1",), ("<NA>",), (None,)], "v string")
    got = [r["out"] for r in df.select(
        normalize_sentinel("v").cast("long").alias("out")
    ).collect()]
    assert got == [1, None, None]

def test_bucketize_edges_inclusive(spark):
    df = spark.createDataFrame([(1.0,), (10.0,), (10.5,), (99.0,)], "v double")
    got = [r["b"] for r in df.select(
        bucketize("v", [10], ["low", "high"]).alias("b")
    ).collect()]
    assert got == ["low", "low", "high", "high"]

def test_scalar_compat_randomized_cross_check(spark):
    """Seeded random sweep (400 dates, 1970–2049, leap days and month ends
    included) of date_trunc week/month and dateadd day/week/month against
    DuckDB — the fixed-case pins above catch known quirks; this catches the
    unknown ones."""
    import random

    rng = random.Random(20240131)
    base = datetime.date(1970, 1, 1)
    days = [base + datetime.timedelta(days=rng.randrange(0, 29200)) for _ in range(394)]
    days += [
        datetime.date(2024, 2, 29),
        datetime.date(2000, 2, 29),
        datetime.date(1999, 12, 31),
        datetime.date(2024, 1, 31),
        datetime.date(2023, 3, 31),
        datetime.date(2100, 1, 1),
    ]
    delta = 37
    df = spark.createDataFrame([(d,) for d in days], "d date")
    got = {
        r["d"]: (r["w"], r["m"], r["ad"], r["aw"], r["am"])
        for r in df.select(
            "d",
            date_trunc_week("d").alias("w"),
            date_trunc_month("d").alias("m"),
            dateadd("day", delta, "d").alias("ad"),
            dateadd("week", delta, "d").alias("aw"),
            dateadd("month", delta, "d").alias("am"),
        ).collect()
    }
    con = duckdb.connect()
    rows = con.execute(
        """
        SELECT d,
               CAST(date_trunc('week', d) AS DATE),
               CAST(date_trunc('month', d) AS DATE),
               CAST(d + INTERVAL 37 DAY AS DATE),
               CAST(d + INTERVAL 37 WEEK AS DATE),
               CAST(d + INTERVAL 37 MONTH AS DATE)
        FROM (SELECT UNNEST(?::DATE[]) AS d)
        """,
        [days],
    ).fetchall()
    for d, *want in rows:
        assert got[d] == tuple(want), f"mismatch at {d}: {got[d]} vs {tuple(want)}"
