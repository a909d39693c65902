"""Semantic pins for the hypertable tier (queries/timeseries.py) and the
hard-negative miner (queries/retrieval.py) — properties the oracle hash
can't see on its own: spine contiguity, LOCF carry semantics, interpolation
convexity, warmup/flag gating, and the negative-band contract."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from kin_data_pipeline_spark.queries.registry import QUERIES

@pytest.fixture(scope="module")
def gapfill(spark, sf_dir):
    rows = QUERIES["gapfill_locf_interpolate"].fn(spark, sf_dir).collect()
    return sorted(rows, key=lambda r: (r.user_id, r.day))

@pytest.fixture(scope="module")
def zscore(spark, sf_dir):
    rows = QUERIES["rolling_zscore_anomalies"].fn(spark, sf_dir).collect()
    return sorted(rows, key=lambda r: (r.event_type, r.day))

def test_gapfill_produces_gap_rows(gapfill):
    assert any(not r.is_observed for r in gapfill), "fixture has no gaps — vacuous"
    assert any(r.is_observed for r in gapfill)

def test_gapfill_spine_is_contiguous_per_user(gapfill):
    by_user: dict[int, list[datetime.date]] = {}
    for r in gapfill:
        by_user.setdefault(r.user_id, []).append(r.day)
    for uid, days in by_user.items():
        span = (days[-1] - days[0]).days + 1
        assert len(days) == span, f"user {uid}: {len(days)} rows over {span}-day span"
        # endpoints of every span are observed (spine is min..max of observations)
        assert days == sorted(days)

def test_gapfill_span_endpoints_are_observed(gapfill):
    by_user: dict[int, list] = {}
    for r in gapfill:
        by_user.setdefault(r.user_id, []).append(r)
    for rows in by_user.values():
        assert rows[0].is_observed and rows[-1].is_observed

def test_gapfill_locf_carries_last_observation(gapfill):
    last = {}
    for r in gapfill:
        if r.is_observed:
            assert r.value_cents is not None
            assert r.locf_cents == r.value_cents
            assert r.interp_num == r.value_cents and r.interp_den == 1
            last[r.user_id] = r.value_cents
        else:
            assert r.value_cents is None
            assert r.locf_cents == last[r.user_id], "LOCF must carry forward"

def test_gapfill_interpolation_is_convex_and_exact(gapfill):
    by_user: dict[int, list] = {}
    for r in gapfill:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for rows in by_user.values():
        obs = [(i, r.value_cents) for i, r in enumerate(rows) if r.is_observed]
        for (i0, v0), (i1, v1) in zip(obs, obs[1:]):
            for j in range(i0 + 1, i1):
                r = rows[j]
                # exact rational: num/den == v0 + (v1-v0)*(j-i0)/(i1-i0)
                assert r.interp_den == i1 - i0
                assert r.interp_num == v0 * (i1 - j) + v1 * (j - i0)
                lo, hi = min(v0, v1), max(v0, v1)
                assert lo * r.interp_den <= r.interp_num <= hi * r.interp_den
                checked += 1
    assert checked > 0, "no interior gap rows — vacuous"

def test_zscore_window_warmup_and_cap(zscore):
    by_type: dict[str, list] = {}
    for r in zscore:
        by_type.setdefault(r.event_type, []).append(r)
    for rows in by_type.values():
        for i, r in enumerate(rows):
            assert r.n_window == min(i + 1, 7), (
                "dense daily grid: n_window must ramp 1..7 then hold"
            )

def test_zscore_flag_matches_float_zscore(zscore):
    fired = 0
    for r in zscore:
        if r.is_anomaly:
            assert r.n_window == 7, "flag must not fire during warmup"
            assert abs(r.zscore) > 2.0
            fired += 1
        elif r.n_window == 7 and r.zscore is not None:
            # integer decision and float z agree away from the boundary
            if abs(r.zscore) > 2.0 + 1e-9:
                raise AssertionError(f"|z|={r.zscore} but flag not set: {r}")
    assert fired >= 1, "no anomalies at this SF — vacuous fixture"

def test_zscore_variance_identity(zscore):
    # var_scaled = n·Σx² − (Σx)² ≥ 0 always (Cauchy–Schwarz); zero only if
    # every value in the frame is identical.
    for r in zscore:
        assert r.var_scaled >= 0
        if r.var_scaled == 0:
            assert r.zscore is None

def test_hard_negatives_contract(spark, sf_dir):
    rows = QUERIES["hard_negative_candidates"].fn(spark, sf_dir).collect()
    assert rows, "no hard negatives — vacuous"
    per_query: dict[int, list] = {}
    for r in rows:
        assert r.query_label != r.neighbor_label, "negatives must cross labels"
        assert r.neighbor_id != r.query_id
        assert 0.2 <= r.cosine_sim <= 1.0
        per_query.setdefault(r.query_id, []).append(r)
    for qid, rs in per_query.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        sims = [r.cosine_sim for r in rs]
        assert sims == sorted(sims, reverse=True)

def test_hard_negatives_are_below_near_dup_ceiling(spark, sf_dir):
    # On this corpus cross-label cosine tops out well under near-dup range;
    # the miner must never surface a same-label pair even at the top rank.
    df = QUERIES["hard_negative_candidates"].fn(spark, sf_dir)
    n_same = df.filter(F.col("query_label") == F.col("neighbor_label")).count()
    assert n_same == 0

def test_twap_den_is_span_and_value_bounded(spark, sf_dir):
    from kin_data_pipeline_spark.sources.catalog import load_table

    out = {
        r.user_id: r
        for r in QUERIES["time_weighted_avg_per_user"].fn(spark, sf_dir).collect()
    }
    ev = (
        load_table(spark, sf_dir, "events")
        .selectExpr(
            "user_id",
            "unix_micros(ts) AS t",
            "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents",
        )
        .collect()
    )
    spans: dict[int, list] = {}
    for r in ev:
        spans.setdefault(r.user_id, []).append(r)
    for uid, rows in spans.items():
        if len(rows) < 2:
            assert uid not in out  # single-observation users have no interval
            continue
        ts = sorted(r.t for r in rows)
        o = out[uid]
        assert o.twa_den == ts[-1] - ts[0], "den must equal the observed span"
        lo, hi = min(r.cents for r in rows), max(r.cents for r in rows)
        assert lo * o.twa_den <= o.twa_num <= hi * o.twa_den
        assert o.n_obs == len(rows) - 1

def test_retention_cohort_contract(spark, sf_dir):
    rows = QUERIES["weekly_retention_cohorts"].fn(spark, sf_dir).collect()
    assert rows
    week0 = {r.cohort_wk: r for r in rows if r.week_offset == 0}
    by_cohort: dict = {}
    for r in rows:
        assert 0 < r.n_active <= r.cohort_size
        by_cohort.setdefault(r.cohort_wk, []).append(r)
    for wk, rs in by_cohort.items():
        # offset 0 is full by definition: every cohort member is active in
        # their own first week
        assert week0[wk].n_active == week0[wk].cohort_size
        assert week0[wk].retention == 1.0

def test_weighted_sample_contract(spark, sf_dir):
    rows = sorted(
        QUERIES["weighted_doc_sample_top50"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rnk,
    )
    assert len(rows) == 50
    assert [r.rnk for r in rows] == list(range(1, 51))
    pris = [r.priority for r in rows]
    assert pris == sorted(pris)
    assert all(r.n_chars > 0 and r.priority >= 0 for r in rows)

def test_gapfill_random_series_match_reference(spark):
    """Seeded randomized sweep of the gap-fill operator against a pure
    Python reference: random sparse integer series per entity, exact
    LOCF + rational-interpolation equality row by row."""
    import random

    from kin_data_pipeline_spark.operators.timeseries import (
        gapfill_locf_interpolate_frame,
    )

    rng = random.Random(41)
    rows = []
    expected = {}
    base = datetime.date(2024, 3, 1)
    for ent in range(6):
        days = sorted(rng.sample(range(40), rng.randint(2, 10)))
        vals = [rng.randint(0, 10_000) for _ in days]
        for d, v in zip(days, vals):
            rows.append((ent, (base + datetime.timedelta(days=d)).isoformat(), v))
        obs = dict(zip(days, vals))
        for d in range(days[0], days[-1] + 1):
            day = base + datetime.timedelta(days=d)
            prevs = [x for x in days if x <= d]
            nexts = [x for x in days if x >= d]
            dp, dn = prevs[-1], nexts[0]
            if dn == dp:
                num, den = obs[d], 1
            else:
                num = obs[dp] * (dn - d) + obs[dn] * (d - dp)
                den = dn - dp
            expected[(ent, day)] = (d in obs, obs.get(d), obs[dp], num, den)
    daily = spark.createDataFrame(
        rows, "ent long, d string, v long"
    ).selectExpr("ent", "CAST(d AS DATE) AS d", "v")
    got = gapfill_locf_interpolate_frame(daily, "ent", "d", "v").collect()
    assert len(got) == len(expected)
    for r in got:
        is_obs, v, locf, num, den = expected[(r.ent, r.d)]
        assert (r.is_observed, r.v, r.locf, r.interp_num, r.interp_den) == (
            is_obs, v, locf, num, den,
        ), f"mismatch at ({r.ent}, {r.d})"

def test_twap_random_series_match_reference(spark):
    """Seeded randomized sweep of time_weighted_avg against a pure Python
    fold over irregular integer series."""
    import random

    from kin_data_pipeline_spark.operators.timeseries import time_weighted_avg

    rng = random.Random(59)
    rows, expected = [], {}
    for ent in range(8):
        n = rng.randint(1, 12)
        ts = sorted(rng.sample(range(1, 100_000), n))
        vs = [rng.randint(0, 5_000) for _ in ts]
        for t, v in zip(ts, vs):
            rows.append((ent, t, v))
        if n >= 2:
            num = sum(v * (t2 - t1) for (t1, v), t2 in zip(zip(ts, vs), ts[1:]))
            expected[ent] = (n - 1, num, ts[-1] - ts[0])
    obs = spark.createDataFrame(rows, "ent long, t long, v long")
    got = {r.ent: (r.n_obs, r.twa_num, r.twa_den) for r in
           time_weighted_avg(obs, "ent", "t", "v").collect()}
    assert got == expected


def test_rolling_zscore_survives_int_typed_values(spark):
    """An IntegerType value column must not overflow the x*x square
    (46341^2 > 2^31): the operator squares in 64-bit."""
    import datetime

    from pyspark.sql import functions as F

    from kin_data_pipeline_spark.operators.timeseries import rolling_zscore

    rows = [
        ("e", datetime.date(2024, 1, d), 100000 + d) for d in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "entity string, day date, value int").withColumn(
        "value", F.col("value").cast("int")
    )
    out = rolling_zscore(df, "entity", "day", "value", window_days=7).collect()
    assert len(out) == 7
    assert all(r["var_scaled"] >= 0 for r in out)
