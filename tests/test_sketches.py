"""Sketch-tier accuracy pins. Since round 5 the REGISTERED sketch queries
are driver-hash-checkable: they emit exact values plus an in-query integer
``within_bound`` flag (VERDICT r4 ask #2), while the raw estimates live on
as unregistered twins (`*_estimates`). This suite pins both layers:

- the estimate twins against exact counts with each sketch's published
  error bound (DataSketches HLL at lgK=14: RSE ≈ 1.04/√2^14 ≈ 0.8%, we
  assert within 5% ≈ 6 standard errors; percentile_approx at
  accuracy=10000: rank error ≤ n/10000, we allow two rank-error windows);
- the registered audit queries' ``within_bound`` terminals — all 1 on the
  test corpus — and their exact-value terminals against independent
  recomputation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kin_data_pipeline_spark.queries import QUERIES
from kin_data_pipeline_spark.queries.extended import (
    _PCT_RANKS,
    approx_length_percentiles_estimates,
    hll_user_rollup_weekly_estimates,
    streaming_approx_daily_users_estimates,
)
from kin_data_pipeline_spark.sources.catalog import load_table


def test_hll_weekly_rollup_matches_exact_within_bound(spark, sf_dir):
    approx = {
        r["week_start"]: (r["approx_users"], r["n_events"])
        for r in hll_user_rollup_weekly_estimates(spark, sf_dir).collect()
    }
    exact = {
        r["week_start"]: (r["exact_users"], r["n_events"])
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy(
                F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start")
            )
            .agg(
                F.countDistinct("user_id").alias("exact_users"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for week, (est, n_ev) in approx.items():
        true, true_ev = exact[week]
        # event counts ride along exactly — they are plain sums
        assert n_ev == true_ev, week
        assert abs(est - true) <= max(2, 0.05 * true), (
            f"week {week}: HLL estimate {est} vs exact {true}"
        )


def test_hll_rollup_is_a_true_sketch_union_not_a_sum(spark, sf_dir):
    # A user active on several days of one week must count ONCE in the
    # weekly estimate. Summing daily distincts would overcount; the sketch
    # union must land near the exact weekly distinct, which is strictly
    # below the daily sum whenever any user repeats across days.
    daily_sum = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("d"))
        .agg(F.sum("d"))
        .collect()[0][0]
    )
    weekly = hll_user_rollup_weekly_estimates(spark, sf_dir).collect()
    est_total = sum(r["approx_users"] for r in weekly)
    exact_total = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("week", F.to_date("ts")))
        .agg(F.countDistinct("user_id").alias("u"))
        .agg(F.sum("u"))
        .collect()[0][0]
    )
    assert est_total <= daily_sum  # union deduplicates across days
    assert abs(est_total - exact_total) <= max(2, 0.05 * exact_total)


def test_approx_percentiles_within_rank_error(spark, sf_dir):
    rows = approx_length_percentiles_estimates(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    for r in rows:
        vals = sorted(
            x[0]
            for x in docs.filter(F.col("source") == r["source"])
            .select("n_chars")
            .collect()
        )
        n = len(vals)
        assert n == r["n_docs"]
        slack = max(2, 2 * n // 10000)  # two rank-error windows
        for q, got in ((0.25, r["p25"]), (0.5, r["p50"]), (0.75, r["p75"]), (0.9, r["p90"])):
            rank = int(q * (n - 1))
            lo = vals[max(0, rank - slack)]
            hi = vals[min(n - 1, rank + slack)]
            assert lo <= got <= hi, (
                f"{r['source']} p{int(q*100)}: {got} outside [{lo}, {hi}]"
            )


def test_streaming_hll_equals_batch_sketch_exactly(spark, sf_dir):
    """HLL register state is a per-register max, so the converged streaming
    sketch must equal the batch sketch over the same rows — estimate
    EQUALITY, not just error-bound agreement — and both sit within the
    bound of the exact count."""
    from kin_data_pipeline_spark.queries.extended import _HLL_LGK

    streamed = {
        r["day"]: (r["approx_users"], r["n_events"])
        for r in streaming_approx_daily_users_estimates(spark, sf_dir).collect()
    }
    batch = {
        r["day"]: (r["approx_users"], r["n_events"])
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy(F.to_date("ts").alias("day"))
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id", F.lit(_HLL_LGK))
                ).alias("approx_users"),
                F.count(F.lit(1)).alias("n_events"),
            )
            .collect()
        )
    }
    assert streamed == batch
    exact = {
        r["day"]: r["u"]
        for r in (
            load_table(spark, sf_dir, "events")
            .groupBy(F.to_date("ts").alias("day"))
            .agg(F.countDistinct("user_id").alias("u"))
            .collect()
        )
    }
    for day, (est, _) in streamed.items():
        assert abs(est - exact[day]) <= max(2, 0.05 * exact[day]), day


def test_registered_sketch_audits_all_within_bound(spark, sf_dir):
    """The driver-checkable audit terminals: every row of every registered
    sketch query carries within_bound == 1 on the test corpus — the same
    claim the DuckDB oracle's literal 1 makes, proven Spark-side."""
    for name in (
        "approx_daily_active_users",
        "hll_user_rollup_weekly",
        "approx_length_percentiles",
        "streaming_approx_daily_users",
    ):
        rows = QUERIES[name].fn(spark, sf_dir).collect()
        assert rows, name
        bad = [r for r in rows if r["within_bound"] != 1]
        assert not bad, f"{name}: estimates outside bound on {bad[:3]}"


def test_registered_percentile_audit_exact_values(spark, sf_dir):
    """The exact integer-rank percentiles the audit emits match a direct
    sorted-list selection at rank ((n-1)·k) div d."""
    rows = {
        r["source"]: r
        for r in QUERIES["approx_length_percentiles"].fn(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    for source, r in rows.items():
        vals = sorted(
            x[0]
            for x in docs.filter(F.col("source") == source)
            .select("n_chars")
            .collect()
        )
        n = len(vals)
        assert n == r["n_docs"]
        for name, k, d in _PCT_RANKS:
            assert r[name] == vals[((n - 1) * k) // d], (source, name)
