"""The external correctness gate checks only the first 50 registry entries —
pin the window layout so a refactor can't silently push the kin model chain
(or the round's new queries) out of verification."""

from __future__ import annotations

from kin_data_pipeline_spark import queries as q

DRIVER_WINDOW = 50

def test_driver_window_covers_kin_chain_and_new_queries():
    names = list(q.queries())
    window = set(names[:DRIVER_WINDOW])
    kin = {n for n in names if n.startswith("kin_")}
    assert kin <= window, f"kin queries outside the driver window: {sorted(kin - window)}"
    for n in q._WINDOW_TAIL:
        assert n in window, f"{n} fell out of the driver window"

def test_fact_builders_lead_for_frame_cache():
    names = list(q.queries())
    assert names[0] == "kin_fact_transactions"
    assert names[1] == "kin_fact_creations"

def test_queries_and_oracles_stay_aligned():
    names = list(q.queries())
    osql = q.oracle_sql()
    assert [n for n in names if n in osql] == list(osql)
    # every query has an oracle except the sketch-based rows-only check
    assert [n for n in names if n not in osql] == ["approx_daily_active_users"]
