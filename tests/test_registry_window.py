"""The external correctness gate checks only the first 50 registry entries —
pin the window layout so a refactor can't silently push this round's
never-driver-checked queries (or the kin representatives) out of
verification. Window composition is an explicit, reviewed decision:
ROUND3_WINDOW_HEAD is the manifest, and this suite is its review."""

from __future__ import annotations

import json
import os

from kin_data_pipeline_spark import queries as q

DRIVER_WINDOW = 50

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def _driver_checked_names() -> set[str]:
    """Queries with a driver CORRECTNESS row in any completed round."""
    names: set[str] = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        path = os.path.join(_REPO, fname)
        if os.path.exists(path):
            names |= set(json.load(open(path)))
    return names

def test_window_is_exactly_the_round3_manifest():
    names = list(q.queries())
    assert names[:DRIVER_WINDOW] == q.ROUND3_WINDOW_HEAD

def test_round3_manifest_is_50_registered_queries():
    assert len(q.ROUND3_WINDOW_HEAD) == DRIVER_WINDOW
    assert len(set(q.ROUND3_WINDOW_HEAD)) == DRIVER_WINDOW
    missing = [n for n in q.ROUND3_WINDOW_HEAD if n not in q.QUERIES]
    assert not missing, f"manifest names not registered: {missing}"

def test_every_query_driver_checked_or_backlogged():
    """The rotation discipline: prior-round rows ∪ this round's window ∪ the
    declared round-4 backlog ⊇ registry. A query may only lack a driver row
    if it is explicitly queued for the next window — nothing falls through
    the rotation untracked."""
    covered = (
        _driver_checked_names()
        | set(q.ROUND3_WINDOW_HEAD)
        | set(q.ROUND4_WINDOW_BACKLOG)
    )
    never = sorted(set(q.queries()) - covered)
    assert not never, f"queries that would still lack a driver row: {never}"

def test_round4_backlog_is_exactly_the_post_window_additions():
    """The backlog must not rot in either direction: every entry is a
    registered query with no prior driver row and no round-3 slot, and it
    stays small enough that the round-4 window can absorb it with room for
    kin representatives."""
    backlog = q.ROUND4_WINDOW_BACKLOG
    assert len(set(backlog)) == len(backlog)
    already = sorted(
        set(backlog) & (_driver_checked_names() | set(q.ROUND3_WINDOW_HEAD))
    )
    assert not already, f"backlog entries already covered: {already}"
    missing = [n for n in backlog if n not in q.QUERIES]
    assert not missing, f"backlog names not registered: {missing}"
    assert len(backlog) <= 30, "backlog exceeds what one window rotation absorbs"

def test_round3_additions_lead():
    """The queries added after the first round-3 window draft take the
    head slots (displacing kin representatives that are green in r02) —
    new queries must enter the window to ever earn a driver row."""
    names = list(q.queries())
    assert names[:5] == [
        "training_shard_manifest",
        "url_domain_filter_stats",
        "token_rarity_scores",
        "repeated_chunk_stats",
        "dedup_keep_best_survivors",
    ]

def test_queries_and_oracles_stay_aligned():
    names = list(q.queries())
    osql = q.oracle_sql()
    assert [n for n in names if n in osql] == list(osql)
    # every query has an oracle except the sketch tier (estimates are
    # engine-specific; tests/test_sketches.py pins them against exact twins
    # with each sketch's published error bound)
    assert sorted(n for n in names if n not in osql) == [
        "approx_daily_active_users",
        "approx_length_percentiles",
        "hll_user_rollup_weekly",
        "streaming_approx_daily_users",
    ]

def test_queries_md_matches_registry():
    """QUERIES.md is the generated registry index — regenerate it when the
    registry changes (see the generator snippet in the repo history)."""
    md = open(os.path.join(_REPO, "QUERIES.md")).read()
    for name in q.QUERIES:
        assert f"| `{name}` |" in md, f"QUERIES.md missing {name} — regenerate"
    listed = md.count("| `")
    assert listed == len(q.QUERIES), (
        f"QUERIES.md lists {listed} queries, registry has {len(q.QUERIES)}"
    )
