"""The external correctness gate checks only the first 50 registry entries —
pin the window layout so a refactor can't silently push this round's
never-driver-green queries out of verification. Window composition is an
explicit, reviewed decision: ROUND4_WINDOW_HEAD is the manifest, and this
suite is its review.

Round-4 hardening (VERDICT r3 ask #2): coverage counts only GREEN driver
rows. The round-3 version unioned *all* names in prior CORRECTNESS files,
so a query that hash-FAILED in round 1 counted as "covered" forever and the
12 r1-red relational queries never rotated back into a window.
"""

from __future__ import annotations

import glob
import json
import os

from kin_data_pipeline_spark import queries as q

DRIVER_WINDOW = 50

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_green_names() -> set[str]:
    """Queries with a GREEN driver CORRECTNESS row in any completed round.

    Green = hash_match true, or (for rows-only sketch queries) the weaker
    rows-check: err == 'no_oracle' with spark_rows > 0. A FAIL row is a
    verification *debt*, not coverage.
    """
    names: set[str] = set()
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("hash_match") or (
                row.get("err") == "no_oracle" and row.get("spark_rows", 0) > 0
            ):
                names.add(name)
    return names


def test_window_is_exactly_the_round4_manifest():
    names = list(q.queries())
    assert names[:DRIVER_WINDOW] == q.ROUND4_WINDOW_HEAD


def test_round4_manifest_is_50_registered_queries():
    assert len(q.ROUND4_WINDOW_HEAD) == DRIVER_WINDOW
    assert len(set(q.ROUND4_WINDOW_HEAD)) == DRIVER_WINDOW
    missing = [n for n in q.ROUND4_WINDOW_HEAD if n not in q.QUERIES]
    assert not missing, f"manifest names not registered: {missing}"


def test_every_query_driver_green_or_windowed_or_backlogged():
    """The rotation discipline, green-only: prior-round GREEN rows ∪ this
    round's window ∪ the declared next-round backlog ⊇ registry. A query may
    only lack a green driver row if it holds a slot in the current window or
    is explicitly queued for the next one — nothing falls through the
    rotation untracked, and a FAIL row never counts as coverage."""
    covered = (
        _driver_green_names()
        | set(q.ROUND4_WINDOW_HEAD)
        | set(q.ROUND5_WINDOW_BACKLOG)
    )
    never = sorted(set(q.queries()) - covered)
    assert not never, f"queries that would still lack a green driver row: {never}"


def test_round4_window_leads_with_the_unverified():
    """Verification closure: every query with no green driver row from
    r1/r2/r3 must sit in the round-4 window (or the round-5 backlog) — the
    whole point of this round's rotation."""
    never_green = set(q.queries()) - _driver_green_names()
    out = sorted(
        never_green - set(q.ROUND4_WINDOW_HEAD) - set(q.ROUND5_WINDOW_BACKLOG)
    )
    assert not out, f"never-green queries outside the window/backlog: {out}"
    # and they lead: all never-green window entries come before the padding
    head = q.ROUND4_WINDOW_HEAD
    idx = [i for i, n in enumerate(head) if n in never_green]
    assert idx == list(range(len(idx))), (
        "never-green queries must occupy the head slots contiguously"
    )


def test_round5_backlog_is_exactly_the_post_window_additions():
    """Round-agnostic backlog freshness rule (VERDICT r3 ask #9): the
    next-round backlog must be exactly the registered queries that have no
    green driver row and no slot in the current window — any query
    registered after the window filled lands here at registration time, and
    nothing already covered squats in it."""
    backlog = q.ROUND5_WINDOW_BACKLOG
    assert len(set(backlog)) == len(backlog)
    expected = sorted(
        set(q.queries()) - _driver_green_names() - set(q.ROUND4_WINDOW_HEAD)
    )
    assert sorted(backlog) == expected, (
        f"backlog drift: declared={sorted(backlog)} expected={expected}"
    )
    assert len(backlog) <= 30, "backlog exceeds what one window rotation absorbs"


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
    """QUERIES.md is the generated registry index — regenerate it with
    scripts/gen_queries_md.py when the registry changes."""
    md = open(os.path.join(_REPO, "QUERIES.md")).read()
    for name in q.QUERIES:
        assert f"| `{name}` |" in md, f"QUERIES.md missing {name} — regenerate"
    listed = md.count("| `")
    assert listed == len(q.QUERIES), (
        f"QUERIES.md lists {listed} queries, registry has {len(q.QUERIES)}"
    )
