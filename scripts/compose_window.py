"""Compute the next round's verification-window composition.

Implements the rotation policy tests/test_registry_window.py enforces,
so round prep is mechanical:

1. Effective green rows = driver CORRECTNESS rows gated by
   PLAN_MANIFEST.json `since` (code-aware: rows older than the query's
   last semantic change don't count).
2. Never-green queries lead the window, contiguously: declared
   NEXT_WINDOW_BACKLOG order first, then the rest sorted by name.
3. Padding fills to 50 slots oldest-green-first (ties by name); every
   query whose last green row would violate MAX_STALENESS at the target
   round MUST land in the window — the script fails loudly if the
   geometry doesn't fit.
4. Whatever never-green overflow remains becomes the new backlog
   (capacity-checked against the 30-slot cap).

Usage (after bumping ROUND in queries/__init__.py and regenerating
PLAN_MANIFEST.json):

    python scripts/compose_window.py [--round N]

Prints the CURRENT_WINDOW_HEAD / NEXT_WINDOW_BACKLOG list literals to
paste into kin_data_pipeline_spark/queries/__init__.py.

When never-green queries overflow the window, WHICH of them wait in the
backlog is a judgment call the invariants don't constrain: prefer
keeping value-changed queries in the window and deferring contract-only
renames (round 6 did exactly that by hand). This script's default —
declared-backlog order first — is a valid starting point; reorder the
head before pasting if the round has a better priority.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WINDOW = 50
BACKLOG_CAP = 30


def main() -> None:
    import math

    from kin_data_pipeline_spark import queries as q

    # Geometry-derived staleness bound, mirroring
    # tests/test_registry_window.py: the window re-verifies the registry
    # every ceil(len/WINDOW) rounds (VERDICT r7 ask #2).
    max_staleness = math.ceil(len(q.QUERIES) / WINDOW)

    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=q.ROUND)
    rnd = ap.parse_args().round

    with open(os.path.join(REPO, "PLAN_MANIFEST.json")) as f:
        since = {k: int(v) for k, v in json.load(f)["since"].items()}

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        r = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if r < since.get(name, 1):
                continue
            if row.get("hash_match") or (
                row.get("err") == "no_oracle" and row.get("spark_rows", 0) > 0
            ):
                latest[name] = max(latest.get(name, 0), r)

    names = set(q.QUERIES)
    never = names - set(latest)
    # never-green head: declared backlog order first, then sorted rest
    head = [n for n in q.NEXT_WINDOW_BACKLOG if n in never]
    head += sorted(never - set(head))

    # padding: must-include (stale at `rnd`) first, then oldest-green
    green = sorted(
        (n for n in names - never), key=lambda n: (latest[n], n)
    )
    must = [n for n in green if rnd - latest[n] > max_staleness]

    # stale-bound queries MUST hold window slots (they are green, so the
    # backlog rule excludes them); never-green fills the remaining head
    # and overflows into the backlog
    if len(must) >= WINDOW:
        raise SystemExit(
            f"geometry violation: {len(must)} stale-bound queries alone "
            f"exceed the {WINDOW}-slot window — verify more per round"
        )
    n_never = min(len(head), WINDOW - len(must))
    window = head[:n_never]
    overflow = head[n_never:]
    window += must
    window += [n for n in green if n not in must][: WINDOW - len(window)]

    if len(overflow) > BACKLOG_CAP:
        raise SystemExit(
            f"backlog overflow: {len(overflow)} never-green queries beyond "
            f"the window exceed the {BACKLOG_CAP}-slot cap"
        )

    print(f"# round {rnd}: {len(never)} never-green, {len(must)} stale-bound")
    print("CURRENT_WINDOW_HEAD = [")
    for n in window:
        print(f'    "{n}",')
    print("]")
    print()
    print("NEXT_WINDOW_BACKLOG: list[str] = [")
    for n in overflow:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
