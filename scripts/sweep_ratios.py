"""Compare two sweep_sf.py outputs and report per-query scaling ratios.

    python scripts/sweep_ratios.py /tmp/sweep_sf01.jsonl /tmp/sweep_sf1.jsonl \
        --factor 10 --flag 15

Linear scaling at data factor F costs ≈ F× wall time minus fixed overhead;
queries whose ratio exceeds ``--flag`` (default 1.5·F) are superlinearity
suspects. Sub-second base times are noise-dominated (session overhead,
codegen) and are reported but only flagged when the scaled time is also
material (> 2s).
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict[str, dict]:
    out = {}
    with open(path) as f:
        for line in f:
            if line.strip():
                row = json.loads(line)
                out[row["query"]] = row
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("base")
    ap.add_argument("scaled")
    ap.add_argument("--factor", type=float, default=10.0)
    ap.add_argument("--flag", type=float, default=15.0)
    args = ap.parse_args()
    base, scaled = load(args.base), load(args.scaled)
    rows = []
    for name, b in base.items():
        s = scaled.get(name)
        if not s or "error" in s or "error" in b:
            rows.append((float("inf"), name, b.get("sec"), s and s.get("sec"),
                         (s or {}).get("error") or b.get("error") or "missing"))
            continue
        ratio = s["sec"] / max(b["sec"], 1e-9)
        rows.append((ratio, name, b["sec"], s["sec"], None))
    rows.sort(reverse=True)
    total_b = sum(b["sec"] for b in base.values() if "error" not in b)
    total_s = sum(s["sec"] for s in scaled.values() if "error" not in s)
    print(f"total: base {total_b:.1f}s -> scaled {total_s:.1f}s "
          f"(x{total_s / total_b:.1f} at data x{args.factor:g})")
    flagged = 0
    for ratio, name, bs, ss, err in rows:
        if err:
            print(f"  !! {name}: {err}")
            flagged += 1
            continue
        mark = ""
        if ratio > args.flag and ss > 2.0:
            mark = " <-- SUPERLINEAR?"
            flagged += 1
        if ratio > args.factor * 0.8 or mark:
            print(f"  {name}: {bs:.2f}s -> {ss:.2f}s (x{ratio:.1f}){mark}")
    print(f"{flagged} flagged of {len(rows)}")


if __name__ == "__main__":
    main()
