"""Per-query wall-time sweep at an arbitrary SF dir, written INCREMENTALLY.

    python scripts/sweep_sf.py --sf-dir .scratch/sf1 --out /tmp/sweep_sf1.jsonl

Unlike bench.py (one JSON line at the end, best-of-two), this driver times
each registered query once on a warm session and appends one JSON line per
query as it completes — a timeout or crash salvages everything finished so
far. Used for the sf1 superlinearity sweep (VERDICT r4 ask #3): ratios of
per-query wall time across SF dirs, not contract numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--skip", default="", help="comma-separated query names")
    ap.add_argument("--only", default="", help="comma-separated query names")
    args = ap.parse_args()

    from kin_data_pipeline_spark.queries import queries
    from kin_data_pipeline_spark.session import get_spark
    from kin_data_pipeline_spark.sources.catalog import load_table

    spark = get_spark(app_name="sf-sweep", master=f"local[{args.cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    for tbl in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, args.sf_dir, tbl).count()

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {json.loads(line)["query"] for line in f if line.strip()}
    skip = {s for s in args.skip.split(",") if s}
    only = {s for s in args.only.split(",") if s}
    for name, fn in queries().items():
        if name in done or name in skip or (only and name not in only):
            continue
        t0 = time.time()
        try:
            n = fn(spark, args.sf_dir).count()
            row = {"query": name, "sec": round(time.time() - t0, 3), "rows": n}
        except Exception as exc:  # salvage the sweep on a single failure
            row = {
                "query": name,
                "sec": round(time.time() - t0, 3),
                "error": str(exc)[:200],
            }
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")
        print(row, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
