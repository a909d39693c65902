"""Round-11 measurement harness (guide §1): per-query noop-sink timing +
``explain("formatted")`` capture for a named subset of the registry.

Usage:
    python scripts/profile_queries.py [--plans-dir plans/r11] [--tag before] \
        [--runs 2] [query ...]

With no query names, profiles every registered query. For each query it
records:
  - noop-sink wall time (best of ``--runs``; the computation, not the sink —
    guide §1.4) plus the first-run time (one-time substrate/codegen cost),
  - the formatted physical plan to ``<plans-dir>/<name>_<tag>.txt``,
  - plan-shape counters (Exchange count, join strategies, Python eval nodes,
    WholeStageCodegen spans, PushedFilters presence),
  - streaming micro-batch stats when the query drove a stream.

Writes a JSON summary to ``<plans-dir>/profile_<tag>.json``. Jobs are
labelled (guide §1.5) so a live UI run is readable.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_shape(plan_text: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan_text)),
        "sort_merge_joins": len(re.findall(r"\bSortMergeJoin\b", plan_text)),
        "broadcast_hash_joins": len(re.findall(r"\bBroadcastHashJoin\b", plan_text)),
        "shuffled_hash_joins": len(re.findall(r"\bShuffledHashJoin\b", plan_text)),
        "bnl_joins": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan_text)),
        "python_evals": len(
            re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas)\b", plan_text)
        ),
        "codegen_spans": len(re.findall(r"\bWholeStageCodegen", plan_text)),
        "sorts": len(re.findall(r"\bSort\b", plan_text)),
        "aqe": "AdaptiveSparkPlan" in plan_text,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans-dir", default="plans/r11")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true", help="skip explain capture")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from kin_data_pipeline_spark.queries import queries
    from kin_data_pipeline_spark.queries.extended import STREAM_RUN_STATS
    from kin_data_pipeline_spark.session import get_spark
    from kin_data_pipeline_spark.sources.catalog import load_table

    spark = get_spark(app_name="r11-profile", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    for tbl in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, tbl).count()

    reg = queries()
    names = args.names or list(reg)
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    os.makedirs(args.plans_dir, exist_ok=True)
    out: dict[str, dict] = {}
    for name in names:
        fn = reg[name]
        runs = []
        stream_stats = None
        for i in range(args.runs):
            STREAM_RUN_STATS.clear()
            spark.sparkContext.setJobDescription(f"{name} [{args.tag} run {i}]")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.monotonic() - t0, 3))
            if STREAM_RUN_STATS:
                stream_stats = {k: dict(v) for k, v in STREAM_RUN_STATS.items()}
        spark.sparkContext.setJobDescription(None)
        rec = {"best": min(runs), "first": runs[0], "runs": runs}
        if stream_stats:
            rec["streams"] = stream_stats
        if not args.no_plans:
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
            rec["shape"] = plan_shape(plan)
        out[name] = rec
        print(f"{rec['best']:8.2f} (first {rec['first']:7.2f})  {name}", file=sys.stderr)

    summary_path = os.path.join(args.plans_dir, f"profile_{args.tag}.json")
    with open(summary_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {summary_path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
