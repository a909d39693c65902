"""Isolate WHY the fleet runs faster at 8 cores than 32 (VERDICT r11 #2).

Runs a handful of the worst 32-core offenders (TPC-H-shape aggregates and
a streaming query) on local[$SPARK_GRAFT_CPUS] under several conf
variants, best-of-2 each, in ONE session per variant set — prints a
variant x query timing table. Variants toggle the candidate mechanisms:

  base        session defaults (shuffle.partitions = cpus, minPartitionNum
              = defaultParallelism via leafNodeDefaultParallelism)
  minpart1    spark.sql.files.minPartitionNum=1 (+ leafNodeDefaultParallelism=8)
  shuf8       spark.sql.shuffle.partitions=8
  both        minpart1 + shuf8

Usage: python scripts/probe_core_overhead.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "national_market_share_q8",
    "ps_min_cost_supplier_q2",
    "ps_nation_profit_q9",
    "promo_revenue_share_q14",
    "top_supplier_revenue_q15",
    "countmin_token_estimates",
    "bm25_doc_scores",
    "priority_late_orders_q4",
]

VARIANTS = {
    "base": {},
    "minpart1": {
        "spark.sql.files.minPartitionNum": "1",
        "spark.sql.leafNodeDefaultParallelism": "8",
    },
    "shuf8": {"spark.sql.shuffle.partitions": "8"},
    "both": {
        "spark.sql.files.minPartitionNum": "1",
        "spark.sql.leafNodeDefaultParallelism": "8",
        "spark.sql.shuffle.partitions": "8",
    },
}


def main() -> None:
    from kin_data_pipeline_spark.queries import queries
    from kin_data_pipeline_spark.session import get_spark
    from kin_data_pipeline_spark.sources.catalog import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="core-overhead-probe", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("lineitem", "orders", "partsupp", "part", "supplier",
              "customer", "nation", "region", "documents"):
        try:
            load_table(spark, SF_DIR, t).count()
        except Exception:
            pass

    qs = queries()
    results: dict[str, dict[str, float]] = {}
    base_conf = {k: spark.conf.get(k, None) for v in VARIANTS.values() for k in v}
    for vname, conf in VARIANTS.items():
        for k, v in conf.items():
            spark.conf.set(k, v)
        for n in QUERIES:
            runs = []
            for _ in range(2):
                t0 = time.monotonic()
                qs[n](spark, SF_DIR).count()
                runs.append(time.monotonic() - t0)
            results.setdefault(n, {})[vname] = round(min(runs), 3)
        for k in conf:
            if base_conf.get(k) is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, base_conf[k])

    print(json.dumps({"cpus": cpus, "results": results}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
