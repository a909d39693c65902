"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action (collect on aggregated
results) so the full plan runs; session build time is excluded from
per-query numbers but a warmup query absorbs JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import time

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    from kin_data_pipeline_spark.queries import QUERIES
    from kin_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="kin-pipeline-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + codegen + parquet footer caches.
    from kin_data_pipeline_spark.sources.catalog import load_table

    load_table(spark, sf_dir, "lineitem").count()

    timings: dict[str, float] = {}
    for name, spec in QUERIES.items():
        t0 = time.monotonic()
        df = spec.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.monotonic() - t0, 3)
        assert n >= 0

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()

if __name__ == "__main__":
    main()
