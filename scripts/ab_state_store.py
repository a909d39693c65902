"""A/B the streaming state-store provider (VERDICT r11 #6): in-heap
HDFSBackedStateStoreProvider (default) vs RocksDBStateStoreProvider at
the engine's 4 state partitions, over the stateful streaming queries.
Best-of-2 per query per provider, one process, providers interleaved so
box drift hits both.

Usage: SPARK_GRAFT_SF_DIR=... python scripts/ab_state_store.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = [
    "streaming_purchase_view_join",
    "streaming_purchase_view_left_join",
    "streaming_static_enrichment_join",
    "streaming_daily_rollup",
    "streaming_user_sessions",
    "streaming_running_balance",
]
PROVIDERS = {
    "hdfs_inheap": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def main() -> None:
    from kin_data_pipeline_spark.queries import queries
    from kin_data_pipeline_spark.session import get_spark
    from kin_data_pipeline_spark.sources.catalog import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="state-store-ab", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    load_table(spark, SF_DIR, "events").count()
    qs = queries()
    key = "spark.sql.streaming.stateStore.providerClass"
    res: dict[str, dict[str, float]] = {}
    # interleave providers per query so drift is shared
    for n in QUERIES:
        for pname, cls in PROVIDERS.items():
            spark.conf.set(key, cls)  # _stream_session clones inherit
            runs = []
            for _ in range(2):
                t0 = time.monotonic()
                qs[n](spark, SF_DIR).count()
                runs.append(time.monotonic() - t0)
            res.setdefault(n, {})[pname] = round(min(runs), 3)
        spark.conf.unset(key)
    print(json.dumps({"sf_dir": SF_DIR, "results": res}, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
