"""Phase-timed lifecycle microbench (round-12 A/B evidence).

Times the versioned-lifecycle engine ops (write_full / enable_versioning /
write_append / delete_by_keys / restore_version / table_changes read) and
the lifecycle-heavy declared queries at $SPARK_GRAFT_SF_DIR, best-of-N in
ONE session — the box swings ~50% between sessions, so A/B comparisons
must run old and new code back-to-back (git stash) within minutes.

Usage: python scripts/bench_lifecycle.py [label]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TRIALS = int(os.environ.get("SPARK_GRAFT_LIFECYCLE_TRIALS", "3"))


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "run"
    from pyspark.sql import functions as F

    from kin_data_pipeline_spark.plans.engine import Catalog
    from kin_data_pipeline_spark.session import get_spark
    from kin_data_pipeline_spark.sources.catalog import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="lifecycle-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    orders.count()  # warm scan + codegen

    def timed(fn):
        t0 = time.monotonic()
        fn()
        return time.monotonic() - t0

    phases: dict[str, list[float]] = {}
    for _ in range(TRIALS):
        cat = Catalog(spark, tempfile.mkdtemp(prefix="lcb_wh_"))
        lo = orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        mid = orders.filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1999-01-01").cast("date"))
        )
        phases.setdefault("write_full", []).append(
            timed(lambda: cat.write_full("f", lo, None))
        )
        phases.setdefault("enable_versioning", []).append(
            timed(lambda: cat.enable_versioning("f"))
        )
        phases.setdefault("write_append", []).append(
            timed(lambda: cat.write_append("f", mid, None))
        )
        phases.setdefault("delete_by_keys", []).append(
            timed(lambda: cat.delete_by_keys("f", "o_orderstatus", ["F"]))
        )
        phases.setdefault("table_changes_read", []).append(
            timed(lambda: cat.table_changes("f", 0, 2).count())
        )
        phases.setdefault("restore_version", []).append(
            timed(lambda: cat.restore_version("f", 0))
        )
        import shutil

        shutil.rmtree(cat.warehouse_dir, ignore_errors=True)

    # the lifecycle-heavy declared queries, best-of-2 like the bench
    from kin_data_pipeline_spark.queries import queries

    qnames = [
        "time_travel_restore",
        "streaming_table_changes",
        "streaming_incremental_aggregate",
        "time_travel_changes",
        "cdf_incremental_aggregate",
        "cdf_incremental_minmax",
    ]
    qs = queries()
    qtimes: dict[str, float] = {}
    for n in qnames:
        runs = []
        for _ in range(2):
            t0 = time.monotonic()
            qs[n](spark, SF_DIR).count()
            runs.append(time.monotonic() - t0)
        qtimes[n] = round(min(runs), 3)

    out = {
        "label": label,
        "sf_dir": SF_DIR,
        "phases_best": {k: round(min(v), 3) for k, v in phases.items()},
        "phases_all": {k: [round(x, 3) for x in v] for k, v in phases.items()},
        "queries_best_of_2": qtimes,
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
