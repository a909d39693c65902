"""Dump ``explain('formatted')`` for named queries to plans/<round>/<q>_<tag>.txt.

Usage: python scripts/dump_plans.py <outdir> <tag> <query> [<query> ...]

Runs on a small local session (local[4], sf0.001 by default via
SPARK_GRAFT_TEST_SF_DIR) — plan SHAPE is SF-independent for these dumps;
fixture-building queries still execute their scratch lifecycle, which is
why this is a standalone script and never part of bench.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir, tag, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    os.makedirs(outdir, exist_ok=True)

    from kin_data_pipeline_spark.queries import queries
    from kin_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-dump", master="local[4]", shuffle_partitions=4)
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
