"""End-to-end example: the reference warehouse AND the corpus release,
materialized through the engine into a local catalog.

    python examples/run_warehouse.py [sf_dir] [warehouse_dir]

What it does (the switch-over path a reference user follows — see
MIGRATION.md for the file-by-file mapping):

1. builds the FULL kin model DAG (facts → marts → KRE chain → API
   summaries → clones → camelCase exports) with data-quality contracts
   enforced before every write, like `execute_snowflake_load.py` but with
   explicit dependency order instead of filename sort;
2. runs a second INCREMENTAL pass to show the high-watermark append path
   (`incremental_anchor.sql` semantics) — all models no-op because no new
   data arrived;
3. publishes every table as a SQL view and runs a reporting query;
4. runs the corpus-release DAG (quality gate → near-dup survivors →
   shards + substring-cleaned variant) and exports the training shards;
5. snapshots the release, simulates a bad rewrite, and restores —
   the zero-copy time-travel path (Catalog.snapshot/table_at/restore);
6. applies a CDC changelog (update + erasure + late insert) to the
   survivors table in one latest-wins merge pass
   (Catalog.apply_changelog) and shows the reapply no-op;
7. sweeps scratch + prunes snapshots (Catalog.vacuum);
8. opts the table into NUMBERED versions and walks the Delta-style
   surface: auto-committed history, VERSION AS OF reads, RESTORE to a
   version (itself a commit), and the change-data-feed read both as a
   bounded batch (read_table_changes) and as a stream through the
   custom catalog_changes Python Data Source (stream_table_changes).
"""

from __future__ import annotations

import datetime
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="kin_wh_")

    from kin_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="kin-warehouse-example")
    try:
        _run(spark, sf_dir, wh)
    finally:
        spark.stop()
        if len(sys.argv) <= 2:  # auto-created tempdir: never leave it behind
            shutil.rmtree(wh, ignore_errors=True)

def _run(spark, sf_dir: str, wh: str) -> None:
    from kin_data_pipeline_spark.models.corpus import (
        corpus_release_models,
        export_release,
    )
    from kin_data_pipeline_spark.models.kin import RUN_DATE
    from kin_data_pipeline_spark.models.pipeline import build_kin_models
    from kin_data_pipeline_spark.plans.engine import Catalog, Runner

    spark.sparkContext.setLogLevel("ERROR")
    catalog = Catalog(spark, wh)
    runner = Runner(spark, catalog)

    models = build_kin_models(sf_dir)
    print(f"[1/8] full refresh: {len(models)} models -> {wh}")
    results = runner.run(models, RUN_DATE, build_type="full_refresh")
    total = sum(r.duration_sec or 0 for r in results)
    slowest = max(results, key=lambda r: r.duration_sec or 0)
    print(f"      built {len(results)} tables in {total:.1f}s "
          f"(slowest: {slowest.model}, {slowest.duration_sec or 0:.1f}s)")

    print("[2/8] incremental pass (no new data -> watermark no-ops)")
    results = runner.run(models, RUN_DATE)
    print(f"      {sum(1 for r in results if r.action == 'incremental')} incremental, "
          f"{sum(1 for r in results if r.action == 'full')} full")

    print("[3/8] SQL surface")
    catalog.publish_views()
    spark.sql(
        """
        SELECT date_key, transaction_count, active_user_balance
        FROM daily_kre_summary ORDER BY date_key DESC LIMIT 5
        """
    ).show(truncate=False)

    print("[4/8] corpus release")
    runner.run(corpus_release_models(sf_dir), datetime.date(2024, 2, 1))
    for t in ("corpus_quality", "corpus_survivors", "corpus_shards", "corpus_clean"):
        print(f"      {t}: {catalog.table(t).count()} rows")
    out = wh + "/release"
    export_release(catalog, out)
    print(f"      shards exported to {out}")

    print("[5/8] snapshot / time travel")
    n0 = catalog.table("corpus_survivors").count()
    catalog.snapshot("corpus_survivors", "release-1")
    # simulate an operator error: the table is overwritten with one row
    catalog.write_full(
        "corpus_survivors", catalog.table("corpus_survivors").limit(1), date_col=None
    )
    broken = catalog.table("corpus_survivors").count()
    at = catalog.table_at("corpus_survivors", "release-1").count()
    catalog.restore("corpus_survivors", "release-1")
    print(f"      {n0} rows -> bad rewrite left {broken} -> snapshot still "
          f"{at} -> restored {catalog.table('corpus_survivors').count()}")

    print("[6/8] CDC changelog apply")
    from pyspark.sql import functions as F

    surv = catalog.table("corpus_survivors")
    cols = surv.columns
    two = surv.orderBy("doc_id").limit(2).collect()
    upd = dict(zip(cols, two[0]))
    upd["source"] = "src_corrected"
    log = spark.createDataFrame(
        [
            tuple(upd[c] for c in cols) + ("U", 2),
            tuple(dict(zip(cols, two[1]))[c] for c in cols) + ("D", 1),
        ],
        surv.schema.add("op", "string").add("seq", "long"),
    )
    counts = catalog.apply_changelog("corpus_survivors", log, ["doc_id"])
    n1 = catalog.table("corpus_survivors").count()
    counts2 = catalog.apply_changelog("corpus_survivors", log, ["doc_id"])
    n2 = catalog.table("corpus_survivors").count()
    corrected = (
        catalog.table("corpus_survivors")
        .filter(F.col("source") == "src_corrected")
        .count()
    )
    print(
        f"      applied {counts} -> {n1} rows ({corrected} corrected); "
        f"reapply {counts2} is a no-op -> {n2} rows"
    )

    print("[7/8] maintenance vacuum")
    catalog.snapshot("corpus_survivors", "pre_vacuum")
    report = catalog.vacuum(keep_snapshots=1, min_age_s=0.0)
    print(
        f"      swept {len(report['scratch_removed'])} orphans; snapshots "
        f"pruned to newest per table: {report['snapshots_dropped']}"
    )

    print("[8/8] numbered versions: time travel, RESTORE, CDF batch + stream")
    from kin_data_pipeline_spark.streaming import (
        read_table_changes,
        stream_table_changes,
    )

    catalog.enable_versioning("corpus_survivors")  # v0 = current state
    catalog.delete_by_keys(
        "corpus_survivors", "doc_id", [r.doc_id for r in two]
    )  # v1
    new_v = catalog.restore_version("corpus_survivors", 0)  # v2 == v0's data
    hist = [(e["version"], e["operation"]) for e in catalog.history("corpus_survivors")]
    print(f"      history: {hist} (restore committed v{new_v})")
    v1 = catalog.table_at_version("corpus_survivors", 1).count()
    live = catalog.table("corpus_survivors").count()
    print(f"      VERSION AS OF 1: {v1} rows; live after restore: {live}")
    # fresh read: step 6's `surv.schema.add("op", ...)` mutated that
    # StructType in place (StructType.add appends to self)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in catalog.table("corpus_survivors").schema
    )
    cdf = read_table_changes(spark, catalog.warehouse_dir, "corpus_survivors", ddl)
    by = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in cdf.groupBy("_commit_version", "_change_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    print(f"      batch CDF per commit: {by}")
    st = stream_table_changes(spark, catalog.warehouse_dir, "corpus_survivors", ddl)
    q = (
        st.writeStream.format("memory").queryName("cdf_demo")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    print(
        f"      streaming CDF replay: {spark.table('cdf_demo').count()} "
        "change rows (== batch)"
    )

if __name__ == "__main__":
    main()
