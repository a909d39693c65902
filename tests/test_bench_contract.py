"""The driver parses bench.py stdout as ONE JSON line — a contract that
broke silently in round 1 (Spark banners polluted stdout → `parsed: null`).
Run the real CLI end-to-end at the smallest scale and pin the shape."""

from __future__ import annotations

import json
import os
import subprocess
import sys

def test_bench_stdout_is_one_parseable_json_line():
    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS="8",
        # keep the committed sf0.1 BENCH_SELF.json out of the blast radius
        SPARK_GRAFT_BENCH_DETAIL="BENCH_SELF.test.json",
    )
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"stdout must be exactly one line, got {len(lines)}"
    # Round-2 regression: a ~4 KB line exceeded what the driver's parser
    # records (2000-char tail) → parsed: null. Keep the line comfortably
    # under that budget.
    assert len(lines[0]) < 1500, f"stdout line too long ({len(lines[0])} bytes)"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert str(payload["sf"]) in sf_dir
    assert payload["value"] > 0

    from kin_data_pipeline_spark.queries import queries

    all_names = set(queries())
    assert payload["n_queries"] == len(all_names)
    assert len(payload["queries"]) == 10
    assert set(payload["queries"]) <= all_names
    assert all(v >= 0 for v in payload["queries"].values())

    # Full per-query detail (steady-state + cold) lives in the sidecar.
    detail_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        payload["detail"],
    )
    with open(detail_path) as fh:
        detail = json.load(fh)
    assert set(detail["queries"]) == all_names
    assert set(detail["first_run"]) == all_names
    assert detail["value"] == payload["value"]
    assert all(
        detail["first_run"][k] >= detail["queries"][k] - 1e-9 for k in all_names
    )
    # Substrate attribution (VERDICT r5 ask #5): every attributed entry
    # names a real query, lists the substrate frames its first run
    # registered, and carries the first-minus-best overhead; the kin fact
    # chain guarantees at least one attributed entry exists.
    attrib = detail["substrate_attribution"]
    assert attrib and set(attrib) <= all_names
    for name, rec in attrib.items():
        assert isinstance(rec["substrates_built"], list)
        assert rec["substrate_overhead"] >= -1e-9
        # bench includes entries when the RAW first-best gap exceeds 0.5s
        # but records round(x, 3) — compare with a rounding-safe bound
        assert rec["substrates_built"] or rec["substrate_overhead"] >= 0.5 - 1e-9
    assert any(rec["substrates_built"] for rec in attrib.values())
    # Streaming execution detail (VERDICT r6 ask #2): every streaming-tier
    # query records, per bench run, the micro-batch count / input rows /
    # trigger-execution ms of each sink it drove, so a wall-clock shift is
    # adjudicable from the committed detail file alone.
    stream_detail = detail["stream_detail"]
    streaming = {n for n in all_names if n.startswith("streaming_")}
    # every streaming_* query must record sink stats; queries outside the
    # naming tier may also drive sinks (e.g. the stream-triggered Runner
    # IVM query) and record too — they just must be real queries
    assert streaming <= set(stream_detail) <= all_names
    for name, per_run in stream_detail.items():
        assert len(per_run) == 2  # one record per bench run
        for sinks in per_run:
            assert sinks, f"{name}: no sink stats captured"
            for rec in sinks.values():
                assert rec["micro_batches"] >= 1
                assert rec["input_rows"] >= 0
                assert rec["trigger_ms"] >= 0
