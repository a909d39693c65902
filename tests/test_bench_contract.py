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
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS="8")
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
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec"
    assert str(payload["sf"]) in sf_dir
    assert payload["value"] > 0

    from kin_data_pipeline_spark.queries import queries

    assert set(payload["queries"]) == set(queries())
    assert all(v >= 0 for v in payload["queries"].values())
