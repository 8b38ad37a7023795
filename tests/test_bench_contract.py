"""Driver contract for bench.py: exactly one JSON line on stdout with
the required keys, runnable at any scale factor via SPARK_GRAFT_SF_DIR."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_emits_single_json_line():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        cwd=str(REPO),
        timeout=480,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got {len(lines)}: {lines[:3]}"
    payload = json.loads(lines[0])
    assert payload["metric"] == "bench_total_wall"
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert isinstance(payload["value"], (int, float)) and payload["value"] > 0
    assert payload["queries"] and all(v >= 0 for v in payload["queries"].values())
    assert abs(sum(payload["queries"].values()) - payload["value"]) < 0.05
