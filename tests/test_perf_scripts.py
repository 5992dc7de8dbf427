"""Smoke coverage for the perf CLI scripts (tiny CPU configs — guards
against bitrot; real numbers come from TPU runs, see docs/PERF.md)."""

import json
import os
import subprocess
import sys


def test_train_bench_smoke():
    env = {**os.environ, "PYTHONPATH": "", "JAX_PLATFORMS": "cpu"}
    result = subprocess.run(
        [sys.executable, "perf/train_bench.py", "--batch", "2", "--iters", "1"],
        capture_output=True, text=True, cwd=".", env=env, timeout=600,
    )
    assert result.returncode == 0, result.stderr[-500:]
    payload = json.loads(result.stdout.strip().splitlines()[-1])
    assert payload["examples_per_s"] > 0 and payload["model"] == "colqwen2-2b-lora"
