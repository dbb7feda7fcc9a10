"""bench.py smoke: the driver runs bench.py after every round — exercise its
exact code path on tiny CPU shapes and validate the JSON contract."""

import json
import os
import subprocess
import sys


def test_bench_tiny_smoke():
    env = dict(os.environ, BENCH_TINY="1", JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=480, cwd=repo, env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0
