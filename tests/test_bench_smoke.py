"""bench.py smoke: the driver runs bench.py after every round — exercise its
exact code path on tiny CPU shapes and validate the JSON contract."""

import json
import os
import subprocess
import sys


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=480, cwd=REPO, env=env,
    )


def test_bench_tiny_smoke():
    env = dict(os.environ, BENCH_TINY="1", JAX_PLATFORMS="cpu")
    out = _run_bench(env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0


def test_bench_orchestrator_success_path():
    """The resilient wrapper (preflight -> bounded child -> re-printed JSON)
    end-to-end on CPU: BENCH_FORCE_ORCH routes the tiny run through
    _orchestrate; the child inherits BENCH_TINY and prints the real line."""
    env = dict(os.environ, BENCH_TINY="1", BENCH_FORCE_ORCH="1",
               JAX_PLATFORMS="cpu", BENCH_RETRY_SLEEP="1")
    # DELIBERATE sitecustomize drop (normally NEVER replace PYTHONPATH —
    # CLAUDE.md): this test must keep the preflight off the (possibly
    # busy/hung) TPU tunnel, and the axon plugin's sitecustomize would
    # re-register the backend. Works only because JAX_PLATFORMS=cpu is
    # set in the same env. Do not copy this pattern without that pin.
    env["PYTHONPATH"] = REPO
    out = _run_bench(env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] > 0, rec


def test_bench_orchestrator_diagnostic_on_dead_backend():
    """With an unreachable backend the wrapper must emit a diagnostic JSON
    with rc=0, never an rc=1 traceback (BENCH_r03.json failure mode).
    Simulated by pinning a platform that has no registered plugin."""
    env = dict(os.environ, JAX_PLATFORMS="nosuchplatform",
               BENCH_PREFLIGHT_TRIES="2", BENCH_RETRY_SLEEP="0",
               BENCH_PREFLIGHT_TIMEOUT="60")
    env["PYTHONPATH"] = REPO  # no axon sitecustomize: the pin stays in effect
    out = _run_bench(env)
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["value"] == 0.0
    assert "error" in rec and rec["error"], rec
