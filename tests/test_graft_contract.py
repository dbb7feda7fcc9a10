"""Driver-contract tests: __graft_entry__.entry() must stay jittable and
dryrun_multichip must compile+run the dp×tp train step on an 8-device mesh —
the same checks the round driver performs.

Round-1 regression (VERDICT.md #1): the driver invokes dryrun_multichip in an
env where jax.devices() is a SINGLE device; the entry must self-provision a
CPU mesh. These tests never skip on device count — that masking is exactly
what let MULTICHIP_r01 go red while tests stayed green.
"""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8_inline():
    # Under conftest's 8-device virtual CPU mesh the body runs in-process.
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # asserts finite loss internally


def test_dryrun_multichip_self_provisions_from_one_device():
    """Reproduce the driver's env: a fresh interpreter that sees ONE device
    (cpu, no forced device count) calls dryrun_multichip(8). Must pass via
    the subprocess re-exec path, not skip."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = ""  # no virtual devices: jax.devices() == 1
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__\n"
        "assert len(jax.devices()) == 1, jax.devices()\n"
        "__graft_entry__.dryrun_multichip(8)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, f"stderr: {proc.stderr[-3000:]}"
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout


def test_dryrun_never_probes_devices_under_nonCpu_env(monkeypatch):
    """Round-3 regression (VERDICT r3 weak #1): with JAX_PLATFORMS=axon and a
    hung tunnel, the old preflight `len(jax.devices())` initialized the broken
    backend and MULTICHIP_r03 timed out (rc=124). A CPU-only correctness check
    must never depend on TPU backend health: when the env pins a non-cpu
    platform the parent must go straight to the subprocess re-exec WITHOUT
    calling jax.devices() at all (an exception-catching fallback is not
    enough — the real failure mode is a hang, not an error)."""
    import __graft_entry__ as g

    called = []

    def probe(*a, **k):
        called.append(1)
        raise RuntimeError("backend touched")

    monkeypatch.setattr(jax, "devices", probe)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    g.dryrun_multichip(2)
    assert not called, "dryrun_multichip touched jax.devices() under axon env"


def test_dryrun_completes_with_hanging_backend_and_axon_config():
    """Same failure env but via jax.config (the sitecustomize's override path):
    config says 'axon' and jax.devices() HANGS. dryrun_multichip must finish
    in bounded time through the forced-CPU subprocess."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    pp = env.get("PYTHONPATH", "")
    env["PYTHONPATH"] = REPO + (os.pathsep + pp if pp else "")
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'axon')\n"
        "import time\n"
        "jax.devices = lambda *a, **k: time.sleep(600)  # simulate hung tunnel\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__\n"
        "__graft_entry__.dryrun_multichip(2)\n"
        "print('NO-HANG')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, f"stderr: {proc.stderr[-3000:]}"
    assert "NO-HANG" in proc.stdout, proc.stdout
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout


def test_entry_abstract_eval():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape[0] == 2 and out.shape[-1] == 50267
