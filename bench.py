"""Benchmark: captions/sec/chip for full VACNIC BART-large beam-5 decode.

North-star metric (BASELINE.json): captions/sec/chip at beam 5, max_length 50,
length_penalty 2.0 on the full multimodal model (article 512 + visual prompt +
face + NER streams). The reference decodes batch-1 through HF's Python beam
loop on an A100 (README.md:8, utils/test_mmbart_clip_ddp.py); the repo
publishes no throughput number, so `vs_baseline` is computed against a
documented estimate of that path: ~1.4 captions/sec (≈0.7 s per beam-5
50-token caption with per-step host dispatch on one A100 — BASELINE.md notes
"reference throughput must be measured or estimated").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# fused Pallas decode-stack kernel by default (kernels/decode_layer.py):
# measured 44.8 vs 40.0 captions/sec on v5e; on-chip parity in
# scripts/bench_decode_kernel.py. Opt out with VACNIC_PALLAS_DECODE=0.
os.environ.setdefault("VACNIC_PALLAS_DECODE", "1")

_REPO = os.path.dirname(os.path.abspath(__file__))
# Persistent compilation cache: if the PJRT plugin supports executable
# serialization, re-runs of the same program skip the erratic remote compile
# (45 s – 10+ min on the tunneled backend); harmless when unsupported. Must
# be set before jax initializes.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

import jax
import jax.numpy as jnp

REFERENCE_CAPTIONS_PER_SEC = 1.4  # estimated A100 batch-1 HF-loop throughput

_METRIC = "captions/sec/chip (BART-large full VACNIC, beam-5, len 50, lp 2.0)"


def _diagnostic(error: str) -> None:
    """Emit a parseable one-line JSON and exit 0: a down backend must produce
    a diagnostic artifact, not an rc=1 traceback (round-3 failure mode —
    BENCH_r03.json captured nothing and the driver kept round 2's number)."""
    print(json.dumps({
        "metric": _METRIC, "value": 0.0, "unit": "captions/sec/chip",
        "vs_baseline": 0.0, "error": error[-2000:],
    }))
    sys.exit(0)


def _preflight(timeout_s: float) -> tuple[bool, str]:
    """Tiny-jit probe in a bounded subprocess (a hung remote compile cannot be
    interrupted in-process). True = backend compiles and executes."""
    code = (
        "import jax, jax.numpy as jnp, numpy as np\n"
        "x = jnp.ones((256, 256), jnp.bfloat16)\n"
        "print(float(np.asarray(jax.jit(lambda a: a @ a)(x)).sum()))\n"
    )
    try:
        proc = subprocess.run([sys.executable, "-c", code], env=dict(os.environ),
                              capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"preflight tiny-jit timed out after {timeout_s:.0f}s (compile service hung)"
    if proc.returncode != 0:
        return False, f"preflight rc={proc.returncode}: {proc.stderr[-800:]}"
    return True, ""


def _try_measure(env: dict, run_timeout: float) -> tuple[str | None, str]:
    """One bounded real-measurement attempt in a child process. Returns
    (json_line, "") on success or (None, error)."""
    try:
        proc = subprocess.run([sys.executable, os.path.abspath(__file__)],
                              env=env, cwd=_REPO, capture_output=True,
                              text=True, timeout=run_timeout)
    except subprocess.TimeoutExpired:
        return None, f"measurement timed out after {run_timeout:.0f}s"
    line = next((ln for ln in reversed(proc.stdout.splitlines())
                 if ln.startswith("{")), None)
    if proc.returncode == 0 and line:
        return line, ""
    return None, (f"measurement rc={proc.returncode}; stderr: "
                  f"{proc.stderr[-800:]}")


def _orchestrate() -> None:
    """Outage-resilient wrapper: recovery-watcher loop (cheap preflight probe
    every BENCH_RETRY_SLEEP seconds across a BENCH_MAX_WINDOW budget — the
    CLAUDE.md compile-outage pattern), run the measurement in a bounded child
    process when a probe succeeds, and emit a diagnostic JSON on hard failure.
    The preflight is advisory, NOT a gate: it has false-flagged healthy
    windows before (queue24: full programs compiled in 210 s while the
    tiny-jit timed out at 150 s), so once the window/attempt budget is
    exhausted without a successful probe the real measurement is attempted
    anyway under BENCH_RUN_TIMEOUT. The child re-enters this file with
    BENCH_INNER=1 and prints the real JSON line, which is re-printed here."""
    tries = int(os.environ.get("BENCH_PREFLIGHT_TRIES", "9"))
    # 240 s: remote-compile latency is erratic (45 s - 10+ min per program,
    # CLAUDE.md) and the persistent cache may be empty on a fresh round
    # workdir — 150 s false-flagged a merely-slow window as "hung"
    pf_timeout = float(os.environ.get("BENCH_PREFLIGHT_TIMEOUT", "240"))
    run_timeout = float(os.environ.get("BENCH_RUN_TIMEOUT", "2400"))
    sleep_s = float(os.environ.get("BENCH_RETRY_SLEEP", "300"))
    window_s = float(os.environ.get("BENCH_MAX_WINDOW", "2700"))
    deadline = time.monotonic() + window_s
    last_err = "no attempt ran"
    env = dict(os.environ)
    env["BENCH_INNER"] = "1"
    measured = False
    for attempt in range(tries):
        if attempt:
            time.sleep(sleep_s)
        ok, err = _preflight(pf_timeout)
        if ok:
            measured = True
            line, err = _try_measure(env, run_timeout)
            if line:
                print(line)
                return
        last_err = err
        sys.stderr.write(f"[bench] attempt {attempt + 1}/{tries}: {err}\n")
        if time.monotonic() + sleep_s + pf_timeout >= deadline:
            break
    if not measured:
        # every probe failed, but the preflight is a proven false gate —
        # spend the remaining budget on one real attempt before giving up
        sys.stderr.write("[bench] probe window exhausted; attempting the real "
                         "measurement anyway (preflight is advisory)\n")
        line, err = _try_measure(env, run_timeout)
        if line:
            print(line)
            return
        last_err = err
        sys.stderr.write(f"[bench] final attempt: {err}\n")
    _diagnostic(last_err)


def main() -> None:
    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.infer.generate import generate_mm_robust as generate_mm
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    import dataclasses
    import os

    if os.environ.get("BENCH_TINY"):
        # CPU smoke mode: exercises the exact bench code path on tiny shapes
        # (tests/test_bench_smoke.py) so driver-side breakage is caught early
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
        cfg = VacnicConfig.tiny()
    else:
        cfg = VacnicConfig.full_train()
    # min_length = max_length: random-weight models emit eos immediately, which
    # would measure a 2-step decode; force the full 50-token beam search so the
    # number reflects real caption-length decoding cost.
    cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode, min_length=cfg.decode.max_length - 1)
    )
    if "BENCH_NGRAM" in os.environ:
        # measurement-only knob (the released config uses ngram=3): isolates
        # the no-repeat-ngram processor's in-situ cost
        cfg = dataclasses.replace(
            cfg, decode=dataclasses.replace(
                cfg.decode, no_repeat_ngram_size=int(os.environ["BENCH_NGRAM"])))
    key = jax.random.PRNGKey(0)
    params = F.multimodal_bart_init(key, cfg.bart, cfg.fusion)
    compute_dtype = jnp.float32 if os.environ.get("BENCH_TINY") else jnp.bfloat16
    params = jax.tree_util.tree_map(lambda x: x.astype(compute_dtype), params)

    # default batch 256: best measured captions/sec/chip — r3 medians
    # 149.9/148.8/149.4 vs 144-145 at b128 (scripts/logs_r3/b256_confirm.log;
    # sanity ok, mean decode length 50.0, batch-invariance checked by
    # scripts/validate_b256.py). Serving throughput at the operator's batch
    # choice; the decode config matches the reference: beam 5, len 50, lp 2.0.
    batch_size = 2 if os.environ.get("BENCH_TINY") else int(os.environ.get("BENCH_BATCH", 256))
    batch = synthetic_batch(cfg, batch_size=batch_size, seed=0)

    import statistics

    import numpy as np

    def make_run(b):
        def run():
            seqs, scores = generate_mm(
                params,
                b["article_ids"],
                create_mask(b["article_ids"]),
                b["image_cls"],
                cfg.bart,
                cfg.fusion,
                cfg.decode,
                face_features=b["face_emb"],
                face_mask=face_mask_from_emb(b["face_emb"]),
                name_ids=b["names_art_ids"],
                name_mask=create_mask(b["names_art_ids"]),
                dtype=compute_dtype,
            )
            # np.asarray forces a device→host transfer of the result: on
            # tunneled backends `block_until_ready` may not actually block,
            # which would time dispatch instead of execution.
            return np.asarray(seqs)

        return run

    def timed_reps(run, n=3):
        """One compile+warmup, then n separately-timed sweeps — the recorded
        value is the MEDIAN so the artifact carries its own variance context
        (±3-8% run-to-run drift on the tunneled chip, VERDICT r2 weak #4).
        Returns (warm_output, times) so callers can sanity-check the decoded
        tokens without paying a second untimed sweep."""
        warm_out = run()
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        return warm_out, times

    warm, times = timed_reps(make_run(batch))
    # SANITY: min_length forces ~full-length decode; a numerics regression
    # (e.g. NaN logits admitting eos instantly) exits the beam loop early
    # and would otherwise record a bogus 2-3x "speedup" (observed r3: a
    # bf16-overflow NaN in the fused encoder read 312 cps with 4-token
    # outputs). Refuse to report a headline number on short outputs.
    nonpad = float((warm != cfg.bart.pad_token_id).sum(axis=1).mean())
    sane = nonpad >= 0.9 * cfg.decode.max_length
    runs_cps = [round(batch_size / t, 3) for t in times]
    cps = statistics.median(runs_cps)

    result = {
        "metric": "captions/sec/chip (BART-large full VACNIC, beam-5, len 50, lp 2.0)",
        "value": cps if sane else 0.0,
        "unit": "captions/sec/chip",
        "batch": batch_size,
        "runs": runs_cps,
        "sanity": ("ok" if sane else
                   f"FAIL: mean nonpad length {nonpad:.1f} < 0.9*max_length — "
                   "numerics regression; raw cps withheld"),
        "mean_decode_len": round(nonpad, 1),
        "vs_baseline": round((cps if sane else 0.0) / REFERENCE_CAPTIONS_PER_SEC, 2),
        # the reference publishes no throughput; the denominator is a
        # documented ESTIMATE of its A100 batch-1 HF loop (BASELINE.md)
        "baseline_basis": f"estimated {REFERENCE_CAPTIONS_PER_SEC} "
                          "captions/sec (A100 batch-1 HF generate loop; "
                          "repo publishes no number — see BASELINE.md)",
        # provenance: every VACNIC_* env knob active for this run (absent
        # knobs = code-chosen defaults)
        "knobs": {k: v for k, v in sorted(os.environ.items())
                  if k.startswith("VACNIC_")},
    }

    # batch-1 latency: the reference's own measurement basis is batch 1
    # (README.md:8, utils/test_mmbart_clip_ddp.py:38,153) — record
    # ms/caption at b1 alongside the serving-batch throughput (VERDICT r2
    # missing #1). Guarded: a failure here must not lose the primary metric.
    if os.environ.get("BENCH_LATENCY", "1") == "1" and batch_size > 1:
        try:
            _, lat_times = timed_reps(make_run(synthetic_batch(cfg, batch_size=1, seed=0)))
            lat_ms = [round(t * 1000.0, 2) for t in lat_times]
            result["latency_b1_ms_per_caption"] = statistics.median(lat_ms)
            result["latency_b1_runs_ms"] = lat_ms
        except Exception as e:  # pragma: no cover - defensive
            result["latency_b1_error"] = repr(e)[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    # BENCH_TINY (CPU smoke) and BENCH_INNER (the orchestrator's child) run
    # the measurement directly; a bare invocation gets the resilient wrapper.
    # BENCH_FORCE_ORCH=1 routes even a tiny run through the orchestrator so
    # the wrapper itself is testable on CPU (tests/test_bench_smoke.py).
    if os.environ.get("BENCH_INNER") or (
            os.environ.get("BENCH_TINY") and not os.environ.get("BENCH_FORCE_ORCH")):
        main()
    else:
        _orchestrate()
