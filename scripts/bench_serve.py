"""Serving-latency benchmark: the micro-batched CaptionService on real HW.

Measures what bench.py (offline throughput) cannot: end-to-end request
latency through the dynamic batcher under three load shapes —

  1. closed-loop single stream (one request at a time; the latency floor
     = b1 decode + batcher overhead),
  2. open-loop Poisson arrivals at SERVE_RATE req/s (the production
     regime: requests coalesce into buckets, latency = wait + decode),
  3. burst saturation (all requests at once; throughput ceiling = the
     largest bucket's decode rate).

Config matches bench.py: full BART-large VACNIC, beam 5, len 50, lp 2.0,
min_length forced so random weights decode full-length captions. Knobs:
SERVE_BUCKETS (default "1,8,32"), SERVE_WAIT ms (default 20), SERVE_RATE
req/s (default 40), SERVE_N requests for phases 2-3 (default 192),
SERVE_TINY=1 for the CPU smoke mode. Prints one JSON line.

Run ALONE on the chip (one TPU process at a time) with a generous timeout:
3 bucket programs cold-compile in minutes each on the tunneled backend.
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import sys
import threading
import time

os.environ.setdefault("VACNIC_PALLAS_DECODE", "1")
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")
sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np


def pct(xs, p):
    return float(np.percentile(np.asarray(xs), p))


def main() -> None:
    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.serve import CaptionService, ServeConfig

    tiny = os.environ.get("SERVE_TINY") == "1"
    if tiny:
        jax.config.update("jax_platforms", "cpu")
        cfg = VacnicConfig.tiny()
    else:
        cfg = VacnicConfig.full_train()
    cfg = dataclasses.replace(
        cfg, decode=dataclasses.replace(cfg.decode,
                                        min_length=cfg.decode.max_length - 1))
    dtype = jnp.float32 if tiny else jnp.bfloat16
    key = jax.random.PRNGKey(0)
    # no "clip" tower: input_kind=image_cls serves precomputed features
    params = {"model": jax.tree_util.tree_map(
        lambda x: x.astype(dtype), F.multimodal_bart_init(key, cfg.bart, cfg.fusion))}

    buckets = tuple(int(b) for b in
                    os.environ.get("SERVE_BUCKETS", "1,8,32").split(","))
    wait_ms = float(os.environ.get("SERVE_WAIT", "20"))
    rate = float(os.environ.get("SERVE_RATE", "40"))
    n_req = int(os.environ.get("SERVE_N", "4" if tiny else "192"))

    fill = os.environ.get("SERVE_FILL", "0") == "1"
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=buckets,
                                               max_wait_ms=wait_ms,
                                               max_queue=65536,
                                               fill_to_stable=fill))
    # per-sample request rows (distinct seeds → distinct articles)
    pool = synthetic_batch(cfg, min(64, max(8, n_req)), seed=0)
    keys = ("article_ids", "image_cls", "face_emb", "names_art_ids")
    rows = [{k: np.asarray(pool[k][i % pool[k].shape[0]]) for k in keys}
            for i in range(n_req)]

    result = {"metric": "serve latency (full VACNIC, beam-5, len 50, lp 2.0)",
              "unit": "ms", "buckets": list(buckets), "max_wait_ms": wait_ms,
              "tiny": tiny}
    try:
        # phase 0: precompile every bucket (timed — provenance for cold starts)
        t0 = time.perf_counter()
        svc.precompile()
        result["precompile_s"] = round(time.perf_counter() - t0, 1)
        print(f"[serve-bench] precompiled {buckets} in "
              f"{result['precompile_s']}s", file=sys.stderr)

        # phase 1: closed-loop single stream (latency floor)
        lat = []
        n_closed = min(10, n_req)
        for i in range(n_closed):
            t0 = time.perf_counter()
            svc.caption(rows[i], timeout=600)
            lat.append((time.perf_counter() - t0) * 1e3)
        result["closed_loop_p50_ms"] = round(statistics.median(lat), 1)
        result["closed_loop_runs_ms"] = [round(x, 1) for x in lat]

        # phase 2: open-loop Poisson arrivals at SERVE_RATE req/s.
        # Latency is captured by DONE-CALLBACKS at resolution time — NOT by
        # observing futures after the driver joins. The original harness
        # measured submit-to-OBSERVATION, and observation could not start
        # until ALL submissions finished, so every recorded open-loop p50
        # (queues 24-36) was just half the submission span (n/rate/2):
        # 20 rps -> 6.4 s, 40 -> 2.4 s, 80 -> 1.6 s — exactly the
        # "saturation plateaus" measured, insensitive to every policy.
        rng = np.random.RandomState(7)
        futs: list = [None] * n_req
        t_in: list = [0.0] * n_req
        t_done: list = [0.0] * n_req
        # Future.set_result wakes result() waiters BEFORE invoking done
        # callbacks, so result() returning does not guarantee t_done[i] is
        # written — count callbacks and wait for all of them (review
        # finding: the last future's wait could read t_done 0.0).
        all_done = threading.Event()
        done_count = [0]
        done_lock = threading.Lock()

        def mk_cb(i):
            def cb(_fut):
                t_done[i] = time.perf_counter()
                with done_lock:
                    done_count[0] += 1
                    if done_count[0] == n_req:
                        all_done.set()
            return cb

        def drive():
            for i in range(n_req):
                time.sleep(float(rng.exponential(1.0 / rate)))
                t_in[i] = time.perf_counter()
                fut = svc.submit(rows[i])
                fut.add_done_callback(mk_cb(i))
                futs[i] = fut

        t_start = time.perf_counter()
        th = threading.Thread(target=drive)
        th.start()
        th.join()
        for i in range(n_req):
            futs[i].result(timeout=600)
        assert all_done.wait(timeout=60), "done callbacks did not all fire"
        span = time.perf_counter() - t_start
        waits = [(t_done[i] - t_in[i]) * 1e3 for i in range(n_req)]
        st = svc.stats()
        result.update({
            "offered_rate_rps": rate,
            "open_loop_p50_ms": round(pct(waits, 50), 1),
            "open_loop_p95_ms": round(pct(waits, 95), 1),
            "open_loop_p99_ms": round(pct(waits, 99), 1),
            "open_loop_achieved_rps": round(n_req / span, 1),
            "open_loop_batches": st["batches"] - n_closed,
            "bucket_counts": st["bucket_counts"],
        })

        # phase 3: burst saturation — all requests at once
        t0 = time.perf_counter()
        burst = [svc.submit(r) for r in rows]
        for f in burst:
            f.result(timeout=600)
        span = time.perf_counter() - t0
        result["burst_throughput_cps"] = round(n_req / span, 1)
        st = svc.stats()
        result["padded_rows_total"] = st["padded_rows"]
        result["deferred_rows_total"] = st["deferred_rows"]
        result["fill_to_stable"] = fill
        result["bucket_decode_ms"] = st.get("bucket_decode_ms")
        result["slots_total"] = sum(b * c for b, c in st["bucket_counts"].items())
        result["value"] = result["open_loop_p50_ms"]
    finally:
        svc.close()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
