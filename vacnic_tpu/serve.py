"""Online caption serving: dynamic micro-batching over the jitted decoder.

The reference's inference surface is offline scripts only (a DataLoader swept
once per checkpoint — utils/test_mmbart_clip_ddp.py:1256-1293); it has no
request-at-a-time serving story. Production TPU serving needs one extra
discipline the offline path never faces: XLA compiles one program per static
shape, so a server cannot decode "whatever arrived" — it must quantize
arrivals onto a small ladder of precompiled batch buckets and pad the
remainder. That is what `CaptionService` does:

  submit(sample) -> Future        # any thread
       │  (bounded queue)
  batcher thread: collect up to max_batch requests or until max_wait_ms,
  pick the smallest bucket >= n, pad rows, run ONE jitted beam search,
  slice the real rows back into the futures.

Design points:
- Padding is exact: beam search is per-sample independent (each row attends
  only to its own history), so dummy rows cannot change real rows' tokens.
  tests/test_serve.py pins this by comparing against the same padded batch
  decoded directly.
- One dispatch thread owns all device work — the TPU tunnel on this target
  serializes concurrent processes/streams anyway (CLAUDE.md), and a single
  issuing thread keeps the jit cache and the device queue warm and ordered.
- Buckets default to (1, 8, 32, 256): 256 is the measured-throughput plateau
  of the fused decode path and 1 is the latency floor (~84 ms/caption on the
  v5e, docs/decode_budget.md).

`http_serve` puts a minimal stdlib HTTP front on the service (POST
/v1/caption, GET /healthz, GET /v1/stats) — enough to load-test and to stand
in for a real RPC layer without adding dependencies.
"""

from __future__ import annotations

import collections
import dataclasses
import json
import math
import queue
import threading
import time
from concurrent.futures import Future
from typing import Any

import numpy as np

from vacnic_tpu.core.config import VacnicConfig


def _safe_set(fut: Future, result=None, exc: BaseException | None = None) -> None:
    """Resolve a future, tolerating caller-side cancel()/double-set races:
    a cancelled or already-resolved future makes set_result/set_exception
    raise InvalidStateError, which must never kill the batcher thread."""
    try:
        if exc is not None:
            fut.set_exception(exc)
        else:
            fut.set_result(result)
    except Exception:  # InvalidStateError (cancelled / already resolved)
        pass


@dataclasses.dataclass(frozen=True)
class ServeConfig:
    """Micro-batching policy.

    buckets: ascending static batch sizes the server compiles; arrivals are
        grouped to the smallest bucket that fits. Keep the ladder short —
        each bucket is one XLA program (compile time + executable memory).
    max_wait_ms: how long the batcher holds an incomplete batch hoping for
        more arrivals. The latency/throughput dial: 0 decodes singletons
        immediately, larger values trade p50 latency for MXU utilization.
    max_queue: bound on queued requests; submit raises when full
        (backpressure instead of unbounded memory growth).
    input_kind: "image_cls" (precomputed CLIP CLS features, the loader
        contract) or "pixels" (raw normalized images; the service runs the
        CLIP tower inside the same batch program).
    default_deadline_ms: if set, every request gets this deadline unless
        submit() passes its own; a request whose deadline has passed when
        its batch is formed is failed fast (TimeoutError on the future)
        instead of occupying a decode slot — under overload the queue sheds
        stale work instead of decoding captions nobody is waiting for.
    """

    buckets: tuple[int, ...] = (1, 8, 32, 256)
    max_wait_ms: float = 10.0
    max_queue: int = 4096
    input_kind: str = "image_cls"
    default_deadline_ms: float | None = None
    # Timed fill-to-stable: when enabled, the batcher additionally WAITS
    # (bounded by the stability budget) to fill the stable-target bucket.
    # Default OFF after three on-chip A/Bs (queues 28/30/32/33): with fill
    # waits, every cycle's capacity equals arrivals-per-cycle / cycle — the
    # service runs marginally at the offered rate by construction and the
    # initial backlog never drains (p50 pinned ~2.2 s at 40 rps). The
    # no-wait system self-regulates: padding costs less than waiting
    # (decode time grows sublinearly with bucket size), small-bucket fixed
    # points are marginally stable, and any backlog blip dispatches
    # full-bucket drain bursts at ~3x the offered rate. The part of the
    # policy that IS always on (independent of this knob) is the
    # saturation-aware defer: the batcher never defers down to a bucket
    # whose measured capacity can't cover arrival_rate * stable_margin
    # (_defer_would_saturate — it costs no wait).
    fill_to_stable: bool = False
    # 1.5: the nominal bucket capacity (b / decode_ms) is optimistic — each
    # cycle also pays collect waits and python dispatch, and the queue30
    # on-chip A/B showed margin 1.2 picking an 8-bucket whose 48.9 cps
    # nominal capacity saturated at a 40 rps offered rate. The margin must
    # absorb the non-decode cycle overhead.
    stable_margin: float = 1.5


class CaptionService:
    """Thread-safe micro-batching front over `generate_mm_robust`.

    `params` is the model param tree ({"model": ..., "clip": ...} as produced
    by training / checkpoint restore; "clip" only needed for pixels input).
    `tokenizer` (optional) turns token rows into caption strings.
    """

    def __init__(self, cfg: VacnicConfig, params: dict, *,
                 tokenizer=None, serve_cfg: ServeConfig | None = None,
                 mesh=None, data_axis: str = "data"):
        import jax.numpy as jnp

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.scfg = serve_cfg or ServeConfig()
        # Multi-chip serving: with a Mesh the batcher dispatches each bucket
        # through generate_mm_sharded (shard_map over `data_axis`, params
        # replicated, batch scattered once — infer/generate.py). Beam decode
        # is per-row independent, so data-parallel serving returns the same
        # tokens as single-chip; every bucket must be divisible by the
        # data-axis size so shards are static-shaped.
        self.mesh = mesh
        self.data_axis = data_axis
        if not self.scfg.buckets or list(self.scfg.buckets) != sorted(
                set(self.scfg.buckets)):
            raise ValueError(f"buckets must be ascending and unique, got "
                             f"{self.scfg.buckets}")
        if self.scfg.buckets[0] < 1:
            raise ValueError(f"buckets must be positive, got "
                             f"{self.scfg.buckets}")
        if mesh is not None:
            axes = dict(zip(mesh.axis_names, mesh.devices.shape))
            if data_axis not in axes:
                raise ValueError(f"mesh has no {data_axis!r} axis "
                                 f"(axes: {sorted(axes)})")
            dp = axes[data_axis]
            bad = [b for b in self.scfg.buckets if b % dp]
            if bad:
                raise ValueError(
                    f"sharded serving: buckets {bad} not divisible by the "
                    f"{data_axis!r} mesh axis ({dp} devices)")
        if self.scfg.input_kind not in ("image_cls", "pixels"):
            raise ValueError(f"unknown input_kind {self.scfg.input_kind!r}")
        self._dtype = (jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16"
                       else jnp.float32)
        self._q: queue.Queue = queue.Queue(maxsize=self.scfg.max_queue)
        self._closed = threading.Event()
        self._lock = threading.Lock()
        # serializes ALL device work (batcher dispatches + precompile from
        # any caller thread): concurrent jit compiles contend for the single
        # tunnel client on this backend and can wedge for minutes
        self._device_lock = threading.Lock()
        self._stats = {
            "requests": 0, "batches": 0, "padded_rows": 0, "errors": 0,
            "expired": 0, "weights_version": 0, "deferred_rows": 0,
            "bucket_counts": {int(b): 0 for b in self.scfg.buckets},
            "wait_ms_sum": 0.0, "decode_ms_sum": 0.0,
        }
        # per-request end-to-end latency (submit -> future resolved), bounded
        # ring so stats() can report percentiles without unbounded growth
        self._lat_ring: collections.deque = collections.deque(maxlen=4096)
        # fill-to-stable state: arrival timestamps (2 s sliding window) and
        # per-bucket decode-time EWMAs (seeded by precompile)
        self._arrivals: collections.deque = collections.deque(maxlen=1024)
        self._bucket_ms: dict[int, float] = {}
        self._expected = self._expected_shapes()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="vacnic-serve-batcher")
        self._worker.start()

    # -- request side --------------------------------------------------------

    def _expected_shapes(self) -> dict[str, tuple[tuple[int, ...], Any]]:
        c, f, d = self.cfg, self.cfg.fusion, self.cfg.data
        exp: dict[str, tuple[tuple[int, ...], Any]] = {
            "article_ids": ((d.article_max_length,), np.int32),
        }
        if self.scfg.input_kind == "pixels":
            exp["pixels"] = ((c.clip.image_size, c.clip.image_size, 3),
                             np.float32)
        else:
            exp["image_cls"] = ((f.img_size,), np.float32)
        if not f.only_image:
            exp["face_emb"] = ((f.max_faces, f.face_feature_dim), np.float32)
            exp["names_art_ids"] = ((f.max_ner_type_len,), np.int32)
        return exp

    def submit(self, sample: dict[str, Any], *,
               deadline_ms: float | None = None) -> Future:
        """Enqueue one request. `sample` holds per-sample arrays (no batch
        dim) matching the §2.4 contract: article_ids, image_cls|pixels, and
        (full model) face_emb + names_art_ids. Returns a Future resolving to
        {"tokens": list[int], "score": float, "caption": str|None}.

        `deadline_ms` (else ServeConfig.default_deadline_ms) bounds how stale
        the request may be when its batch forms: past-deadline requests fail
        fast with TimeoutError instead of occupying a decode slot.

        Raises immediately (not via the future) on a malformed sample or a
        full queue, so bad input never ties up the batcher."""
        if self._closed.is_set():
            raise RuntimeError("CaptionService is closed")
        clean = {}
        for key, (shape, dt) in self._expected.items():
            if key not in sample:
                raise ValueError(f"sample missing {key!r} "
                                 f"(expected keys: {sorted(self._expected)})")
            try:
                arr = np.asarray(sample[key], dtype=dt)
            except (TypeError, ValueError) as e:
                # np raises TypeError on nulls/objects — normalize to the
                # validation error type callers (and the HTTP 400 path) expect
                raise ValueError(f"{key}: not convertible to {np.dtype(dt).name}"
                                 f" ({e})") from e
            if arr.shape != shape:
                raise ValueError(f"{key}: expected shape {shape}, "
                                 f"got {arr.shape}")
            clean[key] = arr
        extra = set(sample) - set(self._expected)
        if extra:
            raise ValueError(f"unexpected sample keys: {sorted(extra)}")
        fut: Future = Future()
        dl_ms = (deadline_ms if deadline_ms is not None
                 else self.scfg.default_deadline_ms)
        if dl_ms is not None:
            try:  # untrusted over HTTP: bool/str/list must be a 400, not a
                # TypeError escaping the handler with a dropped connection
                dl_ms = float(dl_ms)
            except (TypeError, ValueError) as e:
                raise ValueError(f"deadline_ms: not a number ({e})") from e
            if not math.isfinite(dl_ms):
                # NaN passes float() but `now > NaN` is always False — the
                # request would get a deadline that never expires, silently
                # bypassing the shed policy (and the configured default)
                raise ValueError(f"deadline_ms: must be finite, got {dl_ms}")
        deadline = (time.monotonic() + dl_ms / 1e3
                    if dl_ms is not None else None)
        with self._lock:  # _arrival_rate iterates; unlocked appends from
            # HTTP threads would raise "deque mutated during iteration"
            self._arrivals.append(time.monotonic())
        try:
            self._q.put_nowait((clean, fut, time.monotonic(), deadline))
        except queue.Full:
            raise RuntimeError(
                f"serve queue full ({self.scfg.max_queue}); retry later")
        if self._closed.is_set():
            # close() may have drained and the worker exited between the
            # top-of-method check and the put — nobody would ever resolve
            # this future. Fail it here; if the worker DID pick it up,
            # whichever side resolves first wins (_safe_set is idempotent).
            _safe_set(fut, exc=RuntimeError("service closed"))
        return fut

    def caption(self, sample: dict[str, Any], timeout: float | None = None):
        """Blocking convenience wrapper around submit()."""
        return self.submit(sample).result(timeout=timeout)

    def update_params(self, params: dict) -> int:
        """Hot-swap model weights without restarting the service (checkpoint
        rollout). Swaps under the device lock, so it lands between batch
        dispatches — in-flight batches finish on the old weights, every later
        batch uses the new ones. The compiled programs are reused as-is (XLA
        executables depend on shapes/dtypes, not values), so the swap costs
        one host->device transfer, no recompile. Returns the new weights
        version (also reported by stats()).

        The new tree must match the old one in structure and leaf
        shapes/dtypes — a mismatch would silently break the zero-recompile
        contract (jit cache miss → minutes-long remote recompile per bucket
        on this backend) or crash the batcher, so it fails fast here."""
        import jax

        old_leaves, old_def = jax.tree_util.tree_flatten(self.params)
        new_leaves, new_def = jax.tree_util.tree_flatten(params)
        if new_def != old_def:
            raise ValueError(f"update_params: tree structure mismatch "
                             f"(got {new_def}, serving {old_def})")
        for i, (o, nw) in enumerate(zip(old_leaves, new_leaves)):
            os_, ns = np.shape(o), np.shape(nw)
            od = getattr(o, "dtype", None)
            nd = getattr(nw, "dtype", None)
            if os_ != ns or od != nd:
                raise ValueError(
                    f"update_params: leaf {i} mismatch "
                    f"(shape {ns} vs {os_}, dtype {nd} vs {od})")
        with self._device_lock:
            self.params = params
            with self._lock:
                self._stats["weights_version"] += 1
                return self._stats["weights_version"]

    def stats(self) -> dict:
        with self._lock:
            s = dict(self._stats)
            s["bucket_counts"] = dict(self._stats["bucket_counts"])
        n = max(1, s["batches"])
        s["mean_wait_ms"] = s.pop("wait_ms_sum") / max(1, s["requests"])
        s["mean_decode_ms"] = s.pop("decode_ms_sum") / n
        s["queue_depth"] = self._q.qsize()
        with self._lock:
            lat = np.asarray(self._lat_ring)
        if lat.size:  # end-to-end latency percentiles (last ≤4096 requests)
            for p in (50, 95, 99):
                s[f"latency_p{p}_ms"] = round(float(np.percentile(lat, p)), 1)
        with self._lock:  # _dispatch inserts first-seen buckets concurrently
            bms = dict(self._bucket_ms)
        s["bucket_decode_ms"] = {b: round(v, 1) for b, v in sorted(bms.items())}
        r = self._arrival_rate()
        s["arrival_rate_rps"] = round(r, 1) if r is not None else None
        return s

    def close(self, timeout: float = 30.0) -> None:
        """Stop accepting work and join the batcher. The BATCHER drains the
        queue on its way out (pending requests fail with RuntimeError) — the
        queue has exactly one consumer at all times, so close() never races
        it. If the worker is still mid-decode after `timeout` (a cold remote
        compile can take minutes on this backend), warn and return; the
        worker finishes, drains, and exits on its own."""
        if self._closed.is_set():
            return
        self._closed.set()
        try:  # wake the batcher if it's blocked on get(); best-effort — the
            # worker re-checks _closed every 100 ms regardless
            self._q.put_nowait(None)
        except queue.Full:
            pass
        self._worker.join(timeout=timeout)
        if self._worker.is_alive():
            import warnings

            warnings.warn(
                f"CaptionService.close: batcher still running after "
                f"{timeout}s (in-flight decode/compile); it will drain and "
                f"exit when the device call returns", stacklevel=2)

    # -- batcher side ---------------------------------------------------------

    def precompile(self, buckets: tuple[int, ...] | None = None) -> None:
        """Warm the jit cache: decode one synthetic batch per bucket so the
        first real request never pays a cold compile (minutes on the tunneled
        TPU backend). Run before exposing the service."""
        from vacnic_tpu.data.synthetic import synthetic_batch

        for b in buckets or self.scfg.buckets:
            batch = synthetic_batch(
                self.cfg, b, seed=0,
                with_pixels=self.scfg.input_kind == "pixels")
            rows = [{k: np.asarray(batch[k][i]) for k in self._expected}
                    for i in range(b)]
            self._decode_rows(rows)
            # seed the fill-to-stable decode-time estimate with a WARM run
            # (the first decode above paid the compile)
            t0 = time.monotonic()
            self._decode_rows(rows)
            self._bucket_ms.setdefault(int(b),
                                       (time.monotonic() - t0) * 1e3)

    def _run(self) -> None:
        carry: list = []
        while not self._closed.is_set():
            if carry:
                # deferred remainder from the last dispatch: top up from
                # already-queued arrivals WITHOUT waiting (they have waited
                # their share already) and go straight back to dispatch
                items = carry
                carry = []
                while len(items) < self.scfg.buckets[-1]:
                    try:
                        nxt = self._q.get_nowait()
                    except queue.Empty:
                        break
                    if nxt is None:
                        break
                    items.append(nxt)
            else:
                try:
                    first = self._q.get(timeout=0.1)
                except queue.Empty:
                    continue
                if first is None:
                    continue
                # fill-to-stable applies to freshly-collected batches only:
                # carried remainders are promised to go straight back to
                # dispatch (holding them an extra fill wait would convert
                # deferrals into deadline sheds under exactly the load the
                # defer policy targets)
                items = self._fill_to_stable(self._collect(first))
            carry = self._dispatch_or_defer(items)
        # sole-consumer drain on exit: fail whatever is still queued/carried
        for item in carry:
            _safe_set(item[1], exc=RuntimeError("service closed"))
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is not None:
                _safe_set(item[1], exc=RuntimeError("service closed"))

    def _collect(self, first) -> list:
        items = [first]
        max_b = self.scfg.buckets[-1]
        deadline = time.monotonic() + self.scfg.max_wait_ms / 1e3
        while len(items) < max_b:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    # -- fill-to-stable --------------------------------------------------------

    def _arrival_rate(self, window_s: float = 2.0) -> float | None:
        """Requests/sec over the trailing window; None below 4 arrivals
        (not enough signal to justify holding anyone's request)."""
        now = time.monotonic()
        with self._lock:  # submit() appends concurrently
            n = sum(1 for t in reversed(self._arrivals) if t > now - window_s)
        return n / window_s if n >= 4 else None

    def _stable_target(self, rate: float) -> tuple[int, float | None]:
        """Smallest bucket whose measured capacity (b / decode_time) covers
        rate * stable_margin; the largest bucket if none does (max
        throughput is the best a saturated service can offer). Unknown
        decode times fall back to the nearest smaller bucket's (optimistic —
        self-corrects after one dispatch)."""
        d_prev = None
        for b in self.scfg.buckets:
            d = self._bucket_ms.get(b, d_prev)
            if d is None:
                continue
            d_prev = d
            if b / (d / 1e3) >= rate * self.scfg.stable_margin:
                return b, d
        b = self.scfg.buckets[-1]
        return b, self._bucket_ms.get(b, d_prev)

    def _fill_to_stable(self, items: list) -> list:
        """Under sustained load (more than one request in the collected
        batch), extend collection until the stability-target bucket is full.
        The wait is bounded by the STABILITY BUDGET — target/(rate*margin)
        minus the target's decode time — so filling can never push the
        cycle's capacity below the margin the target was chosen for (a
        decode-time cap measurably saturated at 20 rps, queue32). n == 1
        never waits: closed-loop latency unchanged."""
        n = len(items)
        if not self.scfg.fill_to_stable or n <= 1:
            return items
        if not self._bucket_ms:
            return items  # no decode-time data yet: nothing to reason with
        rate = self._arrival_rate()
        if rate is None:
            return items
        target, d_ms = self._stable_target(rate)
        if n >= target:
            return items
        fill_s = (target - n) / rate * 1.25
        # the fill wait is part of the service cycle: capacity with fill is
        # target / (decode + fill), so the fill budget is what keeps that
        # capacity at rate*margin — NOT "one decode time" (queue32 on-chip:
        # a decode-time cap at 20 rps made cycle = fill 199 + decode 199 ms
        # per 8-bucket = 19.6 cps capacity at 20 offered — marginally
        # saturated, p50 6.2 s)
        budget_s = target / (rate * self.scfg.stable_margin)
        if d_ms is not None:
            budget_s -= d_ms / 1e3
        fill_s = min(fill_s, budget_s)
        if fill_s <= 0:
            return items
        deadline = time.monotonic() + fill_s
        while len(items) < target and not self._closed.is_set():
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                break
            items.append(nxt)
        return items

    def _shed_expired(self, items: list) -> list:
        """Fail past-deadline requests fast (TimeoutError) and return only
        live ones. Runs BEFORE the defer split so a live request is never
        deferred behind a dispatch of mostly-expired rows and the bucket
        choice reflects the rows that will actually decode."""
        now = time.monotonic()
        expired = [it for it in items if it[3] is not None and now > it[3]]
        if not expired:
            return items
        with self._lock:
            self._stats["expired"] += len(expired)
        for _, fut, t_in, _dl in expired:
            _safe_set(fut, exc=TimeoutError(
                f"request deadline exceeded before dispatch "
                f"(waited {(now - t_in) * 1e3:.0f} ms)"))
        return [it for it in items if it[3] is None or now <= it[3]]

    def _dispatch_or_defer(self, items: list) -> list:
        """Defer-to-fill: when the collected count n lands between buckets
        and the remainder after the lower bucket is SMALL (smaller than both
        the lower bucket and the padding the upper bucket would burn),
        dispatch the lower bucket full of real rows and carry the remainder
        into the immediately-following batch. Measured motivation: the first
        on-chip open-loop run padded 233 of 435 slots (54% of decode capacity
        burned on dummy rows) because every backlog of 9-31 requests was
        padded to the 32-bucket. Light load is unchanged — with n at or
        below the smallest bucket the policy degenerates to pad-and-send."""
        items = self._shed_expired(items)
        if not items:
            return []
        n = len(items)
        bs = self.scfg.buckets
        b_down = max((b for b in bs if b <= n), default=None)
        b_up = next((b for b in bs if b >= n), None)
        if (b_down is not None and b_up is not None and n != b_up
                and (n - b_down) < min(b_up - n, b_down)
                and not self._defer_would_saturate(n, b_down)):
            with self._lock:
                self._stats["deferred_rows"] += n - b_down
            self._dispatch(items[:b_down])
            return items[b_down:]
        self._dispatch(items)
        return []

    def _defer_would_saturate(self, n: int, b_down: int) -> bool:
        """True when deferring down to b_down-sized dispatches cannot keep
        up with the measured arrival rate. Without this check the defer
        policy is SELF-SUSTAINING under saturation (queue30 on-chip A/B):
        dispatch b_down, carry the remainder, one dispatch-time of arrivals
        lands the next batch back in the defer band, forever — batches pin
        at b_down while the queue and p50 grow without bound. When the
        stable-target bucket exceeds b_down, dispatch the whole batch
        padded upward instead (throughput over padding efficiency)."""
        if n <= 1 or not self._bucket_ms:
            return False
        rate = self._arrival_rate()
        if rate is None:
            return False
        target, _ = self._stable_target(rate)
        return target > b_down

    def _dispatch(self, items: list) -> None:
        now = time.monotonic()
        n = len(items)
        bucket = next((b for b in self.scfg.buckets if b >= n),
                      self.scfg.buckets[-1])
        try:
            t0 = time.monotonic()
            results = self._decode_rows([it[0] for it in items], bucket=bucket)
            decode_ms = (time.monotonic() - t0) * 1e3
        except Exception as e:  # surface to every caller in the batch
            with self._lock:
                self._stats["errors"] += n
            for _, fut, *_ in items:
                _safe_set(fut, exc=e)
            return
        done = time.monotonic()
        with self._lock:
            old = self._bucket_ms.get(int(bucket))
            self._bucket_ms[int(bucket)] = (decode_ms if old is None
                                            else 0.7 * old + 0.3 * decode_ms)
        with self._lock:
            self._stats["requests"] += n
            self._stats["batches"] += 1
            self._stats["padded_rows"] += bucket - n
            self._stats["bucket_counts"][int(bucket)] += 1
            self._stats["wait_ms_sum"] += sum(
                (now - t_in) * 1e3 for _, _, t_in, _dl in items)
            self._stats["decode_ms_sum"] += decode_ms
            self._lat_ring.extend((done - t_in) * 1e3 for _, _, t_in, _dl in items)
        for res, (_, fut, *_) in zip(results, items):
            _safe_set(fut, result=res)

    def _decode_rows(self, rows: list[dict], bucket: int | None = None
                     ) -> list[dict]:
        """Stack sample rows, pad to `bucket` by repeating row 0 (results for
        pad rows are sliced off — beam decode is row-independent so padding
        cannot perturb real rows), run one jitted search. Holds _device_lock:
        precompile() (caller thread) and the batcher must never issue device
        work concurrently."""
        import jax.numpy as jnp

        from vacnic_tpu.infer.generate import (generate_mm_robust,
                                               generate_mm_sharded)
        from vacnic_tpu.models.clip_vit import clip_vision_fwd
        from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

        n = len(rows)
        bucket = bucket or n
        batch = {}
        for key in self._expected:
            stacked = np.stack([r[key] for r in rows])
            if bucket > n:
                pad = np.repeat(stacked[:1], bucket - n, axis=0)
                stacked = np.concatenate([stacked, pad], axis=0)
            batch[key] = jnp.asarray(stacked)

        with self._device_lock:
            if self.scfg.input_kind == "pixels":
                _, img_cls = clip_vision_fwd(self.params["clip"],
                                             batch["pixels"],
                                             self.cfg.clip, self._dtype)
            else:
                img_cls = batch["image_cls"]
            kwargs = {}
            if not self.cfg.fusion.only_image:
                kwargs = dict(
                    face_features=batch["face_emb"],
                    face_mask=face_mask_from_emb(batch["face_emb"]),
                    name_ids=batch["names_art_ids"],
                    name_mask=create_mask(batch["names_art_ids"]),
                )
            src = batch["article_ids"]
            if self.mesh is not None:
                seqs, scores = generate_mm_sharded(
                    self.mesh, self.params["model"], src, create_mask(src),
                    img_cls, self.cfg.bart, self.cfg.fusion, self.cfg.decode,
                    dtype=self._dtype, data_axis=self.data_axis, **kwargs)
            else:
                seqs, scores = generate_mm_robust(
                    self.params["model"], src, create_mask(src), img_cls,
                    self.cfg.bart, self.cfg.fusion, self.cfg.decode,
                    dtype=self._dtype, **kwargs)
        seqs = np.asarray(seqs)[:n]
        scores = np.asarray(scores)[:n]
        out = []
        for i in range(n):
            caption = None
            if self.tokenizer is not None:
                caption = self.tokenizer.decode(seqs[i],
                                                skip_special_tokens=True)
            out.append({"tokens": [int(t) for t in seqs[i]],
                        "score": float(scores[i]), "caption": caption})
        return out


def watch_checkpoints(service: CaptionService, directory: str, load_params,
                      *, poll_s: float = 30.0,
                      initial_step: int | None = None) -> threading.Thread:
    """Continuous checkpoint rollout: poll `directory` for a newer training
    step and hot-swap its weights into the running service
    (`CaptionService.update_params` — zero recompile, between batches).

    `load_params(step) -> params` does the actual restore (the caller owns
    the restore path and its config/overrides; cli serve passes its own).
    `initial_step` is the step the service is already serving (newer steps
    only trigger a swap); None means swap on the first checkpoint seen —
    right for a --random-init service warming up while training runs.
    The thread stops when the service closes; restore errors are logged and
    retried next poll, never fatal to serving."""
    import logging

    log = logging.getLogger(__name__)

    def loop() -> None:
        from vacnic_tpu.train.checkpoints import CheckpointManager

        last = initial_step
        while not service._closed.wait(poll_s):
            try:
                mgr = CheckpointManager(directory)
                try:
                    step = mgr.latest_step()
                finally:
                    mgr.close()
                if step is None or (last is not None and step <= last):
                    continue
                version = service.update_params(load_params(step))
                last = step
                log.info("serving weights hot-swapped to checkpoint step %d "
                         "(weights_version %d)", step, version)
            except Exception:
                log.warning("checkpoint watch poll failed; retrying",
                            exc_info=True)

    t = threading.Thread(target=loop, daemon=True, name="vacnic-ckpt-watch")
    t.start()
    return t


# ---------------------------------------------------------------------------
# Minimal stdlib HTTP front-end
# ---------------------------------------------------------------------------


def make_http_server(service: CaptionService, host: str = "127.0.0.1",
                     port: int = 0):
    """Build (not start) a ThreadingHTTPServer bound to the service.

    Routes: POST /v1/caption (JSON sample -> JSON result), GET /healthz,
    GET /v1/stats. Returns the server; call .serve_forever() (blocking) or
    run it in a thread; .server_address[1] is the bound port (port=0 picks an
    ephemeral one)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib handler naming)
            if self.path == "/healthz":
                alive = (not service._closed.is_set()
                         and service._worker.is_alive())
                self._send(200 if alive else 503, {"ok": alive})
            elif self.path == "/v1/stats":
                self._send(200, service.stats())
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/v1/caption":
                self._send(404, {"error": f"no route {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
                sample = json.loads(self.rfile.read(length) or b"{}")
                dl = (sample.pop("deadline_ms", None)
                      if isinstance(sample, dict) else None)
                fut = service.submit(sample, deadline_ms=dl)
            except ValueError as e:  # malformed sample → client error
                self._send(400, {"error": str(e)})
                return
            except RuntimeError as e:  # queue full / closed → retryable
                self._send(503, {"error": str(e)})
                return
            try:
                self._send(200, fut.result())
            except TimeoutError as e:  # deadline shed → gateway timeout
                self._send(504, {"error": str(e)})
            except RuntimeError as e:
                if str(e) == "service closed":  # retryable elsewhere
                    self._send(503, {"error": str(e)})
                else:  # decode-side failure
                    self._send(500, {"error": f"{type(e).__name__}: {e}"})
            except Exception as e:  # decode-side failure
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, *a):  # quiet by default
            pass

    return ThreadingHTTPServer((host, port), Handler)


def http_serve(service: CaptionService, host: str = "127.0.0.1",
               port: int = 8500) -> None:
    """Blocking HTTP serve loop (the `vacnic serve` CLI entry). SIGTERM
    (the normal orchestrator stop signal) triggers the same graceful
    shutdown as Ctrl-C: stop accepting, drain the batcher, close."""
    import signal

    srv = make_http_server(service, host, port)
    print(f"serving on http://{srv.server_address[0]}:{srv.server_address[1]} "
          f"(buckets={service.scfg.buckets}, "
          f"max_wait_ms={service.scfg.max_wait_ms})")
    prev = None
    try:  # main thread only; http_serve from a helper thread skips this
        # shutdown() blocks until serve_forever exits, and the handler runs
        # ON the serve_forever thread — call it from a helper thread or the
        # handler deadlocks against its own loop
        prev = signal.signal(signal.SIGTERM, lambda *_: threading.Thread(
            target=srv.shutdown, daemon=True).start())
    except ValueError:
        pass
    try:
        srv.serve_forever()
    finally:
        if prev is not None:
            signal.signal(signal.SIGTERM, prev)
        srv.server_close()
        service.close()
