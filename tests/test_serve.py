"""CaptionService micro-batching: exactness vs direct decode (incl. padded
buckets), coalescing, validation, error propagation, and the HTTP front-end.

Exactness tests compare against the SAME jitted program the service runs
(identical batch shapes + inputs), so equality is deterministic — the
random-init-degenerate-logits caveat (CLAUDE.md) only bites across different
programs."""

import json
import threading
import time
import urllib.request
import urllib.error

import numpy as np
import pytest

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.data.synthetic import synthetic_batch
from vacnic_tpu.serve import CaptionService, ServeConfig, make_http_server


@pytest.fixture(scope="module")
def setup():
    import jax

    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.models.clip_vit import clip_vision_init

    cfg = VacnicConfig.tiny()
    key = jax.random.PRNGKey(0)
    params = {
        "model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion),
        "clip": clip_vision_init(jax.random.fold_in(key, 3), cfg.clip),
    }
    return cfg, params


SAMPLE_KEYS = ("article_ids", "image_cls", "face_emb", "names_art_ids")


def _rows(cfg, n, seed=0):
    batch = synthetic_batch(cfg, n, seed=seed)
    return [{k: np.asarray(batch[k][i]) for k in SAMPLE_KEYS}
            for i in range(n)]


def _direct(cfg, params, rows):
    """Decode the stacked rows directly through the same generate path the
    service uses (vacnic_tpu.serve.CaptionService._decode_rows)."""
    import jax.numpy as jnp

    from vacnic_tpu.infer.generate import generate_mm_robust
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    batch = {k: jnp.asarray(np.stack([r[k] for r in rows])) for k in SAMPLE_KEYS}
    seqs, scores = generate_mm_robust(
        params["model"], batch["article_ids"],
        create_mask(batch["article_ids"]), batch["image_cls"],
        cfg.bart, cfg.fusion, cfg.decode,
        face_features=batch["face_emb"],
        face_mask=face_mask_from_emb(batch["face_emb"]),
        name_ids=batch["names_art_ids"],
        name_mask=create_mask(batch["names_art_ids"]),
        dtype=jnp.float32)
    return np.asarray(seqs), np.asarray(scores)


def test_full_bucket_exact_vs_direct(setup):
    cfg, params = setup
    rows = _rows(cfg, 4)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(4,), max_wait_ms=5000))
    try:
        futs = [svc.submit(r) for r in rows]
        results = [f.result(timeout=300) for f in futs]
    finally:
        svc.close()
    seqs, scores = _direct(cfg, params, rows)
    for i, res in enumerate(results):
        assert res["tokens"] == [int(t) for t in seqs[i]]
        assert res["score"] == pytest.approx(float(scores[i]))
        assert res["caption"] is None  # no tokenizer attached
    st = svc.stats()
    assert st["requests"] == 4 and st["batches"] == 1
    assert st["bucket_counts"][4] == 1 and st["padded_rows"] == 0
    # end-to-end latency percentiles over the resolved requests
    assert st["latency_p50_ms"] > 0
    assert st["latency_p50_ms"] <= st["latency_p95_ms"] <= st["latency_p99_ms"]


def test_padded_bucket_exact(setup):
    """3 requests into a 4-bucket: the service pads by repeating row 0; the
    real rows must match a direct decode of that exact padded batch."""
    cfg, params = setup
    rows = _rows(cfg, 3, seed=1)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(4,), max_wait_ms=200))
    try:
        futs = [svc.submit(r) for r in rows]
        results = [f.result(timeout=300) for f in futs]
    finally:
        svc.close()
    seqs, _ = _direct(cfg, params, rows + [rows[0]])
    for i, res in enumerate(results):
        assert res["tokens"] == [int(t) for t in seqs[i]]
    assert svc.stats()["padded_rows"] == 1


def test_coalescing_one_batch(setup):
    cfg, params = setup
    rows = _rows(cfg, 8, seed=2)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1, 8), max_wait_ms=5000))
    try:
        futs = [svc.submit(r) for r in rows]
        for f in futs:
            f.result(timeout=300)
    finally:
        svc.close()
    st = svc.stats()
    # all 8 arrived well inside max_wait → one full 8-bucket dispatch
    assert st["batches"] == 1 and st["bucket_counts"][8] == 1


def test_singleton_flush(setup):
    cfg, params = setup
    (row,) = _rows(cfg, 1, seed=3)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1, 4), max_wait_ms=1))
    try:
        res = svc.caption(row, timeout=300)
        assert len(res["tokens"]) == cfg.decode.max_length
        assert svc.stats()["bucket_counts"][1] == 1
    finally:
        svc.close()


def test_submit_validation(setup):
    cfg, params = setup
    svc = CaptionService(cfg, params, serve_cfg=ServeConfig(buckets=(1,)))
    try:
        (row,) = _rows(cfg, 1)
        with pytest.raises(ValueError, match="missing"):
            svc.submit({k: v for k, v in row.items() if k != "image_cls"})
        bad = dict(row, article_ids=row["article_ids"][:-1])
        with pytest.raises(ValueError, match="expected shape"):
            svc.submit(bad)
        with pytest.raises(ValueError, match="unexpected"):
            svc.submit(dict(row, bogus=np.zeros(3)))
    finally:
        svc.close()
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(row)


def test_decode_error_propagates(setup, monkeypatch):
    cfg, params = setup
    import vacnic_tpu.infer.generate as G

    def boom(*a, **k):
        raise RuntimeError("synthetic decode failure")

    monkeypatch.setattr(G, "generate_mm_robust", boom)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(2,), max_wait_ms=500))
    try:
        futs = [svc.submit(r) for r in _rows(cfg, 2, seed=4)]
        for f in futs:
            with pytest.raises(RuntimeError, match="synthetic decode failure"):
                f.result(timeout=60)
        assert svc.stats()["errors"] == 2
    finally:
        svc.close()


def test_config_validation(setup):
    cfg, params = setup
    with pytest.raises(ValueError, match="ascending"):
        CaptionService(cfg, params, serve_cfg=ServeConfig(buckets=(8, 4)))
    with pytest.raises(ValueError, match="positive"):
        CaptionService(cfg, params, serve_cfg=ServeConfig(buckets=(0, 8)))
    with pytest.raises(ValueError, match="input_kind"):
        CaptionService(cfg, params,
                       serve_cfg=ServeConfig(input_kind="jpeg"))


def test_non_numeric_payload_is_value_error(setup):
    """np.asarray raises TypeError on null/object values; submit must
    normalize that to ValueError so the HTTP layer answers 400, not a
    dropped connection (review finding)."""
    cfg, params = setup
    svc = CaptionService(cfg, params, serve_cfg=ServeConfig(buckets=(1,)))
    try:
        (row,) = _rows(cfg, 1)
        with pytest.raises(ValueError, match="not convertible"):
            svc.submit(dict(row, article_ids=None))
        with pytest.raises(ValueError, match="not convertible"):
            svc.submit(dict(row, article_ids=[{"a": 1}] * 16))
    finally:
        svc.close()


def test_cancelled_future_does_not_kill_batcher(setup):
    """Caller-side Future.cancel() racing the batcher's set_result must not
    raise InvalidStateError in the worker (review finding): the service
    stays alive and serves the next request."""
    cfg, params = setup
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1, 2), max_wait_ms=1))
    try:
        (row,) = _rows(cfg, 1, seed=7)
        fut = svc.submit(row)
        fut.cancel()  # may or may not win the race — either is legal
        # service must still work afterwards
        res = svc.caption(row, timeout=300)
        assert len(res["tokens"]) == cfg.decode.max_length
        assert svc._worker.is_alive()
    finally:
        svc.close()


def test_http_roundtrip(setup):
    cfg, params = setup
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1, 2), max_wait_ms=1))
    srv = make_http_server(svc, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            assert json.load(r)["ok"] is True

        (row,) = _rows(cfg, 1, seed=5)
        payload = json.dumps({k: v.tolist() for k, v in row.items()}).encode()
        req = urllib.request.Request(
            f"{base}/v1/caption", data=payload,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            body = json.load(r)
        assert len(body["tokens"]) == cfg.decode.max_length
        assert isinstance(body["score"], float)

        # malformed request → 400 with the validation message
        bad = urllib.request.Request(
            f"{base}/v1/caption", data=b'{"article_ids": [1, 2]}',
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400

        with urllib.request.urlopen(f"{base}/v1/stats", timeout=30) as r:
            st = json.load(r)
        assert st["requests"] >= 1
    finally:
        srv.shutdown()
        srv.server_close()
        svc.close()


def test_precompile_warms_buckets(setup):
    cfg, params = setup
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1, 2), max_wait_ms=1))
    try:
        svc.precompile()
        t0 = time.monotonic()
        svc.caption(_rows(cfg, 1, seed=6)[0], timeout=300)
        warm_s = time.monotonic() - t0
        # the program was compiled by precompile(); the serve call only
        # executes (tiny config on CPU: well under a second)
        assert warm_s < 5.0
    finally:
        svc.close()


def test_sharded_service_exact_vs_direct(setup):
    """Multi-chip serving: a CaptionService over an 8-way data mesh must
    return the same tokens/scores as the direct single-program decode of the
    identical padded batch (beam search is per-row independent; shard_map
    only scatters the batch — infer/generate.generate_mm_sharded)."""
    import jax
    from jax.sharding import Mesh

    cfg, params = setup
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = Mesh(np.asarray(devices[:8]).reshape(8, 1), ("data", "model"))
    rows = _rows(cfg, 5, seed=11)  # 5 requests pad to the 8-bucket
    svc = CaptionService(cfg, params, mesh=mesh,
                         serve_cfg=ServeConfig(buckets=(8,), max_wait_ms=5000))
    try:
        futs = [svc.submit(r) for r in rows]
        results = [f.result(timeout=300) for f in futs]
    finally:
        svc.close()
    padded = rows + [rows[0]] * 3  # the service pads by repeating row 0
    seqs, scores = _direct(cfg, params, padded)
    for i, res in enumerate(results):
        assert res["tokens"] == [int(t) for t in seqs[i]]
        assert res["score"] == pytest.approx(float(scores[i]), rel=1e-5)
    st = svc.stats()
    assert st["requests"] == 5 and st["padded_rows"] == 3


def test_sharded_bucket_divisibility_validated(setup):
    import jax
    from jax.sharding import Mesh

    cfg, params = setup
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    mesh = Mesh(np.asarray(devices[:8]).reshape(8, 1), ("data", "model"))
    with pytest.raises(ValueError, match="not divisible"):
        CaptionService(cfg, params, mesh=mesh,
                       serve_cfg=ServeConfig(buckets=(1, 8)))


def test_pixels_input_kind_exact_vs_direct(setup):
    """input_kind='pixels': the service runs the CLIP tower inside the batch
    program; results must match running clip_vision_fwd + the same generate
    path directly on the identical stacked batch."""
    import jax.numpy as jnp

    from vacnic_tpu.infer.generate import generate_mm_robust
    from vacnic_tpu.models.clip_vit import clip_vision_fwd
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb

    cfg, params = setup
    batch = synthetic_batch(cfg, 2, seed=21, with_pixels=True)
    keys = ("article_ids", "pixels", "face_emb", "names_art_ids")
    rows = [{k: np.asarray(batch[k][i]) for k in keys} for i in range(2)]
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(2,), max_wait_ms=5000,
                                               input_kind="pixels"))
    try:
        futs = [svc.submit(r) for r in rows]
        results = [f.result(timeout=300) for f in futs]
    finally:
        svc.close()

    px = jnp.asarray(np.stack([r["pixels"] for r in rows]))
    _, img_cls = clip_vision_fwd(params["clip"], px, cfg.clip, jnp.float32)
    ids = jnp.asarray(np.stack([r["article_ids"] for r in rows]))
    faces = jnp.asarray(np.stack([r["face_emb"] for r in rows]))
    names = jnp.asarray(np.stack([r["names_art_ids"] for r in rows]))
    seqs, scores = generate_mm_robust(
        params["model"], ids, create_mask(ids), img_cls,
        cfg.bart, cfg.fusion, cfg.decode,
        face_features=faces, face_mask=face_mask_from_emb(faces),
        name_ids=names, name_mask=create_mask(names), dtype=jnp.float32)
    for i, res in enumerate(results):
        assert res["tokens"] == [int(t) for t in np.asarray(seqs[i])]
        assert res["score"] == pytest.approx(float(np.asarray(scores[i])))


def test_deadline_sheds_stale_requests(setup):
    """A past-deadline request is failed fast (TimeoutError) at batch-form
    time and does NOT occupy a decode slot; a live request in the same
    collected batch still decodes exactly."""
    cfg, params = setup
    rows = _rows(cfg, 2, seed=31)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(2,), max_wait_ms=800))
    try:
        stale = svc.submit(rows[0], deadline_ms=0)
        time.sleep(0.05)  # let the deadline pass while the batcher holds
        live = svc.submit(rows[1])
        with pytest.raises(TimeoutError, match="deadline exceeded"):
            stale.result(timeout=300)
        res = live.result(timeout=300)
    finally:
        svc.close()
    # the live row becomes row 0 of the padded bucket (pad = repeat row 0)
    seqs, _ = _direct(cfg, params, [rows[1], rows[1]])
    assert res["tokens"] == [int(t) for t in seqs[0]]
    st = svc.stats()
    assert st["expired"] == 1 and st["requests"] == 1


def test_deadline_all_expired_skips_decode(setup):
    cfg, params = setup
    (row,) = _rows(cfg, 1, seed=32)
    svc = CaptionService(
        cfg, params,
        serve_cfg=ServeConfig(buckets=(2,), max_wait_ms=100,
                              default_deadline_ms=0))
    try:
        fut = svc.submit(row)  # default deadline from config
        with pytest.raises(TimeoutError):
            fut.result(timeout=60)
        st = svc.stats()
        assert st["expired"] == 1 and st["batches"] == 0
    finally:
        svc.close()


def test_update_params_hot_swap(setup):
    """Weight hot-swap: after update_params, the same request decodes with
    the NEW weights (compare vs direct decode under each param set), with no
    service restart; stats track the weights version."""
    import jax

    from vacnic_tpu.models import fusion as F

    cfg, params = setup
    params_b = {"model": F.multimodal_bart_init(
        jax.random.PRNGKey(99), cfg.bart, cfg.fusion),
        "clip": params["clip"]}  # same tree structure as the served params
    rows = _rows(cfg, 1, seed=41)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1,), max_wait_ms=1))
    try:
        res_a = svc.caption(rows[0], timeout=300)
        v = svc.update_params(params_b)
        assert v == 1 and svc.stats()["weights_version"] == 1
        res_b = svc.caption(rows[0], timeout=300)
    finally:
        svc.close()
    seqs_a, _ = _direct(cfg, params, rows)
    seqs_b, _ = _direct(cfg, params_b, rows)
    assert res_a["tokens"] == [int(t) for t in seqs_a[0]]
    assert res_b["tokens"] == [int(t) for t in seqs_b[0]]


def test_deadline_bad_type_is_value_error(setup):
    """Untrusted HTTP input: a non-numeric deadline_ms must surface as
    ValueError (HTTP 400), not a TypeError escaping the handler."""
    cfg, params = setup
    svc = CaptionService(cfg, params, serve_cfg=ServeConfig(buckets=(1,)))
    try:
        (row,) = _rows(cfg, 1)
        with pytest.raises(ValueError, match="deadline_ms"):
            svc.submit(row, deadline_ms=[100])
        with pytest.raises(ValueError, match="deadline_ms"):
            svc.submit(row, deadline_ms="soon")
    finally:
        svc.close()


def test_update_params_rejects_mismatched_tree(setup):
    """Hot-swap validation: structure or shape/dtype mismatches fail fast
    instead of breaking the zero-recompile contract mid-serving."""
    import jax
    import jax.numpy as jnp

    cfg, params = setup
    svc = CaptionService(cfg, params, serve_cfg=ServeConfig(buckets=(1,)))
    try:
        with pytest.raises(ValueError, match="structure"):
            svc.update_params({"model": {"nothing": np.zeros(3)}})
        wrong_dtype = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16), params)
        with pytest.raises(ValueError, match="dtype"):
            svc.update_params(wrong_dtype)
        assert svc.stats()["weights_version"] == 0  # nothing swapped
    finally:
        svc.close()


def test_defer_to_fill_avoids_padding(setup):
    """9 requests into a (8, 32) ladder: instead of padding a 32-bucket with
    23 dummy rows, the batcher dispatches one full 8-bucket and carries the
    remainder into an immediately-following batch. All results stay exact."""
    cfg, params = setup
    rows = _rows(cfg, 9, seed=51)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(8, 32), max_wait_ms=500))
    try:
        futs = [svc.submit(r) for r in rows]
        results = [f.result(timeout=300) for f in futs]
    finally:
        svc.close()
    st = svc.stats()
    assert st["batches"] == 2 and st["bucket_counts"][8] == 2
    assert st["deferred_rows"] == 1 and st["padded_rows"] == 7
    seqs_a, _ = _direct(cfg, params, rows[:8])
    seqs_b, _ = _direct(cfg, params, [rows[8]] * 8)  # pad = repeat row 0
    for i in range(8):
        assert results[i]["tokens"] == [int(t) for t in seqs_a[i]]
    assert results[8]["tokens"] == [int(t) for t in seqs_b[0]]


def test_watch_checkpoints_hot_swaps_new_step(setup, monkeypatch):
    """Checkpoint watcher: when the directory's latest step advances past
    initial_step, load_params runs and the service hot-swaps; older/equal
    steps and restore errors never swap or kill the watcher."""
    import jax

    import vacnic_tpu.train.checkpoints as C
    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.serve import watch_checkpoints

    cfg, params = setup
    steps = [3, 3, 7]  # poll sequence: unchanged, unchanged, new step

    class StubMgr:
        def __init__(self, directory, *a, **k):
            pass

        def latest_step(self):
            return steps.pop(0) if steps else 7

        def close(self):
            pass

    monkeypatch.setattr(C, "CheckpointManager", StubMgr)
    params_b = {"model": F.multimodal_bart_init(
        jax.random.PRNGKey(5), cfg.bart, cfg.fusion),
        "clip": params["clip"]}
    loaded = []

    def load_params(step):
        loaded.append(step)
        return params_b

    svc = CaptionService(cfg, params, serve_cfg=ServeConfig(buckets=(1,)))
    try:
        th = watch_checkpoints(svc, "/nonexistent", load_params,
                               poll_s=0.05, initial_step=3)
        deadline = time.monotonic() + 10
        while svc.stats()["weights_version"] == 0:
            assert time.monotonic() < deadline, "watcher never swapped"
            time.sleep(0.05)
    finally:
        svc.close()
    assert loaded == [7]  # swapped exactly once, only for the NEW step
    assert svc.params is params_b
    th.join(timeout=5)
    assert not th.is_alive()  # stops when the service closes


def test_deadline_nan_is_value_error(setup):
    """NaN passes float() but `now > NaN` is always False — a NaN deadline
    would never expire, silently bypassing the shed policy (ADVICE r4 #3).
    Non-finite values must be rejected like any other malformed input."""
    cfg, params = setup
    svc = CaptionService(cfg, params, serve_cfg=ServeConfig(buckets=(1,)))
    try:
        (row,) = _rows(cfg, 1)
        for bad in (float("nan"), float("inf"), float("-inf"), "nan"):
            with pytest.raises(ValueError, match="deadline_ms"):
                svc.submit(row, deadline_ms=bad)
    finally:
        svc.close()


def test_shed_runs_before_defer_split(setup):
    """Expired rows must be shed BEFORE the defer-to-fill split (ADVICE r4
    #4): 8 expired + 1 live into an (8, 32) ladder must dispatch the live
    request in ONE batch — not defer it behind a dispatch of expired rows."""
    cfg, params = setup
    rows = _rows(cfg, 9, seed=61)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(8, 32), max_wait_ms=500))
    try:
        stale = [svc.submit(r, deadline_ms=0) for r in rows[:8]]
        time.sleep(0.05)  # deadlines pass while the batcher collects
        live = svc.submit(rows[8])
        res = live.result(timeout=300)
        for f in stale:
            with pytest.raises(TimeoutError):
                f.result(timeout=60)
    finally:
        svc.close()
    st = svc.stats()
    assert st["expired"] == 8 and st["requests"] == 1
    # live request went out immediately in one 8-bucket; nothing deferred
    assert st["batches"] == 1 and st["deferred_rows"] == 0
    seqs, _ = _direct(cfg, params, [rows[8]] * 8)  # pad = repeat row 0
    assert res["tokens"] == [int(t) for t in seqs[0]]


def test_stable_target_selection(setup):
    """Fill-to-stable bucket choice: smallest bucket whose measured capacity
    covers rate*margin; largest when none; optimistic fallback for unknown
    decode times."""
    cfg, params = setup
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1, 2, 4),
                                               stable_margin=1.2))
    try:
        svc._bucket_ms = {1: 200.0, 2: 200.0, 4: 300.0}
        # rate 10 -> need 12 cps: b1=5cps no, b2=10cps no, b4=13.3cps yes
        assert svc._stable_target(10.0) == (4, 300.0)
        # rate 2 -> need 2.4 cps: b1=5cps suffices
        assert svc._stable_target(2.0) == (1, 200.0)
        # rate 100 -> nothing suffices -> largest (max throughput)
        assert svc._stable_target(100.0) == (4, 300.0)
        # unknown b4 time falls back to b2's estimate (optimistic)
        svc._bucket_ms = {1: 200.0, 2: 200.0}
        assert svc._stable_target(10.0) == (4, 200.0)
    finally:
        svc.close()


def test_fill_to_stable_extends_collection(setup, monkeypatch):
    """With a measured arrival rate and decode times making only the largest
    bucket stable, _fill_to_stable pulls queued arrivals up to the target;
    a single-request batch (closed-loop) never waits."""
    import dataclasses

    cfg, params = setup
    # stub the batcher loop so the directly-enqueued items are not consumed
    # by the worker thread (this is a white-box test of the fill logic)
    monkeypatch.setattr(CaptionService, "_run", lambda self: None)
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1, 2, 4),
                                               max_wait_ms=1,
                                               fill_to_stable=True))
    try:
        now = time.monotonic()
        svc._arrivals.extend([now - 0.1 * i for i in range(20)])  # ~10 rps
        # target = 4 (b1 5cps / b2 10cps < 10*1.5; b4 40cps passes) with a
        # positive fill budget (4/(10*1.5) - 0.1 = 167 ms)
        svc._bucket_ms = {1: 200.0, 2: 200.0, 4: 100.0}
        rows = _rows(cfg, 4, seed=71)
        items = [(r, None, now, None) for r in rows]
        svc._q.put((rows[2], None, now, None))
        svc._q.put((rows[3], None, now, None))
        out = svc._fill_to_stable(items[:2])
        assert len(out) == 4  # filled to the stable target bucket
        # closed-loop: one item -> untouched, no wait
        t0 = time.monotonic()
        out1 = svc._fill_to_stable(items[:1])
        assert len(out1) == 1 and time.monotonic() - t0 < 0.05
        # disabled knob -> untouched
        svc.scfg = dataclasses.replace(svc.scfg, fill_to_stable=False)
        out2 = svc._fill_to_stable(items[:2])
        assert len(out2) == 2
        # no decode-time data -> untouched (cold service must not hold
        # requests on a guess)
        svc.scfg = dataclasses.replace(svc.scfg, fill_to_stable=True)
        svc._bucket_ms = {}
        out3 = svc._fill_to_stable(items[:2])
        assert len(out3) == 2
        # negative fill budget (decode alone consumes the stable cycle:
        # 4/(10*1.5) = 267 ms < d=300) -> dispatch now, never wait (the
        # queue32 6.2 s regression at 20 rps)
        svc._bucket_ms = {1: 200.0, 2: 200.0, 4: 300.0}
        t0 = time.monotonic()
        out4 = svc._fill_to_stable(items[:2])
        assert len(out4) == 2 and time.monotonic() - t0 < 0.05
    finally:
        svc.close()


def test_concurrent_submit_stress(setup):
    """Regression for the r5 thread-safety fixes: concurrent submitters +
    stats pollers must not race the batcher's _arrivals/_bucket_ms access
    (unlocked deque/dict iteration raced HTTP-thread appends and could kill
    the batcher or 500 the stats endpoint)."""
    cfg, params = setup
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(1, 4), max_wait_ms=5))
    rows = _rows(cfg, 8, seed=81)
    futs: list = []
    lock = threading.Lock()
    stop = threading.Event()

    def submitter(i):
        for j in range(6):
            f = svc.submit(rows[(i * 6 + j) % len(rows)])
            with lock:
                futs.append(f)
            time.sleep(0.002 * (j % 3))

    poller_errors: list = []

    def poller():
        try:
            while not stop.is_set():
                s = svc.stats()  # iterates _bucket_ms/_lat_ring under lock
                assert "bucket_decode_ms" in s
                time.sleep(0.001)
        except BaseException as e:  # surfaced in the MAIN thread below —
            # an exception dying in a helper thread cannot fail the test
            # (review finding)
            poller_errors.append(e)

    try:
        threads = [threading.Thread(target=submitter, args=(i,))
                   for i in range(4)]
        pt = threading.Thread(target=poller)
        pt.start()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        results = [f.result(timeout=300) for f in futs]
        assert len(results) == 24
        assert all(len(r["tokens"]) > 0 for r in results)
        assert svc._worker.is_alive()  # batcher survived the concurrency
        st = svc.stats()
        assert st["requests"] == 24 and st["errors"] == 0
    finally:
        stop.set()
        pt.join(timeout=5)
        svc.close()
    assert not poller_errors, poller_errors


def test_defer_saturation_guard(setup, monkeypatch):
    """Saturation-aware defer (queue30 on-chip finding): when the stable
    target exceeds the defer-down bucket, the batcher dispatches the whole
    batch padded upward instead of pinning itself at b_down-sized
    dispatches forever."""
    monkeypatch.setattr(CaptionService, "_run", lambda self: None)
    cfg, params = setup
    svc = CaptionService(cfg, params,
                         serve_cfg=ServeConfig(buckets=(8, 32),
                                               stable_margin=1.5))
    try:
        now = time.monotonic()
        svc._arrivals.extend([now - 0.03 * i for i in range(67)])  # ~33 rps
        # 8-bucket nominal 8/0.2s = 40 cps < 33*1.5 -> stable target is 32
        svc._bucket_ms = {8: 200.0, 32: 300.0}
        assert svc._stable_target(33.0)[0] == 32
        assert svc._defer_would_saturate(10, 8) is True
        # light rate: 8-bucket suffices -> defer allowed
        svc._arrivals.clear()
        svc._arrivals.extend([now - 0.4 * i for i in range(8)])  # ~2.5 rps
        assert svc._defer_would_saturate(10, 8) is False
        # knob off / no data -> defer allowed
        svc._bucket_ms = {}
        assert svc._defer_would_saturate(10, 8) is False
    finally:
        svc.close()
