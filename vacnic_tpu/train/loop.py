"""Training orchestration: epoch loop, validation, best/last checkpoints,
end-of-training caption generation + metrics.

Rebuilds `train()` (train...match.py:451-477) and the in-trainer decode
(`gen_caption_from_loader_bart`, :480-559): per-epoch train + val, save best
checkpoint on min val loss and a rolling "last", dump val outputs, and after
training decode the test set with beam search and attach
BLEU/ROUGE/METEOR/CIDEr to the output JSON (`{step: {gt, gen}}` + "bleu" +
"other metrics" — the exact format evaluate_entity.py consumes).
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from vacnic_tpu.core.config import VacnicConfig
from vacnic_tpu.core.logging import MetricsLogger, get_logger
from vacnic_tpu.data.datasets import ascii_fold
from vacnic_tpu.eval.caption_metrics import compute_caption_metrics
from vacnic_tpu.infer.generate import generate_mm_robust as generate_mm
from vacnic_tpu.models.clip_vit import clip_vision_fwd
from vacnic_tpu.train.checkpoints import CheckpointManager
from vacnic_tpu.train.train_step import (
    TrainState,
    create_mask,
    eval_step,
    face_mask_from_emb,
    make_train_step,
)

log = get_logger(__name__)


def _device_feed(batch: dict[str, Any]) -> dict[str, Any]:
    return {k: v for k, v in batch.items()
            if not isinstance(v, (list, str))}


def fit(
    cfg: VacnicConfig,
    state: TrainState,
    step_fn,
    train_loader: Iterable,
    val_loader: Iterable,
    out_dir: str,
    *,
    metrics: MetricsLogger | None = None,
    max_steps: int | None = None,
    tokenizer=None,
) -> TrainState:
    metrics = metrics or MetricsLogger(out_dir)
    ckpt_best = CheckpointManager(os.path.join(out_dir, "best"), cfg, max_to_keep=1)
    ckpt_last = CheckpointManager(os.path.join(out_dir, "last"), cfg, max_to_keep=2)
    # NOTE: the input TrainState is DONATED (its buffers are consumed in place
    # to halve parameter memory) — callers must use the returned state, never
    # the one they passed in.
    jit_step = jax.jit(step_fn, donate_argnums=0)
    jit_eval = jax.jit(lambda p, b: eval_step(p, b, cfg))

    min_val = float("inf")
    steps = 0
    # Cross-epoch cache of the frozen CoLaM teacher's pooled states, keyed by
    # dataset row id: the teacher is deterministic, so epochs >= 2 can skip
    # its full BART forward (numerics-identical; TrainConfig.teacher_cache).
    # Host-RAM footprint: one fp32 d_model vector per dataset row — ~1.7 GB
    # at GoodNews scale (424k × 1024) — kept fp32 so the cached path is
    # bit-identical to the teacher forward.
    teacher_vecs: dict[int, np.ndarray] = {}
    use_tcache = cfg.train.teacher_cache and cfg.train.alpha > 0
    for epoch in range(cfg.train.num_epochs):
        t0 = time.time()
        for batch in train_loader:
            feed = _device_feed(batch)
            idxs = None
            if use_tcache and "sample_idx" in batch:
                idxs = np.asarray(batch["sample_idx"])
                if all(int(i) in teacher_vecs for i in idxs):
                    feed["teacher_pooled"] = np.stack(
                        [teacher_vecs[int(i)] for i in idxs])
            state, m = jit_step(state, feed)
            steps += 1
            # ONE device->host transfer for all per-step metrics (+ the cached
            # teacher states): float(v)-per-metric in MetricsLogger.log would
            # pay a full round trip per key — ~28 ms each on the tunneled
            # backend, 100+ ms of pure sync added to every step.
            m = jax.device_get(m)
            pooled = m.pop("teacher_pooled", None)
            if idxs is not None and pooled is not None:
                for j, i in enumerate(idxs):
                    teacher_vecs[int(i)] = pooled[j]
            metrics.log(m, step=steps)
            if max_steps is not None and steps >= max_steps:
                break

        # ---- validation (eval_epoch :389-448): txt loss + greedy text dump --
        val_losses, out_dict = [], {}
        for vstep, batch in enumerate(val_loader):
            m = jit_eval({"model": state.params["model"], "clip": state.params.get("clip")},
                         _device_feed(batch))
            val_losses.append(float(m["val_loss"]))
            out_dict[vstep] = {"gt_cap": batch.get("caption", [])}
            if tokenizer is not None:
                # greedy argmax text per val step (eval_epoch writes
                # `logit_output` beside gt_cap, train...match.py:432-438;
                # the reference decodes WITHOUT skipping special tokens)
                ids = np.asarray(m["argmax_ids"])
                out_dict[vstep]["logit_output"] = [
                    tokenizer.decode(ids[i], skip_special_tokens=False)
                    for i in range(ids.shape[0])
                ]
        val_loss = float(np.mean(val_losses)) if val_losses else float("nan")
        metrics.log({"val_loss": val_loss, "epoch": epoch})
        log.info("epoch %d: val_loss %.4f (%.1fs)", epoch, val_loss, time.time() - t0)

        ckpt_last.save(steps, state, {"val_loss": val_loss})
        if val_loss < min_val:
            min_val = val_loss
            ckpt_best.save(steps, state, {"val_loss": val_loss})
            with open(os.path.join(out_dir, "val_outputs.json"), "w") as f:
                json.dump(out_dict, f)
            metrics.log({"min val loss": min_val})
        if max_steps is not None and steps >= max_steps:
            break
    ckpt_best.wait()
    ckpt_last.wait()
    return state


def generate_captions(
    cfg: VacnicConfig,
    params: dict,
    loader: Iterable,
    tokenizer,
    *,
    out_path: str | None = None,
    compute_metrics: bool = True,
    mesh=None,
    data_axis: str = "data",
) -> dict:
    """Beam-decode a loader → `{step: {gt, gen}}` (+ metrics) JSON
    (gen_caption_from_loader_bart, train...match.py:480-559).

    With `mesh`, batches whose size divides the data axis decode via
    `generate_mm_sharded` (each chip runs the beam search on its shard —
    the SPMD analogue of the reference's per-rank DDP inference); other
    batches (e.g. the tail) fall back to single-program decode."""
    from vacnic_tpu.infer.generate import generate_mm_sharded

    n_data = mesh.shape[data_axis] if mesh is not None else 0
    out_dict: dict[Any, Any] = {}
    step_idx = 0
    compute_dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" else jnp.float32
    for batch in loader:
        feed = _device_feed(batch)
        src_ids = feed["article_ids"]
        if "image_cls" in feed:
            img_cls = feed["image_cls"]
        else:
            _, img_cls = clip_vision_fwd(params["clip"], feed["pixels"], cfg.clip, compute_dtype)
        kwargs = {}
        if not cfg.fusion.only_image:
            kwargs = dict(
                face_features=feed["face_emb"],
                face_mask=face_mask_from_emb(feed["face_emb"]),
                name_ids=feed["names_art_ids"],
                name_mask=create_mask(feed["names_art_ids"]),
            )
        if mesh is not None and src_ids.shape[0] % n_data == 0:
            seqs, _ = generate_mm_sharded(
                mesh, params["model"], src_ids, create_mask(src_ids), img_cls,
                cfg.bart, cfg.fusion, cfg.decode, dtype=compute_dtype,
                data_axis=data_axis, **kwargs,
            )
        else:
            seqs, _ = generate_mm(
                params["model"], src_ids, create_mask(src_ids), img_cls,
                cfg.bart, cfg.fusion, cfg.decode, dtype=compute_dtype, **kwargs,
            )
        seqs = np.asarray(seqs)
        gts = batch.get("caption", [""] * seqs.shape[0])
        for i in range(seqs.shape[0]):
            gen = tokenizer.decode(seqs[i], skip_special_tokens=True)
            out_dict[step_idx] = {
                "gt": ascii_fold(gts[i]),
                "gen": ascii_fold(gen),
            }
            step_idx += 1

    if compute_metrics and out_dict:
        pairs = [(v["gen"], v["gt"]) for v in out_dict.values()]
        out_dict.update(compute_caption_metrics(pairs))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out_dict, f)
    return out_dict
