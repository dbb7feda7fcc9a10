"""Command-line entry point.

Replaces the reference's three argparse-heavy scripts + shell launchers
(run_full_train.sh / run_onlyvis_train.sh; L0 in SURVEY §1) with subcommands
over the typed config:

  python -m vacnic_tpu.cli train --config full|onlyvis --data-dir ... --out-dir ...
  python -m vacnic_tpu.cli generate --ckpt-dir ... --out ...
  python -m vacnic_tpu.cli evaluate --results caption.json [--gtent dict.json]
  python -m vacnic_tpu.cli smoke  # tiny end-to-end self-check, no data needed

Any config field can be overridden with --set section.field=value.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _apply_overrides(cfg, overrides: list[str]):
    for item in overrides:
        path, _, raw = item.partition("=")
        section, _, field = path.partition(".")
        sub = getattr(cfg, section)
        old = getattr(sub, field)
        if isinstance(old, bool):
            val = raw.lower() in ("1", "true", "yes")
        elif isinstance(old, int):
            val = int(raw)
        elif isinstance(old, float):
            val = float(raw)
        elif isinstance(old, tuple):
            val = tuple(int(x) for x in raw.split(","))
        else:
            val = raw
        cfg = dataclasses.replace(cfg, **{section: dataclasses.replace(sub, **{field: val})})
    return cfg


def _build_config(args) -> "VacnicConfig":
    from vacnic_tpu.core.config import VacnicConfig

    preset = {
        "full": VacnicConfig.full_train,
        "onlyvis": VacnicConfig.onlyvis_train,
        "tiny": VacnicConfig.tiny,
    }[args.config]
    cfg = preset()
    if getattr(args, "data_dir", None):
        cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, data_dir=args.data_dir))
    return _apply_overrides(cfg, args.set or [])


def cmd_smoke(args) -> int:
    """Tiny synthetic end-to-end: init → 3 train steps → beam decode."""
    import jax
    import numpy as np

    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.core.rng import set_random_seed
    from vacnic_tpu.data.synthetic import synthetic_batch
    from vacnic_tpu.data.tokenize import HashWordTokenizer
    from vacnic_tpu.models import bart as B, fusion as F
    from vacnic_tpu.train.train_step import make_train_step
    from vacnic_tpu.infer.generate import generate_mm
    from vacnic_tpu.train.train_step import create_mask, face_mask_from_emb
    import dataclasses as dc

    cfg = VacnicConfig.tiny()
    key = set_random_seed(cfg.train.seed)
    params = {"model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion)}
    teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    init_fn, step_fn = make_train_step(cfg, 10)
    state = init_fn(params, teacher, jax.random.fold_in(key, 2))
    batch = synthetic_batch(cfg, 4)
    step = jax.jit(step_fn)
    for i in range(3):
        state, m = step(state, batch)
        print(f"step {i}: loss {float(m['loss']):.4f} txt {float(m['txt_loss']):.4f}")
    dcfg = dc.replace(cfg.decode, num_beams=3, max_length=8)
    seqs, _ = generate_mm(
        state.params["model"], batch["article_ids"], create_mask(batch["article_ids"]),
        batch["image_cls"], cfg.bart, cfg.fusion, dcfg,
        face_features=batch["face_emb"], face_mask=face_mask_from_emb(batch["face_emb"]),
        name_ids=batch["names_art_ids"], name_mask=create_mask(batch["names_art_ids"]),
    )
    tok = HashWordTokenizer(cfg.bart.vocab_size)
    print("decoded:", [tok.decode(row) for row in np.asarray(seqs)])
    print("smoke ok")
    return 0


def _make_loaders(cfg, tokenizer, split_paths, clip_tokenizer=None):
    from vacnic_tpu.data.collate import collate
    from vacnic_tpu.data.datasets import NewsCaptionDataset
    from vacnic_tpu.data.pipeline import PrefetchLoader

    loaders = []
    for path, is_train in split_paths:
        with open(path) as f:
            data_dict = json.load(f)
        # reference directory layout (train...match.py:770-812):
        # DATADIR/GoodNews/goodnews/* per-sample files, DATADIR/GoodNews/*.json dicts
        base = {"goodnews": "GoodNews/goodnews", "nytimes": "NYTimes/nytimes"}[cfg.data.dataset]
        ds = NewsCaptionDataset(
            data_dict,
            os.path.join(cfg.data.data_dir, base),
            tokenizer,
            dataset=cfg.data.dataset,
            max_article_len=cfg.data.article_max_length,
            max_caption_len=cfg.data.caption_max_length,
            max_ner_type_len=cfg.fusion.max_ner_type_len,
            max_ner_type_len_gt=cfg.fusion.max_ner_type_len_gt,
            retrieved_sent=cfg.data.use_retrieval,
            train=is_train,
            image_size=cfg.clip.image_size,
            clip_tokenizer=clip_tokenizer,
        )
        noname = tokenizer.added_tokens.get("<NONAME>", 50266)
        loaders.append(
            PrefetchLoader(
                ds,
                cfg.train.train_batch_size if is_train else cfg.train.val_batch_size,
                lambda s, _n=noname: collate(
                    s, article_len=cfg.data.article_max_length,
                    caption_len=cfg.data.caption_max_length,
                    ner_len=cfg.fusion.max_ner_type_len,
                    ner_len_gt=cfg.fusion.max_ner_type_len_gt,
                    max_faces=cfg.fusion.max_faces,
                    face_dim=cfg.fusion.face_feature_dim,
                    noname_id=_n,
                ),
                shuffle=is_train,
                num_workers=cfg.data.num_workers,
                # eval loaders must see every sample: entity/face-group eval
                # aligns output entries to data-dict entries by position
                drop_last=is_train,
            )
        )
    return loaders


def _convert_checkpoint_module():
    """scripts/convert_checkpoint.py loaded as a module (scripts/ is not a
    package; the CLI reuses its save/load helpers)."""
    import importlib.util as _ilu

    spec = _ilu.spec_from_file_location(
        "convert_checkpoint",
        os.path.join(os.path.dirname(__file__), "..", "scripts", "convert_checkpoint.py"),
    )
    cc = _ilu.module_from_spec(spec)
    spec.loader.exec_module(cc)
    return cc


def _load_clip_vision_ckpt(path: str, vcfg):
    """Load a stock OR fine-tuned CLIP vision tower for `--clip-ckpt`
    (reference `--trained_clip CLIPNAME.pt`, train...match.py:736-739:
    torch.loads an externally tuned CLIP in OpenAI format). Accepts a
    converted .npz tree from `scripts/convert_checkpoint.py clip` or a raw
    OpenAI/HF torch checkpoint."""
    from vacnic_tpu.models import weights_io as W

    if path.endswith(".npz"):
        tree = _convert_checkpoint_module().load_tree(path)
        return tree["vision"] if "vision" in tree else tree
    sd = W.load_state_dict(path)
    if any(k.startswith("visual.") for k in sd):
        return W.convert_clip_vision_openai(sd, vcfg)
    return W.convert_clip_vision_hf(sd, vcfg)


def cmd_train(args) -> int:
    import jax

    from vacnic_tpu.core.rng import set_random_seed
    from vacnic_tpu.data.tokenize import BartBpeTokenizer
    from vacnic_tpu.models import bart as B, fusion as F
    from vacnic_tpu.train.loop import fit, generate_captions
    from vacnic_tpu.train.train_step import make_train_step

    cfg = _build_config(args)
    os.makedirs(args.out_dir, exist_ok=True)
    key = set_random_seed(cfg.train.seed, cfg.train.prng_impl)

    tokenizer = BartBpeTokenizer(args.vocab, args.merges)
    tokenizer.add_special_tokens(["<ENT>", "<NONAME>", "<PERSON>", "<ORGNORP>", "<GPELOC>"])
    clip_tok = None
    if getattr(args, "clip_vocab", None):
        from vacnic_tpu.data.clip_tokenize import ClipBpeTokenizer

        clip_tok = ClipBpeTokenizer.from_dir(args.clip_vocab)

    from vacnic_tpu.models.clip_vit import clip_vision_init

    params = {
        "model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion),
        # frozen CLIP vision tower for on-the-fly image features (the released
        # config freezes CLIP and never steps its optimizer; train...match.py:376)
        "clip": clip_vision_init(jax.random.fold_in(key, 3), cfg.clip),
    }
    if getattr(args, "clip_ckpt", None):
        params["clip"] = _load_clip_vision_ckpt(args.clip_ckpt, cfg.clip)
    if not cfg.train.no_clip_loss:
        # the optional CLIP contrastive loss (train...match.py:312-321;
        # released script disables it) needs the text tower + logit_scale too
        from vacnic_tpu.models.clip_text import clip_text_init

        if getattr(args, "clip_ckpt", None):
            text_tower = _load_clip_retrieval_ckpt(args.clip_ckpt, cfg.clip)["text"]
        else:
            text_tower = clip_text_init(jax.random.fold_in(key, 9))
        # drop the integer "heads" metadata leaf: value_and_grad rejects
        # int-typed inputs; the static count comes from cfg.clip.text_heads
        params["clip_text"] = {k: v for k, v in text_tower.items() if k != "heads"}
    teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    if args.init_bart:
        # converted pretrained BART (.npz from scripts/convert_checkpoint.py):
        # seeds shared/encoder/decoder of both the multimodal model and the
        # frozen CoLaM teacher; fusion members keep their fresh init.
        pretrained = _convert_checkpoint_module().load_tree(args.init_bart)
        teacher = pretrained
        m = params["model"]
        m["shared"] = pretrained["shared"]
        m["final_logits_bias"] = pretrained["final_logits_bias"]
        for side in ("encoder", "decoder"):
            for k, v in pretrained[side].items():
                if k == "layers":
                    m[side]["layers"] = tuple(
                        {**ours, **theirs} for ours, theirs in zip(m[side]["layers"], v)
                    )
                else:
                    m[side][k] = v
        # NER table re-seeded from the pretrained shared rows (model :1150-1151)
        if "embed_tokens_ner" in m["encoder"]:
            import jax.numpy as jnp

            ner_w = m["encoder"]["embed_tokens_ner"]["weight"]
            shared_w = jnp.asarray(pretrained["shared"]["weight"])
            n = min(ner_w.shape[0], shared_w.shape[0], 50265)
            m["encoder"]["embed_tokens_ner"] = {"weight": ner_w.at[:n].set(shared_w[:n])}
        # Re-apply the attention tie AFTER the pretrained merge: the tie at
        # init captured the random self_attn that the merge just replaced
        # (init_attn_weight_encoder runs on the loaded model, ref :1897-1898).
        if cfg.fusion.init_attn_weight:
            params["model"] = F.tie_fusion_attn_weights(params["model"], cfg.fusion)

    if cfg.train.perturb_bos:
        from vacnic_tpu.train.train_step import perturb_bos

        params["model"] = perturb_bos(params["model"], jax.random.fold_in(key, 7))

    pattern = {
        "goodnews": "GoodNews/{split}_dict_newsmep_ent_clip{n}sent_contras_name_pos.json",
        "nytimes": "NYTimes/{split}_dict_newsmep_ent_seg_clip{n}sent_contras_name_pos.json",
    }[cfg.data.dataset]
    paths = [
        os.path.join(cfg.data.data_dir, pattern.format(split=s, n=cfg.data.num_sentences))
        for s in ("train", "val", "test")
    ]
    train_loader, val_loader, test_loader = _make_loaders(
        cfg, tokenizer, [(paths[0], True), (paths[1], False), (paths[2], False)],
        clip_tokenizer=clip_tok,
    )

    steps_per_epoch = len(train_loader)
    init_fn, step_fn = make_train_step(cfg, cfg.train.num_epochs * steps_per_epoch)
    state = init_fn(params, teacher, jax.random.fold_in(key, 2))
    if args.resume:
        from vacnic_tpu.train.checkpoints import CheckpointManager

        mgr = CheckpointManager(os.path.join(args.out_dir, "last"))
        state, at = mgr.restore(state)
        print(f"resumed from step {at}", file=sys.stderr)
    state = fit(cfg, state, step_fn, train_loader, val_loader, args.out_dir,
                max_steps=args.max_steps, tokenizer=tokenizer)

    out = generate_captions(
        cfg, state.params, test_loader, tokenizer,
        out_path=os.path.join(args.out_dir, "test_captions.json"),
    )
    print(json.dumps({k: out[k] for k in ("bleu", "other metrics") if k in out}))
    return 0


def _init_inference_params(cfg):
    """Random-init inference param tree (model + frozen CLIP vision tower) —
    the template for checkpoint restore and serve's --random-init mode.
    The fold_in constants match cmd_train's so restore templates line up."""
    import jax

    from vacnic_tpu.models import fusion as F
    from vacnic_tpu.models.clip_vit import clip_vision_init

    key = jax.random.PRNGKey(cfg.decode.seed)
    return key, {
        "model": F.multimodal_bart_init(key, cfg.bart, cfg.fusion),
        "clip": clip_vision_init(jax.random.fold_in(key, 3), cfg.clip),
    }


def _restore_gen_params(ckpt_dir: str, set_overrides):
    """Load (cfg, inference params) from a training checkpoint directory —
    the shared restore path of `generate` and `serve`."""
    import jax

    from vacnic_tpu.models import bart as B
    from vacnic_tpu.train.checkpoints import CheckpointManager
    from vacnic_tpu.train.train_step import make_train_step

    cfg = CheckpointManager.load_config(ckpt_dir)
    cfg = _apply_overrides(cfg, set_overrides or [])
    key, params = _init_inference_params(cfg)
    teacher = B.bart_init(jax.random.fold_in(key, 1), cfg.bart)
    init_fn, _ = make_train_step(cfg, 1)
    template = init_fn(params, teacher, key)
    mgr = CheckpointManager(ckpt_dir)
    try:
        state, step = mgr.restore(template)
        gen_params = state.params
    except Exception:
        # The saved param tree can carry optional subtrees the template can't
        # predict — params['clip_text'] from a train.no_clip_loss=false run
        # keeps tower dims from the training-time CLIP checkpoint file.
        # Inference only needs the params, so fall back to a template-free
        # restore of the raw pytree.
        raw, step = mgr.restore_raw()
        if raw is None:
            raise
        gen_params = raw["params"] if isinstance(raw, dict) else raw.params
    print(f"restored checkpoint at step {step}", file=sys.stderr)
    return cfg, gen_params


def cmd_generate(args) -> int:
    from vacnic_tpu.data.tokenize import BartBpeTokenizer
    from vacnic_tpu.train.loop import generate_captions
    import jax

    cfg, gen_params = _restore_gen_params(args.ckpt_dir, args.set)

    tokenizer = BartBpeTokenizer(args.vocab, args.merges)
    tokenizer.add_special_tokens(["<ENT>", "<NONAME>", "<PERSON>", "<ORGNORP>", "<GPELOC>"])
    with open(args.data_dict) as f:
        data_dict = json.load(f)
    mesh = None
    if getattr(args, "sharded", False):
        mesh = _sharded_decode_mesh("decode")

    (loader,) = _make_loaders(cfg, tokenizer, [(args.data_dict, False)])
    out = generate_captions(cfg, gen_params, loader, tokenizer,
                            out_path=args.out, mesh=mesh)
    print(json.dumps({k: out[k] for k in ("bleu", "other metrics") if k in out}))
    return 0


def _sharded_decode_mesh(what: str):
    """Data-parallel mesh over all visible devices (shared by the --sharded
    paths of cmd_generate and cmd_serve)."""
    import jax

    from vacnic_tpu.core.config import MeshConfig
    from vacnic_tpu.core.mesh import make_mesh

    mesh = make_mesh(MeshConfig(), devices=jax.devices())
    print(f"sharded {what} over {len(jax.devices())} devices", file=sys.stderr)
    return mesh


def _prune_to_structure(tree, template):
    """Drop dict subtrees absent from `template` (e.g. params['clip_text']
    written by a train.no_clip_loss=false run) so a raw-restored checkpoint
    tree matches the structure the service is already serving — otherwise
    CaptionService.update_params rejects every poll and the watcher serves
    stale weights forever (ADVICE r4 #2). Raises KeyError when the template
    needs a subtree the checkpoint lacks (a genuinely incompatible
    checkpoint must fail loudly, not serve garbage)."""
    if isinstance(template, dict):
        return {k: _prune_to_structure(tree[k], v) for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        # orbax template-free restore can hand back lists where the served
        # tree holds tuples (per-layer dicts live in tuples) — coerce to the
        # served container type so update_params' treedef check passes
        if len(tree) != len(template):
            raise ValueError(f"checkpoint sequence length {len(tree)} != "
                             f"served {len(template)}")
        return type(template)(
            _prune_to_structure(t, v) for t, v in zip(tree, template))
    return tree


def _restore_watch_params(ckpt_dir: str, step: int, served_params):
    """Inference-only restore for the checkpoint-watch hot-swap path.

    Unlike _restore_gen_params this does NO device work on the watcher
    thread: no random init, no teacher build, no optimizer-state template —
    just the template-free orbax read (host numpy arrays) of the requested
    step, pruned to the served tree's structure. The device transfer happens
    inside CaptionService.update_params / the next dispatch, both of which
    hold the service device lock (ADVICE r4 #1: a full train-state template
    restore on the watcher thread ran several GB of un-locked device work
    next to live decode dispatches)."""
    from vacnic_tpu.train.checkpoints import CheckpointManager

    mgr = CheckpointManager(ckpt_dir)
    try:
        raw, got = mgr.restore_raw(step)
    finally:
        mgr.close()
    if raw is None:
        raise RuntimeError(f"no checkpoint at step {step} in {ckpt_dir}")
    tree = raw["params"] if isinstance(raw, dict) and "params" in raw else (
        raw.params if hasattr(raw, "params") else raw)
    return _prune_to_structure(tree, served_params)


def cmd_serve(args) -> int:
    """Online caption serving: micro-batched beam decode behind an HTTP API
    (vacnic_tpu/serve.py). Beyond-reference surface — the reference only
    ships offline batch inference (utils/test_mmbart_clip_ddp.py)."""
    from vacnic_tpu.core.config import VacnicConfig
    from vacnic_tpu.serve import CaptionService, ServeConfig, http_serve

    if args.ckpt_dir:
        cfg, params = _restore_gen_params(args.ckpt_dir, args.set)
    elif args.random_init:
        # random-init mode: stand the full serving stack up without a
        # checkpoint (drive tests, load tests, latency rehearsals)
        cfg = {"full": VacnicConfig.full_train,
               "onlyvis": VacnicConfig.onlyvis_train,
               "tiny": VacnicConfig.tiny}[args.config]()
        cfg = _apply_overrides(cfg, args.set or [])
        _, params = _init_inference_params(cfg)
        print("serving RANDOM-INIT weights (--random-init)", file=sys.stderr)
    else:
        print("serve: need --ckpt-dir or --random-init", file=sys.stderr)
        return 2

    tokenizer = None
    if args.vocab and args.merges:
        from vacnic_tpu.data.tokenize import BartBpeTokenizer

        tokenizer = BartBpeTokenizer(args.vocab, args.merges)
        tokenizer.add_special_tokens(
            ["<ENT>", "<NONAME>", "<PERSON>", "<ORGNORP>", "<GPELOC>"])

    buckets = tuple(int(b) for b in args.buckets.split(","))
    mesh = None
    if args.sharded:
        mesh = _sharded_decode_mesh("serving")
        # round buckets up to data-axis multiples so the documented default
        # ladder (1,8,32) starts on any device count instead of failing
        # CaptionService's divisibility check
        dp = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
        rounded = tuple(sorted({-(-b // dp) * dp for b in buckets}))
        if rounded != buckets:
            print(f"buckets {list(buckets)} -> {list(rounded)} "
                  f"(rounded up to multiples of the {dp}-way data axis)",
                  file=sys.stderr)
            buckets = rounded
    scfg = ServeConfig(
        buckets=buckets,
        max_wait_ms=args.max_wait_ms,
        input_kind=args.input_kind,
        default_deadline_ms=args.default_deadline_ms,
        fill_to_stable=args.fill_to_stable,
        stable_margin=args.stable_margin,
    )
    service = CaptionService(cfg, params, tokenizer=tokenizer, serve_cfg=scfg,
                             mesh=mesh)
    if args.watch_ckpt_s:
        if not args.ckpt_dir:
            print("serve: --watch-ckpt-s needs --ckpt-dir", file=sys.stderr)
            service.close()
            return 2
        from vacnic_tpu.serve import watch_checkpoints
        from vacnic_tpu.train.checkpoints import CheckpointManager

        m = CheckpointManager(args.ckpt_dir)
        initial = m.latest_step()
        m.close()
        watch_checkpoints(
            service, args.ckpt_dir,
            lambda step: _restore_watch_params(args.ckpt_dir, step,
                                               service.params),
            poll_s=args.watch_ckpt_s, initial_step=initial)
        print(f"watching {args.ckpt_dir} for new checkpoints every "
              f"{args.watch_ckpt_s:g}s (serving step {initial})",
              file=sys.stderr)
    if not args.no_precompile:
        print(f"precompiling buckets {scfg.buckets} ...", file=sys.stderr)
        service.precompile()
    try:
        http_serve(service, host=args.host, port=args.port)
    except KeyboardInterrupt:
        pass
    finally:
        service.close()
    return 0


def cmd_quality_rehearsal(args) -> int:
    """One-command corpus-quality-parity rehearsal (eval/rehearsal.py): when
    real weights/corpora appear, the real run swaps synthetic data for the
    corpus paths — the decode+convert+eval pipeline is this exact code."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # CI-time CPU check
    from vacnic_tpu.eval.rehearsal import run_quality_rehearsal

    try:
        summary = run_quality_rehearsal(
            args.out_dir, n_samples=args.samples,
            train_steps=args.train_steps, seed=args.seed,
            ref_dir=args.ref_dir)
    except SystemExit as e:
        if e.code == 3:
            print("quality-rehearsal: reference snapshot not mounted at "
                  f"{args.ref_dir} (env-blocked)", file=sys.stderr)
        raise
    print(json.dumps(summary))
    ok = summary["token_identity"] == 1.0 and summary["metrics_identical"]
    return 0 if ok else 1


def cmd_evaluate(args) -> int:
    from vacnic_tpu.eval.caption_metrics import compute_caption_metrics
    from vacnic_tpu.eval.entity_eval import evaluate_entity, evaluate_entity_by_gtent
    from vacnic_tpu.eval.face_groups import score_face_groups

    with open(args.results) as f:
        out_dict = json.load(f)
    pairs = [(v["gen"], v["gt"]) for k, v in out_dict.items()
             if k not in ("bleu", "other metrics")]
    report = compute_caption_metrics(pairs)
    if args.gtent:
        with open(args.gtent) as f:
            gtent = json.load(f)
        report["entities"] = evaluate_entity_by_gtent(out_dict, gtent)
    else:
        report["entities"] = evaluate_entity(out_dict)
    if args.data_dict:
        with open(args.data_dict) as f:
            data_dict = json.load(f)
        report["face_groups"] = score_face_groups(out_dict, data_dict)
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0


def _load_clip_retrieval_ckpt(path: str, vcfg, text_layers: int = 12,
                              text_heads: int = 8) -> dict:
    """Load BOTH CLIP towers for `cli retrieve --clip-ckpt` (reference
    --trained_clip, train...match.py:736-739). Accepts a converted .npz tree
    or a raw .pt: the vision tower goes through the same helper as
    `train --clip-ckpt` (OpenAI or HF format); the text tower only has an
    OpenAI converter. Raises SystemExit when no text tower is available —
    retrieval needs it to score sentences."""
    if path.endswith(".npz"):
        clip_params = _convert_checkpoint_module().load_tree(path)
    else:
        from vacnic_tpu.models import weights_io as W
        from vacnic_tpu.models.clip_text import convert_clip_text_openai

        sd = W.load_state_dict(path)
        clip_params = {"vision": _load_clip_vision_ckpt(path, vcfg)}
        if any(k.startswith("transformer.resblocks.") for k in sd):
            clip_params["text"] = convert_clip_text_openai(
                sd, layers=text_layers, heads=text_heads)
    if "text" not in clip_params:
        raise SystemExit(
            "clip checkpoint has no text tower usable for retrieval; pass an "
            "OpenAI-format .pt or convert it with scripts/convert_checkpoint.py clip")
    return clip_params


def cmd_retrieve(args) -> int:
    """CLIP sentence-retrieval preprocessing (the stage ABSENT from the
    reference snapshot, SURVEY §0.1): embed each sample's image, score the
    article's sentences with the CLIP text tower, keep the top
    --num-sentences, and write `sents_byclip` into a copy of the data dict —
    producing the `*_clip{N}sent_contras_name_pos.json` files the trainers
    consume (train...match.py:772, goodnews...py:562-563)."""
    import jax.numpy as jnp
    import numpy as np

    from vacnic_tpu.core.config import ClipVisionConfig
    from vacnic_tpu.data.clip_tokenize import ClipBpeTokenizer
    from vacnic_tpu.data.datasets import load_image
    from vacnic_tpu.data.preprocess.clip_retrieval import retrieve_sentences, split_sentences
    from vacnic_tpu.models.clip_vit import clip_image_embed

    vcfg = ClipVisionConfig()
    clip_params = _load_clip_retrieval_ckpt(args.clip_ckpt, vcfg)
    tok = ClipBpeTokenizer.from_dir(args.clip_vocab)

    with open(args.data_dict) as f:
        data_dict = json.load(f)
    n_done = 0
    for hash_id, rec in data_dict.items():
        art_path = os.path.join(args.data_base_dir, "articles_full", f"{hash_id}.txt")
        if "article" in rec:
            article = rec["article"]
        elif os.path.exists(art_path):
            with open(art_path) as f:
                article = f.read()
        else:
            continue
        img_path = os.path.join(args.data_base_dir, "images_processed", f"{hash_id}.jpg")
        if not os.path.exists(img_path):
            continue
        pixels = jnp.asarray(load_image(img_path)[None])
        img_embed = np.asarray(clip_image_embed(clip_params["vision"], pixels, vcfg))[0]
        if len(split_sentences(article)) > 1:
            rec["sents_byclip"] = retrieve_sentences(
                clip_params["text"], tok, img_embed, article,
                num_sentences=args.num_sentences)
        else:
            rec["sents_byclip"] = article
        n_done += 1
    with open(args.out, "w") as f:
        json.dump(data_dict, f)
    print(f"retrieved top-{args.num_sentences} sentences for {n_done} samples → {args.out}")
    return 0


def cmd_lmm(args) -> int:
    """LMM zero-shot prompting over a split (test_*_prompt.py equivalents)."""
    from vacnic_tpu.lmm import prompting as P

    backends = {
        "echo": P.EchoBackend,
        "instructblip": P.InstructBlipBackend,
        "llava": P.LlavaBackend,
    }
    backend = backends[args.backend]()
    with open(args.data_dict) as f:
        data_dict = json.load(f)
    from vacnic_tpu.data.datasets import NewsCaptionDataset

    ds = NewsCaptionDataset(
        data_dict, args.data_base_dir, tokenizer=None, dataset=args.dataset,
        retrieved_sent=args.use_retrieval, raw_mode=True,
    )
    def loader():
        bs = args.batch_size
        for i in range(0, len(ds), bs):
            samples = [ds[j] for j in range(i, min(i + bs, len(ds)))]
            yield {
                "article": [s["article"] for s in samples],
                "caption": [s["caption"] for s in samples],
                "raw_img": [s["raw_img"] for s in samples],
            }

    out = P.prompt_captions(backend, loader(), use_retrieval=args.use_retrieval,
                            out_path=args.out)
    flat = P.flatten_for_scoring(out)
    from vacnic_tpu.eval.caption_metrics import compute_caption_metrics

    m = compute_caption_metrics([(v["gen"], v["gt"]) for v in flat.values()])
    print(json.dumps(m))
    return 0


def main(argv=None) -> int:
    # Honor JAX_PLATFORMS the way stock JAX does. The TPU image's
    # sitecustomize calls axon.register(), which overrides jax_platforms via
    # jax.config at interpreter start — so `JAX_PLATFORMS=cpu vacnic_tpu.cli
    # smoke` would silently run against the tunneled TPU (minutes of remote
    # compile for a tiny self-check). Re-asserting the env value after import
    # restores env-var semantics; a no-op when the env agrees or is unset.
    envp = os.environ.get("JAX_PLATFORMS")
    if envp:
        import jax

        jax.config.update("jax_platforms", envp)

    p = argparse.ArgumentParser(prog="vacnic_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("train", help="train the multimodal captioner")
    sp.add_argument("--config", choices=["full", "onlyvis", "tiny"], default="full")
    sp.add_argument("--data-dir", required=True)
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--vocab", required=True, help="BART vocab.json")
    sp.add_argument("--merges", required=True, help="BART merges.txt")
    sp.add_argument("--max-steps", type=int, default=None)
    sp.add_argument("--init-bart", default=None,
                    help="converted BART .npz (scripts/convert_checkpoint.py) to init from")
    sp.add_argument("--resume", action="store_true",
                    help="resume from <out-dir>/last (full TrainState incl. optimizer)")
    sp.add_argument("--set", action="append", metavar="sec.field=val")
    sp.add_argument("--clip-ckpt", default=None,
                    help="stock or fine-tuned CLIP vision checkpoint "
                         "(.npz tree or OpenAI/HF .pt — reference "
                         "--trained_clip, train...match.py:736-739)")
    sp.add_argument("--clip-vocab", default=None,
                    help="CLIP BPE vocab (bpe_simple_vocab_16e6.txt.gz or HF dir) "
                         "→ emit caption_ids_clip for the CLIP contrastive loss")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("generate", help="beam-decode a split from a checkpoint")
    sp.add_argument("--ckpt-dir", required=True)
    sp.add_argument("--data-dict", required=True)
    sp.add_argument("--vocab", required=True)
    sp.add_argument("--merges", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--set", action="append")
    sp.add_argument("--sharded", action="store_true",
                    help="shard the beam search over all visible devices "
                         "(the device count must divide the batch size; "
                         "non-divisible tail batches decode single-program)")
    sp.set_defaults(fn=cmd_generate)

    sp = sub.add_parser("serve", help="online caption service (micro-batched HTTP)")
    sp.add_argument("--ckpt-dir", default=None)
    sp.add_argument("--random-init", action="store_true",
                    help="serve random-init weights (drive/load testing)")
    sp.add_argument("--config", choices=["full", "onlyvis", "tiny"], default="full",
                    help="config preset for --random-init (ckpt runs use the saved config)")
    sp.add_argument("--vocab", default=None, help="BART vocab.json (else token-id output)")
    sp.add_argument("--merges", default=None)
    sp.add_argument("--host", default="127.0.0.1")
    sp.add_argument("--port", type=int, default=8500)
    sp.add_argument("--buckets", default="1,8,32,64",
                    help="comma-separated static batch buckets (each = one "
                         "XLA program). Default ladder covers the measured "
                         "frontier: 64 engages past ~80 rps (queue38)")
    sp.add_argument("--max-wait-ms", type=float, default=10.0,
                    help="batcher hold time for incomplete batches (latency/throughput dial)")
    sp.add_argument("--input-kind", choices=["image_cls", "pixels"], default="image_cls")
    sp.add_argument("--watch-ckpt-s", type=float, default=None,
                    help="poll --ckpt-dir every N seconds and hot-swap newer "
                         "checkpoints into the running service")
    sp.add_argument("--default-deadline-ms", type=float, default=None,
                    help="shed requests older than this at batch-form time "
                         "(504 over HTTP); per-request deadline_ms overrides")
    sp.add_argument("--no-precompile", action="store_true")
    sp.add_argument("--fill-to-stable", action="store_true",
                    help="additionally WAIT (stability-bounded) to fill the "
                         "stable-target bucket — measured to pin the service "
                         "at marginal capacity under load; the no-wait "
                         "saturation-aware defer is always on (serve.py)")
    sp.add_argument("--stable-margin", type=float, default=1.5,
                    help="stability headroom: a bucket is escalation-exempt "
                         "only if its measured capacity covers "
                         "arrival_rate * margin")
    sp.add_argument("--sharded", action="store_true",
                    help="data-parallel serving over all visible devices "
                         "(every bucket must be divisible by the data axis)")
    sp.add_argument("--set", action="append", metavar="sec.field=val")
    sp.set_defaults(fn=cmd_serve)

    sp = sub.add_parser("retrieve", help="CLIP sentence-retrieval preprocessing")
    sp.add_argument("--data-dict", required=True)
    sp.add_argument("--data-base-dir", required=True)
    sp.add_argument("--clip-ckpt", required=True,
                    help="converted CLIP .npz (scripts/convert_checkpoint.py clip)")
    sp.add_argument("--clip-vocab", required=True)
    sp.add_argument("--num-sentences", type=int, default=8)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_retrieve)

    sp = sub.add_parser("evaluate", help="score a caption-results JSON")
    sp.add_argument("--results", required=True)
    sp.add_argument("--gtent", default=None)
    sp.add_argument("--data-dict", default=None)
    sp.add_argument("--out", default=None)
    sp.set_defaults(fn=cmd_evaluate)

    sp = sub.add_parser("lmm", help="LMM zero-shot prompting baseline")
    sp.add_argument("--backend", choices=["echo", "instructblip", "llava"], default="echo")
    sp.add_argument("--data-dict", required=True)
    sp.add_argument("--data-base-dir", required=True)
    sp.add_argument("--dataset", choices=["goodnews", "nytimes"], default="goodnews")
    sp.add_argument("--use-retrieval", action="store_true")
    sp.add_argument("--batch-size", type=int, default=4)
    sp.add_argument("--out", required=True)
    sp.set_defaults(fn=cmd_lmm)

    sp = sub.add_parser(
        "quality-rehearsal",
        help="CPU rehearsal of corpus quality parity: train the reference "
             "torch model briefly, convert, decode a held-out split through "
             "both stacks, run the full eval stack on both, assert metric "
             "identity")
    sp.add_argument("--out-dir", required=True)
    sp.add_argument("--samples", type=int, default=16)
    sp.add_argument("--train-steps", type=int, default=120)
    sp.add_argument("--seed", type=int, default=0)
    sp.add_argument("--ref-dir", default="/root/reference")
    sp.set_defaults(fn=cmd_quality_rehearsal)

    sp = sub.add_parser("smoke", help="tiny synthetic end-to-end self-check")
    sp.set_defaults(fn=cmd_smoke)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
