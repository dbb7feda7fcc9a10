"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY §4 distributed-test strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins the TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU plugin's sitecustomize overrides jax_platforms via jax.config at
# interpreter start; override it back before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


# --- fast smoke tier (`pytest -m fast`, <5 min on this box) -----------------
# One representative test per subsystem, centralized here so the tier can't
# drift silently across files. Durations from scripts/logs_r4/
# pytest_durations.log; budget ≈ 4.5 min total. The graft-contract dryrun
# covers mesh/sharded-train/sharded-decode in one test.
FAST_TESTS = {
    "test_graft_contract.py::test_dryrun_multichip_8_inline",      # driver contract + 8-dev mesh
    "test_train_step.py::test_loss_decreases",                     # train step + losses wiring
    "test_decode_kernel.py::test_generate_mm_pallas_flag_token_parity",  # fused decode kernel e2e
    "test_lm_stats.py::test_generate_mm_stats_token_parity",       # fused LM-stats head e2e
    "test_beam_shortlist.py::test_fast_modes_match_full[0-shortlist]",   # beam-logic equivalence
    "test_beam_shortlist.py::test_shortlist_blockmax_mode[None]",  # blockmax default (r4)
    "test_beam_418_semantics.py::test_chunked_top_k_matches_single_call",
    "test_beam_parity.py::test_beam_tokens_match_hf[2.0-0-2]",     # HF token identity
    "test_kernels.py::test_flash_matches_reference[128-256]",      # flash attention kernel
    "test_encoder_stack.py::test_fused_encoder_batch_slicing[full]",     # fused encoder kernel
    "test_fusion_parity.py::test_full_forward_parity",             # golden parity vs reference torch
    "test_losses.py::test_secla_matches_torch_reference",
    "test_data_layer.py::test_prefetch_loader",
    "test_dataset_fixture.py::test_dataset_retrieved",
    "test_eval_metrics.py::test_bleu_hand_computed",
    "test_meteor15.py::test_jar_protocol_driver",
    "test_clip_parity.py::test_cls_and_patch_parity",              # CLIP ViT vs HF
    "test_bart_parity.py::test_encoder_parity",
    "test_clip_tokenize.py::test_hf_id_parity",
    "test_native_runtime.py::test_native_matches_python",          # C BPE engine
    "test_loop_and_checkpoints.py::test_restore_across_prng_impl", # ckpt/resume
    "test_checkpoint_flow.py::test_retrieve_ckpt_loader_formats",
    "test_decode_fast.py::test_choose_plan_clamps_env_chunking",   # plan legality
    "test_serve.py::test_singleton_flush",                         # serving micro-batcher
    "test_serve.py::test_stable_target_selection",                 # fill-to-stable policy (r5)
    "test_decode_fast.py::test_plan_regime_stale_warning",         # plan-provenance guard (r5)
}


def pytest_collection_modifyitems(config, items):
    matched = set()
    for item in items:
        nodeid = item.nodeid.split("tests/")[-1]
        if nodeid in FAST_TESTS:
            item.add_marker(pytest.mark.fast)
            matched.add(nodeid)
    # Guard against tier rot: on a full-suite collection, every listed id
    # must exist (renames/removals surface immediately instead of silently
    # shrinking the tier). Sub-path runs collect fewer files — skip there.
    files = {item.nodeid.split("::")[0] for item in items}
    # only --ignore shrinks COLLECTION (this hook runs before -k/-m
    # deselection), so -k/-m runs must keep the guard: `pytest -m fast` is
    # exactly where a renamed FAST_TESTS entry must fail loudly
    if len(files) >= 25 and not config.getoption("ignore"):
        missing = FAST_TESTS - matched
        assert not missing, f"FAST_TESTS entries not collected: {sorted(missing)}"


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


def assert_close(a, b, atol=1e-4, rtol=1e-4, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol, err_msg=msg)
