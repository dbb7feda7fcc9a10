"""cli quality-rehearsal (VERDICT r4 next #4): the one-command CPU rehearsal
of corpus quality parity — reference-side training, production conversion,
both-stack decode, full eval stack, metric identity. Skipped when the
reference snapshot is absent (env-blocked, like the golden-parity tests)."""

import json
import os

import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference snapshot not mounted")


def test_quality_rehearsal_end_to_end(tmp_path):
    from vacnic_tpu.eval.rehearsal import run_quality_rehearsal

    summary = run_quality_rehearsal(
        str(tmp_path), n_samples=4, train_steps=10, seed=0)
    # the whole point: both stacks produce identical captions, hence
    # identical metrics through the full eval stack
    assert summary["token_identity"] == 1.0, summary
    assert summary["metrics_identical"] is True, summary
    # training actually moved the model (peaked logits, not random ties)
    assert summary["train_loss_last"] < summary["train_loss_first"]
    # artifacts on disk: caption JSONs + reports + summary
    for name in ("captions_ours.json", "captions_reference.json",
                 "report_ours.json", "report_reference.json", "summary.json"):
        assert (tmp_path / name).is_file(), name
    with open(tmp_path / "report_ours.json") as f:
        report = json.load(f)
    assert set(report) >= {"bleu", "other metrics", "entities", "face_groups"}
    assert set(report["face_groups"]) == {
        "face_name", "face_noname", "noface_name", "noface_noname"}
