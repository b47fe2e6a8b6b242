"""Smoke test for the checkpoint-parity runbook (scripts/reproduce_baseline.py).

Builds a synthetic reference .pth (femto Swin through the actual torch
reference), a tiny synthetic dataset, and drives the runbook end-to-end:
import -> k-NN -> linear probe -> report JSON. This is the exact command a
real reproduction run uses (BASELINE.md gate), minus ImageNet.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")


def test_runbook_end_to_end(tmp_path):
    import torch

    from tests.test_parity_swin import build_ref_swin

    ref = build_ref_swin()
    pth = tmp_path / "synthetic_teacher.pth"
    # Released checkpoints wrap the state dict under 'teacher' with DDP
    # 'module.' prefixes (ref utils.py:78-103) — replicate that envelope.
    torch.save({"teacher": {"module." + k: v
                            for k, v in ref.state_dict().items()}}, str(pth))

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts import reproduce_baseline

    out = tmp_path / "out"
    rc = reproduce_baseline.main([
        "--pth", str(pth),
        "--arch", "swin_femto",
        "--data_kind", "synthetic",
        "--dataset_kw", json.dumps({"n": 48, "size": 32, "num_classes": 4}),
        "--batch_size", "16",
        "--nb_knn", "5",
        "--linear_epochs", "2",
        "--output_dir", str(out),
    ])
    assert rc == 0  # femto has no gate -> informational, rc 0
    report = json.loads((out / "baseline_report.json").read_text())
    assert "5" in report["knn"]
    assert report["linear_top1"] is not None
    assert report["gate"] is None
