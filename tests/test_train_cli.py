"""End-to-end orchestrator smoke: the reference's scripts_local smoke runs
(SURVEY.md §4) as an actual test — tiny model, synthetic data, real loader,
checkpointing, JSONL log, resume."""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu import config
from esvit_tpu.train import train as train_lib


pytestmark = pytest.mark.slow

def tiny_cfg(tmp_path):
    return config.TrainConfig(
        model=config.swin_femto(),
        head=config.HeadConfig(out_dim=16, hidden_dim=8, bottleneck_dim=4),
        loss=config.LossConfig(out_dim=16, use_dense_prediction=True,
                               warmup_teacher_temp_epochs=1),
        crops=config.CropConfig(global_size=32, local_size=16,
                                local_crops_number=2),
        # 8 virtual devices in the test env -> global batch 8
        optim=config.OptimConfig(epochs=2, warmup_epochs=1,
                                 batch_size_per_device=1),
        steps_per_epoch=2,
        dtype=jnp.float32,
        output_dir=str(tmp_path / "out"),
        save_every_epochs=1,
    )


def test_train_orchestrator_end_to_end(tmp_path):
    cfg = tiny_cfg(tmp_path)
    state = train_lib.train(
        cfg, data_kind="synthetic",
        data_kwargs={"n": 32, "size": 40}, host_aug=False)
    # 32 imgs / global bs 8 = 4 steps/epoch x 2 epochs
    assert int(state.step) == 8
    out = tmp_path / "out"
    assert (out / "checkpoint").is_dir()
    log = (out / "log.txt").read_text().strip().splitlines()
    assert len(log) == 2
    rec = json.loads(log[0])
    assert rec["epoch"] == 0 and np.isfinite(rec["train_loss"])

    # Resume: a fresh call continues from the checkpoint instead of step 0.
    state2 = train_lib.train(
        cfg.replace(optim=cfg.optim.__class__(
            **{**cfg.optim.__dict__, "epochs": 3})),
        data_kind="synthetic", data_kwargs={"n": 32, "size": 40})
    assert int(state2.step) == 12


def test_cli_arg_parsing(tmp_path):
    args = train_lib.get_args_parser().parse_args([
        "--arch", "swin_femto", "--out_dim", "32", "--epochs", "1",
        "--batch_size_per_device", "2", "--output_dir", str(tmp_path),
        "--no-bf16", "--local_crops_number", "2", "--local_crops_size", "16",
    ])
    cfg = train_lib.config_from_args(args)
    assert cfg.head.out_dim == 32
    assert cfg.crops.local_crops_number == 2
    assert cfg.dtype == jnp.float32
    assert cfg.model.name == "swin"
