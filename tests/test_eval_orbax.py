"""Orbax-checkpoint → eval loading path: train briefly, save, run k-NN from
the saved teacher (the in-framework analogue of loading released .pth)."""

import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu import config
from esvit_tpu.data.datasets import ProceduralShapes
from esvit_tpu.evals.knn import load_backbone_variables, run_knn_eval
from esvit_tpu.io.checkpoint import CheckpointManager
from esvit_tpu.models.registry import build_backbone
from esvit_tpu.train.step import EsViTTrainer
import pytest


pytestmark = pytest.mark.slow

def test_orbax_checkpoint_to_knn_eval(tmp_path, np_rng):
    cfg = config.TrainConfig(
        model=config.swin_femto(),
        head=config.HeadConfig(out_dim=16, hidden_dim=8, bottleneck_dim=4),
        loss=config.LossConfig(out_dim=16, use_dense_prediction=True),
        optim=config.OptimConfig(epochs=1, warmup_epochs=0),
        steps_per_epoch=1, dtype=jnp.float32)
    trainer = EsViTTrainer(cfg, total_batch_size=4)
    batch = (jnp.asarray(np_rng.normal(size=(4, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(6, 16, 16, 3)), jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path))
    mgr.save(state, epoch=0)

    model_cfg = cfg.model
    backbone = build_backbone(model_cfg)
    variables = load_backbone_variables(
        backbone, model_cfg, str(tmp_path / "checkpoint"), "teacher")
    # variables must equal the saved teacher backbone
    a = np.asarray(jax.tree.leaves(variables["params"])[0])
    b = np.asarray(jax.tree.leaves(
        jax.device_get(state.teacher)["backbone"])[0])
    np.testing.assert_array_equal(a, b)

    train_ds = ProceduralShapes(n=16, size=48, seed=0)
    val_ds = ProceduralShapes(n=8, size=48, seed=1)
    res = run_knn_eval(backbone, variables, train_ds, val_ds, ks=(3,),
                       batch_size=8, size=32)
    assert 3 in res
