"""Orbax checkpoint save/restore + resume semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu import config
from esvit_tpu.io.checkpoint import CheckpointManager
from esvit_tpu.train.step import EsViTTrainer
import pytest


pytestmark = pytest.mark.slow

def tiny_trainer():
    cfg = config.TrainConfig(
        model=config.swin_femto(),
        head=config.HeadConfig(out_dim=16, hidden_dim=8, bottleneck_dim=4),
        loss=config.LossConfig(out_dim=16, use_dense_prediction=True),
        optim=config.OptimConfig(epochs=2, warmup_epochs=0),
        steps_per_epoch=2, dtype=jnp.float32)
    return EsViTTrainer(cfg, total_batch_size=4)


def test_save_restore_roundtrip(tmp_path, np_rng):
    trainer = tiny_trainer()
    batch = (jnp.asarray(np_rng.normal(size=(4, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(6, 16, 16, 3)), jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, _ = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(1))

    mgr = CheckpointManager(str(tmp_path / "out"))
    assert not mgr.has_checkpoint()
    mgr.save(state, epoch=0, save_every_epochs=1)
    assert mgr.has_checkpoint()

    like = trainer.init_state(jax.random.PRNGKey(2), batch)
    restored = mgr.restore(like)
    assert restored is not None
    assert int(restored.step) == 1
    for a, b in zip(jax.tree.leaves(restored.student),
                    jax.tree.leaves(state.student)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(restored.centers.center),
                                  np.asarray(state.centers.center))
    # numbered keep also exists
    assert (tmp_path / "out" / "checkpoint0000").is_dir()


def test_restore_missing_returns_none(tmp_path, np_rng):
    trainer = tiny_trainer()
    batch = (jnp.asarray(np_rng.normal(size=(4, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(6, 16, 16, 3)), jnp.float32))
    like = trainer.init_state(jax.random.PRNGKey(0), batch)
    mgr = CheckpointManager(str(tmp_path / "empty"))
    assert mgr.restore(like) is None
