"""Trainer-level parity of the K-streamed loss path (LossConfig.streamed).

One full train step with streamed=True must produce the SAME parameter
updates and centers as the dense ddino_loss path — the streamed loss is an
exact reformulation, and the per-param Adam update quantizes away the fp
reassociation noise at these scales.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu import config
from esvit_tpu.train.step import EsViTTrainer


def _run(streamed, batch, B):
    cfg = config.TrainConfig(
        model=config.swin_femto(),
        head=config.HeadConfig(out_dim=256, hidden_dim=64,
                               bottleneck_dim=32),
        loss=config.LossConfig(out_dim=256, use_dense_prediction=True,
                               streamed=streamed, stream_chunks=4),
        optim=config.OptimConfig(batch_size_per_device=B),
        steps_per_epoch=100, dtype=jnp.float32)
    tr = EsViTTrainer(cfg, total_batch_size=B)
    state = tr.init_state(jax.random.PRNGKey(0), batch)
    state, m = jax.jit(tr.train_step)(state, batch, jax.random.PRNGKey(1))
    return float(m["loss"]), jax.device_get(state)


@pytest.mark.slow
def test_streamed_step_matches_dense_step():
    B = 4
    rng = np.random.RandomState(0)
    batch = (jnp.asarray(rng.rand(2 * B, 32, 32, 3), jnp.float32),
             jnp.asarray(rng.rand(4 * B, 16, 16, 3), jnp.float32))
    loss_d, st_d = _run(False, batch, B)
    loss_s, st_s = _run(True, batch, B)
    np.testing.assert_allclose(loss_s, loss_d, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(st_d.student),
                    jax.tree.leaves(st_s.student)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_d.centers.center),
                               np.asarray(st_s.centers.center),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(st_d.centers.center_grid),
                               np.asarray(st_s.centers.center_grid),
                               rtol=1e-5, atol=1e-7)
