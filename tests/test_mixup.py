"""Mixup-SSL: view mixing, target matrices, train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu import config
from esvit_tpu.data.mixup import MixupConfig, mixup_multicrop, mixup_view


def test_mixup_view_targets_rows_sum_to_one(np_rng):
    x = jnp.asarray(np_rng.uniform(size=(6, 8, 8, 3)), jnp.float32)
    cfg = MixupConfig(enabled=True, prob=1.0, switch_prob=0.0)
    mixed, t = mixup_view(jax.random.PRNGKey(0), x, cfg)
    assert mixed.shape == x.shape
    np.testing.assert_allclose(np.asarray(t).sum(1), 1.0, rtol=1e-6)
    # mixed = lam*x + (1-lam)*x[::-1] with lam from the target diagonal
    lam = float(t[0, 0])
    expect = lam * np.asarray(x) + (1 - lam) * np.asarray(x[::-1])
    np.testing.assert_allclose(np.asarray(mixed), expect, atol=1e-5)


def test_cutmix_branch_pastes_box(np_rng):
    x = jnp.asarray(np_rng.uniform(size=(4, 8, 8, 3)), jnp.float32)
    cfg = MixupConfig(enabled=True, prob=1.0, switch_prob=1.0)
    mixed, t = mixup_view(jax.random.PRNGKey(1), x, cfg)
    m = np.asarray(mixed)
    xf = np.asarray(x[::-1])
    xn = np.asarray(x)
    # every pixel comes from either x or flipped x
    from_x = np.isclose(m, xn).all(-1)
    from_f = np.isclose(m, xf).all(-1)
    assert np.all(from_x | from_f)
    # lam on the diagonal equals the non-box area fraction
    lam = float(t[0, 0])
    frac = from_x.mean()
    assert abs(lam - frac) < 0.35   # box clip makes exact only per-sample


def test_mixup_multicrop_only_first_views(np_rng):
    B, L = 4, 3
    g = jnp.asarray(np_rng.uniform(size=(2 * B, 8, 8, 3)), jnp.float32)
    l = jnp.asarray(np_rng.uniform(size=(L * B, 4, 4, 3)), jnp.float32)
    cfg = MixupConfig(enabled=True, num_mixup_views=2, prob=1.0)
    g2, l2, targets = mixup_multicrop(jax.random.PRNGKey(0), g, l, cfg)
    assert targets.shape == (2 + L, B, B)
    # local views untouched, identity targets
    np.testing.assert_array_equal(np.asarray(l2), np.asarray(l))
    for v in range(2, 2 + L):
        np.testing.assert_array_equal(np.asarray(targets[v]), np.eye(B))


def test_train_step_with_mixup(np_rng):
    from esvit_tpu.train.step import EsViTTrainer

    cfg = config.TrainConfig(
        model=config.swin_femto(),
        head=config.HeadConfig(out_dim=16, hidden_dim=8, bottleneck_dim=4),
        loss=config.LossConfig(out_dim=16, use_dense_prediction=False),
        optim=config.OptimConfig(epochs=2, warmup_epochs=0),
        mixup=MixupConfig(enabled=True, num_mixup_views=2),
        steps_per_epoch=2, dtype=jnp.float32)
    trainer = EsViTTrainer(cfg, total_batch_size=4)
    batch = (jnp.asarray(np_rng.normal(size=(8, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(8, 16, 16, 3)), jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, m = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
