"""Per-layer ViL neighbor-mode sampling (mode sentinel PER_LAYER_MODE):
the reference draws the sliding-chunk neighbor independently per layer per
forward (longformer2d.py:151); ours does it with a traced lax.switch so one
compilation covers all draws."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu import config
from esvit_tpu.models.vil import PER_LAYER_MODE, MsViT

pytestmark = pytest.mark.slow  # lax.switch over 8 chunk variants: slow compile


@pytest.fixture(scope="module")
def vil():
    cfg = config.vil_from_arch(
        "l1,h2,d16,n2,s1,g1,p4,f2_l2,h2,d32,n1,s1,g1,p2,f2", img_size=32)
    model = MsViT(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    return model, v


def _fwd(model, v, x, key, mode):
    return model.apply(v, x, deterministic=True, mode=mode,
                       rngs={"vil_mode": key})


def test_per_layer_mode_runs_and_is_deterministic(vil, np_rng):
    model, v = vil
    x = jnp.asarray(np_rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    k = jax.random.PRNGKey(7)
    c1, _ = _fwd(model, v, x, k, PER_LAYER_MODE)
    c2, _ = _fwd(model, v, x, k, PER_LAYER_MODE)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_per_layer_mode_draws_vary_with_key(vil, np_rng):
    model, v = vil
    x = jnp.asarray(np_rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    outs = [np.asarray(_fwd(model, v, x, jax.random.PRNGKey(s),
                            PER_LAYER_MODE)[0]) for s in range(6)]
    # At least two keys must select different neighbor sets.
    assert any(not np.array_equal(outs[0], o) for o in outs[1:])


def test_per_layer_mode_matches_some_static_mode_single_layer(np_rng):
    """With ONE sparse layer, a per-layer draw must equal one of the 8
    static-mode forwards (same params, same input)."""
    cfg = config.vil_from_arch("l1,h2,d16,n1,s1,g1,p4,f2", img_size=32)
    model = MsViT(cfg)
    x = jnp.asarray(np_rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    got = np.asarray(_fwd(model, v, x, jax.random.PRNGKey(3),
                          PER_LAYER_MODE)[0])
    statics = [np.asarray(model.apply(v, x, deterministic=True, mode=m)[0])
               for m in range(1, 9)]
    assert any(np.allclose(got, s, rtol=1e-5, atol=1e-6) for s in statics)


def test_train_step_with_per_layer_mode(np_rng):
    """The jitted train step accepts the sentinel for both nets."""
    from esvit_tpu.train.step import EsViTTrainer

    cfg = config.TrainConfig(
        model=config.vil_femto(per_layer_mode=True, mode=2, mode_switch=1.0),
        head=config.HeadConfig(out_dim=32, hidden_dim=16, bottleneck_dim=8),
        loss=config.LossConfig(out_dim=32, use_dense_prediction=False),
        optim=config.OptimConfig(epochs=2, warmup_epochs=1),
        steps_per_epoch=2, dtype=jnp.float32)
    trainer = EsViTTrainer(cfg, total_batch_size=2)
    batch = (jnp.asarray(np_rng.normal(size=(4, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(4, 16, 16, 3)), jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.train_step,
                   static_argnames=("mode", "teacher_mode"))
    state, metrics = step(state, batch, jax.random.PRNGKey(1),
                          mode=PER_LAYER_MODE, teacher_mode=PER_LAYER_MODE)
    assert np.isfinite(float(metrics["loss"]))
