"""Fused clip+AdamW+freeze+apply+EMA vs the unfused optax chain.

The fused path (optim.fused_adamw_ema_apply, enabled by
OptimConfig.fused_update) must produce BIT-IDENTICAL params, teacher, and
optimizer state to the optax chain + apply_updates + EMA tree_map it
replaces — including under per-param clipping, the weight-decay mask, the
DINO-head last-layer freeze, and finetune layer freezes. Reference
semantics being reproduced: AdamW step + clip_gradients +
cancel_gradients_last_layer + teacher EMA (main_esvit.py:575-590,
utils.py:106-123).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from esvit_tpu import config
from esvit_tpu.train import optim as optim_lib


def make_params(key):
    k = jax.random.split(key, 8)
    return {
        "backbone": {
            "layers_0": {"kernel": jax.random.normal(k[0], (16, 16)),
                         "bias": jax.random.normal(k[1], (16,))},
            "patch_embed": {"kernel": jax.random.normal(k[2], (4, 8)),
                            "scale": jax.random.normal(k[3], (8,))},
        },
        "head": {
            "last_layer": {"kernel_v": jax.random.normal(k[4], (8, 32)),
                           "scale_g": jax.random.normal(k[5], (32,))},
            "mlp": {"kernel": jax.random.normal(k[6], (8, 8)),
                    "bias": jax.random.normal(k[7], (8,))},
        },
    }


def unfused_step(opt, params, teacher, opt_state, grads, ll_mask, frozen,
                 m, f_mask=None):
    g = optim_lib.apply_last_layer_freeze(grads, ll_mask, frozen)
    if f_mask is not None:
        g = optim_lib.apply_param_freeze(g, f_mask)
    updates, opt_state = opt.update(g, opt_state, params)
    updates = optim_lib.apply_last_layer_freeze(updates, ll_mask, frozen)
    if f_mask is not None:
        updates = optim_lib.apply_param_freeze(updates, f_mask)
    new_p = optax.apply_updates(params, updates)
    new_t = jax.tree.map(lambda t, s: t * m + s * (1.0 - m), teacher, new_p)
    return new_p, new_t, opt_state


@pytest.mark.parametrize("clip", [3.0, 0.0])
@pytest.mark.parametrize("frozen_layers", [(), ("patch_embed",)])
def test_fused_adamw_bit_identical(clip, frozen_layers):
    cfg = config.OptimConfig(clip_grad=clip, frozen_layers=frozen_layers)
    params = make_params(jax.random.PRNGKey(0))
    teacher = jax.tree.map(jnp.copy, params)
    lr_fn = lambda s: 1e-3 * (1.0 + s)
    wd_fn = lambda s: 0.04 + 0.01 * s
    opt = optim_lib.make_optimizer(cfg, params, lr_fn, wd_fn,
                                   decay_scale_g=True)
    opt_state = opt.init(params)

    ll_mask = optim_lib.last_layer_mask(params)
    decay_mask = optim_lib.wd_mask(params, decay_scale_g=True)
    f_mask = (optim_lib.freeze_mask_by_prefix(params, frozen_layers)
              if frozen_layers else None)

    p_u, t_u, s_u = params, teacher, opt_state
    p_f, t_f, s_f = params, teacher, opt_state
    for step in range(4):
        grads = jax.tree.map(
            lambda p: jax.random.normal(
                jax.random.fold_in(jax.random.PRNGKey(7), step), p.shape)
            * (10.0 if step % 2 else 0.1),     # exercise both clip branches
            params)
        frozen = jnp.asarray(step < 2)         # freeze, then unfreeze
        m = 0.996 + 1e-4 * step

        # Masks are static Python-bool pytrees — close over them instead of
        # passing through jit (they'd be traced and break `if mask:`).
        p_u, t_u, s_u = jax.jit(
            lambda p, t, s, g, fr, mm: unfused_step(
                opt, p, t, s, g, ll_mask, fr, mm, f_mask))(
            p_u, t_u, s_u, grads, frozen, m)
        # Schedules evaluated INSIDE jit on a traced step so the f32
        # arithmetic matches optax inject_hyperparams bit-for-bit.
        p_f, t_f, s_f = jax.jit(
            lambda p, t, s, g, fr, mm, st: optim_lib.fused_adamw_ema_apply(
                g, s, p, t, lr=lr_fn(st), wd=wd_fn(st), ema_m=mm,
                clip=clip, decay_mask=decay_mask, ll_mask=ll_mask,
                frozen=fr, f_mask=f_mask))(
            p_f, t_f, s_f, grads, frozen, m, jnp.asarray(step, jnp.int32))

        for a, b in zip(jax.tree.leaves(p_u), jax.tree.leaves(p_f)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(t_u), jax.tree.leaves(t_f)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # Optimizer state: identical structure AND values (counts, moments,
        # recorded hyperparams) so checkpoints interchange freely.
        assert (jax.tree.structure(s_u) == jax.tree.structure(s_f))
        for a, b in zip(jax.tree.leaves(s_u), jax.tree.leaves(s_f)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Frozen leaves never moved; unfrozen ones did.
    if frozen_layers:
        np.testing.assert_array_equal(
            np.asarray(p_f["backbone"]["patch_embed"]["kernel"]),
            np.asarray(params["backbone"]["patch_embed"]["kernel"]))
    assert np.abs(np.asarray(p_f["backbone"]["layers_0"]["kernel"])
                  - np.asarray(params["backbone"]["layers_0"]["kernel"])).max() > 0


def test_train_step_fused_matches_unfused():
    """Full femto train step: fused_update=True == fused_update=False."""
    from esvit_tpu.train.step import EsViTTrainer

    def build(fused):
        cfg = config.TrainConfig(
            model=config.swin_femto(),
            head=config.HeadConfig(out_dim=32, hidden_dim=16,
                                   bottleneck_dim=8),
            loss=config.LossConfig(out_dim=32, use_dense_prediction=True,
                                   warmup_teacher_temp_epochs=2),
            optim=config.OptimConfig(epochs=4, warmup_epochs=1,
                                     freeze_last_layer_epochs=1,
                                     fused_update=fused),
            steps_per_epoch=2,
            dtype=jnp.float32,
        )
        return EsViTTrainer(cfg, total_batch_size=8)

    rng = np.random.default_rng(0)
    batch = (jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32),
             jnp.asarray(rng.normal(size=(16, 16, 16, 3)), jnp.float32))

    tr_f, tr_u = build(True), build(False)
    state_f = tr_f.init_state(jax.random.PRNGKey(0), batch)
    state_u = tr_u.init_state(jax.random.PRNGKey(0), batch)
    step_f = jax.jit(tr_f.train_step)
    step_u = jax.jit(tr_u.train_step)
    for i in range(3):
        state_f, m_f = step_f(state_f, batch, jax.random.PRNGKey(i))
        state_u, m_u = step_u(state_u, batch, jax.random.PRNGKey(i))
    for a, b in zip(jax.tree.leaves(state_u.student),
                    jax.tree.leaves(state_f.student)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state_u.teacher),
                    jax.tree.leaves(state_f.teacher)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state_u.opt_state),
                    jax.tree.leaves(state_f.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(m_u["grad_norm"]),
                                  np.asarray(m_f["grad_norm"]))
