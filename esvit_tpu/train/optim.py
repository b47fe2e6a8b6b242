"""Optimizer stack replicating the reference's update semantics.

- AdamW (torch defaults: betas 0.9/0.999, eps 1e-8) with two param groups:
  no weight decay on biases / 1-D params (ref: utils.py:672-683
  get_params_groups).
- Per-parameter gradient norm clipping — each tensor clipped to ``clip``
  independently (ref: utils.py:106-115 clip_gradients), not a global norm.
- LR and WD are per-step cosine schedules injected every update
  (ref: main_esvit.py:505-510 writes schedule[it] into the param groups).
- DINO-head last-layer freeze for the first ``freeze_last_layer`` epochs
  (ref: utils.py:118-123 cancel_gradients_last_layer sets grad=None, which
  makes torch skip the param entirely). Here the incoming gradient AND the
  final update are zeroed while frozen; since Adam moments start at zero and
  see only zero grads during the freeze, the param and its moments are
  unchanged, matching torch except for the per-param step count used in bias
  correction after unfreeze (negligible, documented).
- SGD and LARS (ref: utils.py:519-557, used for ResNet recipes).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from esvit_tpu.config import OptimConfig


def wd_mask(params: Any, decay_scale_g: bool = False) -> Any:
    """True for weight-decayed leaves: ndim > 1 and name isn't a bias.
    Mirrors get_params_groups (utils.py:672-683): biases and all 1-D params
    (LayerNorm scales, rel-pos tables are 2-D and *are* decayed there too —
    same here).

    decay_scale_g: the DINO-head weight-norm gain is stored (out,) here but
    is the reference's 2-D ``weight_g`` (out, 1), which get_params_groups
    decays whenever it is trainable (norm_last_layer=False, this repo's CLI
    default). When norm_last_layer=True torch sets requires_grad=False and
    the param never enters a group, so it must NOT be decayed either."""
    def f(path, x):
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "scale_g":
            return decay_scale_g
        return x.ndim > 1 and not name.endswith("bias")
    return jax.tree_util.tree_map_with_path(f, params)


def last_layer_mask(params: Any) -> Any:
    """True for DINO-head last-layer leaves (path contains 'last_layer')."""
    def f(path, x):
        return any(getattr(k, "key", str(k)) == "last_layer" for k in path)
    return jax.tree_util.tree_map_with_path(f, params)


def per_param_clip(clip: float) -> optax.GradientTransformation:
    """Clip each parameter's gradient to norm ``clip`` independently
    (utils.py:106-115: coef = clip / (||g|| + 1e-6), applied if < 1)."""

    def update_fn(updates, state, params=None):
        del params

        def c(g):
            n = jnp.linalg.norm(g.astype(jnp.float32))
            coef = jnp.minimum(clip / (n + 1e-6), 1.0)
            return (g * coef).astype(g.dtype)

        return jax.tree.map(c, updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update_fn)


def make_optimizer(cfg: OptimConfig, params: Any,
                   lr_fn: Callable, wd_fn: Callable,
                   decay_scale_g: bool = False) -> optax.GradientTransformation:
    """Build the full chain. lr_fn/wd_fn: step -> value (traced-friendly)."""
    decay_mask = wd_mask(params, decay_scale_g=decay_scale_g)

    if cfg.optimizer == "adamw":
        def make_opt(lr, wd):
            return optax.chain(
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.add_decayed_weights(wd, mask=decay_mask),
                optax.scale(-1.0),
                optax.scale_by_learning_rate(lr, flip_sign=False),
            )
    elif cfg.optimizer == "sgd":
        def make_opt(lr, wd):
            return optax.chain(
                optax.trace(decay=0.9),
                optax.add_decayed_weights(wd, mask=decay_mask),
                optax.scale(-1.0),
                optax.scale_by_learning_rate(lr, flip_sign=False),
            )
    elif cfg.optimizer == "lars":
        def make_opt(lr, wd):
            return optax.lars(lr, weight_decay=wd,
                              weight_decay_mask=decay_mask, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    opt = optax.inject_hyperparams(
        lambda lr, wd: make_opt(lr, wd))(lr=lr_fn, wd=wd_fn)

    if cfg.clip_grad and cfg.clip_grad > 0:
        opt = optax.chain(per_param_clip(cfg.clip_grad), opt)
    return opt


def fused_adamw_ema_apply(grads: Any, opt_state, params: Any, teacher: Any,
                          *, lr, wd, ema_m, clip: float | None,
                          decay_mask: Any, ll_mask: Any, frozen,
                          f_mask: Any = None,
                          b1: float = 0.9, b2: float = 0.999,
                          eps: float = 1e-8):
    """One-pass clip + AdamW + last-layer freeze + param apply + teacher EMA.

    Replaces the optax chain built by ``make_optimizer`` (adamw branch) plus
    ``optax.apply_updates`` plus the teacher-EMA tree_map with a single
    per-leaf expression, so XLA emits ONE fused loop per parameter reading
    (g, p, mu, nu, t) and writing (p', mu', nu', t') — instead of the ~10
    elementwise passes of the unfused chain (the reference's equivalent
    cost: optimizer.step() + the EMA loop, main_esvit.py:586-590).

    Bit-identical to the unfused path (tests/test_fused_optim.py): every
    operation replicates the optax op order —
    mu' = (1-b1)*g + b1*mu;  nu' = (1-b2)*g^2 + b2*nu;
    hat = x' / (1 - b^count_inc);  u = mu_hat/(sqrt(nu_hat)+eps);
    u += wd*p (masked);  p' = p + lr*(-u);  t' = m*t + (1-m)*p'.

    opt_state must be the exact pytree produced by make_optimizer's adamw
    chain: (EmptyState, InjectStatefulHyperparamsState(count, hyperparams,
    hyperparams_states, inner_state=(ScaleByAdamState, ...))). The returned
    state has the same structure (counts advanced, hyperparams refreshed),
    so checkpoints are interchangeable between the fused and unfused paths.

    lr/wd/ema_m are the already-evaluated scalars for this step (the
    unfused path evaluates lr_fn/wd_fn at the schedule count == step).
    frozen: traced bool — last-layer leaves keep zero update while True.
    """
    import optax

    # clip>0: state is (EmptyState, inject); clip off: inject directly.
    has_clip_state = clip is not None and clip > 0
    if has_clip_state:
        clip_state, inject = opt_state
    else:
        clip_state, inject = None, opt_state
    adam = inject.inner_state[0]
    count_inc = optax.safe_increment(adam.count)
    bc1 = 1.0 - jnp.asarray(b1, jnp.float32) ** count_inc
    bc2 = 1.0 - jnp.asarray(b2, jnp.float32) ** count_inc

    def leaf(g, p, mu, nu, t, dmask, llm, fm):
        # Freeze zeroes the GRADIENT first (the unfused path zeroes grads
        # before the chain, so Adam moments see zeros while frozen) and the
        # final update again (so weight decay can't leak in).
        if fm:
            g = jnp.zeros_like(g)
        elif llm:
            g = jnp.where(frozen, jnp.zeros_like(g), g)
        if clip is not None and clip > 0:
            n = jnp.linalg.norm(g.astype(jnp.float32))
            g = (g * jnp.minimum(clip / (n + 1e-6), 1.0)).astype(g.dtype)
        mu2 = (1 - b1) * g + b1 * mu
        nu2 = (1 - b2) * (g ** 2) + b2 * nu
        mu_hat = mu2 / bc1.astype(mu2.dtype)
        nu_hat = nu2 / bc2.astype(nu2.dtype)
        u = mu_hat / (jnp.sqrt(nu_hat) + eps)
        if dmask:
            u = u + wd * p
        u = (u * -1.0) * lr
        if llm:
            u = jnp.where(frozen, jnp.zeros_like(u), u)
        if fm:
            u = jnp.zeros_like(u)
        p2 = (p + u).astype(p.dtype)
        t2 = t * ema_m + p2 * (1.0 - ema_m)
        return p2, mu2, nu2, t2

    if f_mask is None:
        f_mask = jax.tree.map(lambda _: False, decay_mask)
    flat = jax.tree.map(leaf, grads, params, adam.mu, adam.nu, teacher,
                        decay_mask, ll_mask, f_mask)
    new_p = jax.tree.map(lambda l: l[0], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_mu = jax.tree.map(lambda l: l[1], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_nu = jax.tree.map(lambda l: l[2], flat, is_leaf=lambda x: isinstance(x, tuple))
    new_t = jax.tree.map(lambda l: l[3], flat, is_leaf=lambda x: isinstance(x, tuple))

    # Rebuild the optax state exactly as the unfused chain would have:
    # every count advances by one; the recorded hyperparams refresh to the
    # values used this step.
    new_adam = adam._replace(count=count_inc, mu=new_mu, nu=new_nu)
    new_inner = (new_adam,) + tuple(inject.inner_state[1:])
    new_inject = inject._replace(
        count=optax.safe_increment(inject.count),
        hyperparams={"lr": jnp.asarray(lr, jnp.float32),
                     "wd": jnp.asarray(wd, jnp.float32)},
        hyperparams_states=jax.tree.map(
            lambda c: c + 1, inject.hyperparams_states),
        inner_state=new_inner)
    new_opt_state = (clip_state, new_inject) if has_clip_state else new_inject
    return new_p, new_t, new_opt_state


def apply_last_layer_freeze(grads: Any, ll_mask: Any, frozen: jnp.ndarray) -> Any:
    """Zero last-layer grads while ``frozen`` (a traced bool) is True."""
    return jax.tree.map(
        lambda g, m: jnp.where(jnp.logical_and(frozen, m), jnp.zeros_like(g), g)
        if m else g,
        grads, ll_mask)


def freeze_mask_by_prefix(params: Any, frozen_layers: tuple) -> Any:
    """True for leaves under any of ``frozen_layers`` — the JAX equivalent
    of the reference's ``freeze_pretrained_layers`` (swin_transformer.py:
    919-943, used by the finetune recipes via FINETUNE.FROZEN_LAYERS),
    which sets requires_grad=False on modules whose first one or two
    name components match (or everything with '*').

    Entries use our param-tree keys ('patch_embed', 'layers_0',
    'layers_0/blocks_1'); reference-style dotted names ('layers.0') are
    normalized. A frozen leaf's gradient AND update are zeroed so neither
    momentum nor weight decay moves it — matching torch's skip of
    requires_grad=False params.
    """
    wanted = set()
    for name in frozen_layers:
        wanted.add(name.replace(".", "_").replace("/", " ").strip())
    star = "*" in wanted

    def f(path, x):
        if star:
            return True
        keys = [getattr(k, "key", str(k)) for k in path]
        if keys and keys[0] == "backbone":   # names are backbone-relative
            keys = keys[1:]
        return (keys[0] in wanted
                or (len(keys) > 1 and " ".join(keys[:2]) in wanted))
    return jax.tree_util.tree_map_with_path(f, params)


def apply_param_freeze(tree: Any, mask: Any) -> Any:
    """Zero leaves where the static boolean mask is True (grads/updates)."""
    return jax.tree.map(lambda g, m: jnp.zeros_like(g) if m else g,
                        tree, mask)
