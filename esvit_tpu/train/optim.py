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
