"""Mixup/CutMix for SSL views (ref: main_esvit.py:223-230, 515-538).

The reference applies timm's ``Mixup`` (batch mode) to the first
``num_mixup_views`` student views with ``targets = arange(B)`` — producing a
(B, B) soft-matching matrix — while the remaining views carry identity
targets. DINOLoss then uses the matrix CE form (main_esvit.py:639-641).

This is the jit-friendly equivalent: one Beta-sampled lambda per view
(timm 'batch' mode), flip-pairing (x + x[::-1]), optional CutMix with a
switch probability, gated by ``prob``; targets get the same convex
combination plus label smoothing.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class MixupConfig:
    enabled: bool = False
    num_mixup_views: int = 2
    mixup_alpha: float = 0.8
    cutmix_alpha: float = 1.0
    prob: float = 1.0
    switch_prob: float = 0.5
    label_smoothing: float = 0.0


def _rand_bbox(rng, h: int, w: int, lam):
    """CutMix box for mix ratio (1-lam), timm-style center + sqrt area."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cut_w = (w * cut_rat).astype(jnp.int32)
    ky, kx = jax.random.split(rng)
    cy = jax.random.randint(ky, (), 0, h)
    cx = jax.random.randint(kx, (), 0, w)
    y1 = jnp.clip(cy - cut_h // 2, 0, h)
    y2 = jnp.clip(cy + cut_h // 2, 0, h)
    x1 = jnp.clip(cx - cut_w // 2, 0, w)
    x2 = jnp.clip(cx + cut_w // 2, 0, w)
    return y1, y2, x1, x2


def mixup_view(rng, x: jnp.ndarray, cfg: MixupConfig):
    """One view batch (B, H, W, C) -> (mixed x, targets (B, B))."""
    B, H, W, _ = x.shape
    k_apply, k_switch, k_lam_m, k_lam_c, k_box = jax.random.split(rng, 5)
    eye = jnp.eye(B, dtype=jnp.float32)

    use_cutmix = jnp.logical_and(
        jax.random.bernoulli(k_switch, cfg.switch_prob),
        cfg.cutmix_alpha > 0)
    lam_mix = jax.random.beta(k_lam_m, cfg.mixup_alpha, cfg.mixup_alpha)
    lam_cut = jax.random.beta(k_lam_c, cfg.cutmix_alpha, cfg.cutmix_alpha)

    flipped = x[::-1]

    # mixup branch
    lam_m = lam_mix.astype(x.dtype)
    mixed_mix = x * lam_m + flipped * (1.0 - lam_m)

    # cutmix branch: paste the flipped batch's box
    y1, y2, x1, x2 = _rand_bbox(k_box, H, W, lam_cut)
    row = jnp.arange(H)[None, :, None, None]
    col = jnp.arange(W)[None, None, :, None]
    inbox = ((row >= y1) & (row < y2) & (col >= x1) & (col < x2))
    mixed_cut = jnp.where(inbox, flipped, x)
    lam_cut_adj = 1.0 - ((y2 - y1) * (x2 - x1)) / (H * W)

    mixed = jnp.where(use_cutmix, mixed_cut, mixed_mix)
    lam = jnp.where(use_cutmix, lam_cut_adj, lam_mix).astype(jnp.float32)
    targets = lam * eye + (1.0 - lam) * eye[::-1]

    apply = jax.random.bernoulli(k_apply, cfg.prob)
    mixed = jnp.where(apply, mixed, x)
    targets = jnp.where(apply, targets, eye)

    if cfg.label_smoothing > 0:
        s = cfg.label_smoothing
        targets = targets * (1.0 - s) + s / B
    return mixed, targets


def mixup_multicrop(rng, global_crops: jnp.ndarray, local_crops: jnp.ndarray,
                    cfg: MixupConfig):
    """Apply mixup to the first ``num_mixup_views`` views (ref :515-538).

    global_crops (2B, S, S, C) view-major; local_crops (L*B, s, s, C).
    Returns (global, local, targets (ncrops, B, B)).
    """
    B = global_crops.shape[0] // 2
    L = local_crops.shape[0] // B
    ncrops = 2 + L
    eye = jnp.eye(B, dtype=jnp.float32)

    g_views = list(global_crops.reshape(2, B, *global_crops.shape[1:]))
    l_views = list(local_crops.reshape(L, B, *local_crops.shape[1:]))
    views = g_views + l_views
    targets = []
    for v in range(ncrops):
        if v < cfg.num_mixup_views:
            rng, sub = jax.random.split(rng)
            views[v], t = mixup_view(sub, views[v], cfg)
        else:
            t = eye
        targets.append(t)
    g = jnp.concatenate(views[:2], axis=0)
    l = jnp.concatenate(views[2:], axis=0) if L else local_crops
    return g, l, jnp.stack(targets)
