"""DINO / DDINO losses as pure functions.

Structurally identical math to the reference modules
(``/root/reference/main_esvit.py:603-660`` DINOLoss, ``:663-770`` DDINOLoss):
teacher softmax((t - center)/temp) over 2 global views, student log-softmax
at temp 0.1, CE summed over all (teacher view, student view) pairs with
v != iq; the dense task adds a region-level CE where each student region is
matched to its cosine-similarity-argmax teacher region, 0.5/0.5 weighted.

Centers are explicit state: each loss returns ``(loss, new_center(s))``.
The reference's ``dist.all_reduce`` centering (main_esvit.py:655-657,
758-766) becomes a plain global mean — under pjit with batch sharded over the
``data`` mesh axis, XLA lowers it to a psum over ICI automatically.

All math runs in fp32 regardless of the model compute dtype.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class DinoCenters(NamedTuple):
    """EMA centers (registered buffers in the reference, main_esvit.py:611,671-672)."""

    center: jnp.ndarray            # (K,) view-level
    center_grid: jnp.ndarray       # (K,) region-level (dense task only)

    @classmethod
    def zeros(cls, out_dim: int) -> "DinoCenters":
        z = jnp.zeros((out_dim,), jnp.float32)
        return cls(center=z, center_grid=z)


def _chunk_views(x: jnp.ndarray, nviews: int) -> jnp.ndarray:
    """(nviews*B, K) -> (nviews, B, K); rows are view-major like torch.chunk."""
    return x.reshape(nviews, -1, x.shape[-1])


def _update_center(old: jnp.ndarray, batch: jnp.ndarray, momentum: float) -> jnp.ndarray:
    """EMA toward the global batch mean (main_esvit.py:650-660)."""
    batch_center = jnp.mean(batch.astype(jnp.float32), axis=0)
    return old * momentum + batch_center * (1.0 - momentum)


def dino_loss(student_cls: jnp.ndarray, teacher_cls: jnp.ndarray,
              center: jnp.ndarray, teacher_temp: jnp.ndarray,
              *, ncrops: int, student_temp: float = 0.1,
              center_momentum: float = 0.9,
              targets_mixup: Optional[jnp.ndarray] = None):
    """View-level DINO loss (ref: main_esvit.py:620-648).

    student_cls: (ncrops*B, K) view-major; teacher_cls: (2*B, K).
    targets_mixup: optional (ncrops, B, B) matching targets (mixup-SSL,
    main_esvit.py:639-641).
    Returns (scalar loss, new_center (K,)).
    """
    s = _chunk_views(student_cls.astype(jnp.float32) / student_temp, ncrops)
    t_logits = (teacher_cls.astype(jnp.float32) - center[None]) / teacher_temp
    q = jax.lax.stop_gradient(jax.nn.softmax(t_logits, axis=-1))
    q = _chunk_views(q, 2)

    total, n_terms = 0.0, 0
    for iq in range(2):
        for v in range(ncrops):
            if v == iq:
                continue
            logp = jax.nn.log_softmax(s[v], axis=-1)
            if targets_mixup is not None:
                # -sum(T_v * (q @ logp^T), -1): soft matching of mixed views.
                sim = jnp.einsum("ak,bk->ab", q[iq], logp)
                term = -jnp.sum(targets_mixup[v] * sim, axis=-1)
            else:
                term = jnp.sum(-q[iq] * logp, axis=-1)
            total = total + jnp.mean(term)
            n_terms += 1
    loss = total / n_terms
    new_center = _update_center(center, teacher_cls, center_momentum)
    return loss, new_center


def ddino_loss(student_out, teacher_out, centers: DinoCenters,
               teacher_temp: jnp.ndarray, *, ncrops: int, batch_size: int,
               student_temp: float = 0.1, center_momentum: float = 0.9):
    """View + region (dense) EsViT loss (ref: main_esvit.py:683-770).

    student_out / teacher_out: the 4-tuples produced by EsViTModel
    ``(cls_logits, region_logits, region_fea, npatch)``; the teacher holds the
    2 global views. batch_size is the per-view batch B (static).
    Returns (scalar loss, new DinoCenters).
    """
    s_cls_out, s_region_out, s_fea, s_npatch = student_out
    t_cls_out, t_region_out, t_fea, t_npatch = teacher_out
    B = batch_size

    # Per-view patch counts: first resolution group covers the 2 global
    # views, the second the local views (main_esvit.py:710).
    if len(s_npatch) == 1:
        view_patches = [s_npatch[0]] * ncrops
    else:
        view_patches = [s_npatch[0]] * 2 + [s_npatch[1]] * (ncrops - 2)
    N_t = t_npatch[0]

    # Teacher: center + sharpen, fp32, stop-gradient.
    t_cls = jax.nn.softmax(
        (t_cls_out.astype(jnp.float32) - centers.center[None]) / teacher_temp, axis=-1)
    t_cls = jax.lax.stop_gradient(_chunk_views(t_cls, 2))
    t_region = jax.nn.softmax(
        (t_region_out.astype(jnp.float32) - centers.center_grid[None]) / teacher_temp,
        axis=-1)
    t_region = jax.lax.stop_gradient(t_region.reshape(2, B, N_t, -1))
    t_fea_v = jax.lax.stop_gradient(
        t_fea.astype(jnp.float32).reshape(2, B, N_t, -1))

    # Student views.
    s_cls = _chunk_views(s_cls_out.astype(jnp.float32) / student_temp, ncrops)
    s_region_flat = s_region_out.astype(jnp.float32) / student_temp
    s_fea_flat = s_fea.astype(jnp.float32)

    # Static row offsets of each student view inside the flattened region
    # tensors (replaces torch.split at main_esvit.py:710-715).
    offsets = [0]
    for n in view_patches:
        offsets.append(offsets[-1] + n * B)

    def view_regions(v):
        n = view_patches[v]
        sl = slice(offsets[v], offsets[v + 1])
        return (s_region_flat[sl].reshape(B, n, -1),
                s_fea_flat[sl].reshape(B, n, -1))

    def _l2n(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    total, n_terms = 0.0, 0
    for iq in range(2):
        for v in range(ncrops):
            if v == iq:
                continue
            # view-level CE
            logp = jax.nn.log_softmax(s_cls[v], axis=-1)
            loss_v = 0.5 * jnp.sum(-t_cls[iq] * logp, axis=-1)          # (B,)

            # region-level CE with cosine-argmax matching (main_esvit.py:731-742)
            s_reg, s_f = view_regions(v)                                 # B,Ts,K / B,Ts,C
            sim = jnp.einsum("btc,bsc->bts", _l2n(s_f), _l2n(t_fea_v[iq]))
            match = jnp.argmax(sim, axis=-1)                             # B,Ts
            t_matched = jnp.take_along_axis(
                t_region[iq], match[..., None], axis=1)                  # B,Ts,K
            logp_r = jax.nn.log_softmax(s_reg, axis=-1)
            loss_r = jnp.mean(jnp.sum(-t_matched * logp_r, axis=-1), axis=-1)
            total = total + jnp.mean(loss_v + 0.5 * loss_r)
            n_terms += 1
    loss = total / n_terms

    new_centers = DinoCenters(
        center=_update_center(centers.center, t_cls_out, center_momentum),
        center_grid=_update_center(centers.center_grid, t_region_out, center_momentum),
    )
    return loss, new_centers
