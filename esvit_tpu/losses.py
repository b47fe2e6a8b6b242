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

    Bandwidth note: the pairwise CE uses the exact identity
    ``sum(-q * log_softmax(s)) = logsumexp(s) - q . s`` (sum q == 1), so the
    (rows, 65536) log-prob tensor is never materialized per pair — each
    student view needs one logsumexp pass and each pair one fused dot.
    """
    s = _chunk_views(student_cls.astype(jnp.float32) / student_temp, ncrops)
    t_logits = (teacher_cls.astype(jnp.float32) - center[None]) / teacher_temp
    q = jax.lax.stop_gradient(jax.nn.softmax(t_logits, axis=-1))
    q = _chunk_views(q, 2)
    lse = jax.nn.logsumexp(s, axis=-1)                  # (ncrops, B)

    total, n_terms = 0.0, 0
    for iq in range(2):
        for v in range(ncrops):
            if v == iq:
                continue
            if targets_mixup is not None:
                # -sum_b T[a,b] * (q[a] . logp[b]) with logp = s - lse:
                # = -sum_b T[a,b] (q[a].s[b]) + sum_b T[a,b] lse[b]
                qs = jnp.einsum("ak,bk->ab", q[iq], s[v])
                term = (-jnp.sum(targets_mixup[v] * qs, axis=-1)
                        + targets_mixup[v] @ lse[v])
            else:
                term = lse[v] - jnp.sum(q[iq] * s[v], axis=-1)
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
    # Batch-major layouts for everything entering a b-batched contraction:
    # TPU dot_generals want the batch dim physically leading, and hoisting
    # the one row permutation here (fused into the softmax / slice) removes
    # XLA's repeated multi-hundred-MB relayout copies of the (rows, K)
    # tensors around each einsum (PERF.md round 2 profile).
    t_region = jax.nn.softmax(
        (t_region_out.astype(jnp.float32) - centers.center_grid[None]) / teacher_temp,
        axis=-1)
    t_region = jax.lax.stop_gradient(
        t_region.reshape(2, B, N_t, -1).transpose(1, 0, 2, 3))   # (B,2,Nt,K)
    t_fea_v = jax.lax.stop_gradient(
        t_fea.astype(jnp.float32).reshape(2, B, N_t, -1)
        .transpose(1, 0, 2, 3))                                   # (B,2,Nt,C)

    # Student views stay in their storage dtype (bf16 in training); the
    # temperature scaling moves AFTER the linear contractions (exact: bf16
    # -> fp32 is lossless per element and the contractions accumulate fp32),
    # so no (rows, K) fp32 copies are materialized.
    s_cls = _chunk_views(s_cls_out, ncrops)
    s_region_flat = s_region_out
    s_fea_flat = s_fea.astype(jnp.float32)
    inv_t = 1.0 / student_temp

    def _l2n(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    # Bandwidth-first reformulation (values identical to the reference):
    # 1. CE identity: sum(-q * log_softmax(s)) = logsumexp(s) - q . s, so
    #    no (rows, K) log-prob tensor is materialized per pair.
    # 2. The per-pair "gather teacher row by cosine-argmax then dot" becomes
    #    M[q,v] = t_region[q] @ s_region[v]^T over K (an MXU matmul reading
    #    each region tensor ONCE per resolution group) followed by a one-hot
    #    selection of the matched column — replacing 2*(ncrops-1) gather+dot
    #    HBM passes with grouped matmuls.
    lse_cls = jax.nn.logsumexp(s_cls.astype(jnp.float32) * inv_t, axis=-1)
    qs_cls = jnp.einsum("qbk,vbk->qvb", t_cls, s_cls,
                        preferred_element_type=jnp.float32) * inv_t

    # Group student views by resolution: views [0,1] at N_g, rest at N_l.
    groups = []                      # (view_indices, n_patches)
    if len(s_npatch) == 1:
        groups.append((list(range(ncrops)), view_patches[0]))
    else:
        groups.append(([0, 1], view_patches[0]))
        groups.append((list(range(2, ncrops)), view_patches[2]))

    t_fea_n = _l2n(t_fea_v)                                      # (B,2,Nt,C)
    ce_region = {}                   # (iq, v) -> (B,)
    offset = 0
    for view_ids, n in groups:
        nv = len(view_ids)
        rows = nv * n * B
        s_reg = (s_region_flat[offset:offset + rows]
                 .reshape(nv, B, n, -1).transpose(1, 0, 2, 3))   # (B,nv,n,K)
        s_f = (s_fea_flat[offset:offset + rows]
               .reshape(nv, B, n, -1).transpose(1, 0, 2, 3))     # (B,nv,n,C)
        offset += rows

        sim = jnp.einsum("bvtc,bqjc->bqvtj", _l2n(s_f), t_fea_n)
        onehot = jax.nn.one_hot(jnp.argmax(sim, axis=-1), t_region.shape[2],
                                dtype=jnp.float32)               # (B,2,nv,n,Nt)
        M = jnp.einsum("bqjk,bvtk->bqvtj", t_region, s_reg,
                       preferred_element_type=jnp.float32) * inv_t
        qs_reg = jnp.sum(onehot * M, axis=-1)                    # (B,2,nv,n)
        lse_reg = jax.nn.logsumexp(s_reg.astype(jnp.float32) * inv_t, axis=-1)
        ce = jnp.mean(lse_reg[:, None] - qs_reg, axis=-1)        # (B,2,nv)
        for q in range(2):
            for i, v in enumerate(view_ids):
                ce_region[(q, v)] = ce[:, q, i]

    total, n_terms = 0.0, 0
    for iq in range(2):
        for v in range(ncrops):
            if v == iq:
                continue
            loss_v = 0.5 * (lse_cls[v] - qs_cls[iq, v])          # (B,)
            total = total + jnp.mean(loss_v + 0.5 * ce_region[(iq, v)])
            n_terms += 1
    loss = total / n_terms

    new_centers = DinoCenters(
        center=_update_center(centers.center, t_cls_out, center_momentum),
        center_grid=_update_center(centers.center_grid, t_region_out, center_momentum),
    )
    return loss, new_centers
