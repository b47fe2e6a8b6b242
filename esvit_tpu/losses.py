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
    batch = batch.reshape(-1, batch.shape[-1])
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
    ``(cls_logits, region_logits, region_fea, npatch)``; the teacher holds
    the 2 global views. batch_size is the per-view batch B (static).

    Region tensors may arrive in either layout:
      - batch-major 3-D ``(B, S, K)`` (EsViTModel called with batch_size —
        the training path; the 65536-wide tensors are born in this layout
        and are NEVER repacked here), or
      - the reference's flat 2-D ``(sum_v B*N_v, K)`` view-major rows, which
        are converted (one transpose) for compatibility/tests.
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

    def _to_batch_major(flat, patches):
        """Reference-layout (sum_v B*n_v, K) -> (B, sum_v n_v, K)."""
        out, off = [], 0
        groups_ = []
        for n in patches:
            if groups_ and groups_[-1][1] == n:
                groups_[-1][0] += 1
            else:
                groups_.append([1, n])
        for nv, n in groups_:
            rows = nv * n * B
            out.append(flat[off:off + rows].reshape(nv, B, n, -1)
                       .transpose(1, 0, 2, 3).reshape(B, nv * n, -1))
            off += rows
        return jnp.concatenate(out, axis=1)

    if s_region_out.ndim == 2:
        s_region_out = _to_batch_major(s_region_out, view_patches)
        s_fea = _to_batch_major(s_fea, view_patches)
    if t_region_out.ndim == 2:
        t_region_out = _to_batch_major(t_region_out, [N_t, N_t])
        t_fea = _to_batch_major(t_fea, [N_t, N_t])
    S = s_region_out.shape[1]                 # sum_v n_v student region rows

    # Teacher: center + sharpen, fp32, stop-gradient.
    t_cls = jax.nn.softmax(
        (t_cls_out.astype(jnp.float32) - centers.center[None]) / teacher_temp, axis=-1)
    t_cls = jax.lax.stop_gradient(_chunk_views(t_cls, 2))
    t_region = jax.lax.stop_gradient(jax.nn.softmax(
        (t_region_out.astype(jnp.float32) - centers.center_grid[None])
        / teacher_temp, axis=-1))                               # (B, 2*Nt, K)
    t_fea_v = jax.lax.stop_gradient(t_fea.astype(jnp.float32))  # (B, 2*Nt, C)

    # Student views stay in their storage dtype (bf16 in training); the
    # temperature scaling moves AFTER the linear contractions (exact: bf16
    # -> fp32 is lossless per element and the contractions accumulate fp32),
    # so no (rows, K) fp32 copies are materialized.
    s_cls = _chunk_views(s_cls_out, ncrops)
    inv_t = 1.0 / student_temp

    def _l2n(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    # Bandwidth-first reformulation (values identical to the reference):
    # 1. CE identity: sum(-q * log_softmax(s)) = logsumexp(s) - q . s, so
    #    no (rows, K) log-prob tensor is materialized per pair.
    # 2. The per-pair "gather teacher row by cosine-argmax then dot" becomes
    #    ONE batch-major batched matmul M = t_region @ s_region^T over K
    #    covering every (teacher view, student view) pair, followed by a
    #    one-hot selection of the matched column — the (.., K) tensors are
    #    each read exactly once, in their native layout, with no repacks
    #    (PERF.md round 2: the former per-group reshape/transpose chain cost
    #    ~15 ms/step in XLA relayouts of the 65536-wide tensors).
    lse_cls = jax.nn.logsumexp(s_cls.astype(jnp.float32) * inv_t, axis=-1)
    qs_cls = jnp.einsum("qbk,vbk->qvb", t_cls, s_cls,
                        preferred_element_type=jnp.float32) * inv_t

    lse_reg = jax.nn.logsumexp(
        s_region_out.astype(jnp.float32) * inv_t, axis=-1)       # (B, S)
    M = jnp.einsum("bjk,btk->bjt", t_region, s_region_out,
                   preferred_element_type=jnp.float32) * inv_t   # (B,2Nt,S)
    sim = jnp.einsum("bjc,btc->bjt", _l2n(t_fea_v),
                     _l2n(s_fea.astype(jnp.float32)))            # (B,2Nt,S)
    # Per teacher view q: match each student patch t to its most-similar
    # teacher patch j (argmax over j within view q) and select M there.
    sim4 = sim.reshape(B, 2, N_t, S)
    M4 = M.reshape(B, 2, N_t, S)
    onehot = jax.nn.one_hot(jnp.argmax(sim4, axis=2), N_t,
                            dtype=jnp.float32)                   # (B,2,S,Nt)
    qs_reg = jnp.einsum("bqtj,bqjt->bqt", onehot, M4)            # (B,2,S)
    ce_flat = lse_reg[:, None, :] - qs_reg                       # (B,2,S)

    total, n_terms = 0.0, 0
    off = 0
    seg = []                                   # per-view [start, end) in S
    for v in range(ncrops):
        seg.append((off, off + view_patches[v]))
        off += view_patches[v]
    for iq in range(2):
        for v in range(ncrops):
            if v == iq:
                continue
            loss_v = 0.5 * (lse_cls[v] - qs_cls[iq, v])          # (B,)
            ce_v = jnp.mean(ce_flat[:, iq, seg[v][0]:seg[v][1]], axis=-1)
            total = total + jnp.mean(loss_v + 0.5 * ce_v)
            n_terms += 1
    loss = total / n_terms

    new_centers = DinoCenters(
        center=_update_center(centers.center, t_cls_out, center_momentum),
        center_grid=_update_center(centers.center_grid, t_region_out, center_momentum),
    )
    return loss, new_centers
