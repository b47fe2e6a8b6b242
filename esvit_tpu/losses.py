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


def ddino_loss_streamed(s_cls_z, s_reg_z, s_fea, t_cls_z, t_reg_z, t_fea,
                        w_s, centers: DinoCenters, teacher_temp,
                        *, ncrops: int, batch_size: int, npatch,
                        t_npatch: int, w_t=None, w_s_dense=None,
                        w_t_dense=None, n_chunks: int = 8,
                        student_temp: float = 0.1,
                        center_momentum: float = 0.9):
    """ddino_loss computed WITHOUT ever materializing a (rows, K) logits
    tensor: the DINO-head last layer (L2-normalized bottleneck @ weight-
    normed matrix, models/heads.py) is folded into the loss, which scans
    the K=65536 output dimension in chunks.

    Two passes over the weight chunks (each recomputing the chunk logits —
    ~150 GFLOP/pass, cheap on the MXU; the ~4-5 GB/step of logits/softmax
    HBM streams the dense path pays are what this buys back):
      1. online logsumexp for every student/teacher row + teacher center
         batch sums;
      2. teacher-softmax-weighted pair contractions (qs_cls and the region
         matrix M) using the pass-1 normalizers.
    Values are identical to ddino_loss(head(z), ...) up to fp reassociation
    (tested). Scan bodies are jax.checkpoint'd so backward rematerializes
    per-chunk instead of saving chunk logits.

    s_cls_z: (ncrops*B, D) view-major normalized bottleneck features;
    s_reg_z: (B, S, D) batch-major; t_cls_z: (2B, D); t_reg_z: (B, 2Nt, D);
    s_fea/t_fea: backbone region features for the cosine matching (C-wide,
    no K dimension); w_s: (D, K) effective STUDENT cls-head last-layer
    matrix; w_t: the teacher's (defaults to w_s); w_s_dense/w_t_dense: the
    dense heads' matrices (default to the cls ones — single-head tests; the
    real model has a separate head_dense, main_esvit.py:246-254); npatch:
    per-resolution patch counts (static).
    Returns (loss, new DinoCenters).
    """
    if w_t is None:
        w_t = w_s
    if w_s_dense is None:
        w_s_dense = w_s
    if w_t_dense is None:
        w_t_dense = w_t
    B = batch_size
    K = w_s.shape[1]
    D = w_s.shape[0]
    assert K % n_chunks == 0, (K, n_chunks)
    Kc = K // n_chunks
    N_t = t_npatch
    S = s_reg_z.shape[1]
    inv_ts = 1.0 / student_temp
    inv_tt = 1.0 / teacher_temp

    def chunked(w):
        return w.reshape(D, n_chunks, Kc).transpose(1, 0, 2)

    xs_all = (chunked(w_s), chunked(w_t), chunked(w_s_dense),
              chunked(w_t_dense), centers.center.reshape(n_chunks, Kc),
              centers.center_grid.reshape(n_chunks, Kc))

    s_cls3 = _chunk_views(s_cls_z, ncrops)                  # (v, B, D)

    def logits(z, w):
        return jax.lax.dot_general(
            z, w.astype(z.dtype), (((z.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def lse_update(carry, chunk):
        m, l = carry
        m_c = jnp.max(chunk, axis=-1)
        m_new = jnp.maximum(m, m_c)
        l_new = (l * jnp.exp(m - m_new)
                 + jnp.sum(jnp.exp(chunk - m_new[..., None]), axis=-1))
        return m_new, l_new

    neg = jnp.float32(-jnp.inf)

    @jax.checkpoint
    def pass1(carry, xs):
        w, wt, wd, wtd, c_cls, c_reg = xs
        (mc, lc), (mr, lr), (mtc, ltc), (mtr, ltr) = carry
        raw_tc = logits(t_cls_z, wt)                        # (2B, Kc)
        raw_tr = logits(t_reg_z, wtd)                       # (B, 2Nt, Kc)
        ls_cls = logits(s_cls3, w) * inv_ts                 # (v, B, Kc)
        ls_reg = logits(s_reg_z, wd) * inv_ts               # (B, S, Kc)
        lt_cls = (raw_tc - c_cls[None]) * inv_tt
        lt_reg = (raw_tr - c_reg[None, None]) * inv_tt
        carry = (lse_update((mc, lc), ls_cls),
                 lse_update((mr, lr), ls_reg),
                 lse_update((mtc, ltc), lt_cls),
                 lse_update((mtr, ltr), lt_reg))
        # teacher-center batch sums of THIS chunk's K slice (stacked ys)
        return carry, (jnp.sum(raw_tc, axis=0), jnp.sum(raw_tr, axis=(0, 1)))

    def zeros_ml(shape):
        return (jnp.full(shape, neg), jnp.zeros(shape, jnp.float32))

    init = (zeros_ml((ncrops, B)), zeros_ml((B, S)), zeros_ml((2 * B,)),
            zeros_ml((B, 2 * N_t)))
    (st_cls, st_reg, st_tc, st_tr), (sum_tc_c, sum_tr_c) = jax.lax.scan(
        pass1, init, xs_all)
    sum_tc = sum_tc_c.reshape(K)
    sum_tr = sum_tr_c.reshape(K)

    def lse(st):
        m, l = st
        return m + jnp.log(l)

    lse_cls = lse(st_cls)                                   # (v, B)
    lse_reg = lse(st_reg)                                   # (B, S)
    lse_tc = lse(st_tc)                                     # (2B,)
    lse_tr = lse(st_tr)                                     # (B, 2Nt)

    @jax.checkpoint
    def pass2(carry, xs):
        w, wt, wd, wtd, c_cls, c_reg = xs
        qs_cls, M = carry
        ls_cls = logits(s_cls3, w)                          # (v, B, Kc)
        ls_reg = logits(s_reg_z, wd)                        # (B, S, Kc)
        q_cls = jax.lax.stop_gradient(
            jnp.exp((logits(t_cls_z, wt) - c_cls[None]) * inv_tt
                    - lse_tc[:, None]))
        q_reg = jax.lax.stop_gradient(
            jnp.exp((logits(t_reg_z, wtd) - c_reg[None, None]) * inv_tt
                    - lse_tr[..., None]))
        q_cls3 = q_cls.reshape(2, B, Kc)
        qs_cls = qs_cls + jnp.einsum(
            "qbk,vbk->qvb", q_cls3, ls_cls,
            preferred_element_type=jnp.float32)
        M = M + jnp.einsum("bjk,btk->bjt", q_reg, ls_reg,
                           preferred_element_type=jnp.float32)
        return (qs_cls, M), None

    init2 = (jnp.zeros((2, ncrops, B), jnp.float32),
             jnp.zeros((B, 2 * N_t, S), jnp.float32))
    (qs_cls, M), _ = jax.lax.scan(pass2, init2, xs_all)
    qs_cls = qs_cls * inv_ts
    M = M * inv_ts

    # --- K-free parts: cosine matching + CE assembly (as in ddino_loss) ---
    def _l2n(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    t_fea_v = jax.lax.stop_gradient(t_fea.astype(jnp.float32))
    sim = jnp.einsum("bjc,btc->bjt", _l2n(t_fea_v),
                     _l2n(s_fea.astype(jnp.float32)))       # (B, 2Nt, S)
    sim4 = sim.reshape(B, 2, N_t, S)
    M4 = M.reshape(B, 2, N_t, S)
    onehot = jax.nn.one_hot(jnp.argmax(sim4, axis=2), N_t, dtype=jnp.float32)
    qs_reg = jnp.einsum("bqtj,bqjt->bqt", onehot, M4)       # (B, 2, S)
    ce_flat = lse_reg[:, None, :] - qs_reg                  # (B, 2, S)

    if len(npatch) == 1:
        view_patches = [npatch[0]] * ncrops
    else:
        view_patches = [npatch[0]] * 2 + [npatch[1]] * (ncrops - 2)

    total, n_terms = 0.0, 0
    off, seg = 0, []
    for v in range(ncrops):
        seg.append((off, off + view_patches[v]))
        off += view_patches[v]
    for iq in range(2):
        for v in range(ncrops):
            if v == iq:
                continue
            loss_v = 0.5 * (lse_cls[v] - qs_cls[iq, v])
            ce_v = jnp.mean(ce_flat[:, iq, seg[v][0]:seg[v][1]], axis=-1)
            total = total + jnp.mean(loss_v + 0.5 * ce_v)
            n_terms += 1
    loss = total / n_terms

    new_centers = DinoCenters(
        center=(centers.center * center_momentum
                + (sum_tc / (2 * B)) * (1.0 - center_momentum)),
        center_grid=(centers.center_grid * center_momentum
                     + (sum_tr / (2 * N_t * B)) * (1.0 - center_momentum)),
    )
    return loss, new_centers
