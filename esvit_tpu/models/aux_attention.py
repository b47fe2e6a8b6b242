"""Auxiliary attention vocabulary (ref: layers/attention.py).

The reference ships axial and criss-cross attention for its
``experiments/imagenet/vit/deit/{axial,criss_cross}`` configs (never
imported by the EsViT main path — SURVEY.md §2.3). Implemented here for
inventory completeness, covering the configurations those experiments use:

- ``AxialAttention`` (ref :24-152): per-row (or per-column) attention with
  the CLS token replicated into every row; the CLS query itself uses full
  attention over [cls + all grid tokens]. This is the
  ``use_full_attn_for_cls=True`` configuration every non-archived axial
  experiment sets — the False path crashes in the reference (its reshape at
  :131 is inconsistent for cls inputs).
- ``CrissCrossAttention`` (ref :193-310): each pixel attends to its column
  (CLS prepended) and its row (self masked out of the row to avoid double
  counting) under one joint softmax; the CLS token uses full attention.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from esvit_tpu.models.common import dense, softmax_fp32

Dtype = Any


class AxialAttention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    horizontal: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, 1 + H*W, C) with a CLS token first."""
        B, N, C = x.shape
        nH = self.num_heads
        hd = self.dim // nH
        scale = self.qk_scale or hd ** -0.5
        import math

        HW = N - 1
        H = W = int(math.isqrt(HW))

        cls, grid = x[:, :1], x[:, 1:]
        grid = grid.reshape(B, H, W, C)
        if not self.horizontal:                       # vertical: swap axes
            grid = grid.transpose(0, 2, 1, 3)
        x_seq = jnp.concatenate([cls, grid.reshape(B, H * W, C)], axis=1)

        qkv = dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x_seq)
        qkv = qkv.reshape(B, N, 3, nH, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]              # (B, nH, N, hd)

        def with_cls_rows(t):
            # (B, nH, 1+HW, hd) -> rows of [cls, row tokens]:
            # (B*H, nH, 1+W, hd)
            t_cls, t_grid = t[:, :, :1], t[:, :, 1:]
            t_grid = t_grid.reshape(B, nH, H, W, hd)
            t_cls = jnp.broadcast_to(t_cls[:, :, None], (B, nH, H, 1, hd))
            rows = jnp.concatenate([t_cls, t_grid], axis=3)  # B,nH,H,1+W,hd
            return rows.transpose(0, 2, 1, 3, 4).reshape(B * H, nH, 1 + W, hd)

        q_r, k_r, v_r = with_cls_rows(q), with_cls_rows(k), with_cls_rows(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q_r, k_r,
                          preferred_element_type=jnp.float32) * scale
        # (B*H, nH, 1+W, 1+W) -> cls rows get full attention instead
        attn_rows = attn.reshape(B, H, nH, 1 + W, 1 + W)
        cls_scores = attn_rows[:, :, :, 0].transpose(0, 2, 1, 3)  # B,nH,H,1+W
        # cls->cls from row 0 + cls->every grid token (ref :116-121)
        cls_scores = jnp.concatenate(
            [cls_scores[:, :, 0, :1],
             cls_scores[:, :, :, 1:].reshape(B, nH, H * W)], axis=-1)
        p_cls = softmax_fp32(cls_scores[:, :, None])              # B,nH,1,1+HW
        p_cls = nn.Dropout(self.attn_drop)(p_cls, deterministic=deterministic)
        v_rows = v_r.reshape(B, H, nH, 1 + W, hd).transpose(0, 2, 1, 3, 4)
        v_cls_full = jnp.concatenate(
            [v_rows[:, :, 0, :1],
             v_rows[:, :, :, 1:].reshape(B, nH, H * W, hd)], axis=2)
        out_cls = jnp.einsum("bhnm,bhmd->bhnd", p_cls.astype(self.dtype),
                             v_cls_full)
        out_cls = out_cls.transpose(0, 2, 1, 3).reshape(B, 1, self.dim)

        grid_scores = attn.reshape(B * H, nH, 1 + W, 1 + W)[:, :, 1:]
        probs = softmax_fp32(grid_scores)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(self.dtype), v_r)
        out_grid = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim)
        if not self.horizontal:
            out_grid = out_grid.transpose(0, 2, 1, 3)
        out = jnp.concatenate([out_cls, out_grid.reshape(B, H * W, self.dim)],
                              axis=1)
        out = dense(self.dim, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class CrissCrossAttention(nn.Module):
    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    use_cls_token: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        nH = self.num_heads
        hd = C // nH
        scale = self.qk_scale or hd ** -0.5
        import math

        HW = N - 1 if self.use_cls_token else N
        H = W = int(math.isqrt(HW))

        qkv = dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, nH, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if self.use_cls_token:
            q_full, k_full, v_full = q, k, v
            q_cls, q = q[:, :, :1], q[:, :, 1:]
            k_cls, k = k[:, :, :1], k[:, :, 1:]
            v_cls, v = v[:, :, :1], v[:, :, 1:]

        def grid5(t):
            return t.reshape(B, nH, H, W, hd)

        qg, kg, vg = grid5(q), grid5(k), grid5(v)

        # column direction (the reference's "h"): sequences along H per
        # column, CLS prepended when present.
        def cols(t, t_cls=None):
            c = t.transpose(0, 3, 1, 2, 4)            # B, W, nH, H, hd
            if t_cls is not None:                     # t_cls: (B, nH, hd)
                cc = jnp.broadcast_to(t_cls[:, None, :, None, :],
                                      (B, W, nH, 1, hd))
                c = jnp.concatenate([cc, c], axis=3)  # B, W, nH, 1+H, hd
            return c

        q_h = cols(qg, q_cls[:, :, 0] if self.use_cls_token else None)
        k_h = cols(kg, k_cls[:, :, 0] if self.use_cls_token else None)
        v_h = cols(vg, v_cls[:, :, 0] if self.use_cls_token else None)

        score_h = jnp.einsum("bwhnd,bwhmd->bwhnm", q_h, k_h,
                             preferred_element_type=jnp.float32) * scale
        # per-pixel rows of scores: (B, H, nH, W, 1+H) taking the grid part
        # of the query axis.
        off = 1 if self.use_cls_token else 0
        score_h_pix = score_h[:, :, :, off:].transpose(0, 3, 2, 1, 4)

        # row direction: (B, H, nH, W, W) with the diagonal removed (self
        # counted once, ref :271-273). qg is (B, nH, H, W, hd).
        score_w = jnp.einsum("bnhwd,bnhvd->bhnwv", qg, kg,
                             preferred_element_type=jnp.float32) * scale
        diag = jnp.where(jnp.eye(W, dtype=bool), -jnp.inf, 0.0)
        score_w = score_w + diag[None, None, None]

        scores = jnp.concatenate([score_h_pix, score_w], axis=-1)
        probs = softmax_fp32(scores)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        p_h, p_w = probs[..., :H + off], probs[..., H + off:]

        # x_h: back to column-major then weighted sum over (1+H) keys
        p_h_cols = p_h.transpose(0, 3, 2, 1, 4)       # B, W, nH, H, 1+H
        x_h = jnp.einsum("bwhnm,bwhmd->bwhnd", p_h_cols.astype(self.dtype), v_h)
        x_h = x_h.transpose(0, 3, 1, 2, 4).reshape(B, H, W, C)
        x_w = jnp.einsum("bhnwv,bnhvd->bhwnd", p_w.astype(self.dtype), vg)
        x_w = x_w.reshape(B, H, W, C)
        out = (x_h + x_w).reshape(B, H * W, C)

        if self.use_cls_token:
            s_cls = jnp.einsum("bhnd,bhmd->bhnm", q_cls, k_full,
                               preferred_element_type=jnp.float32) * scale
            p_cls = softmax_fp32(s_cls)
            p_cls = nn.Dropout(self.attn_drop)(p_cls,
                                               deterministic=deterministic)
            x_cls = jnp.einsum("bhnm,bhmd->bhnd", p_cls.astype(self.dtype),
                               v_full)
            x_cls = x_cls.transpose(0, 2, 1, 3).reshape(B, 1, C)
            out = jnp.concatenate([x_cls, out], axis=1)

        out = dense(C, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
