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
- ``ConvQKVAttention`` (ref ``Attention`` :355-662): MHA whose q/k/v are
  produced by one of several conv stems ('conv', 'conv_pw', 'dw_*_pw',
  'pw_glu_*'), with reduced q/k dims (qkv_ratio != 3), residual score
  chaining (res_score), average-attention modes and an add_v_res tail.
- ``DownAttention`` (ref :664-1030): conv-QKV attention at a strided
  (downsampled) resolution, bilinearly 2x-upsampled back and fused with a
  full-resolution depthwise value branch (v_full).
- ``CrossScaleAttention`` (ref :1032-1405): full-resolution queries attend
  to strided keys/values, plus the same v_full fusion. The reference splits
  heads out of channel-major (B, C, T) buffers with a raw ``view`` — a
  token/channel scramble we reproduce verbatim for parity.

For the last two, only the ``dw_*_pw`` method family is implemented: every
other method branch of those reference classes leaves ``v_full`` undefined
and crashes at ref :925/:1303, so they are unreachable.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from esvit_tpu.models.common import dense, softmax_fp32

Dtype = Any

_DW_METHODS = ("dw_glu_pw", "dw_bn_glu_pw", "dw_swish_pw", "dw_pw",
               "dw_bn_pw")
_PW_METHODS = ("pw_glu_conv_glu_pw", "pw_glu_conv_bn_glu_pw",
               "pw_glu_conv_swish_pw", "pw_glu_conv_bn_swish_pw",
               "pw_glu_dw_glu_pw", "pw_glu_conv_bn_pw")


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


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _gelu(x):
    """torch nn.GELU default = exact erf gelu."""
    return jax.nn.gelu(x, approximate=False)


def _split_cls(x):
    """(cls or None, grid tokens, H) for (B, N, C) with an optional leading
    CLS token (ref grid-inference at layers/attention.py:466-473)."""
    B, N, C = x.shape
    H = math.isqrt(N)
    if H * H == N:
        return None, x, H
    H = math.isqrt(N - 1)
    assert H * H == N - 1, f"token count {N} is not H*W or H*W+1"
    return x[:, :1], x[:, 1:], H


def _conv2d(feat, k, s, p, groups, use_bias, name, dtype):
    return nn.Conv(feat, (k, k), strides=(s, s), padding=[(p, p), (p, p)],
                   feature_group_count=groups, use_bias=use_bias,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def _batchnorm(name, bn_train):
    return nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                        epsilon=1e-5, dtype=jnp.float32,
                        param_dtype=jnp.float32, name=name)


def _split_heads_tokens(tokens, nH, qkv_dim, dim, ratio):
    """Token-major (B, T, F) -> per-head q/k/v (B, nH, T, hd), mirroring the
    reference channel-major reshapes (ref :527-537): F decomposes (s, h, d)
    when ratio == 3, h-major [q|k|v] blocks when ratio != 3."""
    B, T, F = tokens.shape
    if ratio != 3:
        hq = qkv_dim // nH
        t4 = tokens.reshape(B, T, nH, F // nH)
        q = t4[..., :hq].transpose(0, 2, 1, 3)
        k = t4[..., hq:2 * hq].transpose(0, 2, 1, 3)
        v = t4[..., 2 * hq:].transpose(0, 2, 1, 3)
    else:
        t5 = tokens.reshape(B, T, 3, nH, qkv_dim // nH)
        q = t5[:, :, 0].transpose(0, 2, 1, 3)
        k = t5[:, :, 1].transpose(0, 2, 1, 3)
        v = t5[:, :, 2].transpose(0, 2, 1, 3)
    return q, k, v


def _merge_heads(v):
    """(B, nH, T, hd) -> (B, T, nH*hd), the reference's
    ``.transpose(1, 2).reshape(B, N, C)``."""
    B, nH, T, hd = v.shape
    return v.transpose(0, 2, 1, 3).reshape(B, T, nH * hd)


class ConvQKVAttention(nn.Module):
    """Conv-QKV attention (ref layers/attention.py:355-662 ``Attention``).

    Dead code in the reference (never imported by models/; the t2t qkvconv
    call path contains a debug sys.exit) — implemented for inventory
    completeness and golden-parity tested against the reference class.
    """

    dim: int
    in_dim: Optional[int] = None
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    res_score: bool = False
    use_avg_att: bool = False
    use_avg_att_all: bool = False
    use_qkvconv: bool = False
    qkv_ratio: float = 3.0
    add_v_res: bool = False
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    method: str = "conv"
    conv_reduce_ratio: int = 3
    dtype: Dtype = jnp.float32

    def _qkv_conv_tokens(self, x, bn_train):
        """The reference ``forward_qkvconv`` stem (ref :465-539): produce
        the pre-split (B, T, F) qkv tokens for the configured method."""
        dim, m = self.dim, self.method
        in_dim = self.in_dim or dim
        qkv_dim = int(dim * self.qkv_ratio) // 3
        # Only the dw_* branch of the reference sizes its pw layer for the
        # reduced-q/k layout (ref :409-414); the other stems emit
        # int(dim*ratio) channels regardless, which the ratio!=3 split then
        # scrambles — unsupported, assert out.
        assert self.qkv_ratio == 3 or m in _DW_METHODS, \
            "qkv_ratio != 3 is only supported by the dw_*_pw stems"
        F_out = (qkv_dim * 2 + dim) if self.qkv_ratio != 3 \
            else int(dim * self.qkv_ratio)
        cls, grid, H = _split_cls(x)
        B, C = x.shape[0], x.shape[-1]
        xg = grid.reshape(B, H, H, C)
        k_, s_, p_ = self.kernel_size, self.stride, self.padding

        if m in _DW_METHODS:
            xg = _conv2d(dim, k_, s_, p_, in_dim, False, "dw",
                         self.dtype)(xg)
            if "bn" in m:
                xg = _batchnorm("bn", bn_train)(xg)
            act = _swish if "swish" in m else (_gelu if "glu" in m else None)
            if act is not None:
                xg = act(xg)
            toks = xg.reshape(B, -1, dim)
            if cls is not None:
                # ref :488 concatenates the RAW cls on the channel axis —
                # requires the input width to equal dim.
                assert C == dim, "cls passthrough needs in_dim == dim"
                toks = jnp.concatenate([cls, toks], axis=1)
            return dense(F_out, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="pw")(toks)
        if m in _PW_METHODS:
            red = int(dim // self.conv_reduce_ratio)
            pw0 = dense(red, use_bias=False, dtype=self.dtype, name="pw0")
            t = _gelu(pw0(grid))                       # self.act = GELU
            tg = t.reshape(B, H, H, red)
            if "dw" in m:
                tg = _conv2d(red, k_, s_, p_, red, False, "dw",
                             self.dtype)(tg)
            else:
                tg = _conv2d(red, k_, s_, p_, 1, False, "conv",
                             self.dtype)(tg)
            if "bn" in m:
                tg = _batchnorm("bn", bn_train)(tg)
            if m == "pw_glu_conv_bn_pw":
                act2 = None
            elif "swish" in m:
                act2 = _swish
            else:                                      # every name has 'glu'
                act2 = _gelu
            if act2 is not None:
                tg = act2(tg)
            toks = tg.reshape(B, -1, red)
            if cls is not None:
                toks = jnp.concatenate([pw0(cls), toks], axis=1)
            return dense(F_out, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="pw")(toks)
        if m == "conv_pw":
            xg = _gelu(_conv2d(dim, k_, s_, p_, 1, False, "conv",
                               self.dtype)(xg))
            toks = xg.reshape(B, -1, dim)
            if cls is not None:
                assert C == dim
                toks = jnp.concatenate([cls, toks], axis=1)
            return dense(F_out, use_bias=self.qkv_bias, dtype=self.dtype,
                         name="pw")(toks)
        assert m == "conv", f"conv method {m} for qkv not supported"
        qkv_conv = _conv2d(int(dim * self.qkv_ratio), k_, s_, p_, 1,
                           self.qkv_bias, "qkv", self.dtype)
        toks = qkv_conv(xg).reshape(B, -1, int(dim * self.qkv_ratio))
        if cls is not None:
            # ref :523: the cls vector is tiled to a 3x3 patch, convolved,
            # and the flattened output at index 4 (the center at k3/s1/p1)
            # becomes the cls qkv row.
            tile = jnp.broadcast_to(cls.reshape(B, 1, 1, C), (B, 3, 3, C))
            yc = qkv_conv(tile).reshape(B, -1, int(dim * self.qkv_ratio))
            toks = jnp.concatenate([yc[:, 4:5], toks], axis=1)
        return toks

    @nn.compact
    def __call__(self, x, prev=None, deterministic: bool = True,
                 bn_train: bool = False, return_attn: bool = False):
        """Returns (out, prev) — prev is the residual score carry
        (ref :566-570) — or (out, prev, attn) with return_attn."""
        B = x.shape[0]
        dim, nH = self.dim, self.num_heads
        qkv_dim = int(dim * self.qkv_ratio) // 3
        scale = self.qk_scale or (qkv_dim // nH) ** -0.5

        if self.use_qkvconv:
            toks = self._qkv_conv_tokens(x, bn_train)
            q, k, v = _split_heads_tokens(toks, nH, qkv_dim, dim,
                                          self.qkv_ratio)
        else:
            assert self.qkv_ratio == 3, \
                "the reference linear path only supports qkv_ratio == 3"
            qkv = dense(int(dim * self.qkv_ratio), use_bias=self.qkv_bias,
                        dtype=self.dtype, name="qkv")(x)
            N = x.shape[1]
            qkv = qkv.reshape(B, N, 3, nH, dim // nH).transpose(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]

        attn = None
        vT = _merge_heads(v)                           # (B, T, dim)
        if self.use_avg_att:
            out = vT.at[:, 0].set(vT[:, 1:].mean(axis=1))   # ref :558
            if self.qkv_ratio == 3:
                # ref :557's transpose+reshape of v is a VIEW when the
                # (nH, hd) merge is stride-compatible (every ratio==3
                # layout), so the in-place row write above also lands in
                # the v that add_v_res adds. The ratio!=3 split layouts
                # force a copy instead — v stays unmodified there.
                vT = out
        elif self.use_avg_att_all:
            out = jnp.broadcast_to(vT.mean(axis=1, keepdims=True), vT.shape)
        else:
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                           preferred_element_type=jnp.float32) * scale
            if prev is not None and self.res_score:
                s = s + prev
            if self.res_score:
                prev = s
            attn = softmax_fp32(s)
            attn = nn.Dropout(self.attn_drop)(attn,
                                              deterministic=deterministic)
            out = _merge_heads(jnp.einsum("bhnm,bhmd->bhnd",
                                          attn.astype(vT.dtype), v))
        out = dense(dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if self.add_v_res:
            out = out + vT
        if return_attn:
            return out, prev, attn
        return out, prev


class DownAttention(nn.Module):
    """Strided conv-QKV attention with bilinear 2x re-upsampling and a
    full-resolution depthwise value branch (ref layers/attention.py:664-1030
    ``DownAttention``). Only the dw_*_pw method family is reachable in the
    reference (every other branch leaves v_full undefined, ref :925)."""

    dim: int
    in_dim: Optional[int] = None
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    res_score: bool = False
    qkv_ratio: float = 3.0
    add_v_res: bool = False
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    method: str = "dw_bn_glu_pw"
    add_v_full_after_proj: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, prev=None, deterministic: bool = True,
                 bn_train: bool = False):
        from esvit_tpu.ops.resample import torch_bilinear_resize

        assert self.method in _DW_METHODS, \
            "only the dw_*_pw family is reachable in the reference"
        dim, nH, m = self.dim, self.num_heads, self.method
        in_dim = self.in_dim or dim
        qkv_dim = int(dim * self.qkv_ratio) // 3
        F_out = (qkv_dim * 2 + dim) if self.qkv_ratio != 3 \
            else int(dim * self.qkv_ratio)
        scale = self.qk_scale or (qkv_dim // nH) ** -0.5

        cls, grid, H = _split_cls(x)
        B, C = x.shape[0], x.shape[-1]
        xg = grid.reshape(B, H, H, C)

        # Full-resolution value branch (ref :802-805): dw k3/s1/p1 -> BN ->
        # pointwise, token-major output (B, H*H, dim).
        vf = _conv2d(dim, 3, 1, 1, in_dim, False, "v_dw", self.dtype)(xg)
        vf = _batchnorm("v_bn", bn_train)(vf)
        v_full = dense(dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="v_pw")(vf.reshape(B, H * H, dim))

        # Strided qkv stem (ref :807-815), identical to ConvQKVAttention's
        # dw branch.
        yg = _conv2d(dim, self.kernel_size, self.stride, self.padding,
                     in_dim, False, "dw", self.dtype)(xg)
        if "bn" in m:
            yg = _batchnorm("bn", bn_train)(yg)
        act = _swish if "swish" in m else (_gelu if "glu" in m else None)
        if act is not None:
            yg = act(yg)
        toks = yg.reshape(B, -1, dim)
        if cls is not None:
            assert C == dim
            toks = jnp.concatenate([cls, toks], axis=1)
        toks = dense(F_out, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="pw")(toks)
        q, k, v = _split_heads_tokens(toks, nH, qkv_dim, dim, self.qkv_ratio)

        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        if prev is not None and self.res_score:
            s = s + prev
        if self.res_score:
            prev = s
        p = nn.Dropout(self.attn_drop)(softmax_fp32(s),
                                       deterministic=deterministic)
        vT = _merge_heads(v)
        out = _merge_heads(jnp.einsum("bhnm,bhmd->bhnd",
                                      p.astype(vT.dtype), v))

        if cls is not None:
            x_cls, out = out[:, :1], out[:, 1:]
        Hd = math.isqrt(out.shape[1])
        og = out.reshape(B, Hd, Hd, dim)
        og = torch_bilinear_resize(og, 2 * Hd, 2 * Hd, 2.0, 2.0)
        out = og.reshape(B, -1, dim)                   # ref :919-922
        if not self.add_v_full_after_proj:
            out = out + v_full
        if cls is not None:
            out = jnp.concatenate([x_cls, out], axis=1)
        out = dense(dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if self.add_v_res:
            out = out + vT
        if self.add_v_full_after_proj:                 # ref :936-939
            x_cls2, rest = out[:, :1], out[:, 1:1 + v_full.shape[1]]
            out = jnp.concatenate([x_cls2, rest + v_full], axis=1)
        return out, prev


class CrossScaleAttention(nn.Module):
    """Full-resolution queries over strided keys/values with a v_full
    fusion branch (ref layers/attention.py:1032-1405). Only the dw_*_pw
    family is reachable (ref :1303), and the reference asserts
    qkv_ratio == 3 (ref :1089).

    Head splitting reproduces the reference verbatim: q/k/v are reshaped
    out of channel-major (B, C, T) buffers with a raw ``view``
    (ref :1238-1240), which scrambles token/channel pairs whenever
    T != C — a reference quirk kept for parity.
    """

    dim: int
    in_dim: Optional[int] = None
    num_heads: int = 8
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    res_score: bool = False
    add_v_res: bool = False
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    method: str = "dw_bn_glu_pw"
    add_v_full_after_proj: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, prev=None, deterministic: bool = True,
                 bn_train: bool = False):
        assert self.method in _DW_METHODS, \
            "only the dw_*_pw family is reachable in the reference"
        dim, nH, m = self.dim, self.num_heads, self.method
        in_dim = self.in_dim or dim
        hd = dim // nH
        scale = self.qk_scale or hd ** -0.5

        cls, grid, H = _split_cls(x)
        B, C = x.shape[0], x.shape[-1]
        xg = grid.reshape(B, H, H, C)

        def scramble(toks):
            """Token-major (B, T, C) -> (B, nH, T, hd) via the reference's
            channel-major raw view (ref :1238-1240)."""
            T = toks.shape[1]
            cm = toks.transpose(0, 2, 1)               # (B, C, T) buffer
            return cm.reshape(B, T, nH, hd).transpose(0, 2, 1, 3)

        # v_full (ref :1172-1174): dw k3/s1/p1 -> BN -> pointwise.
        vf = _conv2d(dim, 3, 1, 1, in_dim, False, "v_dw", self.dtype)(xg)
        vf = _batchnorm("v_bn", bn_train)(vf)
        v_full = dense(dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="v_pw")(vf.reshape(B, H * H, dim))

        # q at full resolution (ref :1177-1181): dw stride 1 -> BN (no act).
        qg = _conv2d(dim, self.kernel_size, 1, self.padding, in_dim, False,
                     "q_dw", self.dtype)(xg)
        qg = _batchnorm("q_bn", bn_train)(qg)
        q_toks = qg.reshape(B, -1, dim)
        if cls is not None:
            assert C == dim
            q_toks = jnp.concatenate([cls, q_toks], axis=1)
        q_toks = dense(dim, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="q_pw")(q_toks)

        # k/v at strided resolution (ref :1184-1192).
        kvg = _conv2d(dim, self.kernel_size, self.stride, self.padding,
                      in_dim, False, "kv_dw", self.dtype)(xg)
        if "bn" in m:
            kvg = _batchnorm("kv_bn", bn_train)(kvg)
        act = _swish if "swish" in m else (_gelu if "glu" in m else None)
        if act is not None:
            kvg = act(kvg)
        kv_toks = kvg.reshape(B, -1, dim)
        if cls is not None:
            kv_toks = jnp.concatenate([cls, kv_toks], axis=1)
        kv_toks = dense(2 * dim, use_bias=self.qkv_bias, dtype=self.dtype,
                        name="kv_pw")(kv_toks)
        # torch.chunk(kv, 2, dim=1) on channel-major = lane halves here.
        k_toks, v_toks = kv_toks[..., :dim], kv_toks[..., dim:]

        q = scramble(q_toks)
        k = scramble(k_toks)
        v = scramble(v_toks)

        s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                       preferred_element_type=jnp.float32) * scale
        if prev is not None and self.res_score:
            s = s + prev
        if self.res_score:
            prev = s
        p = nn.Dropout(self.attn_drop)(softmax_fp32(s),
                                       deterministic=deterministic)
        vT = _merge_heads(v)
        out = _merge_heads(jnp.einsum("bhnm,bhmd->bhnd",
                                      p.astype(vT.dtype), v))

        if cls is not None:
            x_cls, out = out[:, :1], out[:, 1:]
        if not self.add_v_full_after_proj:             # ref :1302-1303
            out = out + v_full
        if cls is not None:
            out = jnp.concatenate([x_cls, out], axis=1)
        out = dense(dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if self.add_v_res:
            out = out + vT
        if self.add_v_full_after_proj:                 # ref :1314-1317
            x_cls2, rest = out[:, :1], out[:, 1:1 + v_full.shape[1]]
            out = jnp.concatenate([x_cls2, rest + v_full], axis=1)
        return out, prev
