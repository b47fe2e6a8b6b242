"""Swin Transformer backbone, TPU-native.

Functionally equivalent to the reference Swin
(ref: models/swin_transformer.py:72-943) with a TPU-first implementation:

- NHWC layout throughout, static shapes — every input resolution compiles to
  its own XLA program (the multi-crop recipe has exactly two).
- Shifted-window masks and relative-position indices are numpy constants
  computed at trace time (ops/window.py) instead of the reference's
  per-forward rebuild (swin_transformer.py:297 dead cache).
- Windowed attention runs as one batched matmul over all windows (MXU
  friendly); softmax/LayerNorm in fp32 under bf16 compute, mirroring torch
  AMP. A fused Pallas kernel path is selected via ``attention_impl``.

Per-stage effective window size replicates the reference rule
(swin_transformer.py:206-210): if min(stage resolution at construction
``img_size``) <= window, the window shrinks to that resolution and shift is
disabled. Inputs at other resolutions (local 96px crops) are zero-padded to a
window multiple after norm1, exactly like swin_transformer.py:286-291.
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu.config import SwinConfig
from esvit_tpu.models.common import (DropPath, LayerNorm, Mlp, dense,
                                     softmax_fp32, trunc_normal_init)
from esvit_tpu.models.registry import register_backbone
from esvit_tpu.ops import window as wops

# Pad-ratio (ws^2 / real tokens) above which the subwindow virtual-pad-
# column path takes priority over the fused megakernel when BOTH can run
# a single-padded-window stage (e.g. 6x6 tokens in a 7x7 window: ratio
# 1.36). 1.0 = subwindow always wins. Env-seeded for A/B measurement.
_SUBWIN_RATIO = float(os.environ.get("ESVIT_SUBWIN_RATIO", "1.0"))

Dtype = Any


class Static:
    """Identity-hashable, subscriptable wrapper so trace-time constant
    dicts (window masks / layout metadata) can ride through ``nn.remat``
    static arguments."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __getitem__(self, k):
        return self.value[k]

    def get(self, k, default=None):
        return self.value.get(k, default)

    def __hash__(self):
        return id(self.value)

    def __eq__(self, other):
        return isinstance(other, Static) and self.value is other.value


def _subwindow_geometry(H, W, ws, ss):
    """Trace-time geometry of the single-padded-window layout (Hp == Wp ==
    ws > H): positions of the H*W real tokens in the (rolled, for shifted
    blocks) ws x ws window, the pad positions, and the reference shift
    mask (swin_transformer.py:249-272) or None. The reference's roll by
    -ss on the padded grid maps real row i to (i - ss) % ws."""
    N = ws * ws
    ii, jj = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pos = (((ii - ss) % ws) * ws + ((jj - ss) % ws)).reshape(-1)
    pad_pos = np.setdiff1d(np.arange(N), pos)
    m = (np.asarray(wops.shifted_window_mask(H, W, ws, ss), np.float32)[0]
         if ss > 0 else None)
    return pos, pad_pos, m


def _subwindow_bias_parts(table, ws, pos, pad_pos, m):
    """(bias_real (L, L, nH), log_s (L, nH)) from the learned rel-pos
    table: the real-token bias (+shift mask) and the per-(query, head)
    logsumexp of the pad columns' bias (+mask) — the virtual pad column's
    position-dependent logit term. In-graph so table gradients flow
    exactly as through the reference's materialized pad columns."""
    N = ws * ws
    nH = table.shape[-1]
    idx = wops.relative_position_index(ws, ws)
    bias_full = table[idx.reshape(-1)].reshape(N, N, nH)        # f32
    bias_real = bias_full[pos[:, None], pos[None, :]]
    bias_pad = bias_full[pos[:, None], pad_pos[None, :]]
    if m is not None:
        bias_real = bias_real + m[pos[:, None], pos[None, :], None]
        bias_pad = bias_pad + m[pos[:, None], pad_pos[None, :], None]
    return bias_real, jax.nn.logsumexp(bias_pad, axis=1)


class _DenseParams(nn.Module):
    """Parameter-only stand-in for ``dense``: declares the same
    kernel/bias names, shapes, and initializers without computing — the
    block-fused Pallas kernel consumes the raw arrays. Checkpoints are
    interchangeable between the fused and classic paths."""

    din: int
    dout: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", trunc_normal_init, (self.din, self.dout),
                       jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.dout,),
                        jnp.float32) if self.use_bias
             else jnp.zeros((self.dout,), jnp.float32))
        return k, b


class _LNLeafParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.dim,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dim,),
                       jnp.float32)
        return s, b


class _NormParams(nn.Module):
    """Mirrors common.LayerNorm's scope (child 'ln' holding scale/bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        return _LNLeafParams(self.dim, name="ln")()


class _AttnParams(nn.Module):
    """Mirrors WindowAttention's parameter tree (qkv, proj, rel-pos table)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        ws = self.window_size
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
                           jnp.float32)
        qkv = _DenseParams(self.dim, 3 * self.dim, self.qkv_bias,
                           name="qkv")()
        proj = _DenseParams(self.dim, self.dim, True, name="proj")()
        return table, qkv, proj


class _MlpParams(nn.Module):
    """Mirrors Mlp's parameter tree (fc1, fc2)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = _DenseParams(self.dim, self.hidden, name="fc1")()
        fc2 = _DenseParams(self.hidden, self.dim, name="fc2")()
        return fc1, fc2


class WindowAttention(nn.Module):
    """W-MSA / SW-MSA with relative position bias
    (ref: models/swin_transformer.py:72-152).

    The rel-pos bias and the shifted-window mask are fused into one
    (nWm, nH, N, N) additive tensor up front (the reference gathers the
    table and adds the mask separately every forward). ``attention_impl``
    selects the XLA batched-matmul path (default) or the fused Pallas
    kernel (ops/pallas_window_attention.py).
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    attention_impl: str = "xla"
    score_dtype: Any = jnp.float32
    # (packed_max_calls, packed_target_cols, fused_tw_mm, fused_hg_max,
    # fused_g_step) — SwinConfig.kernel_knobs; recorded in the run config.
    kernel_knobs: tuple = (1, 2400, 2, 3, 32)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray] = None,
                 deterministic: bool = True, return_attention: bool = False,
                 region: Optional[np.ndarray] = None):
        B_, N, C = x.shape
        nH = self.num_heads
        hd = C // nH
        scale = self.qk_scale or hd ** -0.5

        # Table layout identical to torch ((2w-1)^2, nH) for checkpoint import.
        ws = self.window_size
        table = self.param("relative_position_bias_table", trunc_normal_init,
                           ((2 * ws - 1) * (2 * ws - 1), nH), jnp.float32)

        idx = wops.relative_position_index(ws, ws)          # (ws*ws, ws*ws) np
        bias_nomask = table[idx.reshape(-1)].reshape(ws * ws, ws * ws, nH)
        bias_nomask = bias_nomask.transpose(2, 0, 1)        # (nH, N, N) f32

        qkv = dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)

        # Packed fused kernel (ops/packed_window_attention.py): used when a
        # single call covers all heads (stage-1 shapes — where the XLA
        # batched tiny-dot path is per-entry-overhead-bound; larger-nH
        # stages measured faster on XLA, PERF.md round 2). The shifted mask
        # travels as region ids; requires a TPU backend (the kernel has its
        # own interpret-mode parity tests for CPU).
        if (self.attention_impl == "packed" and not return_attention
                and self.attn_drop == 0.0 and N == ws * ws
                and (mask is None) == (region is None)
                and jax.default_backend() == "tpu"):
            from esvit_tpu.ops import packed_window_attention as pwa

            nWt = region.shape[0] if region is not None else 1
            max_calls, target_cols = self.kernel_knobs[:2]
            TW, HG = pwa._pick_layout(B_, nH, nWt, N,
                                      target_cols=target_cols)
            if TW > 0 and HG > 0 and nH // HG <= max_calls:
                qkv2 = qkv.reshape(B_ * N, 3 * C)
                out2 = pwa.packed_window_attention(
                    qkv2[:, :C], qkv2[:, C:2 * C], qkv2[:, 2 * C:],
                    bias_nomask, region, N, nH, scale,
                    score_dtype=self.score_dtype, tile_windows=(TW, HG))
                out = out2.reshape(B_, N, C)
                out = dense(C, dtype=self.dtype, name="proj")(out)
                out = nn.Dropout(self.proj_drop)(out,
                                                 deterministic=deterministic)
                return out, None

        bias = bias_nomask[None, :, :N, :N]                 # (1, nH, N, N)
        if mask is not None:
            m = jnp.asarray(mask, jnp.float32)              # (nW, N, N) const
            bias = bias + m[:, None]                        # (nW, nH, N, N)

        use_pallas = (self.attention_impl == "pallas" and not return_attention
                      and self.attn_drop == 0.0)
        if use_pallas:
            from esvit_tpu.ops.pallas_window_attention import \
                fused_window_attention

            out = fused_window_attention(qkv, bias, nH, scale)
            probs = None
        else:
            # Transpose-free decomposition: the head split is a trailing-dim
            # reshape (free) and the head axis rides dot_general batch dims,
            # so no physical (B_, N, 3, nH, hd) -> (3, B_, nH, N, hd)
            # transpose copy is materialized (profiling showed those copies
            # at ~10% of the whole train step — PERF.md round 2).
            qkv_r = qkv.reshape(B_, N, 3, nH, hd)
            q = qkv_r[:, :, 0]                              # (B_, N, nH, hd)
            k = qkv_r[:, :, 1]
            v = qkv_r[:, :, 2]
            sd = self.score_dtype
            attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                              preferred_element_type=sd)
            nWm = bias.shape[0]
            attn = (attn.reshape(B_ // nWm, nWm, nH, N, N)
                    + bias[None].astype(sd)).reshape(B_, nH, N, N)
            probs = softmax_fp32(attn)                       # fp32
            probs_c = nn.Dropout(self.attn_drop)(probs,
                                                 deterministic=deterministic)
            out = jnp.einsum("bhnm,bmhd->bnhd", probs_c.astype(self.dtype), v)
            out = out.reshape(B_, N, C)

        out = dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        if return_attention:
            return out, probs
        return out, None


class SwinBlock(nn.Module):
    """One Swin block: (S)W-MSA + MLP with pre-norm residuals
    (ref: models/swin_transformer.py:177-333)."""

    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    attention_impl: str = "xla"
    score_dtype: Any = jnp.float32
    fused_block: bool = False
    fused_interpret: bool = False
    kernel_knobs: tuple = (1, 2400, 2, 3, 32)
    subwindow_opt: bool = True
    dtype: Dtype = jnp.float32

    def _drop_path_scales(self, B, C, deterministic):
        """Two (B*8, C) per-sample stochastic-depth scale arrays ({0,
        1/keep}; DropPath semantics), each image's scale replicated 8x and
        pre-broadcast along C (the fused kernel's sublane-divisible block
        layout). None when stochastic depth is inactive."""
        if self.drop_path == 0.0 or deterministic:
            return None, None
        keep = 1.0 - self.drop_path
        r1, r2 = jax.random.split(self.make_rng("droppath"))
        m1 = jax.random.bernoulli(r1, keep, (B,)).astype(jnp.float32) / keep
        m2 = jax.random.bernoulli(r2, keep, (B,)).astype(jnp.float32) / keep
        return (jnp.broadcast_to(m1[:, None, None], (B, 8, C)).reshape(-1, C),
                jnp.broadcast_to(m2[:, None, None], (B, 8, C)).reshape(-1, C))

    def _fused(self, x, deterministic, window_major):
        """Whole-block Pallas megakernel path (ops/fused_block.py).

        When ``window_major`` carries a ``subwindow`` geometry, the block
        runs on the AUGMENTED single window: H*W real tokens plus one
        virtual token standing in for every spatial-pad position. The
        kernel's per-row pad multiplier zeroes the virtual row after LN1,
        so its key/value are exactly the qkv biases (the reference's pad
        semantics), and the bias operand carries the virtual column's
        per-(query, head) logsumexp term — same math as
        SwinBlock._subwindow, executed VMEM-resident."""
        from esvit_tpu.ops import fused_block as fb

        B, L, C = x.shape
        ws = self.window_size
        nH = self.num_heads
        table, (wqkv, bqkv), (wp, bp) = _AttnParams(
            C, ws, nH, self.qkv_bias, name="attn")()
        g1, be1 = _NormParams(C, name="norm1")()
        g2, be2 = _NormParams(C, name="norm2")()
        hidden = int(C * self.mlp_ratio)
        (w1, b1), (w2, b2) = _MlpParams(C, hidden, name="mlp")()

        sub = window_major.get("subwindow")
        if sub is not None:
            N = window_major["N"]
            Nr = N - 1
            bias_real, log_s = _subwindow_bias_parts(table, ws, *sub)
            bias = jnp.zeros((nH, N, N), jnp.float32)
            bias = bias.at[:, :Nr, :Nr].set(bias_real.transpose(2, 0, 1))
            bias = bias.at[:, :Nr, Nr].set(log_s.T)
        else:
            N = ws * ws
            idx = wops.relative_position_index(ws, ws)
            bias = table[idx.reshape(-1)].reshape(N, N, nH).transpose(2, 0, 1)

        params = dict(
            g1=g1, be1=be1,
            wq=wqkv[:, :C], bq=bqkv[:C],
            wk=wqkv[:, C:2 * C], bk=bqkv[C:2 * C],
            wv=wqkv[:, 2 * C:], bv=bqkv[2 * C:],
            bias=bias, wp=wp, bp=bp, g2=g2, be2=be2,
            w1=w1, b1=b1, w2=w2, b2=b2,
        )
        dp1, dp2 = self._drop_path_scales(B, C, deterministic)
        pad = window_major["pad_mask"]
        out = fb.fused_swin_block(
            x, params, dp1, dp2, N=N, nH=nH,
            nW=window_major["n_windows"],
            scale=self.qk_scale or (C // nH) ** -0.5,
            region=window_major["region"],
            pad=(np.asarray(pad) if pad is not None else None),
            eps=self.norm_eps,
            score_dtype=self.score_dtype,
            interpret=self.fused_interpret,
            knobs=self.kernel_knobs[2:])
        return out, None

    def _subwindow(self, x, H, W, deterministic):
        """Single-padded-window block (Hp == Wp == ws > H): the exact
        reference math without ever materializing pad rows.

        Reference semantics (models/swin_transformer.py:275-333): the
        feature map is zero-padded AFTER norm1, the (un-masked, for
        W-MSA) attention runs over the full ws*ws window, and pad
        outputs are cropped before the FFN. Because pad rows enter the
        qkv projection as exact zeros, every pad token's key/value is
        the projection bias itself (k_pad = b_k, v_pad = b_v) — so for
        each (query, head) the ENTIRE pad-column block of the softmax
        collapses into one virtual column whose logit is

            q . b_k * scale + log sum_p exp(bias[pos_q, p] + mask[pos_q, p])

        (the sum runs over pad positions p; a tiny in-graph logsumexp
        over the learned rel-pos table, so table gradients flow exactly
        as through the reference's materialized pad columns) and whose
        value row is b_v. Attention is then softmax over H*W+1 columns
        instead of ws*ws — at the 96px crop branch's stage 3 (3x3 real
        tokens in a 7x7 window) this removes the 5.4x pad waste the
        round-4 profile measured at ~16 ms/step. Shifted blocks fold
        the reference's roll into the trace-time position map (rolling
        a fully-padded border moves real tokens, never mixes them) and
        carry the -100 region mask on both real and pad columns."""
        B, L, C = x.shape
        ws, ss = self.window_size, self.shift_size
        nH = self.num_heads
        hd = C // nH
        scale = self.qk_scale or hd ** -0.5
        N = ws * ws

        norm1 = LayerNorm(self.norm_eps, self.dtype, name="norm1")
        table, (wqkv, bqkv), (wp, bp) = _AttnParams(
            C, ws, nH, self.qkv_bias, name="attn")()
        dp = DropPath(self.drop_path, name="drop_path")
        norm2 = LayerNorm(self.norm_eps, self.dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), drop=self.drop,
                  dtype=self.dtype, name="mlp")

        pos, pad_pos, m = _subwindow_geometry(H, W, ws, ss)
        bias_real, log_s = _subwindow_bias_parts(table, ws, pos, pad_pos, m)

        shortcut = x
        y = norm1(x)
        # flax Dense numerics: all-bf16 operands under mixed precision
        # (f32 MXU accumulation is XLA's bf16-dot default).
        cd = self.dtype
        qkv = y.astype(cd) @ wqkv.astype(cd)
        if self.qkv_bias:
            qkv = qkv + bqkv.astype(cd)
        qkv = qkv.reshape(B, L, 3, nH, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        sd = self.score_dtype
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                          preferred_element_type=sd)
        attn = attn + bias_real.transpose(2, 0, 1)[None].astype(sd)
        b_k = bqkv[C:2 * C].reshape(nH, hd)
        b_v = bqkv[2 * C:].reshape(nH, hd)
        lv = jnp.einsum("bnhd,hd->bhn", q * scale, b_k.astype(cd),
                        preferred_element_type=sd)
        lv = lv + log_s.T[None].astype(sd)                       # (B, nH, L)
        probs = softmax_fp32(jnp.concatenate(
            [attn.astype(jnp.float32), lv[..., None].astype(jnp.float32)],
            axis=-1))                                            # (B,nH,L,L+1)
        out = jnp.einsum("bhnm,bmhd->bnhd", probs[..., :L].astype(cd), v)
        out = out + jnp.einsum("bhn,hd->bnhd", probs[..., L].astype(cd),
                               b_v.astype(cd))
        out = out.reshape(B, L, C)
        out = out.astype(cd) @ wp.astype(cd) + bp.astype(cd)
        out = nn.Dropout(self.drop)(out, deterministic=deterministic)

        x = shortcut + dp(out, deterministic)
        y2 = mlp(norm2(x), deterministic)
        return x + dp(y2, deterministic)

    @nn.compact
    def __call__(self, x, deterministic: bool = True,
                 return_attention: bool = False,
                 window_major: Optional[dict] = None):
        """Classic path: x is (B, H*W, C) spatial tokens. Window-major path
        (window_major = {'mask', 'pad_mask', 'n_windows'}): x is already in
        this block's window-major layout; partition is a free reshape and
        the stage driver handles layout transitions (ops/window.py)."""
        if window_major is not None and window_major["padded"]:
            # Padded window-major layout: only the fused megakernel consumes
            # it (the stage driver gates eligibility before choosing it).
            return self._fused(x, deterministic, window_major)

        if window_major is None and self.subwindow_opt:
            B, L, C = x.shape
            H = W = int(math.isqrt(L))
            Hp, Wp = wops.pad_to_window_multiple(H, W, self.window_size)
            if ((Hp, Wp) == (self.window_size,) * 2 and (Hp, Wp) != (H, W)
                    and not return_attention and self.attn_drop == 0.0):
                return self._subwindow(x, H, W, deterministic), None

        norm1 = LayerNorm(self.norm_eps, self.dtype, name="norm1")
        attn_mod = WindowAttention(
            self.dim, self.window_size, self.num_heads,
            qkv_bias=self.qkv_bias, qk_scale=self.qk_scale,
            attn_drop=self.attn_drop, proj_drop=self.drop,
            attention_impl=self.attention_impl,
            score_dtype=self.score_dtype,
            kernel_knobs=self.kernel_knobs, dtype=self.dtype, name="attn")
        dp = DropPath(self.drop_path, name="drop_path")
        norm2 = LayerNorm(self.norm_eps, self.dtype, name="norm2")
        mlp = Mlp(int(self.dim * self.mlp_ratio), drop=self.drop,
                  dtype=self.dtype, name="mlp")

        B, L, C = x.shape
        ws, ss = self.window_size, self.shift_size

        if window_major is not None:
            shortcut = x
            y = norm1(x)
            if window_major["pad_mask"] is not None:
                y = y * jnp.asarray(window_major["pad_mask"],
                                    y.dtype)[None, :, None]
            windows = y.reshape(B * window_major["n_windows"], ws * ws, C)
            attn_out, attn = attn_mod(windows, window_major["mask"],
                                      deterministic, return_attention,
                                      region=window_major["region"])
            x = shortcut + dp(attn_out.reshape(B, L, C), deterministic)
            y = mlp(norm2(x), deterministic)
            x = x + dp(y, deterministic)
            return x, attn

        H = W = int(math.isqrt(L))
        shortcut = x
        x = norm1(x)
        x = x.reshape(B, H, W, C)

        # Zero-pad (post-norm, like the reference) to a window multiple.
        Hp, Wp = wops.pad_to_window_multiple(H, W, ws)
        if (Hp, Wp) != (H, W):
            x = jnp.pad(x, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))

        mask = region = None
        if ss > 0:
            x = jnp.roll(x, shift=(-ss, -ss), axis=(1, 2))
            mask = wops.shifted_window_mask(H, W, ws, ss)
            region = wops.window_region_ids(H, W, ws, ss)

        windows = wops.window_partition(x, ws)              # (B*nW, ws*ws, C)
        attn_out, attn = attn_mod(windows, mask, deterministic,
                                  return_attention, region=region)

        x = wops.window_reverse(attn_out, ws, Hp, Wp)
        if ss > 0:
            x = jnp.roll(x, shift=(ss, ss), axis=(1, 2))
        if (Hp, Wp) != (H, W):
            x = x[:, :H, :W, :]
        x = x.reshape(B, L, C)

        x = shortcut + dp(x, deterministic)
        y = mlp(norm2(x), deterministic)
        x = x + dp(y, deterministic)
        return x, attn


class PatchMerging(nn.Module):
    """2x2 patch merging: concat 4 neighbors -> LN -> linear 4C->2C
    (ref: models/swin_transformer.py:354-420; x0..x3 order preserved for
    checkpoint parity)."""

    dim: int
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        B, L, C = x.shape
        H = W = int(math.isqrt(L))
        x = x.reshape(B, H, W, C)
        if H % 2 == 1 or W % 2 == 1:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = x.reshape(B, -1, 4 * C)
        x = LayerNorm(self.norm_eps, self.dtype, name="norm")(x)
        x = dense(2 * C, use_bias=False, dtype=self.dtype, name="reduction")(x)
        return x


class PatchEmbed(nn.Module):
    """Non-overlapping conv patch embedding (ref: swin_transformer.py:514-547)."""

    patch_size: int
    embed_dim: int
    patch_norm: bool = True
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) NHWC
        ps = self.patch_size
        x = nn.Conv(self.embed_dim, (ps, ps), strides=(ps, ps), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=trunc_normal_init, name="proj")(x)
        B, Hp, Wp, C = x.shape
        x = x.reshape(B, Hp * Wp, C)
        if self.patch_norm:
            x = LayerNorm(self.norm_eps, self.dtype, name="norm")(x)
        return x


class SwinStage(nn.Module):
    """A stack of Swin blocks + optional patch merging
    (ref: models/swin_transformer.py:433-499 BasicLayer)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    shift_enabled: bool
    mlp_ratio: float
    qkv_bias: bool
    qk_scale: Optional[float]
    drop: float
    attn_drop: float
    drop_path: tuple[float, ...]
    norm_eps: float
    downsample: bool
    attention_impl: str = "xla"
    score_dtype: Any = jnp.float32
    remat: str = "none"
    fused_block: bool = False
    fused_interpret: bool = False
    kernel_knobs: tuple = (1, 2400, 2, 3, 32)
    subwindow_opt: bool = True
    # Whether sub-window shapes may take the augmented-window fused
    # megakernel route (config.subwindow_fused_stages; defaults to the
    # stage's fused_block setting at model build).
    subwindow_fused: bool = False
    # Subwindow-vs-fused crossover (config.subwindow_ratio).
    subwindow_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    def setup(self):
        if self.remat == "block":
            # Per-block rematerialization: backward recomputes each block's
            # activations from its input instead of reading saved residuals
            # from HBM (deterministic/return_attention/window_major are
            # trace-time static).
            Block = nn.remat(SwinBlock, static_argnums=(2, 3, 4))
        elif self.remat == "none":
            Block = SwinBlock
        else:
            raise ValueError(f"unknown remat mode {self.remat!r}")
        self.blocks = [
            Block(
                dim=self.dim, num_heads=self.num_heads,
                window_size=self.window_size,
                shift_size=(self.window_size // 2
                            if (i % 2 == 1 and self.shift_enabled) else 0),
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                qk_scale=self.qk_scale, drop=self.drop,
                attn_drop=self.attn_drop, drop_path=self.drop_path[i],
                norm_eps=self.norm_eps,
                attention_impl=self.attention_impl,
                score_dtype=self.score_dtype,
                fused_block=self.fused_block,
                fused_interpret=self.fused_interpret,
                kernel_knobs=self.kernel_knobs,
                subwindow_opt=self.subwindow_opt, dtype=self.dtype,
                name=f"blocks_{i}",
            )
            for i in range(self.depth)
        ]
        if self.downsample:
            self.merge = PatchMerging(self.dim, self.norm_eps, self.dtype,
                                      name="downsample")

    def __call__(self, x, deterministic: bool = True, capture: Optional[str] = None,
                 layout_opt: bool = True):
        """capture: None | 'features' | 'attention' -> aux list per block.

        layout_opt: run the whole stage in window-major token order — the
        per-block pad/roll/partition/reverse copies become one static
        gather per layout change (ops/window.py). Numerically identical to
        the classic path (golden parity tests cover both); disabled when
        capturing (aux consumers expect spatial tokens).
        """
        if layout_opt and capture is None and len(self.blocks) > 0:
            if self._subwindow_ok(x):
                # Single-padded-window shapes: virtual-pad-column math —
                # through the fused megakernel on the AUGMENTED H*W+1
                # window when it supports the layout (strictly fewer rows
                # than the padded-window fused path: Np(aug) < Np * nW),
                # else the plain block loop below (SwinBlock._subwindow's
                # XLA path).
                if self.subwindow_fused and self._subwindow_fused_ok(x):
                    return self._forward_fused_subwindow(
                        x, deterministic), []
            else:
                if self.fused_block and self._fused_ok(x):
                    return self._forward_fused(x, deterministic), []
                return self._forward_window_major(x, deterministic), []
        aux = []
        for blk in self.blocks:
            # full positional arity: nn.remat static_argnums binds by position
            x, attn = blk(x, deterministic, capture == "attention", None)
            if capture == "features":
                aux.append(x)
            elif capture == "attention":
                aux.append(attn)
        if self.downsample:
            x = self.merge(x)
        return x, aux

    def _forward_window_major(self, x, deterministic: bool):
        B, L, C = x.shape
        import math as _math

        H = W = int(_math.isqrt(L))
        ws = self.blocks[0].window_size
        Hp, Wp = wops.pad_to_window_multiple(H, W, ws)
        padded = (Hp, Wp) != (H, W)
        if padded:
            x = jnp.pad(x.reshape(B, H, W, C),
                        ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
            x = x.reshape(B, Hp * Wp, C)
        n_windows = (Hp // ws) * (Wp // ws)

        cur: Optional[int] = None                  # current layout shift
        for blk in self.blocks:
            t = blk.shift_size
            if cur is None:
                x = wops.to_window_major(x, Hp, Wp, ws, t)
            elif cur != t:
                x = wops.transition_window_major(x, Hp, Wp, ws, cur, t)
            cur = t
            wm = Static({
                "mask": (wops.shifted_window_mask(H, W, ws, t) if t > 0
                         else None),
                "region": (wops.window_region_ids(H, W, ws, t) if t > 0
                           else None),
                "pad_mask": (wops.pad_token_mask(H, W, Hp, Wp, ws, t)
                             if padded else None),
                "n_windows": n_windows,
                "padded": False,
            })
            x, _ = blk(x, deterministic, False, wm)

        x = wops.from_window_major(x, Hp, Wp, ws, cur)
        if padded:
            x = x.reshape(B, Hp, Wp, C)[:, :H, :W, :].reshape(B, L, C)
        if self.downsample:
            x = self.merge(x)
        return x

    def _subwindow_ok(self, x) -> bool:
        """Whether this stage's shape is a single spatially-padded window
        per image (Hp == Wp == ws > H) eligible for the virtual-pad-column
        block path. When the fused megakernel is also available for the
        shape, subwindow takes priority only above a pad-ratio threshold
        (ws^2 real-token multiple); at mild ratios the fused kernel's
        VMEM residency can beat the row savings — the threshold is the
        measured crossover (PERF.md round 4)."""
        if not self.subwindow_opt or self.attn_drop != 0.0:
            return False
        B, L, C = x.shape
        H = W = int(math.isqrt(L))
        ws = self.blocks[0].window_size
        Hp, Wp = wops.pad_to_window_multiple(H, W, ws)
        if (Hp, Wp) != (ws, ws) or (Hp, Wp) == (H, W):
            return False
        ratio = (ws * ws) / (H * W)
        if (ratio < self.subwindow_ratio and self.fused_block
                and self._fused_ok(x)):
            return False
        return True

    def _fused_ok(self, x) -> bool:
        """Whether the block-fused megakernel path can run this stage."""
        from esvit_tpu.ops import fused_block as fb

        if not (jax.default_backend() == "tpu" or self.fused_interpret):
            return False
        if self.drop != 0.0 or self.attn_drop != 0.0:
            return False
        B, L, C = x.shape
        H = W = int(math.isqrt(L))
        ws = self.blocks[0].window_size
        Hp, Wp = wops.pad_to_window_multiple(H, W, ws)
        nW = (Hp // ws) * (Wp // ws)
        Np = wops.padded_window_tokens(ws)
        return fb.supports(B, nW * Np, ws * ws, self.num_heads, nW,
                           knobs=self.kernel_knobs[2:],
                           C=C, M=int(C * self.mlp_ratio))

    def _subwindow_fused_ok(self, x) -> bool:
        """Whether the fused megakernel can run this stage on the
        AUGMENTED single window (H*W real tokens + 1 virtual pad token)."""
        from esvit_tpu.ops import fused_block as fb

        if not (jax.default_backend() == "tpu" or self.fused_interpret):
            return False
        if self.drop != 0.0 or self.attn_drop != 0.0:
            return False
        B, L, C = x.shape
        N = L + 1
        Np = ((N + 7) // 8) * 8
        return fb.supports(B, Np, N, self.num_heads, 1,
                           knobs=self.kernel_knobs[2:],
                           C=C, M=int(C * self.mlp_ratio))

    def _forward_fused_subwindow(self, x, deterministic: bool):
        """Sub-window stage through the fused megakernel: each image is
        ONE augmented window of N = H*W + 1 tokens (real tokens + the
        virtual pad-column token), padded to Np slots. No inter-block
        layout transitions exist — a single window is already window-major
        and the shift rides the bias (SwinBlock._fused subwindow branch).
        The virtual token's input row is zeroed by the kernel's pad
        multiplier every block, so its k/v are the qkv biases in every
        block, exactly like the reference's freshly re-padded rows."""
        B, L, C = x.shape
        H = W = int(math.isqrt(L))
        ws = self.blocks[0].window_size
        N = L + 1
        Np = ((N + 7) // 8) * 8
        x = jnp.pad(x, ((0, 0), (0, Np - L), (0, 0)))
        pad_vec = np.zeros(Np, np.float32)
        pad_vec[:L] = 1.0
        for blk in self.blocks:
            wm = Static({
                "region": None,
                "pad_mask": pad_vec,
                "n_windows": 1,
                "padded": True,
                "N": N,
                "subwindow": _subwindow_geometry(H, W, ws, blk.shift_size),
            })
            x, _ = blk(x, deterministic, False, wm)
        x = x[:, :L, :]
        if self.downsample:
            x = self.merge(x)
        return x

    def _forward_fused(self, x, deterministic: bool):
        """Whole stage in the PADDED window-major layout (ops/window.py):
        every block runs as one fused Pallas kernel; layout changes are
        static gathers on padded rows."""
        B, L, C = x.shape
        H = W = int(math.isqrt(L))
        ws = self.blocks[0].window_size
        Hp, Wp = wops.pad_to_window_multiple(H, W, ws)
        spatial_padded = (Hp, Wp) != (H, W)
        if spatial_padded:
            x = jnp.pad(x.reshape(B, H, W, C),
                        ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
            x = x.reshape(B, Hp * Wp, C)
        n_windows = (Hp // ws) * (Wp // ws)

        cur: Optional[int] = None
        for blk in self.blocks:
            t = blk.shift_size
            if cur is None:
                x = wops.to_window_major_padded(x, Hp, Wp, ws, t)
            elif cur != t:
                x = wops.transition_window_major_padded(x, Hp, Wp, ws, cur, t)
            cur = t
            wm = Static({
                "region": (wops.window_region_ids(H, W, ws, t) if t > 0
                           else None),
                "pad_mask": (
                    wops.pad_token_mask_padded(H, W, Hp, Wp, ws, t)
                    if spatial_padded else None),
                "n_windows": n_windows,
                "padded": True,
            })
            x, _ = blk(x, deterministic, False, wm)

        x = wops.from_window_major_padded(x, Hp, Wp, ws, cur)
        if spatial_padded:
            x = x.reshape(B, Hp, Wp, C)[:, :H, :W, :].reshape(B, L, C)
        else:
            x = x.reshape(B, L, C)
        if self.downsample:
            x = self.merge(x)
        return x


class SwinTransformer(nn.Module):
    """Full hierarchical backbone (ref: models/swin_transformer.py:576-943).

    ``forward_features`` returns ``(cls, region)``: the global-avg-pooled
    feature and the final normed token map — the EsViT dense contract
    (swin_transformer.py:678-694).
    """

    cfg: SwinConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        nstages = len(c.depths)
        self.patch_embed = PatchEmbed(c.patch_size, c.embed_dim, c.patch_norm,
                                      c.norm_eps, self.dtype)
        base_res = c.img_size // c.patch_size
        if c.ape:
            self.absolute_pos_embed = self.param(
                "absolute_pos_embed", trunc_normal_init,
                (1, base_res * base_res, c.embed_dim), jnp.float32)

        dpr = np.linspace(0, c.drop_path_rate, sum(c.depths))
        stages = []
        for i in range(nstages):
            res = base_res // (2 ** i)
            # Reference rule (swin_transformer.py:206-210): shrink window and
            # disable shift when the construction-time resolution is small.
            eff_ws = min(c.window_size, res)
            shift_enabled = res > eff_ws
            lo, hi = sum(c.depths[:i]), sum(c.depths[:i + 1])
            stages.append(SwinStage(
                dim=int(c.embed_dim * 2 ** i), depth=c.depths[i],
                num_heads=c.num_heads[i], window_size=eff_ws,
                shift_enabled=shift_enabled, mlp_ratio=c.mlp_ratio,
                qkv_bias=c.qkv_bias, qk_scale=c.qk_scale, drop=c.drop_rate,
                attn_drop=c.attn_drop_rate,
                drop_path=tuple(float(d) for d in dpr[lo:hi]),
                norm_eps=c.norm_eps, downsample=(i < nstages - 1),
                attention_impl=c.attention_impl,
                # Score storage only drops below fp32 under mixed-precision
                # compute (mirrors torch AMP, where fp16 scores exist only
                # inside autocast); fp32 compute stays end-to-end exact for
                # the golden parity suite.
                score_dtype=(jnp.dtype(c.score_dtype).type
                             if self.dtype == jnp.bfloat16 else jnp.float32),
                remat=getattr(c, "remat", "none"),
                fused_block=(i in getattr(c, "fused_block_stages", ())),
                fused_interpret=getattr(c, "fused_block_interpret", False),
                kernel_knobs=(c.stage_kernel_knobs(i)
                              if hasattr(c, "stage_kernel_knobs")
                              else (1, 2400, 2, 3, 32)),
                subwindow_opt=getattr(c, "subwindow_opt", True),
                subwindow_fused=(
                    i in (getattr(c, "subwindow_fused_stages", None)
                          if getattr(c, "subwindow_fused_stages", None)
                          is not None
                          else getattr(c, "fused_block_stages", ()))),
                subwindow_ratio=getattr(c, "subwindow_ratio",
                                        _SUBWIN_RATIO),
                dtype=self.dtype, name=f"layers_{i}",
            ))
        self.stages = stages
        self.norm = LayerNorm(c.norm_eps, self.dtype, name="norm_final")
        self.pos_drop = nn.Dropout(c.drop_rate)

    def _embed(self, x, deterministic):
        x = self.patch_embed(x)
        if self.cfg.ape:
            x = x + self.absolute_pos_embed.astype(x.dtype)
        return self.pos_drop(x, deterministic=deterministic)

    def __call__(self, x, deterministic: bool = True, bn_train: bool = False):
        return self.forward_features(x, deterministic)

    def forward_features(self, x, deterministic: bool = True,
                         bn_train: bool = False):
        del bn_train  # no BatchNorm in Swin
        x = self._embed(x, deterministic)
        for stage in self.stages:
            x, _ = stage(x, deterministic, layout_opt=self.cfg.layout_opt)
        region = self.norm(x)                                # (B, L, C)
        cls = jnp.mean(region, axis=1)                       # (B, C)
        return cls, region

    def forward_selfattention(self, x, n: int = 1, deterministic: bool = True):
        """n=1: last block's attention map; else all blocks' maps
        (ref: swin_transformer.py:766-796)."""
        x = self._embed(x, deterministic)
        attns = []
        for i, stage in enumerate(self.stages):
            last = i == len(self.stages) - 1
            want = (n != 1) or last
            x, aux = stage(x, deterministic,
                           capture="attention" if want else None)
            attns.extend(aux)
        return attns[-1] if n == 1 else attns

    def forward_return_n_last_blocks(self, x, n: int = 4,
                                     deterministic: bool = True):
        """Concat of avg-pooled features of the n last blocks across stages
        (ref: swin_transformer.py:799-837); final-stage features pass through
        the last norm."""
        depths = self.cfg.depths
        num_blks = sum(depths)
        start_idx = num_blks - n

        out = []
        blk_id = 0
        x = self._embed(x, deterministic)
        for i, stage in enumerate(self.stages):
            x, feats = stage(x, deterministic, capture="features")
            for f in feats:
                if blk_id >= start_idx:
                    if i == len(self.stages) - 1:
                        f = self.norm(f)
                    out.append(jnp.mean(f, axis=1))
                blk_id += 1
        return jnp.concatenate(out, axis=-1)


@register_backbone("swin")
def build_swin(cfg: SwinConfig, dtype=jnp.float32) -> SwinTransformer:
    return SwinTransformer(cfg, dtype=dtype)
