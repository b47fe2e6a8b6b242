"""Tokens-to-Token (T2T) encoding module (ref: layers/t2t.py).

Used by the reference's ``experiments/imagenet/vit/deit/t2t`` configs —
never by the EsViT main path (SURVEY.md §2.3). Canonical 'transformer'
tokens-type: unfold(7,s4,p2) -> TokenTransformer -> unfold(3,s2,p1) ->
TokenTransformer -> unfold(3,s2,p1) -> linear projection.

Reference quirk worth knowing: the snapshot's standard (non-axial)
``Token_transformer.forward`` contains a leftover debug
``print(x); sys.exit(-1)`` (t2t.py:174-176), so the canonical path cannot
execute there at all; the T2T ``Attention`` submodule (with its v-residual
skip, :30-65, including the upstream head_dim bug fix noted at :35-39) is
intact and is golden-tested here.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from esvit_tpu.models.common import (DropPath, LayerNorm, Mlp, dense,
                                     softmax_fp32)

Dtype = Any


def unfold(x: jnp.ndarray, kernel: int, stride: int, padding: int
           ) -> jnp.ndarray:
    """torch.nn.Unfold equivalent: (B, H, W, C) NHWC -> (B, L, C*k*k) with
    torch's channel-major patch ordering (c, kh, kw)."""
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    oh = (H + 2 * padding - kernel) // stride + 1
    ow = (W + 2 * padding - kernel) // stride + 1
    # gather patches: (B, oh, ow, k, k, C)
    idx_h = (jnp.arange(oh) * stride)[:, None] + jnp.arange(kernel)[None, :]
    idx_w = (jnp.arange(ow) * stride)[:, None] + jnp.arange(kernel)[None, :]
    p = xp[:, idx_h][:, :, :, idx_w]          # (B, oh, k, ow, k, C)
    p = p.transpose(0, 1, 3, 5, 2, 4)         # (B, oh, ow, C, k, k)
    return p.reshape(B, oh * ow, C * kernel * kernel)


class T2TAttention(nn.Module):
    """T2T attention with the v-residual skip (ref t2t.py:30-65)."""

    dim: int
    in_dim: int
    num_heads: int = 1
    qkv_bias: bool = False
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        # The reference reshape (t2t.py:50: each "head" carries the FULL
        # in_dim) and its v.squeeze(1) skip are only consistent for
        # num_heads == 1, which is the T2T default and the only value the
        # experiments use.
        assert self.num_heads == 1, "T2TAttention supports num_heads=1"
        B, N, C = x.shape
        scale = self.qk_scale or self.in_dim ** -0.5

        qkv = dense(3 * self.in_dim, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.in_dim).transpose(2, 0, 1, 3)
        q, k, v = qkv[0], qkv[1], qkv[2]                # (B, N, in_dim)

        attn = jnp.einsum("bnd,bmd->bnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        probs = softmax_fp32(attn)
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum("bnm,bmd->bnd", probs.astype(self.dtype), v)
        out = dense(self.in_dim, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        # v-based skip connection (input dim differs from output dim)
        return v + out


class TokenTransformer(nn.Module):
    """norm -> T2TAttention -> +mlp (ref Token_transformer, standard path
    minus the debug exit)."""

    dim: int
    in_dim: int
    num_heads: int = 1
    mlp_ratio: float = 1.0
    norm_eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LayerNorm(self.norm_eps, self.dtype, name="norm1")(x)
        x = T2TAttention(self.dim, self.in_dim, self.num_heads,
                         dtype=self.dtype, name="attn")(y, deterministic)
        y = LayerNorm(self.norm_eps, self.dtype, name="norm2")(x)
        y = Mlp(int(self.in_dim * self.mlp_ratio), out_dim=self.in_dim,
                dtype=self.dtype, name="mlp")(y, deterministic)
        return x + DropPath(0.0, name="drop_path")(y, deterministic)


class T2TModule(nn.Module):
    """'transformer' tokens-type T2T encoding (ref T2T_module + its
    forward_transformer, :188-215, :310-335)."""

    embed_dim: int = 768
    token_dim: int = 64
    num_heads: int = 1
    mlp_ratio: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        """x: (B, H, W, 3) NHWC -> (B, (H/16)*(W/16), embed_dim)."""
        import math

        B = x.shape[0]
        x = unfold(x, 7, 4, 2)                          # (B, L0, 147)
        x = TokenTransformer(x.shape[-1], self.token_dim, self.num_heads,
                             self.mlp_ratio, dtype=self.dtype,
                             name="attention1")(x, deterministic)
        s = int(math.isqrt(x.shape[1]))
        x = unfold(x.reshape(B, s, s, -1), 3, 2, 1)     # (B, L1, 9*td)
        x = TokenTransformer(x.shape[-1], self.token_dim, self.num_heads,
                             self.mlp_ratio, dtype=self.dtype,
                             name="attention2")(x, deterministic)
        s = int(math.isqrt(x.shape[1]))
        x = unfold(x.reshape(B, s, s, -1), 3, 2, 1)     # (B, L2, 9*td)
        return dense(self.embed_dim, dtype=self.dtype, name="project")(x)
