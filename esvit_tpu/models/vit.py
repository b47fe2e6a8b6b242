"""Monolithic ViT/DeiT backbone (ref: models/vision_transformer.py:124-381).

CLS token + learned pos-embed (bicubic-interpolated for non-native crop
sizes, ref :271-285 — here via jax.image.resize, static shapes so the resize
is compiled per resolution). ``forward_features`` returns
``(cls_token, patch_tokens)`` — the EsViT dense contract (ref :248-251).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu.config import ViTConfig
from esvit_tpu.models.common import (DropPath, LayerNorm, Mlp, dense,
                                     softmax_fp32, trunc_normal_init)
from esvit_tpu.models.registry import register_backbone

Dtype = Any


class Attention(nn.Module):
    """Full MHA (ref: vision_transformer.py:71-95)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, N, C = x.shape
        nH = self.num_heads
        hd = C // nH
        scale = self.qk_scale or hd ** -0.5
        qkv = dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, nH, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        probs = softmax_fp32(attn)
        probs_c = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs_c.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = dense(C, dtype=self.dtype, name="proj")(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out, probs


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    norm_eps: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y, attn = Attention(self.dim, self.num_heads, self.qkv_bias,
                            self.qk_scale, self.attn_drop, self.drop,
                            self.dtype, name="attn")(
            LayerNorm(self.norm_eps, self.dtype, name="norm1")(x), deterministic)
        dp = DropPath(self.drop_path, name="drop_path")
        x = x + dp(y, deterministic)
        y = Mlp(int(self.dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
                name="mlp")(LayerNorm(self.norm_eps, self.dtype, name="norm2")(x),
                            deterministic)
        x = x + dp(y, deterministic)
        return x, attn


class VisionTransformer(nn.Module):
    cfg: ViTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.cls_token = self.param("cls_token", trunc_normal_init,
                                    (1, 1, c.embed_dim), jnp.float32)
        n = (c.img_size // c.patch_size) ** 2
        self.pos_embed = self.param("pos_embed", trunc_normal_init,
                                    (1, n + 1, c.embed_dim), jnp.float32)
        dpr = np.linspace(0, c.drop_path_rate, c.depth)
        self.blocks = [
            Block(c.embed_dim, c.num_heads, c.mlp_ratio, c.qkv_bias, c.qk_scale,
                  c.drop_rate, c.attn_drop_rate, float(dpr[i]), c.norm_eps,
                  self.dtype, name=f"blocks_{i}")
            for i in range(c.depth)
        ]
        self.norm = LayerNorm(c.norm_eps, self.dtype, name="norm_final")
        self.pos_drop = nn.Dropout(c.drop_rate)
        self.patch_proj = nn.Conv(c.embed_dim, (c.patch_size, c.patch_size),
                                  strides=(c.patch_size, c.patch_size),
                                  padding="VALID", dtype=self.dtype,
                                  param_dtype=jnp.float32,
                                  kernel_init=trunc_normal_init,
                                  name="patch_embed")

    def _patchify(self, x):
        x = self.patch_proj(x)
        B, Hp, Wp, C = x.shape
        return x.reshape(B, Hp * Wp, C)

    def _pos_embed_for(self, npatch: int):
        """Bicubic interpolation of the patch-grid pos-embed when the crop
        resolution differs from the native one (ref :271-285), using torch's
        interpolate semantics (scale_factor sqrt(npatch/N), A=-0.75 kernel)
        for checkpoint parity."""
        from esvit_tpu.ops.resample import torch_interpolate_scale

        pe = self.pos_embed
        n = pe.shape[1] - 1
        if npatch == n:
            return pe
        cls_pe, patch_pe = pe[:, :1], pe[:, 1:]
        s_old = int(math.isqrt(n))
        grid = patch_pe.reshape(1, s_old, s_old, -1)
        grid = torch_interpolate_scale(grid, math.sqrt(npatch / n))
        flat = grid.reshape(1, -1, grid.shape[-1])
        assert flat.shape[1] == npatch
        return jnp.concatenate([cls_pe, flat], axis=1)

    def _embed(self, x, deterministic):
        B = x.shape[0]
        x = self._patchify(x)
        cls = jnp.broadcast_to(self.cls_token.astype(x.dtype),
                               (B, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
        x = x + self._pos_embed_for(x.shape[1] - 1).astype(x.dtype)
        return self.pos_drop(x, deterministic=deterministic)

    def __call__(self, x, deterministic: bool = True, bn_train: bool = False):
        return self.forward_features(x, deterministic)

    def forward_features(self, x, deterministic: bool = True,
                         bn_train: bool = False):
        del bn_train  # no BatchNorm in ViT
        x = self._embed(x, deterministic)
        for blk in self.blocks:
            x, _ = blk(x, deterministic)
        x = self.norm(x)
        return x[:, 0], x[:, 1:]

    def forward_selfattention(self, x, n: int = 1, deterministic: bool = True):
        x = self._embed(x, deterministic)
        attns = []
        for blk in self.blocks:
            x, attn = blk(x, deterministic)
            attns.append(attn)
        return attns[-1] if n == 1 else attns

    def forward_return_n_last_blocks(self, x, n: int = 4,
                                     avgpool: bool = False,
                                     deterministic: bool = True):
        """Concat CLS of the n last blocks; optionally also the avg-pooled
        patch tokens of the last block (ref :339-360)."""
        x = self._embed(x, deterministic)
        out = []
        depth = len(self.blocks)
        for i, blk in enumerate(self.blocks):
            x, _ = blk(x, deterministic)
            if i >= depth - n:
                out.append(self.norm(x)[:, 0])
        if avgpool:
            out.append(jnp.mean(self.norm(x)[:, 1:], axis=1))
        return jnp.concatenate(out, axis=-1)


@register_backbone("vit")
def build_vit(cfg: ViTConfig, dtype=jnp.float32) -> VisionTransformer:
    return VisionTransformer(cfg, dtype=dtype)
