"""CvT-v4 backbone (ref: models/cvt_v4_transformer.py:434-707).

Multi-stage conv-vision-transformer: each stage is an overlapping strided
conv patch embed (ConvEmbed, ref :349-382) followed by transformer blocks
whose QKV projection is a depthwise-conv (k3 s1 p1) + BatchNorm + pointwise
conv (DepthWiseConv2d, ref :75-105), with windowed attention over the stage
grid. NHWC throughout; BatchNorm carries ``batch_stats`` and under pjit the
batch-stat reductions are global across the data mesh axis — SyncBN
semantics (main_esvit.py:367-372) for free.

Reference quirks replicated deliberately:
- attention scale is ``dim ** -0.5`` with the FULL embed dim, not the
  per-head dim (ref :126);
- QuickGELU (x * sigmoid(1.702 x), ref :44-46) and fp32 LayerNorm eps 1e-5;
- SHIFT adds the shifted-window mask but performs NO cyclic roll
  (Attention.forward never shifts, ref :165-220) — default configs have
  SHIFT off, and we reproduce the exact behavior either way.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu.config import CvTConfig, CvTStageConfig
from esvit_tpu.models.common import DropPath, LayerNorm, softmax_fp32, trunc_normal_init
from esvit_tpu.models.registry import register_backbone
from esvit_tpu.ops import window as wops

Dtype = Any


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class DepthWiseConvQKV(nn.Module):
    """depthwise conv -> BatchNorm -> pointwise conv (ref :75-105)."""

    dim_in: int
    dim_out: int
    kernel: int
    padding: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bn_train: bool):
        k, p = self.kernel, self.padding
        x = nn.Conv(self.dim_in, (k, k), strides=(1, 1),
                    padding=[(p, p), (p, p)], feature_group_count=self.dim_in,
                    use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=trunc_normal_init, name="dw")(x)
        x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="bn")(
            x.astype(jnp.float32)).astype(self.dtype)
        x = nn.Conv(self.dim_out, (1, 1), use_bias=self.use_bias,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=trunc_normal_init, name="pw")(x)
        return x


class CvTAttention(nn.Module):
    """Windowed attention with conv QKV (ref :108-220)."""

    dim: int
    num_heads: int
    qkv_bias: bool
    kernel_qkv: int
    padding_qkv: int
    window_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask: Optional[np.ndarray], bn_train: bool):
        B, H, W, C = x.shape
        h = self.num_heads
        hd = self.dim // h
        # Reference quirk: scale by full dim, not head dim (ref :126).
        scale = self.dim ** -0.5
        w = min(self.window_size, min(H, W))

        qkv = DepthWiseConvQKV(C, self.dim * 3, self.kernel_qkv,
                               self.padding_qkv, self.qkv_bias, self.dtype,
                               name="qkv")(x, bn_train)

        Hp, Wp = wops.pad_to_window_multiple(H, W, w)
        if (Hp, Wp) != (H, W):
            qkv = jnp.pad(qkv, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))

        # (B, Hp, Wp, 3*dim) -> windows (B*nW, w*w, 3*dim) -> q,k,v heads
        win = wops.window_partition(qkv, w)                # (B*nW, w*w, 3dim)
        Bw, N, _ = win.shape
        win = win.reshape(Bw, N, 3, h, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = win[0], win[1], win[2]                   # (Bw, h, N, hd)

        dots = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        if mask is not None:
            nW = mask.shape[0]
            m = jnp.asarray(mask, jnp.float32)
            dots = dots.reshape(Bw // nW, nW, h, N, N) + m[None, :, None]
            dots = dots.reshape(Bw, h, N, N)
        probs = softmax_fp32(dots, out_dtype=self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(Bw, N, self.dim)
        out = wops.window_reverse(out, w, Hp, Wp)
        if (Hp, Wp) != (H, W):
            out = out[:, :H, :W, :]
        out = nn.Conv(C, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=trunc_normal_init, name="proj_out")(out)
        return out


class CvTBlock(nn.Module):
    """PreNorm(attn) + PreNorm(ff) with shared DropPath (ref :262-286,
    :331-336: x = drop_path(attn(norm(x))) + x, then ff)."""

    stage: CvTStageConfig
    drop_path: float
    norm_eps: float
    shift_this_block: bool
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool, bn_train: bool):
        B, H, W, C = x.shape
        st = self.stage
        mask = None
        if self.shift_this_block and st.window_size > 0:
            # Reference builds the mask from the STAGE window size even when
            # the effective window shrinks (build_attn_mask, ref :291-329).
            ss = st.window_size // 2
            if 0 < ss < min(H, W):
                mask = wops.shifted_window_mask(H, W, st.window_size, ss)

        dp = DropPath(self.drop_path, name="drop_path")
        y = LayerNorm(self.norm_eps, self.dtype, name="norm_attn")(x)
        y = CvTAttention(st.embed_dim, st.num_heads, st.qkv_bias,
                         st.kernel_qkv, st.padding_qkv, st.window_size,
                         self.dtype, name="attn")(y, mask, bn_train)
        x = dp(y, deterministic) + x
        y = LayerNorm(self.norm_eps, self.dtype, name="norm_ff")(x)
        y = nn.Conv(int(C * st.mlp_ratio), (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=trunc_normal_init,
                    name="ff_1")(y)
        y = quick_gelu(y)
        y = nn.Conv(C, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=trunc_normal_init, name="ff_2")(y)
        x = dp(y, deterministic) + x
        return x


class ConvEmbed(nn.Module):
    """Overlapping strided conv patch embed + LN (ref :349-382)."""

    patch_size: int
    stride: int
    padding: int
    embed_dim: int
    norm_eps: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, s, p = self.patch_size, self.stride, self.padding
        x = nn.Conv(self.embed_dim, (k, k), strides=(s, s),
                    padding=[(p, p), (p, p)], dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=trunc_normal_init,
                    name="proj")(x)
        x = LayerNorm(self.norm_eps, self.dtype, name="norm")(x)
        return x


class CvT(nn.Module):
    cfg: CvTConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        total_depth = sum(s.depth for s in c.stages)
        dpr = np.linspace(0, c.stages[0].drop_path_rate, total_depth)
        embeds, stages = [], []
        acc = 0
        for i, st in enumerate(c.stages):
            embeds.append(ConvEmbed(st.patch_size, st.patch_stride,
                                    st.patch_padding, st.embed_dim,
                                    c.norm_eps, self.dtype,
                                    name=f"embed_{i}"))
            blocks = [
                CvTBlock(st, float(dpr[acc + j]), c.norm_eps,
                         shift_this_block=(st.shift and j % 2 == 1),
                         dtype=self.dtype, name=f"stage{i}_block{j}")
                for j in range(st.depth)
            ]
            stages.append(blocks)
            acc += st.depth
        self.embeds = embeds
        self.blocks_per_stage = stages
        self.norm = LayerNorm(c.norm_eps, self.dtype, name="norm_final")

    def _run(self, x, deterministic, bn_train, capture: bool = False):
        feats = []
        for embed, blocks in zip(self.embeds, self.blocks_per_stage):
            x = embed(x)
            for blk in blocks:
                x = blk(x, deterministic, bn_train)
                if capture:
                    feats.append(x)
        return x, feats

    def __call__(self, x, deterministic: bool = True, bn_train: bool = False):
        return self.forward_features(x, deterministic, bn_train)

    def forward_features(self, x, deterministic: bool = True,
                         bn_train: bool = False):
        x, _ = self._run(x, deterministic, bn_train)
        B, H, W, C = x.shape
        region = self.norm(x.reshape(B, H * W, C))        # (B, L, C)
        cls = jnp.mean(region, axis=1)
        return cls, region

    def forward_return_n_last_blocks(self, x, n: int = 4,
                                     deterministic: bool = True,
                                     bn_train: bool = False):
        depths = [s.depth for s in self.cfg.stages]
        start_idx = sum(depths) - n
        x, feats = self._run(x, deterministic, bn_train, capture=True)
        out = []
        for i, f in enumerate(feats):
            if i >= start_idx:
                if i >= sum(depths[:-1]):                  # final stage: norm
                    B, H, W, C = f.shape
                    f = self.norm(f.reshape(B, H * W, C))
                    out.append(jnp.mean(f, axis=1))
                else:
                    out.append(jnp.mean(f, axis=(1, 2)))
        return jnp.concatenate(out, axis=-1)


@register_backbone("cvt")
def build_cvt(cfg: CvTConfig, dtype=jnp.float32) -> CvT:
    return CvT(cfg, dtype=dtype)
