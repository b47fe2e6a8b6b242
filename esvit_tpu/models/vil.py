"""Vision Longformer / MsViT backbone (ref: models/vision_longformer.py).

Multi-stage ViT configured by the reference arch string
``'l1,h3,d96,n2,s1,g1,p4,f7,a1_l2,...'`` (parsed at ref :474-482; our
``ViLConfig``/``parse_vil_arch`` mirror it): per stage a PatchEmbed with
optional global CLS tokens and factorized x/y absolute pos-embeds
(ref :191-274), then alternating AttnBlock / MlpBlock pairs (ref :295-403).
Attention type per stage: sliding-chunk longformer when ``s=1``
(Long2DSCAttention), full attention when ``s=0``; model-level
``attn_type`` can instead select performer / linformer / srformer for every
sparse stage (ref :309-359).

forward_features (ref :581-605): stages chain through (tokens, nx, ny),
stripping global tokens between stages; final LN; cls = global token 0 when
the last stage has one, else mean-pool.

Neighbor-mode sampling: by default ``mode`` is static per net per step
(host-sampled, jit caches the 8 variants) — the same unbiased neighbor
distribution as the reference without 8^depth compile variants. With
``ViLConfig.per_layer_mode`` (pass ``mode=PER_LAYER_MODE`` + an rng stream
'vil_mode'), every layer draws independently per forward exactly like the
reference (longformer2d.py:151), via a traced lax.switch.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu.config import ViLConfig, ViLStageConfig
from esvit_tpu.models.common import (DropPath, LayerNorm, Mlp, dense,
                                     softmax_fp32, trunc_normal_init)
from esvit_tpu.models.registry import register_backbone
from esvit_tpu.models.vil_layers import (LinformerAttention, Long2DSCAttention,
                                         PerformerAttention, SRAttention)

Dtype = Any

# Sentinel mode value requesting a per-layer traced neighbor draw.
PER_LAYER_MODE = 9


def parse_vil_arch(arch: str) -> tuple[ViLStageConfig, ...]:
    """'l1,h3,d96,n2,s1,g1,p4,f7,a1_l2,...' -> stage configs (ref :474-482)."""
    stages = []
    for layer in arch.split("_"):
        cfg = {"l": 1, "h": 3, "d": 192, "n": 1, "s": 1, "g": 1,
               "p": 2, "f": 7, "a": 1, "r": 0}
        for attr in layer.split(","):
            cfg[attr[0]] = int(attr[1:])
        stages.append(ViLStageConfig(
            num_heads=cfg["h"], embed_dim=cfg["d"], depth=cfg["n"],
            is_sparse=bool(cfg["s"]), num_global=cfg["g"],
            patch_size=cfg["p"], window_size=cfg["f"], ape=bool(cfg["a"])))
    return tuple(stages)


class ViLPatchEmbed(nn.Module):
    """Patch embed + global CLS tokens + factorized x/y APE (ref :191-274)."""

    stage: ViLStageConfig
    nx: int                     # construction-time grid (for APE params)
    ny: int
    norm_embed: bool
    norm_eps: float
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        st = self.stage
        p = st.patch_size
        x = nn.Conv(st.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=trunc_normal_init, name="proj")(x)
        B, nx, ny, C = x.shape
        x = x.reshape(B, nx * ny, C)
        if self.norm_embed:
            x = LayerNorm(self.norm_eps, self.dtype, name="norm_embed")(x)

        if st.num_global >= 1:
            cls = self.param("cls_token", trunc_normal_init,
                             (1, st.num_global, st.embed_dim), jnp.float32)
            x = jnp.concatenate(
                [jnp.broadcast_to(cls.astype(x.dtype),
                                  (B, st.num_global, C)), x], axis=1)

        if st.ape:
            cls_pe = self.param("cls_pos_embed", trunc_normal_init,
                                (1, st.num_global, st.embed_dim), jnp.float32)
            x_pe = self.param("x_pos_embed", trunc_normal_init,
                              (1, self.nx, st.embed_dim // 2), jnp.float32)
            y_pe = self.param("y_pos_embed", trunc_normal_init,
                              (1, self.ny, st.embed_dim // 2), jnp.float32)
            pe2d = jnp.concatenate([
                jnp.broadcast_to(x_pe[:, :, None, :],
                                 (1, self.nx, self.ny, st.embed_dim // 2)),
                jnp.broadcast_to(y_pe[:, None, :, :],
                                 (1, self.nx, self.ny, st.embed_dim // 2)),
            ], axis=-1).reshape(1, self.nx * self.ny, st.embed_dim)
            # Reference quirk (vision_longformer.py:261-274): the resample
            # trigger/scale counts the GLOBAL tokens — sqrt((Nglo+nx*ny)/N) —
            # so with nglo >= 1 the APE is bicubic-resampled even at the
            # native grid. Replicated exactly (torch kernel + scale).
            from esvit_tpu.ops.resample import torch_interpolate_scale

            npatch_incl = st.num_global + nx * ny
            N0 = self.nx * self.ny
            if npatch_incl != N0:
                import math as _math

                scale = _math.sqrt(npatch_incl / N0)
                grid = pe2d.reshape(1, self.nx, self.ny, st.embed_dim)
                grid = torch_interpolate_scale(grid, scale)
                pe2d = grid.reshape(1, -1, st.embed_dim)
            assert pe2d.shape[1] == nx * ny, (
                f"APE resample produced {pe2d.shape[1]} tokens for a "
                f"{nx}x{ny} grid")
            pe = jnp.concatenate([cls_pe, pe2d], axis=1).astype(x.dtype)
            x = x + pe
        x = nn.Dropout(self.drop_rate)(x, deterministic=deterministic)
        return x, nx, ny


class ViLFullAttention(nn.Module):
    """Vanilla MHA with max-subtracted softmax (ref :38-131; rpe variant
    supported at the native grid only — the canonical EsViT ViL configs use
    APE, not rpe)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    rpe: bool = False
    wx: int = 14
    wy: int = 14
    nglo: int = 1
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nx: int, ny: int, deterministic: bool = True):
        B, N, C = x.shape
        H = self.num_heads
        M = C // H
        scale = self.qk_scale or M ** -0.5
        qkv = dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                    name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, H, M).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)
        if self.rpe:
            from esvit_tpu.ops.window import relative_position_index

            table = self.param("local_relative_position_bias_table",
                               trunc_normal_init,
                               ((2 * self.wx - 1) * (2 * self.wy - 1), H),
                               jnp.float32)
            nglo = self.nglo
            assert N - nglo == self.wx * self.wy, (
                "ViL full-attention rpe only supports the native grid")
            idx = relative_position_index(self.wx, self.wy)
            bias = table[idx.reshape(-1)].reshape(self.wx * self.wy,
                                                  self.wx * self.wy, H)
            bias = bias.transpose(2, 0, 1)
            if nglo > 0:
                g2l = self.param("g2l_relative_position_bias",
                                 trunc_normal_init, (2, H, nglo), jnp.float32)
                g2g = self.param("g2g_relative_position_bias",
                                 trunc_normal_init, (H, nglo, nglo), jnp.float32)
                nloc = N - nglo
                top = jnp.concatenate(
                    [g2g, jnp.broadcast_to(g2l[0][:, :, None], (H, nglo, nloc))],
                    axis=-1)
                bottom = jnp.concatenate(
                    [jnp.broadcast_to(g2l[1][:, None, :], (H, nloc, nglo)),
                     bias], axis=-1)
                bias = jnp.concatenate([top, bottom], axis=1)
            attn = attn + bias[None]
        probs = softmax_fp32(attn - jnp.max(attn, -1, keepdims=True))
        probs = nn.Dropout(self.attn_drop)(probs, deterministic=deterministic)
        out = jnp.einsum("bhnm,bhmd->bhnd", probs.astype(self.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, C)
        out = dense(C, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class ViLAttnBlock(nn.Module):
    """norm -> attention -> droppath residual (ref :295-379)."""

    stage: ViLStageConfig
    model_cfg: ViLConfig
    seq_len: int
    drop_path: float
    nx: int
    ny: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, nx, ny, deterministic: bool = True, mode: int = 0):
        st, mc = self.stage, self.model_cfg
        y = LayerNorm(mc.norm_eps, self.dtype, name="norm")(x)
        common = dict(qkv_bias=mc.qkv_bias, attn_drop=mc.attn_drop_rate,
                      proj_drop=mc.drop_rate, dtype=self.dtype)
        if not st.is_sparse:
            y = ViLFullAttention(st.embed_dim, st.num_heads, rpe=not st.ape,
                                 wx=self.nx, wy=self.ny, nglo=st.num_global,
                                 name="attn", **common)(y, nx, ny, deterministic)
        elif mc.attn_type in ("longformer", "longformerhand", "longformerauto"):
            attn = Long2DSCAttention(st.embed_dim, st.num_heads,
                                     window=st.window_size, nglo=st.num_global,
                                     rpe=not st.ape, fused_sc=mc.fused_sc,
                                     name="attn", **common)
            if mode == PER_LAYER_MODE:
                # Reference semantics (longformer2d.py:151): every layer
                # draws its own neighbor chunk each forward. The draw is
                # traced (lax.switch over the 8 static variants), so one
                # compilation covers all layer/mode combinations.
                idx = jax.random.randint(self.make_rng("vil_mode"), (), 0, 8)
                branches = [
                    (lambda m: lambda mdl, t: mdl(t, nx, ny, deterministic,
                                                  mode=m))(m)
                    for m in range(1, 9)]
                y = nn.switch(idx, branches, attn, y)
            else:
                y = attn(y, nx, ny, deterministic, mode=mode)
        elif mc.attn_type == "performer":
            y = PerformerAttention(st.embed_dim, st.num_heads,
                                   nb_features=st.window_size * st.window_size,
                                   name="attn", **common)(y, nx, ny, deterministic)
        elif mc.attn_type == "linformer":
            y = LinformerAttention(st.embed_dim, self.seq_len,
                                   num_feats=256, num_heads=st.num_heads,
                                   name="attn", **common)(y, nx, ny, deterministic)
        elif mc.attn_type == "srformer":
            y = SRAttention(st.embed_dim, rratio=2, num_heads=st.num_heads,
                            name="attn", **common)(y, nx, ny, deterministic)
        else:
            raise ValueError(f"unknown attn_type {mc.attn_type!r}")
        return x + DropPath(self.drop_path, name="drop_path")(y, deterministic)


class ViLMlpBlock(nn.Module):
    dim: int
    mlp_ratio: float
    drop: float
    drop_path: float
    norm_eps: float
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        y = LayerNorm(self.norm_eps, self.dtype, name="norm")(x)
        y = Mlp(int(self.dim * self.mlp_ratio), drop=self.drop,
                dtype=self.dtype, name="mlp")(y, deterministic)
        return x + DropPath(self.drop_path, name="drop_path")(y, deterministic)


class MsViT(nn.Module):
    cfg: ViLConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        total_depth = sum(s.depth for s in c.stages)
        dpr = np.linspace(0, c.drop_path_rate, total_depth)
        res = c.img_size
        embeds, attns, mlps = [], [], []
        acc = 0
        for i, st in enumerate(c.stages):
            res = res // st.patch_size
            seq_len = res * res + st.num_global
            embeds.append(ViLPatchEmbed(
                st, res, res, norm_embed=True, norm_eps=c.norm_eps,
                drop_rate=c.drop_rate, dtype=self.dtype, name=f"embed_{i}"))
            a_blocks, m_blocks = [], []
            for j in range(st.depth):
                a_blocks.append(ViLAttnBlock(
                    st, c, seq_len, float(dpr[acc + j]), res, res,
                    dtype=self.dtype, name=f"stage{i}_attn{j}"))
                m_blocks.append(ViLMlpBlock(
                    st.embed_dim, c.mlp_ratio, c.drop_rate,
                    float(dpr[acc + j]), c.norm_eps, dtype=self.dtype,
                    name=f"stage{i}_mlp{j}"))
            attns.append(a_blocks)
            mlps.append(m_blocks)
            acc += st.depth
        self.embeds = embeds
        self.attn_blocks = attns
        self.mlp_blocks = mlps
        self.norm = LayerNorm(c.norm_eps, self.dtype, name="norm_final")

    def _run(self, x, deterministic, mode: int = 0, capture: bool = False):
        feats = []
        nx = ny = None
        for i, st in enumerate(self.cfg.stages):
            if i > 0:
                # strip previous stage's global tokens, back to a grid
                prev_g = self.cfg.stages[i - 1].num_global
                B = x.shape[0]
                x = x[:, prev_g:].reshape(B, nx, ny, -1)
            x, nx, ny = self.embeds[i](x, deterministic)
            for a, m in zip(self.attn_blocks[i], self.mlp_blocks[i]):
                x = a(x, nx, ny, deterministic, mode=mode)
                x = m(x, deterministic)
                if capture:
                    feats.append((x, nx, ny))
        return x, nx, ny, feats

    def __call__(self, x, deterministic: bool = True, bn_train: bool = False,
                 mode: int = 0):
        return self.forward_features(x, deterministic, mode=mode)

    def forward_features(self, x, deterministic: bool = True,
                         bn_train: bool = False, mode: int = 0):
        del bn_train
        x, nx, ny, _ = self._run(x, deterministic, mode)
        x = self.norm(x)
        last_g = self.cfg.stages[-1].num_global
        if last_g > 0:
            return x[:, 0], x[:, last_g:]
        return jnp.mean(x, axis=1), x

    def forward_return_n_last_blocks(self, x, n: int = 4,
                                     deterministic: bool = True):
        depths = [s.depth for s in self.cfg.stages]
        start_idx = sum(depths) - n
        x, nx, ny, feats = self._run(x, deterministic, capture=True)
        out = []
        for i, (f, _, _) in enumerate(feats):
            if i >= start_idx:
                if i >= sum(depths) - depths[-1]:
                    f = self.norm(f)
                out.append(jnp.mean(f, axis=1))
        return jnp.concatenate(out, axis=-1)


@register_backbone("vil")
def build_vil(cfg: ViLConfig, dtype=jnp.float32) -> MsViT:
    return MsViT(cfg, dtype=dtype)
