"""DINO projection head (ref: models/vision_transformer.py:384-418).

3-layer MLP (hidden 2048, exact GELU) -> bottleneck 256 -> L2 normalize ->
weight-normalized linear to out_dim (65536). Weight-norm parameterization
matches ``torch.nn.utils.weight_norm`` on a ``Linear(bottleneck, out)`` with
default ``dim=0``: each *output row* w_j = g_j * v_j / ||v_j||_2. Our kernel
is stored (in, out), so v_j is column j and the norm is over axis 0. When
``norm_last_layer``, g is pinned to 1 and excluded from gradients
(vision_transformer.py:404-406), implemented with stop_gradient.

The head exposes its two halves separately for the K-streamed loss
(losses.ddino_loss_streamed): ``bottleneck`` returns the L2-normalized
bottleneck features and ``last_weight`` the effective (in, out) matrix of
the weight-norm layer, so the (rows, 65536) logits need never be
materialized in HBM — the loss contracts them chunk by chunk.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from esvit_tpu.config import HeadConfig
from esvit_tpu.models.common import dense, trunc_normal_init

Dtype = Any


class WeightNormDense(nn.Module):
    """x @ (g * v / ||v||) with column-wise normalization, no bias."""

    features: int
    norm_last_layer: bool = True
    dtype: Dtype = jnp.float32
    in_features: int | None = None

    def setup(self):
        assert self.in_features is not None, "in_features is required"
        self.kernel_v = self.param("kernel_v", trunc_normal_init,
                                   (self.in_features, self.features),
                                   jnp.float32)
        self.scale_g = self.param("scale_g", nn.initializers.ones,
                                  (self.features,), jnp.float32)

    def weight(self):
        """Effective (in, out) matrix in the compute dtype."""
        g = self.scale_g
        if self.norm_last_layer:
            g = jax.lax.stop_gradient(g)
        norm = jnp.linalg.norm(self.kernel_v, axis=0, keepdims=True)  # fp32
        return (g[None, :] * self.kernel_v / (norm + 1e-12)).astype(self.dtype)

    def __call__(self, x):
        return x.astype(self.dtype) @ self.weight()


class DINOHead(nn.Module):
    cfg: HeadConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        c = self.cfg
        nlayers = max(c.nlayers, 1)
        mlps, bns = [], []
        if nlayers == 1:
            mlps.append(dense(c.bottleneck_dim, dtype=self.dtype,
                              name="mlp_0"))
        else:
            mlps.append(dense(c.hidden_dim, dtype=self.dtype, name="mlp_0"))
            if c.use_bn:
                bns.append(nn.BatchNorm(axis_name=None, dtype=jnp.float32,
                                        name="bn_0"))
            for i in range(nlayers - 2):
                mlps.append(dense(c.hidden_dim, dtype=self.dtype,
                                  name=f"mlp_{i + 1}"))
                if c.use_bn:
                    bns.append(nn.BatchNorm(axis_name=None,
                                            dtype=jnp.float32,
                                            name=f"bn_{i + 1}"))
            mlps.append(dense(c.bottleneck_dim, dtype=self.dtype,
                              name=f"mlp_{nlayers - 1}"))
        self.mlps = mlps
        self.bns = bns
        self.last_layer = WeightNormDense(
            c.out_dim, norm_last_layer=c.norm_last_layer, dtype=self.dtype,
            in_features=c.bottleneck_dim, name="last_layer")

    def bottleneck(self, x, deterministic: bool = True):
        """MLP + L2 normalize — everything before the weight-norm linear."""
        c = self.cfg
        nlayers = max(c.nlayers, 1)
        if nlayers == 1:
            x = self.mlps[0](x)
        else:
            for i, mlp in enumerate(self.mlps[:-1]):
                x = mlp(x)
                if c.use_bn:
                    x = self.bns[i](x, use_running_average=deterministic)
                x = jax.nn.gelu(x, approximate=False)
            x = self.mlps[-1](x)
        # L2-normalize in fp32 for stability (ref: F.normalize, eps 1e-12).
        x32 = x.astype(jnp.float32)
        x = x32 / jnp.maximum(jnp.linalg.norm(x32, axis=-1, keepdims=True),
                              1e-12)
        return x.astype(self.dtype)

    def last_weight(self):
        """Effective (bottleneck, out_dim) last-layer matrix."""
        return self.last_layer.weight()

    def __call__(self, x, deterministic: bool = True):
        return self.last_layer(self.bottleneck(x, deterministic))
