"""DINO projection head (ref: models/vision_transformer.py:384-418).

3-layer MLP (hidden 2048, exact GELU) -> bottleneck 256 -> L2 normalize ->
weight-normalized linear to out_dim (65536). Weight-norm parameterization
matches ``torch.nn.utils.weight_norm`` on a ``Linear(bottleneck, out)`` with
default ``dim=0``: each *output row* w_j = g_j * v_j / ||v_j||_2. Our kernel
is stored (in, out), so v_j is column j and the norm is over axis 0. When
``norm_last_layer``, g is pinned to 1 and excluded from gradients
(vision_transformer.py:404-406), implemented with stop_gradient.
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

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        v = self.param("kernel_v", trunc_normal_init, (in_dim, self.features),
                       jnp.float32)
        g = self.param("scale_g", nn.initializers.ones, (self.features,),
                       jnp.float32)
        if self.norm_last_layer:
            g = jax.lax.stop_gradient(g)
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)     # (1, out) fp32
        w = (g[None, :] * v / (norm + 1e-12)).astype(self.dtype)
        return x.astype(self.dtype) @ w


class DINOHead(nn.Module):
    cfg: HeadConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        c = self.cfg
        nlayers = max(c.nlayers, 1)
        if nlayers == 1:
            x = dense(c.bottleneck_dim, dtype=self.dtype, name="mlp_0")(x)
        else:
            x = dense(c.hidden_dim, dtype=self.dtype, name="mlp_0")(x)
            if c.use_bn:
                x = nn.BatchNorm(use_running_average=deterministic,
                                 axis_name=None, dtype=jnp.float32,
                                 name="bn_0")(x)
            x = jax.nn.gelu(x, approximate=False)
            for i in range(nlayers - 2):
                x = dense(c.hidden_dim, dtype=self.dtype, name=f"mlp_{i + 1}")(x)
                if c.use_bn:
                    x = nn.BatchNorm(use_running_average=deterministic,
                                     axis_name=None, dtype=jnp.float32,
                                     name=f"bn_{i + 1}")(x)
                x = jax.nn.gelu(x, approximate=False)
            x = dense(c.bottleneck_dim, dtype=self.dtype, name=f"mlp_{nlayers - 1}")(x)

        # L2-normalize in fp32 for stability (ref: F.normalize, eps 1e-12).
        x32 = x.astype(jnp.float32)
        x = x32 / jnp.maximum(jnp.linalg.norm(x32, axis=-1, keepdims=True), 1e-12)
        x = WeightNormDense(c.out_dim, norm_last_layer=c.norm_last_layer,
                            dtype=self.dtype, name="last_layer")(x.astype(self.dtype))
        return x
