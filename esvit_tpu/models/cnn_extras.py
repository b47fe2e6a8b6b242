"""CNN helper vocabulary (ref: layers/{se_layer,dropblock,dy_relu,
batch_norm,blocks}.py).

Supporting modules for the reference's config'd CNN experiments — none on
the EsViT main path (SURVEY.md §2.3). The detectron2-heritage plumbing
(layers/wrappers.py empty-tensor-safe convs, shape_spec) is torch-specific
scaffolding with no JAX analogue and is intentionally omitted.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from esvit_tpu.models.common import dense

Dtype = Any


class SELayer2D(nn.Module):
    """Squeeze-excitation on NHWC feature maps (ref: se_layer.py:4-19)."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2))                       # (B, C)
        y = dense(self.channels // self.reduction, use_bias=False,
                  dtype=self.dtype, name="fc1")(y)
        y = jax.nn.relu(y)
        y = dense(self.channels, use_bias=False, dtype=self.dtype,
                  name="fc2")(y)
        return x * jax.nn.sigmoid(y)[:, None, None, :]


def h_sigmoid(x, h_max: float = 1.0):
    """relu6(x + 3) * h_max / 6 (ref: dy_relu.py:18-25)."""
    return jnp.clip(x + 3.0, 0.0, 6.0) * h_max / 6.0


class DyReLU2(nn.Module):
    """Dynamic ReLU-B: per-channel piecewise-linear activation whose slopes
    and intercepts come from a squeeze head (ref: dy_relu.py:28-101,
    K2=True use_bias=True default: out = max(a1 x + b1, a2 x + b2))."""

    channels: int
    reduction: int = 4
    lambda_a: float = 1.0
    init_a: Sequence[float] = (1.0, 0.0)
    init_b: Sequence[float] = (0.0, 0.0)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        C = self.channels
        squeeze = C // self.reduction
        lam = self.lambda_a * 2.0
        y = jnp.mean(x, axis=(1, 2))
        y = dense(squeeze, dtype=self.dtype, name="fc1")(y)
        y = jax.nn.relu(y)
        y = dense(4 * C, dtype=self.dtype, name="fc2")(y)
        y = h_sigmoid(y)[:, None, None, :]
        a1, b1, a2, b2 = jnp.split(y, 4, axis=-1)
        a1 = (a1 - 0.5) * lam + self.init_a[0]
        a2 = (a2 - 0.5) * lam + self.init_a[1]
        b1 = b1 - 0.5 + self.init_b[0]
        b2 = b2 - 0.5 + self.init_b[1]
        return jnp.maximum(x * a1 + b1, x * a2 + b2)


class FrozenBatchNorm(nn.Module):
    """BatchNorm with fixed affine + statistics (ref: batch_norm.py:10-121
    FrozenBatchNorm2d): y = (x - mean) / sqrt(var + eps) * weight + bias,
    all four as non-trainable constants collection."""

    channels: int
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        def const(name, init):
            return self.variable("frozen_stats", name, init,
                                 (self.channels,)).value

        weight = const("weight", jnp.ones)
        bias = const("bias", jnp.zeros)
        mean = const("mean", jnp.zeros)
        var = const("var", jnp.ones)
        scale = weight * jax.lax.rsqrt(var + self.epsilon)
        return (x.astype(jnp.float32) * scale + (bias - mean * scale)).astype(
            self.dtype)


class DropBlock(nn.Module):
    """DropBlock regularization with linear keep-prob ramp
    (ref: dropblock.py:6-75): contiguous block_size x block_size regions are
    zeroed; output rescaled by kept fraction. Progress in [0, 1] ramps
    1 -> keep_prob like the reference's current_step/train_steps."""

    block_size: int = 7
    keep_prob: float = 0.9

    @nn.compact
    def __call__(self, x, deterministic: bool = True, progress: float = 1.0):
        if deterministic or self.keep_prob >= 1.0:
            return x
        B, H, W, C = x.shape
        keep = 1.0 - progress * (1.0 - self.keep_prob)
        bs = min(self.block_size, W)
        gamma = (1.0 - keep) * W * W / bs ** 2 / (W - bs + 1) ** 2

        rng = self.make_rng("dropblock")
        # valid centers: block fully inside the map
        i = jnp.arange(H)[:, None]
        j = jnp.arange(W)[None, :]
        valid = ((i >= bs // 2) & (i < H - (bs - 1) // 2) &
                 (j >= bs // 2) & (j < W - (bs - 1) // 2))
        seeds = jax.random.uniform(rng, x.shape)
        centers = (seeds < gamma) & valid[None, :, :, None]
        # expand each center to a block via max-pooling of the indicator
        blocks = nn.max_pool(centers.astype(jnp.float32),
                             (bs, bs), strides=(1, 1), padding="SAME")
        mask = 1.0 - blocks
        kept = jnp.mean(mask)
        return x * mask.astype(x.dtype) / jnp.maximum(kept, 1e-6).astype(x.dtype)
