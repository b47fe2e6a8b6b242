"""Shared building blocks for all backbones.

Matches reference semantics where they affect parity:
- GELU is the exact (erf) variant — torch ``nn.GELU`` default
  (ref: models/swin_transformer.py:22-37 Mlp).
- LayerNorm/softmax run in float32 even under bf16 compute, mirroring torch
  AMP autocast behavior on the fp16 path the reference always uses
  (main_esvit.py:541).
- DropPath is per-sample stochastic depth (timm semantics: scale by 1/keep).
- trunc_normal(std=.02) init for Linear weights, zeros for bias, ones/zeros
  for LayerNorm (ref: models/swin_transformer.py:660-667).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any

trunc_normal_init = nn.initializers.truncated_normal(stddev=0.02)


def dense(features: int, *, use_bias: bool = True, dtype: Dtype = jnp.float32,
          name: str | None = None, kernel_init=trunc_normal_init) -> nn.Dense:
    return nn.Dense(features, use_bias=use_bias, dtype=dtype,
                    param_dtype=jnp.float32, kernel_init=kernel_init,
                    bias_init=nn.initializers.zeros, name=name)


class LayerNorm(nn.Module):
    """fp32 LayerNorm that casts its result back to ``dtype``."""

    epsilon: float = 1e-6
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=self.epsilon, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln")(x.astype(jnp.float32))
        return y.astype(self.dtype)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class Mlp(nn.Module):
    """Two-layer MLP with exact GELU (ref: models/swin_transformer.py:21-37)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    drop: float = 0.0
    dtype: Dtype = jnp.float32
    act: Callable = lambda x: jax.nn.gelu(x, approximate=False)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        out_dim = self.out_dim or x.shape[-1]
        x = dense(self.hidden_dim, dtype=self.dtype, name="fc1")(x)
        x = self.act(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = dense(out_dim, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


def softmax_fp32(logits, axis: int = -1, out_dtype: Dtype | None = None):
    """Numerically-safe softmax in fp32, optionally cast back down."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=axis)
    return p.astype(out_dtype) if out_dtype is not None else p
