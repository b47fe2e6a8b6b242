"""ResNet backbone (ref: torchvision resnet + utils.py:560-665
ResNetWrapper/MultiCropWrapper).

torchvision-layout ResNet-v1 with bottleneck blocks; ``forward_features``
returns ``(avgpooled cls, final 7x7 grid as region tokens)`` exactly like
the reference's ResNetWrapper (utils.py:621-665: forward_feature_map's
spatial grid becomes the region tokens for the dense task). BatchNorm uses
flax batch_stats; under pjit the stat reductions are global across the data
axis = SyncBN semantics (main_esvit.py:367-372). Trained with LARS at large
batch per the reference recipe (utils.py:519-557).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from esvit_tpu.config import ResNetConfig
from esvit_tpu.models.registry import register_backbone

Dtype = Any


class ConvBN(nn.Module):
    features: int
    kernel: int
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bn_train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=[(p, p), (p, p)], use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.he_normal(), name="conv")(x)
        x = nn.BatchNorm(use_running_average=not bn_train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32,
                         param_dtype=jnp.float32,
                         name="bn")(x.astype(jnp.float32))
        return x.astype(self.dtype)


class Bottleneck(nn.Module):
    features: int            # bottleneck width; out = 4x
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, bn_train: bool = False):
        identity = x
        y = jax.nn.relu(ConvBN(self.features, 1, dtype=self.dtype,
                               name="cb1")(x, bn_train))
        y = jax.nn.relu(ConvBN(self.features, 3, self.strides,
                               dtype=self.dtype, name="cb2")(y, bn_train))
        y = ConvBN(self.features * 4, 1, dtype=self.dtype,
                   name="cb3")(y, bn_train)
        if self.downsample:
            identity = ConvBN(self.features * 4, 1, self.strides,
                              dtype=self.dtype, name="down")(x, bn_train)
        return jax.nn.relu(y + identity)


_DEPTHS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class ResNet(nn.Module):
    cfg: ResNetConfig
    dtype: Dtype = jnp.float32

    def setup(self):
        self.stem = ConvBN(64, 7, 2, dtype=self.dtype, name="stem")
        blocks = []
        for i, depth in enumerate(_DEPTHS[self.cfg.depth]):
            for j in range(depth):
                blocks.append(Bottleneck(
                    64 * 2 ** i, strides=(2 if (j == 0 and i > 0) else 1),
                    downsample=(j == 0), dtype=self.dtype,
                    name=f"layer{i + 1}_block{j}"))
        self.blocks = blocks

    def _features(self, x, bn_train):
        x = jax.nn.relu(self.stem(x, bn_train))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for blk in self.blocks:
            x = blk(x, bn_train)
        return x                                           # (B, H/32, W/32, 2048)

    def __call__(self, x, deterministic: bool = True, bn_train: bool = False):
        return self.forward_features(x, deterministic, bn_train)

    def forward_features(self, x, deterministic: bool = True,
                         bn_train: bool = False):
        del deterministic
        fmap = self._features(x, bn_train)
        B, H, W, C = fmap.shape
        region = fmap.reshape(B, H * W, C)                 # 7x7 grid tokens
        cls = jnp.mean(region, axis=1)
        return cls, region

    def forward_return_n_last_blocks(self, x, n: int = 1,
                                     deterministic: bool = True,
                                     bn_train: bool = False):
        """ResNet linear eval uses the final pooled feature (the reference
        routes ResNets through avgpool only, eval_linear.py:168-176)."""
        cls, _ = self.forward_features(x, deterministic, bn_train)
        return cls


@register_backbone("resnet")
def build_resnet(cfg: ResNetConfig, dtype=jnp.float32) -> ResNet:
    return ResNet(cfg, dtype=dtype)
