"""Composite EsViT model: backbone + DINO head (+ dense head).

The reference attaches ``head``/``head_dense`` to each backbone and gives
every backbone an identical multi-crop ``forward(list_of_crops)``
(ref: main_esvit.py:239-254, models/swin_transformer.py:713-763). Here the
ragged crop list becomes a *static* tuple of per-resolution batches
(e.g. ``(2B,224,224,3)`` and ``(8B,96,96,3)``) so everything jits once.

Dense output contract (matches swin_transformer.py:734-751):
    cls_logits    (ncrops*B, K)   head over concat of per-resolution cls
    region_logits (sum_r nB_r*N_r, K)
    region_fea    (sum_r nB_r*N_r, C)
    npatch        tuple of N_r per resolution group (static ints)

TPU layout note: when ``batch_size`` is passed to ``__call__``, the region
tensors are instead emitted *batch-major 3-D*: ``(B, S, K)`` with
``S = sum_r views_r * N_r`` and rows ordered (view, patch) within each
resolution group. The reorder happens on the C-wide features BEFORE the
65536-wide dense head, so the big logits are born in the layout the loss
consumes — profiling showed XLA otherwise spends ~15 ms/step repacking
(reshape/slice/transpose) the (rows, 65536) tensors around the loss einsums
(PERF.md round 2). Math is identical; the flat layout (the reference's,
swin_transformer.py:744-751) remains the default for API/parity parity.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from esvit_tpu.config import HeadConfig
from esvit_tpu.models.heads import DINOHead
from esvit_tpu.models.registry import build_backbone

Dtype = Any


class EsViTModel(nn.Module):
    backbone_cfg: Any
    head_cfg: HeadConfig
    use_dense_prediction: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        self.backbone = build_backbone(self.backbone_cfg, dtype=self.dtype)
        self.head = DINOHead(self.head_cfg, dtype=self.dtype)
        if self.use_dense_prediction:
            self.head_dense = DINOHead(self.head_cfg, dtype=self.dtype)

    def __call__(self, crops: Sequence[jnp.ndarray], deterministic: bool = True,
                 bn_train: bool | None = None, mode: int = 0,
                 batch_size: int | None = None,
                 bottleneck_outputs: bool = False):
        """crops: tuple of per-resolution batches (n_r*B, S_r, S_r, 3).

        bn_train: BatchNorm mode for BN backbones (CvT/ResNet). Defaults to
        ``not deterministic``; the train step passes True for the teacher,
        which runs deterministically but keeps BN in batch-stats mode like
        the reference's always-train-mode teacher (main_esvit.py:364-383).
        mode: ViL sliding-chunk neighbor-sampling mode (static; ignored by
        other backbones).
        batch_size: static per-view batch B; when given, region outputs are
        batch-major (B, S, K)/(B, S, C) (see module docstring).
        bottleneck_outputs: dense path only — return the heads' L2-normalized
        bottleneck features plus the effective last-layer matrices instead of
        K-wide logits: ``(cls_z, region_z, region_fea, npatch, w_cls,
        w_dense)``. The K-streamed loss (losses.ddino_loss_streamed)
        contracts them chunk by chunk so (rows, 65536) logits never
        materialize in HBM.
        """
        if bn_train is None:
            bn_train = not deterministic
        is_vil = getattr(self.backbone_cfg, "name", "") == "vil"
        extra = {"mode": mode} if is_vil else {}
        cls_list, fea_list, npatch = [], [], []
        for x in crops:
            cls, fea = self.backbone.forward_features(
                x, deterministic, bn_train=bn_train, **extra)
            cls_list.append(cls)
            fea_list.append(fea)
            npatch.append(fea.shape[1])
        cls_cat = jnp.concatenate(cls_list, axis=0)
        if bottleneck_outputs:
            assert self.use_dense_prediction
            cls_z = self.head.bottleneck(cls_cat, deterministic)
        else:
            cls_logits = self.head(cls_cat, deterministic)
            if not self.use_dense_prediction:
                return cls_logits
        if batch_size is None:
            fea_cat = jnp.concatenate(
                [f.reshape(-1, f.shape[-1]) for f in fea_list], axis=0)
        else:
            # Batch-major reorder on the cheap C-wide features: (v*B, N, C)
            # -> (B, v*N, C) per resolution group, concatenated over groups.
            B = batch_size
            fea_cat = jnp.concatenate(
                [f.reshape(-1, B, f.shape[1], f.shape[-1])
                  .transpose(1, 0, 2, 3)
                  .reshape(B, -1, f.shape[-1])
                 for f in fea_list], axis=1)
        if bottleneck_outputs:
            region_z = self.head_dense.bottleneck(fea_cat, deterministic)
            return (cls_z, region_z, fea_cat, tuple(npatch),
                    self.head.last_weight(), self.head_dense.last_weight())
        region_logits = self.head_dense(fea_cat, deterministic)
        return cls_logits, region_logits, fea_cat, tuple(npatch)

    # ---- evaluation/analysis entry points, dispatched via apply(method=...)
    def features(self, x, deterministic: bool = True):
        return self.backbone.forward_features(x, deterministic)

    def head_only(self, cls, deterministic: bool = True):
        return self.head(cls, deterministic)

    def selfattention(self, x, n: int = 1, deterministic: bool = True):
        return self.backbone.forward_selfattention(x, n, deterministic)

    def n_last_blocks(self, x, n: int = 4, deterministic: bool = True, **kw):
        return self.backbone.forward_return_n_last_blocks(
            x, n, deterministic=deterministic, **kw)
