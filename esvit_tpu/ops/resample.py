"""torch-compatible bicubic resampling.

``torch.nn.functional.interpolate(mode='bicubic', align_corners=False)``
semantics, which differ from ``jax.image.resize`` in two ways that break
checkpoint parity for interpolated position embeddings:

1. the cubic convolution kernel uses A = -0.75 (jax uses Keys A = -0.5);
2. when called with ``scale_factor`` (as all the reference call sites do:
   vision_transformer.py:271-285, vision_longformer.py:261-274), the
   *given* scale maps coordinates — src = (dst + 0.5)/scale - 0.5 — even
   when it's inconsistent with the size ratio. The ViL PatchEmbed passes
   ``sqrt((N + nglo)/N)`` (it counts the CLS token, ref :262), so its APE is
   slightly resampled EVERY forward when nglo >= 1; we reproduce that
   faithfully.

Weights/taps are static numpy; the gather + contraction is jnp (so learned
pos-embeds stay differentiable).
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

_A = -0.75  # torch's cubic convolution alpha


def _cubic_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    w = np.where(
        ax <= 1,
        (_A + 2) * ax ** 3 - (_A + 3) * ax ** 2 + 1,
        np.where(ax < 2, _A * ax ** 3 - 5 * _A * ax ** 2 + 8 * _A * ax - 4 * _A,
                 0.0))
    return w


@functools.lru_cache(maxsize=None)
def _axis_taps(in_size: int, out_size: int, scale: float):
    """(out_size, 4) clamped tap indices + fp32 weights for one axis."""
    dst = np.arange(out_size, dtype=np.float64)
    src = (dst + 0.5) / scale - 0.5
    base = np.floor(src).astype(np.int64)
    t = src - base
    offs = np.arange(-1, 3)
    idx = base[:, None] + offs[None, :]                    # (out, 4)
    w = _cubic_kernel(offs[None, :] - t[:, None])          # (out, 4)
    idx = np.clip(idx, 0, in_size - 1)
    return idx.astype(np.int32), w.astype(np.float32)


def torch_bicubic_resize(grid: jnp.ndarray, out_h: int, out_w: int,
                         scale_h: float | None = None,
                         scale_w: float | None = None) -> jnp.ndarray:
    """grid (..., H, W, C) -> (..., out_h, out_w, C).

    When scale_* is given it drives the coordinate mapping (torch
    scale_factor semantics); otherwise the size ratio is used.
    """
    H, W = grid.shape[-3], grid.shape[-2]
    sh = scale_h if scale_h is not None else out_h / H
    sw = scale_w if scale_w is not None else out_w / W
    idx_h, w_h = _axis_taps(H, out_h, sh)
    idx_w, w_w = _axis_taps(W, out_w, sw)

    g32 = grid.astype(jnp.float32)
    rows = g32[..., idx_h, :, :]                           # (..., out_h, 4, W, C)
    rows = jnp.einsum("...htwc,ht->...hwc", rows, jnp.asarray(w_h))
    cols = rows[..., :, idx_w, :]                          # (..., out_h, out_w, 4, C)
    out = jnp.einsum("...hwtc,wt->...hwc", cols, jnp.asarray(w_w))
    return out.astype(grid.dtype)


@functools.lru_cache(maxsize=None)
def _axis_taps_linear(in_size: int, out_size: int, scale: float):
    """(out_size, 2) clamped tap indices + fp32 weights for one axis under
    torch bilinear align_corners=False semantics: src = (dst+0.5)/scale-0.5
    clamped to >= 0 (ATen area_pixel_compute_source_index clamps the
    COORDINATE for linear modes, unlike cubic which clamps indices)."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.maximum((dst + 0.5) / scale - 0.5, 0.0)
    base = np.floor(src).astype(np.int64)
    t = src - base
    idx = np.stack([base, np.minimum(base + 1, in_size - 1)], axis=-1)
    w = np.stack([1.0 - t, t], axis=-1)
    return idx.astype(np.int32), w.astype(np.float32)


def torch_bilinear_resize(grid: jnp.ndarray, out_h: int, out_w: int,
                          scale_h: float | None = None,
                          scale_w: float | None = None) -> jnp.ndarray:
    """torch F.interpolate(mode='bilinear', align_corners=False) on
    (..., H, W, C) — used by the DownAttention 2x upsample
    (ref layers/attention.py:783,921)."""
    H, W = grid.shape[-3], grid.shape[-2]
    sh = scale_h if scale_h is not None else out_h / H
    sw = scale_w if scale_w is not None else out_w / W
    idx_h, w_h = _axis_taps_linear(H, out_h, sh)
    idx_w, w_w = _axis_taps_linear(W, out_w, sw)

    g32 = grid.astype(jnp.float32)
    rows = g32[..., idx_h, :, :]                           # (..., out_h, 2, W, C)
    rows = jnp.einsum("...htwc,ht->...hwc", rows, jnp.asarray(w_h))
    cols = rows[..., :, idx_w, :]                          # (..., out_h, out_w, 2, C)
    out = jnp.einsum("...hwtc,wt->...hwc", cols, jnp.asarray(w_w))
    return out.astype(grid.dtype)


def torch_interpolate_scale(grid: jnp.ndarray, scale: float) -> jnp.ndarray:
    """F.interpolate(grid, scale_factor=scale, mode='bicubic') on
    (..., H, W, C): out size = floor(size * scale), coordinates mapped with
    the given scale."""
    H, W = grid.shape[-3], grid.shape[-2]
    out_h = int(math.floor(H * scale))
    out_w = int(math.floor(W * scale))
    return torch_bicubic_resize(grid, out_h, out_w, scale, scale)
