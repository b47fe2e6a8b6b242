"""On-device (jitted, batched) DINO photometric augmentation.

TPU-first variant of the reference's CPU torchvision stack
(datasets/build.py:203-261): the host does decode + RandomResizedCrop (cheap,
shape-changing), the device does everything photometric — flip, color
jitter, grayscale, Gaussian blur, solarize, normalize — as one fused jitted
program over the whole batch. This is what lets a single-digit-core host
feed a TPU chip.

Semantics match torchvision/PIL per-op with two documented deviations:
- jitter sub-ops run in a fixed order (brightness, contrast, saturation,
  hue) instead of a per-sample random permutation;
- blur uses a true separable Gaussian with edge padding (PIL's is a
  3-box-pass approximation).
Both only perturb the augmentation distribution, not the model contract.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)

_BLUR_TAPS = 13  # covers sigma up to 2.0 (radius 3*sigma)


def _gray(x):
    # ITU-R 601 luma, like PIL convert('L')
    w = jnp.array([0.299, 0.587, 0.114], x.dtype)
    return jnp.einsum("...c,c->...", x, w)[..., None]


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    h = jnp.where(mx == r, (g - b) / safe_d % 6,
                  jnp.where(mx == g, (b - r) / safe_d + 2,
                            (r - g) / safe_d + 4)) / 6.0
    h = jnp.where(d == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _per_sample(x, f):
    """Broadcast a per-sample scalar (N,) over image dims."""
    return f.reshape(-1, 1, 1, 1).astype(x.dtype)


def _color_jitter(x, rng, apply_mask, brightness=0.4, contrast=0.4,
                  saturation=0.2, hue=0.1):
    n = x.shape[0]
    kb, kc, ks, kh = jax.random.split(rng, 4)
    fb = jax.random.uniform(kb, (n,), minval=1 - brightness, maxval=1 + brightness)
    fc = jax.random.uniform(kc, (n,), minval=1 - contrast, maxval=1 + contrast)
    fs = jax.random.uniform(ks, (n,), minval=1 - saturation, maxval=1 + saturation)
    fh = jax.random.uniform(kh, (n,), minval=-hue, maxval=hue)

    y = jnp.clip(x * _per_sample(x, fb), 0, 1)
    mean_gray = jnp.mean(_gray(y), axis=(1, 2, 3), keepdims=True)
    y = jnp.clip(mean_gray + (y - mean_gray) * _per_sample(y, fc), 0, 1)
    g = _gray(y)
    y = jnp.clip(g + (y - g) * _per_sample(y, fs), 0, 1)
    h, s, v = _rgb_to_hsv(y)
    y = _hsv_to_rgb((h + fh.reshape(-1, 1, 1)) % 1.0, s, v)

    m = _per_sample(x, apply_mask)
    return x * (1 - m) + y * m


def _grayscale(x, mask):
    g = jnp.repeat(_gray(x), 3, axis=-1)
    m = _per_sample(x, mask)
    return x * (1 - m) + g * m


def _gaussian_blur(x, rng, apply_mask, radius_min=0.1, radius_max=2.0):
    """Separable per-sample-sigma Gaussian with edge padding."""
    n, hgt, wid, _ = x.shape
    sigma = jax.random.uniform(rng, (n,), minval=radius_min, maxval=radius_max)
    r = _BLUR_TAPS // 2
    offs = jnp.arange(-r, r + 1, dtype=jnp.float32)
    w = jnp.exp(-0.5 * (offs[None, :] / sigma[:, None]) ** 2)   # (N, T)
    w = w / jnp.sum(w, axis=1, keepdims=True)

    def blur_axis(y, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (r, r)
        yp = jnp.pad(y, pad, mode="edge")
        taps = [jax.lax.slice_in_dim(yp, k, k + y.shape[axis], axis=axis)
                for k in range(_BLUR_TAPS)]
        stacked = jnp.stack(taps, axis=0)                       # (T, N, H, W, C)
        return jnp.einsum("tnhwc,nt->nhwc", stacked, w)

    blurred = blur_axis(blur_axis(x, 1), 2)
    m = _per_sample(x, apply_mask)
    return x * (1 - m) + blurred * m


def _solarize(x, mask):
    sol = jnp.where(x >= 0.5, 1.0 - x, x)
    m = _per_sample(x, mask)
    return x * (1 - m) + sol * m


@functools.partial(jax.jit, static_argnames=("blur_p", "solarize_p", "out_dtype"))
def augment_view_batch(rng, images, *, blur_p: float, solarize_p: float = 0.0,
                       out_dtype: Any = jnp.float32):
    """Photometric DINO augmentation for one view batch.

    images: (N, S, S, 3) uint8 or float in [0,1] (already RRC'd on host).
    Returns (N, S, S, 3) normalized, in ``out_dtype``.
    """
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    n = x.shape[0]
    k_flip, k_jit_p, k_jit, k_gray, k_blur_p, k_blur, k_sol = jax.random.split(rng, 7)

    flip = jax.random.bernoulli(k_flip, 0.5, (n,))
    x = jnp.where(_per_sample(x, flip) > 0, x[:, :, ::-1, :], x)

    x = _color_jitter(x, k_jit, jax.random.bernoulli(k_jit_p, 0.8, (n,)))
    x = _grayscale(x, jax.random.bernoulli(k_gray, 0.2, (n,)))
    if blur_p > 0:
        x = _gaussian_blur(x, k_blur,
                           jax.random.bernoulli(k_blur_p, blur_p, (n,)))
    if solarize_p > 0:
        x = _solarize(x, jax.random.bernoulli(k_sol, solarize_p, (n,)))

    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    return x.astype(out_dtype)


def augment_multicrop(rng, global_u8, local_u8, out_dtype=jnp.float32):
    """Full DINO multi-crop device augmentation.

    global_u8: (2B, Sg, Sg, 3) — rows [g1 batch; g2 batch] view-major.
    local_u8: (L*B, Sl, Sl, 3).
    Asymmetric global policy like the reference: view 1 blur p=1.0; view 2
    blur p=0.1 + solarize p=0.2; locals blur p=0.5.
    """
    b2 = global_u8.shape[0]
    b = b2 // 2
    k1, k2, k3 = jax.random.split(rng, 3)
    g1 = augment_view_batch(k1, global_u8[:b], blur_p=1.0, out_dtype=out_dtype)
    g2 = augment_view_batch(k2, global_u8[b:], blur_p=0.1, solarize_p=0.2,
                            out_dtype=out_dtype)
    loc = augment_view_batch(k3, local_u8, blur_p=0.5, out_dtype=out_dtype)
    return jnp.concatenate([g1, g2], axis=0), loc
