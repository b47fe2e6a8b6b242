"""2-D sliding-chunk attention primitives (Vision Longformer).

TPU-native reformulation of the reference's custom autograd Function
(ref: layers/slidingchunk_2d.py): the 9 rolled einsums become ONE einsum
against a stacked 3x3 chunk neighborhood — XLA fuses the rolls into the
contraction and autodiff provides the backward (the reference hand-writes
it, :130-243, because torch materializes 9 intermediates; XLA doesn't).
``jax.checkpoint`` can rematerialize if memory demands.

Neighborhood order matches the reference concat order exactly
(slidingchunk_qk, :34-76): (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),
(1,-1),(1,0),(1,1) — so ``attn[..., j*W^2:(j+1)*W^2]`` means the same
chunk in both implementations, and the invalid-location masks (cyclic /
zero / exact, :246-315) are bit-identical (vectorized numpy here).

Shapes (following the reference convention):
    q_img, k_img, v_img: (BH, M, mx, my, W2)  — chunked grids
    attn: (BH, mx, my, W2, K*W2) with K = 9 (mode 0), 1 (mode -1),
          2 (mode 1..8: self + one sampled neighbor).

``mode`` is static: 0 = all 8 neighbors, -1 = self only, i>0 = self +
neighbor i (the training-time random-neighbor sampling, ref
longformer2d.py:147-155 — the host samples i and jit caches 8 variants).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# mode index -> roll shift applied to k/v (ref slidingchunk_2d.py:12-21)
MODE_SHIFTS = {
    1: (1, 1), 2: (1, 0), 3: (1, -1),
    4: (0, 1), 5: (0, -1),
    6: (-1, 1), 7: (-1, 0), 8: (-1, -1),
}
# full-neighborhood roll shifts in reference concat order
_ALL_SHIFTS = [(1, 1), (1, 0), (1, -1), (0, 1), (0, 0), (0, -1),
               (-1, 1), (-1, 0), (-1, -1)]


def _stack_neighbors(t: jnp.ndarray, mode: int) -> jnp.ndarray:
    """(BH, M, mx, my, W2) -> (BH, M, K, mx, my, W2) of rolled copies."""
    if mode == 0:
        shifts = _ALL_SHIFTS
    elif mode == -1:
        shifts = [(0, 0)]
    else:
        shifts = [(0, 0), MODE_SHIFTS[mode]]
    return jnp.stack(
        [jnp.roll(t, s, axis=(2, 3)) if s != (0, 0) else t for s in shifts],
        axis=2)


def slidingchunk_qk(q_img: jnp.ndarray, k_img: jnp.ndarray,
                    mode: int = 0) -> jnp.ndarray:
    """(BH,M,mx,my,W2) x2 -> attn (BH,mx,my,W2,K*W2), fp32 accumulate."""
    kn = _stack_neighbors(k_img, mode)                   # BH,M,K,mx,my,W2
    attn = jnp.einsum("bcmnl,bcjmnt->bmnljt", q_img, kn,
                      preferred_element_type=jnp.float32)
    BH, mx, my, W2 = attn.shape[0], attn.shape[1], attn.shape[2], attn.shape[3]
    return attn.reshape(BH, mx, my, W2, -1)


def slidingchunk_av(attn: jnp.ndarray, v_img: jnp.ndarray,
                    mode: int = 0) -> jnp.ndarray:
    """attn (BH,mx,my,W2,K*W2) x v (BH,M,mx,my,W2) -> (BH,M,mx,my,W2)."""
    BH, mx, my, W2, _ = attn.shape
    k = attn.shape[-1] // W2
    a = attn.reshape(BH, mx, my, W2, k, W2)
    vn = _stack_neighbors(v_img, mode)                   # BH,M,K,mx,my,W2
    return jnp.einsum("bmnljt,bcjmnt->bcmnl", a, vn.astype(attn.dtype))


# ---------------------------------------------------------------------------
# Invalid-location masks (bit-identical to slidingchunk_2d.py:246-315)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _mask_components(nx: int, ny: int, padx: int, pady: int, w: int):
    """Vectorized index grids shared by the mask builders."""
    w2 = w * w
    i = np.arange(nx * ny)
    j = np.arange(9 * w2)
    ix = (i // ny)[:, None]          # query chunk row
    iy = (i % ny)[:, None]           # query chunk col
    cdx = ((j // w2) // 3)[None]     # neighbor chunk row offset (0..2)
    cdy = ((j // w2) % 3)[None]      # neighbor chunk col offset (0..2)
    tx = ((j % w2) // w)[None]       # key within-chunk row
    ty = ((j % w2) % w)[None]
    return ix, iy, cdx, cdy, tx, ty


@functools.lru_cache(maxsize=None)
def invalid_mask_cyclic(nx: int, ny: int, padx: int, pady: int, w: int
                        ) -> np.ndarray:
    """(nx*ny, 9w^2) bool: wrapped-in padded positions under cyclic padding
    (ref :246-264)."""
    ix, iy, cdx, cdy, tx, ty = _mask_components(nx, ny, padx, pady, w)
    mx = (ix + cdx == nx) & ((nx - 1) * w + tx >= nx * w - padx)
    my = (iy + cdy == ny) & ((ny - 1) * w + ty >= ny * w - pady)
    return mx | my


@functools.lru_cache(maxsize=None)
def invalid_mask_zero(nx: int, ny: int, padx: int, pady: int, w: int
                      ) -> np.ndarray:
    """(nx*ny, 9w^2) bool: out-of-grid neighbors + padded positions
    (ref :267-287)."""
    ix, iy, cdx, cdy, tx, ty = _mask_components(nx, ny, padx, pady, w)
    gx = ix + cdx - 1                 # absolute key chunk row
    gy = iy + cdy - 1
    bad_x = (gx < 0) | (gx >= nx) | (gx * w + tx >= nx * w - padx)
    bad_y = (gy < 0) | (gy >= ny) | (gy * w + ty >= ny * w - pady)
    return bad_x | bad_y


@functools.lru_cache(maxsize=None)
def invalid_mask_exact(nx: int, ny: int, padx: int, pady: int, w: int
                       ) -> np.ndarray:
    """(nx*ny, w^2, 9w^2) bool: exact per-query sliding window
    (ref :290-315)."""
    w2 = w * w
    ix, iy, cdx, cdy, tx, ty = _mask_components(nx, ny, padx, pady, w)
    l = np.arange(w2)
    lx = (l // w)[None, :, None]      # query within-chunk row
    ly = (l % w)[None, :, None]
    ix, iy = ix[:, :, None] * 1, iy[:, :, None] * 1       # (N,1,1)
    cdx, cdy, tx, ty = (a[:, None, :] for a in (cdx, cdy, tx, ty))  # (1,1,9w2)
    nx_max = nx * w - 1 - padx
    ny_max = ny * w - 1 - pady
    kx = (ix + cdx - 1) * w + tx      # absolute key row (N,w2,9w2)
    ky = (iy + cdy - 1) * w + ty
    qx = (ix - 1) * w + lx            # window bounds around query
    qy = (iy - 1) * w + ly
    bad = ((kx < np.maximum(0, qx)) |
           (kx > np.minimum(nx_max, qx + 2 * w)) |
           (ky < np.maximum(0, qy)) |
           (ky > np.minimum(ny_max, qy + 2 * w)))
    return bad


def _select_mode_columns(mask: np.ndarray, w: int, mode: int) -> np.ndarray:
    """Restrict a (..., 9w^2) mask to the mode's chunk columns
    (ref mask_invalid_locations :341-350)."""
    w2 = w * w
    if mode == 0:
        return mask
    if mode == -1:
        return mask[..., 4 * w2:5 * w2]
    chunk_id = mode if mode > 4 else mode - 1
    return np.concatenate([mask[..., 4 * w2:5 * w2],
                           mask[..., chunk_id * w2:(chunk_id + 1) * w2]],
                          axis=-1)


def invalid_locations_mask(nx: int, ny: int, padx: int, pady: int, w: int,
                           exact: int = 0, mode: int = 0) -> np.ndarray:
    """Boolean mask broadcastable onto attn (BH, nx, ny, w^2, K*w^2).

    exact: 1 = exact sliding window, 0 = blockwise zero padding,
    -1 = blockwise cyclic padding (ref mask_invalid_locations :318-354).
    """
    w2 = w * w
    if exact == 1 and mode == 0:
        m = invalid_mask_exact(nx, ny, padx, pady, w)
        return m.reshape(1, nx, ny, w2, 9 * w2)
    if exact == 0:
        m = invalid_mask_zero(nx, ny, padx, pady, w)
    elif exact == -1:
        m = invalid_mask_cyclic(nx, ny, padx, pady, w)
    else:
        raise ValueError("exact must be in {1, 0, -1}")
    m = _select_mode_columns(m, w, mode)
    return m.reshape(1, nx, ny, 1, -1)


def apply_invalid_mask(attn: jnp.ndarray, nx: int, ny: int, padx: int,
                       pady: int, w: int, exact: int = 0, mode: int = 0
                       ) -> jnp.ndarray:
    mask = invalid_locations_mask(nx, ny, padx, pady, w, exact, mode)
    return jnp.where(jnp.asarray(mask), -jnp.inf, attn)
