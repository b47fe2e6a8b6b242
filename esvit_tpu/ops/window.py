"""Window partitioning + shifted-window masks + relative-position indices.

TPU-first reimplementation of the Swin windowing machinery
(ref: models/swin_transformer.py:40-69 window_partition/window_reverse,
:96-110 relative-position index, :249-272 SW-MSA mask). Everything here is
*static*: masks and indices are computed in numpy at trace time (shapes are
static under jit), cached with lru_cache, and baked into the compiled program
as constants — the reference rebuilds its mask every forward
(swin_transformer.py:297 is a dead cache lookup); we pay zero runtime cost.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def window_partition(x: jnp.ndarray, window_size: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, window_size*window_size, C). H, W divisible."""
    B, H, W, C = x.shape
    ws = window_size
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, window_size: int, H: int, W: int) -> jnp.ndarray:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    ws = window_size
    C = windows.shape[-1]
    B = windows.shape[0] // ((H // ws) * (W // ws))
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """(wh*ww, wh*ww) int32 index into the (2wh-1)*(2ww-1) bias table.

    Same construction as swin_transformer.py:100-109: pairwise coordinate
    deltas shifted to start at 0, row-major flattened.
    """
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)                                   # 2, N
    rel = flat[:, :, None] - flat[:, None, :]                      # 2, N, N
    rel = rel.transpose(1, 2, 0).astype(np.int64)                  # N, N, 2
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(H: int, W: int, window_size: int, shift_size: int) -> np.ndarray:
    """(nW, N, N) float32 additive mask (0 / -100) for SW-MSA.

    Mirrors the reference's create_attn_mask (swin_transformer.py:249-272):
    the *padded* grid (Hp, Wp) is labeled into 9 regions by window/shift
    slices, partitioned into windows, and pairs of tokens from different
    regions get -100.
    """
    ws, ss = window_size, shift_size
    Hp = int(np.ceil(H / ws)) * ws
    Wp = int(np.ceil(W / ws)) * ws
    img = np.zeros((Hp, Wp), dtype=np.int32)
    slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    cnt = 0
    for hs in slices:
        for wsl in slices:
            img[hs, wsl] = cnt
            cnt += 1
    # partition into windows -> (nW, ws*ws)
    mw = img.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = mw[:, None, :] - mw[:, :, None]                         # nW, N, N
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def window_region_ids(H: int, W: int, window_size: int, shift_size: int
                      ) -> np.ndarray:
    """(nW, N) int32 shift-region label per window token — the `mw` grid the
    SW-MSA mask is derived from (swin_transformer.py:249-268). Tokens in
    different regions must not attend: mask = -100 * (id_i != id_j). Used by
    the packed attention kernel, which compares ids on the fly instead of
    loading the dense (nW, N, N) mask."""
    ws, ss = window_size, shift_size
    Hp = int(np.ceil(H / ws)) * ws
    Wp = int(np.ceil(W / ws)) * ws
    img = np.zeros((Hp, Wp), dtype=np.int32)
    slices = (slice(0, -ws), slice(-ws, -ss), slice(-ss, None))
    cnt = 0
    for hs in slices:
        for wsl in slices:
            img[hs, wsl] = cnt
            cnt += 1
    return (img.reshape(Hp // ws, ws, Wp // ws, ws)
            .transpose(0, 2, 1, 3).reshape(-1, ws * ws).astype(np.int32))


@functools.lru_cache(maxsize=None)
def pad_to_window_multiple(H: int, W: int, window_size: int) -> tuple[int, int]:
    ws = window_size
    Hp = int(np.ceil(H / ws)) * ws
    Wp = int(np.ceil(W / ws)) * ws
    return Hp, Wp


# ---------------------------------------------------------------------------
# Window-major token layouts: run a whole Swin stage in window order so
# per-block partition/roll/reverse copies collapse into (at most) one static
# gather per block boundary. All permutations are trace-time numpy constants.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def window_major_perm(Hp: int, Wp: int, window_size: int, shift: int
                      ) -> np.ndarray:
    """Permutation p with x_window_major = x_spatial_flat[:, p, :]:
    the token order produced by roll(-shift) then window_partition on the
    padded (Hp, Wp) grid."""
    grid = np.arange(Hp * Wp).reshape(Hp, Wp)
    if shift:
        grid = np.roll(grid, (-shift, -shift), axis=(0, 1))
    ws = window_size
    return grid.reshape(Hp // ws, ws, Wp // ws, ws).transpose(
        0, 2, 1, 3).reshape(-1)


@functools.lru_cache(maxsize=None)
def window_major_inverse(Hp: int, Wp: int, window_size: int, shift: int
                         ) -> np.ndarray:
    return np.argsort(window_major_perm(Hp, Wp, window_size, shift))


@functools.lru_cache(maxsize=None)
def layout_transition(Hp: int, Wp: int, window_size: int, src_shift: int,
                      dst_shift: int) -> np.ndarray:
    """Permutation t with x_dst = x_src[:, t, :] between two window-major
    layouts (src/dst shift amounts)."""
    inv_src = window_major_inverse(Hp, Wp, window_size, src_shift)
    perm_dst = window_major_perm(Hp, Wp, window_size, dst_shift)
    return inv_src[perm_dst]


# --- Padded-window layouts (round-2 fused kernel substrate) -----------------
# Each ws*ws window is padded to Np = ceil(ws*ws/8)*8 token slots so that
# window boundaries are 8-aligned in the sublane dimension (Mosaic slice
# rule). Dead slots carry garbage: the kernels mask dead KEYS with -1e9 and
# dead rows never feed real outputs (attention is window-local and MLP/LN
# are row-local), so real-token results are bit-identical to the unpadded
# layout and dead-slot cotangents are exactly zero.


def padded_window_tokens(window_size: int) -> int:
    n = window_size * window_size
    return ((n + 7) // 8) * 8


@functools.lru_cache(maxsize=None)
def window_major_perm_padded(Hp: int, Wp: int, window_size: int, shift: int
                             ) -> np.ndarray:
    """Gather indices p (len nW*Np) with x_padded = x_spatial_flat[:, p, :]:
    real slots pick their token; dead slots pick index 0 (their value is
    masked and their cotangent is zero, so the scatter-add in the gather's
    VJP adds exact zeros to token 0)."""
    ws = window_size
    N, Np = ws * ws, padded_window_tokens(ws)
    perm = window_major_perm(Hp, Wp, ws, shift).reshape(-1, N)   # (nW, N)
    out = np.zeros((perm.shape[0], Np), np.int64)
    out[:, :N] = perm
    return out.reshape(-1)


@functools.lru_cache(maxsize=None)
def padded_to_spatial_perm(Hp: int, Wp: int, window_size: int, shift: int
                           ) -> np.ndarray:
    """Gather indices q (len Hp*Wp) with x_spatial = x_padded[:, q, :]."""
    ws = window_size
    N, Np = ws * ws, padded_window_tokens(ws)
    perm = window_major_perm(Hp, Wp, ws, shift)                  # (nW*N,)
    inv = np.empty(Hp * Wp, np.int64)
    # padded position of real token perm[k] (window k//N, slot k%N)
    pos = (np.arange(perm.size) // N) * Np + (np.arange(perm.size) % N)
    inv[perm] = pos
    return inv


@functools.lru_cache(maxsize=None)
def layout_transition_padded(Hp: int, Wp: int, window_size: int,
                             src_shift: int, dst_shift: int) -> np.ndarray:
    """Gather t with x_dst_padded = x_src_padded[:, t, :] between two padded
    window-major layouts; dead slots read index 0."""
    ws = window_size
    N, Np = ws * ws, padded_window_tokens(ws)
    to_spatial = padded_to_spatial_perm(Hp, Wp, ws, src_shift)
    dst = window_major_perm_padded(Hp, Wp, ws, dst_shift).reshape(-1, Np)
    out = np.zeros_like(dst)
    out[:, :N] = to_spatial[dst[:, :N]]
    return out.reshape(-1)


# --- Structured layout movement (round-5) -----------------------------------
# The same permutations as the gather tables above, expressed as
# roll + reshape + transpose + pad chains. Real-slot contents are identical
# to x[:, perm, :]; dead slots are ZERO instead of the gather's token-0
# read (both are masked downstream — dead keys get -1e9, dead rows never
# feed real outputs, and dead-slot cotangents are exactly zero either way).
# The win is the BACKWARD: a gather's VJP is a scatter-add (the round-5
# profile measured the stage-0 scatter-adds + their layout copies at
# several ms/step); these chains' VJPs are slice + transpose + roll.


def to_window_major_padded(x: jnp.ndarray, Hp: int, Wp: int,
                           window_size: int, shift: int) -> jnp.ndarray:
    """(B, Hp*Wp, C) spatial-major -> (B, nW*Np, C) padded window-major."""
    B, _, C = x.shape
    ws = window_size
    N, Np = ws * ws, padded_window_tokens(ws)
    x = x.reshape(B, Hp, Wp, C)
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, -1, N, C)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Np - N), (0, 0)))
    return x.reshape(B, -1, C)


def from_window_major_padded(x: jnp.ndarray, Hp: int, Wp: int,
                             window_size: int, shift: int) -> jnp.ndarray:
    """Inverse of to_window_major_padded: -> (B, Hp*Wp, C) spatial-major."""
    B, _, C = x.shape
    ws = window_size
    N, Np = ws * ws, padded_window_tokens(ws)
    x = x.reshape(B, -1, Np, C)[:, :, :N, :]
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, C)
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    return x.reshape(B, Hp * Wp, C)


def transition_window_major_padded(x: jnp.ndarray, Hp: int, Wp: int,
                                   window_size: int, src_shift: int,
                                   dst_shift: int) -> jnp.ndarray:
    """Between two padded window-major layouts: one roll by the shift
    delta instead of exit-roll + enter-roll."""
    B, _, C = x.shape
    ws = window_size
    N, Np = ws * ws, padded_window_tokens(ws)
    x = x.reshape(B, -1, Np, C)[:, :, :N, :]
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, C)
    d = src_shift - dst_shift
    if d:
        x = jnp.roll(x, (d, d), axis=(1, 2))
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, -1, N, C)
    if Np != N:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, Np - N), (0, 0)))
    return x.reshape(B, -1, C)


def to_window_major(x: jnp.ndarray, Hp: int, Wp: int, window_size: int,
                    shift: int) -> jnp.ndarray:
    """(B, Hp*Wp, C) -> (B, nW*ws^2, C) unpadded window-major
    (window_major_perm order)."""
    B, _, C = x.shape
    ws = window_size
    x = x.reshape(B, Hp, Wp, C)
    if shift:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp * Wp, C)


def from_window_major(x: jnp.ndarray, Hp: int, Wp: int, window_size: int,
                      shift: int) -> jnp.ndarray:
    """Inverse of to_window_major."""
    B, _, C = x.shape
    ws = window_size
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, C)
    if shift:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    return x.reshape(B, Hp * Wp, C)


def transition_window_major(x: jnp.ndarray, Hp: int, Wp: int,
                            window_size: int, src_shift: int,
                            dst_shift: int) -> jnp.ndarray:
    """Between two unpadded window-major layouts (layout_transition order)."""
    B, _, C = x.shape
    ws = window_size
    x = x.reshape(B, Hp // ws, Wp // ws, ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(B, Hp, Wp, C)
    d = src_shift - dst_shift
    if d:
        x = jnp.roll(x, (d, d), axis=(1, 2))
    x = x.reshape(B, Hp // ws, ws, Wp // ws, ws, C).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, Hp * Wp, C)


@functools.lru_cache(maxsize=None)
def pad_token_mask_padded(H: int, W: int, Hp: int, Wp: int, window_size: int,
                          shift: int) -> np.ndarray:
    """pad_token_mask in the padded-window layout (dead slots -> 0)."""
    ws = window_size
    N, Np = ws * ws, padded_window_tokens(ws)
    base = pad_token_mask(H, W, Hp, Wp, ws, shift).reshape(-1, N)
    out = np.zeros((base.shape[0], Np), np.float32)
    out[:, :N] = base
    return out.reshape(-1)


@functools.lru_cache(maxsize=None)
def pad_token_mask(H: int, W: int, Hp: int, Wp: int, window_size: int,
                   shift: int) -> np.ndarray:
    """(Hp*Wp,) float32: 1 for real tokens, 0 for padding, in the
    window-major layout of (Hp, Wp, shift). Multiplied in after norm1 so
    padded key/values are zero exactly like the reference's post-norm
    zero-pad (swin_transformer.py:286-291)."""
    real = np.zeros((Hp, Wp), np.float32)
    real[:H, :W] = 1.0
    return real.reshape(-1)[window_major_perm(Hp, Wp, window_size, shift)]
