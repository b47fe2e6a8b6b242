"""Fused window attention Pallas kernel.

The Swin hot path (SURVEY.md §3.1): thousands of tiny per-window attentions
(N = 49 tokens, head_dim 32). The XLA decomposition materializes the
(B_, nH, N, N) fp32 score tensor in HBM plus two transposes of qkv; this
kernel consumes the qkv projection's natural (B_, N, 3C) layout and keeps
scores, bias/mask add, softmax, and the AV product entirely in VMEM.

Layout choices (see PERF.md):
- grid over window blocks of G windows; each step reads (G, N, 3C) and
  writes (G, N, C) — the only HBM traffic besides the bias table.
- rel-pos bias (+ shifted-window mask when present) is precomputed into one
  (nW_or_1, nH, N, N) fp32 constant and kept VMEM-resident across steps.
- per-head scores use dot_general with a leading (G*nH) batch via reshapes;
  N is padded to the fp32 sublane multiple inside VMEM by Mosaic.

Backward falls back to XLA autodiff via jax.custom_vjp with a
rematerialized forward (cheap: the forward is bandwidth-bound).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True (e.g. in CPU tests) to run the kernel in interpreter mode.
INTERPRET = False


def _attention_kernel(q_ref, k_ref, v_ref, bias_ref, out_ref, *,
                      scale: float, n_tokens: int):
    """One grid step: a block of (window, head) pairs via block-diagonal
    packing — TWO dense MXU matmuls instead of Gh tiny batched ones.

    q/k/v/out_ref: (Gh*N, hd). bias_ref: (Gh*N, Gh*N) f32 block-diagonal
    constant: per-pair rel-pos(+shift-mask) bias on the diagonal N x N
    blocks, -1e9 elsewhere. Cross-window scores are computed (garbage) but
    the bias drives their softmax weight to zero, so the dense P @ V is
    exactly the per-window result.
    """
    q = q_ref[:].astype(jnp.float32) * scale           # (GhN, hd)
    k = k_ref[:].astype(jnp.float32)
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # (GhN, GhN)
    scores = scores + bias_ref[:]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(probs, v_ref[:].astype(jnp.float32),
                  preferred_element_type=jnp.float32)  # (GhN, hd)
    out_ref[:] = out.astype(out_ref.dtype)


def _pick_block(total_rows: int, period: int, n_tokens: int,
                target_scores: int = 1280) -> int:
    """(window, head) pairs per grid step: a multiple of the bias period
    with Gh*N divisible by 8 (Mosaic sublane constraint), sized so the
    (Gh*N)^2 fp32 score matrix stays VMEM-friendly."""
    g = max(period, 1)
    while (g * n_tokens) % 8 != 0:
        g *= 2
    while g * 2 * n_tokens <= target_scores and total_rows % (g * 2) == 0:
        g *= 2
    if total_rows % g != 0:
        raise ValueError(f"cannot block {total_rows} rows with period {period}")
    return g


def _blockdiag_bias(bias: jnp.ndarray, Gh: int, N: int) -> jnp.ndarray:
    """(nWm, nH, N, N) per-pair bias -> (Gh*N, Gh*N) block-diagonal constant
    with -1e9 off-diagonal (nWm*nH divides Gh)."""
    nWm, nH = bias.shape[0], bias.shape[1]
    period = nWm * nH
    reps = Gh // period
    b = bias.reshape(period, N, N)
    b = jnp.broadcast_to(b[None], (reps, period, N, N)).reshape(Gh, N, N)
    big = jnp.full((Gh, N, Gh, N), -1e9, jnp.float32)
    idx = jnp.arange(Gh)
    big = big.at[idx, :, idx, :].set(b)
    return big.reshape(Gh * N, Gh * N)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_window_attention(qkv: jnp.ndarray, bias: jnp.ndarray,
                           num_heads: int, scale: float) -> jnp.ndarray:
    """qkv (B_, N, 3C), bias (nWm, nH, N, N) fp32 -> (B_, N, C).

    nWm must divide B_ (bias repeats per image); nWm == 1 when unmasked.
    """
    return _forward(qkv, bias, num_heads, scale)


def _forward(qkv, bias, num_heads, scale):
    B_, N, C3 = qkv.shape
    C = C3 // 3
    nH = num_heads
    hd = C // nH
    nWm = bias.shape[0]

    # Head split/transpose happens in XLA (one fused copy); the kernel then
    # runs over a flat (window*head*token, hd) 2-D layout.
    qkv_r = qkv.reshape(B_, N, 3, nH, hd).transpose(2, 0, 3, 1, 4)
    q = qkv_r[0].reshape(B_ * nH * N, hd)
    k = qkv_r[1].reshape(B_ * nH * N, hd)
    v = qkv_r[2].reshape(B_ * nH * N, hd)

    rows = B_ * nH
    period = nWm * nH
    Gh = _pick_block(rows, period, N)
    assert rows % Gh == 0 and Gh % period == 0, (rows, Gh, period)
    big_bias = _blockdiag_bias(bias, Gh, N)            # (Gh*N, Gh*N) const

    out = pl.pallas_call(
        functools.partial(_attention_kernel, scale=scale, n_tokens=N),
        grid=(rows // Gh,),
        in_specs=[
            pl.BlockSpec((Gh * N, hd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gh * N, hd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gh * N, hd), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Gh * N, Gh * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Gh * N, hd), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows * N, hd), qkv.dtype),
        interpret=INTERPRET,
    )(q, k, v, big_bias)

    return out.reshape(B_, nH, N, hd).transpose(0, 2, 1, 3).reshape(B_, N, C)


def _reference_attention(qkv, bias, num_heads, scale):
    """Pure-XLA equivalent (also the source of the backward pass)."""
    B_, N, C3 = qkv.shape
    C = C3 // 3
    nH = num_heads
    hd = C // nH
    qkv_r = qkv.reshape(B_, N, 3, nH, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv_r[0], qkv_r[1], qkv_r[2]
    attn = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32) * scale,
                      k.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    nWm = bias.shape[0]
    attn = attn.reshape(B_ // nWm, nWm, nH, N, N) + bias[None]
    attn = attn.reshape(B_, nH, N, N)
    probs = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", probs, v.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).reshape(B_, N, C).astype(qkv.dtype)


def _fwd(qkv, bias, num_heads, scale):
    return _forward(qkv, bias, num_heads, scale), (qkv, bias)


def _bwd(num_heads, scale, res, g):
    qkv, bias = res
    _, vjp = jax.vjp(
        lambda q, b: _reference_attention(q, b, num_heads, scale), qkv, bias)
    return vjp(g)


fused_window_attention.defvjp(_fwd, _bwd)
