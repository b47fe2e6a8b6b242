"""Fused 2-D sliding-chunk attention — the ViL hot kernel, TPU-native.

Replaces the stacked-neighborhood einsum decomposition of Vision
Longformer's local attention (ops/slidingchunk.py; ref:
layers/slidingchunk_2d.py:24-127 + layers/longformer2d.py:158-301) for the
canonical EsViT ViL configuration (mode 0 = all 8 neighbors, blockwise
zero padding ``exact=0``, APE models so no chunk RPE, no pooled keys).
The einsum path materializes 9 rolled K/V copies and a
(BH, mx, my, W^2, 9W^2+Nglo) fp32 score/prob tensor in HBM, and XLA lowers
its contractions to thousands of (49, M) @ (M, 441) tiny batched dots —
the same per-entry-overhead + HBM-streaming disease the packed Swin
kernel cured (PERF.md round 2; measured here: ViL-T step MFU 0.048 on the
einsum path).

Design (one Pallas call, grid = (B*H, mx)):

- Tokens ride in **chunk-major padded rows**: chunk (ci, cj) owns rows
  ``(ci*my + cj)*Np + t`` with ``Np = ceil(W^2/8)*8`` slots (t >= W^2 are
  dead slots, masked as keys — sublane-aligned chunk boundaries, the
  ops/fused_block.py trick).
- Grid step (b, i) computes one full **chunk-row of queries** (R = my*Np
  rows) against the **3-chunk-row key band** around it (BR = 3*R rows,
  clamped at grid edges) — contiguous rows of K/V, loaded with one
  dynamic 8-aligned slice from the whole-(L, M) VMEM block. The 3x3
  neighborhood test collapses to iota compares on (row chunk, col chunk)
  indices; out-of-grid / spatially-padded / dead-slot keys pick up -1e9
  exactly like the einsum path's ``invalid_mask_zero``.
- The ``Nglo`` global keys (local-to-global attention, the reference
  concatenates them into the same softmax) ride as 8 extra key rows per
  head; invalid rows masked.
- One fp32 softmax over [band | global] per query row, then P @ V_band +
  Pg @ V_glo — scores and probabilities never touch HBM.
- Backward is a second kernel over the same grid: flash-style forward
  recompute, dq written per-step, dk/dv accumulated into revisited
  whole-(L, M) f32 output blocks (grid order keeps them block-resident
  across the mx steps of one head).

Numerics mirror the einsum path: bf16 operands, f32 MXU accumulation,
f32 softmax (max-subtracted), probabilities cast to the compute dtype
before the value matmuls. Score FLOP waste vs the true neighborhood is
~(my/3)*(Np/W^2) — dense MXU issues in exchange, same trade the Swin
kernels measured as a large win at these shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
_GLO_ROWS = 8                       # global-key rows per head (Nglo <= 8)


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _band_mask(i, band_c0, *, R, BR, Np, W, W2, my, nx, ny, nglo):
    """(R, BR) and (R, _GLO_ROWS) additive f32 masks for grid step chunk-row
    ``i`` with the key band starting at chunk-row ``band_c0`` (both traced
    scalars). Key validity only — matches invalid_mask_zero + the mode-0
    neighborhood (ops/slidingchunk.py:109-118)."""
    col = _iota2((R, BR), 1)
    row = _iota2((R, BR), 0)
    t = col % Np                         # key slot within chunk
    gc = (col % R) // Np                 # key chunk col
    gr = band_c0 + col // R              # key chunk row (absolute)
    cj = row // Np                       # query chunk col
    tx = t // W
    ty = t % W
    valid = (
        (t < W2)
        & (jnp.abs(gr - i) <= 1)
        & (jnp.abs(gc - cj) <= 1)
        & (gr * W + tx < nx)
        & (gc * W + ty < ny)
    )
    mask = jnp.where(valid, 0.0, -1e9).astype(jnp.float32)
    gcol = _iota2((R, _GLO_ROWS), 1)
    gmask = jnp.where(gcol < nglo, 0.0, -1e9).astype(jnp.float32)
    return mask, gmask


def _recompute_probs(q, k_ref, kg_ref, i, off, band_c0, meta):
    """Masked softmax probabilities for one grid step: returns
    (p_band f32 (R, BR), p_glo f32 (R, _GLO_ROWS), k_band)."""
    (R, BR, Np, W, W2, my, nx, ny, nglo, mx) = meta
    k_band = k_ref[pl.ds(off, BR), :]
    s = jax.lax.dot_general(q, k_band, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    sg = jax.lax.dot_general(q, kg_ref[:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mask, gmask = _band_mask(i, band_c0, R=R, BR=BR, Np=Np, W=W, W2=W2,
                             my=my, nx=nx, ny=ny, nglo=nglo)
    s = s + mask
    sg = sg + gmask
    m = jnp.maximum(jnp.max(s, axis=1, keepdims=True),
                    jnp.max(sg, axis=1, keepdims=True))
    e = jnp.exp(s - m)
    eg = jnp.exp(sg - m)
    l = jnp.sum(e, axis=1, keepdims=True) + jnp.sum(eg, axis=1, keepdims=True)
    linv = 1.0 / l
    return e * linv, eg * linv, k_band


def _offsets(i, *, mx, R):
    band_chunks = min(3, mx)
    band_c0 = jnp.clip(i - 1, 0, mx - band_chunks)
    return band_c0, pl.multiple_of(band_c0 * R, 8), band_chunks * R


def _fwd_kernel(q_ref, k_ref, v_ref, kg_ref, vg_ref, o_ref, *, meta):
    (R, BR, Np, W, W2, my, nx, ny, nglo, mx) = meta
    i = pl.program_id(1)
    band_c0, off, _ = _offsets(i, mx=mx, R=R)
    q = q_ref[:]
    cd = q.dtype
    p, pg, _ = _recompute_probs(q, k_ref, kg_ref, i, off, band_c0, meta)
    v_band = v_ref[pl.ds(off, BR), :]
    o = jax.lax.dot_general(p.astype(cd), v_band, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o + jax.lax.dot_general(pg.astype(cd), vg_ref[:],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    o_ref[:] = o.astype(cd)


def _bwd_kernel(q_ref, k_ref, v_ref, kg_ref, vg_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dkg_ref, dvg_ref, *, meta):
    (R, BR, Np, W, W2, my, nx, ny, nglo, mx) = meta
    i = pl.program_id(1)
    band_c0, off, _ = _offsets(i, mx=mx, R=R)
    q = q_ref[:]
    cd = q.dtype

    @pl.when(i == 0)
    def _():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)
        dkg_ref[:] = jnp.zeros_like(dkg_ref)
        dvg_ref[:] = jnp.zeros_like(dvg_ref)

    p32, pg32, k_band = _recompute_probs(q, k_ref, kg_ref, i, off, band_c0,
                                         meta)
    p = p32.astype(cd)
    pg = pg32.astype(cd)
    do = do_ref[:]

    dv_ref[pl.ds(off, BR), :] = dv_ref[pl.ds(off, BR), :] + jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dvg_ref[:] = dvg_ref[:] + jax.lax.dot_general(
        pg, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    v_band = v_ref[pl.ds(off, BR), :]
    dp = jax.lax.dot_general(do, v_band, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dpg = jax.lax.dot_general(do, vg_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    r = (jnp.sum(p32 * dp, axis=1, keepdims=True)
         + jnp.sum(pg32 * dpg, axis=1, keepdims=True))
    ds = (p32 * (dp - r)).astype(cd)
    dsg = (pg32 * (dpg - r)).astype(cd)

    dq = jax.lax.dot_general(ds, k_band, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dq = dq + jax.lax.dot_general(dsg, kg_ref[:], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    dq_ref[:] = dq.astype(cd)

    dk_ref[pl.ds(off, BR), :] = dk_ref[pl.ds(off, BR), :] + jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dkg_ref[:] = dkg_ref[:] + jax.lax.dot_general(
        dsg, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


class _Meta:
    """Hashable static bundle for the custom_vjp nondiff argument."""

    __slots__ = ("mx", "my", "W", "nx", "ny", "nglo", "interpret")

    def __init__(self, mx, my, W, nx, ny, nglo, interpret):
        self.mx, self.my, self.W = mx, my, W
        self.nx, self.ny, self.nglo = nx, ny, nglo
        self.interpret = interpret

    def _key(self):
        return (self.mx, self.my, self.W, self.nx, self.ny, self.nglo,
                self.interpret)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, _Meta) and self._key() == other._key()


def _shapes(meta):
    W2 = meta.W * meta.W
    Np = ((W2 + 7) // 8) * 8
    R = meta.my * Np
    L = meta.mx * R
    BR = min(3, meta.mx) * R
    kmeta = (R, BR, Np, meta.W, W2, meta.my, meta.nx, meta.ny, meta.nglo,
             meta.mx)
    return W2, Np, R, L, BR, kmeta


def _run(kind, q, k, v, kg, vg, do, meta):
    W2, Np, R, L, BR, kmeta = _shapes(meta)
    BH = q.shape[0] // L
    M = q.shape[1]
    mx = meta.mx

    row_spec = pl.BlockSpec((R, M), lambda b, i: (b * mx + i, 0))
    full_spec = pl.BlockSpec((L, M), lambda b, i: (b, 0))
    glo_spec = pl.BlockSpec((_GLO_ROWS, M), lambda b, i: (b, 0))
    grid = (BH, mx)

    if kind == "fwd":
        return pl.pallas_call(
            functools.partial(_fwd_kernel, meta=kmeta),
            grid=grid,
            in_specs=[row_spec, full_spec, full_spec, glo_spec, glo_spec],
            out_specs=row_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=_COMPILER_PARAMS,
            interpret=meta.interpret,
        )(q, k, v, kg, vg)

    f32 = jnp.float32
    dq, dk, dv, dkg, dvg = pl.pallas_call(
        functools.partial(_bwd_kernel, meta=kmeta),
        grid=grid,
        in_specs=[row_spec, full_spec, full_spec, glo_spec, glo_spec,
                  row_spec],
        out_specs=[row_spec, full_spec, full_spec, glo_spec, glo_spec],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, f32),
            jax.ShapeDtypeStruct(v.shape, f32),
            jax.ShapeDtypeStruct(kg.shape, f32),
            jax.ShapeDtypeStruct(vg.shape, f32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=meta.interpret,
    )(q, k, v, kg, vg, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype), dkg.astype(kg.dtype), \
        dvg.astype(vg.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _sliding_chunk_attention(q, k, v, kg, vg, meta):
    out, _ = _sc_fwd(q, k, v, kg, vg, meta)
    return out


def _sc_fwd(q, k, v, kg, vg, meta):
    return _run("fwd", q, k, v, kg, vg, None, meta), (q, k, v, kg, vg)


def _sc_bwd(meta, res, do):
    return _run("bwd", *res, do, meta)


_sliding_chunk_attention.defvjp(_sc_fwd, _sc_bwd)


def supports(mode: int, exact: int, rpe: bool, add_pooled: bool,
             only_glo: bool, nglo: int, attn_dropping: bool) -> bool:
    """The fused kernel covers the canonical EsViT ViL configuration; other
    (mode, exact, rpe, pooled) combinations keep the einsum path."""
    return (mode == 0 and exact == 0 and not rpe and not add_pooled
            and not only_glo and 0 <= nglo <= _GLO_ROWS
            and not attn_dropping)


def _to_chunk_major(t, mx, my, W, Np, nx, ny):
    """(BH, nx, ny, M) spatial grid -> (BH*mx*my*Np, M) chunk-major padded
    rows (zero rows at spatial pads and dead slots)."""
    BH, _, _, M = t.shape
    W2 = W * W
    t = jnp.pad(t, ((0, 0), (0, mx * W - nx), (0, my * W - ny), (0, 0)))
    t = t.reshape(BH, mx, W, my, W, M).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(BH, mx, my, W2, M)
    if Np != W2:
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, Np - W2), (0, 0)))
    return t.reshape(BH * mx * my * Np, M)


def _from_chunk_major(rows, BH, mx, my, W, Np, nx, ny):
    """Inverse of _to_chunk_major, cropping pads: -> (BH, nx, ny, M)."""
    M = rows.shape[1]
    W2 = W * W
    t = rows.reshape(BH, mx, my, Np, M)[:, :, :, :W2]
    t = t.reshape(BH, mx, my, W, W, M).transpose(0, 1, 3, 2, 4, 5)
    t = t.reshape(BH, mx * W, my * W, M)
    return t[:, :nx, :ny]


def sliding_chunk_attention(q, k, v, k_glo, v_glo, *, nx: int, ny: int,
                            W: int, interpret: bool = False):
    """Fused mode-0 sliding-chunk attention + local-to-global columns.

    q/k/v: (BH, nx, ny, M) spatial grids (q pre-scaled); k_glo/v_glo:
    (BH, Nglo, M) global keys/values (Nglo may be 0). Returns
    (BH, nx, ny, M). Differentiable in all five tensor args. Semantics ==
    softmax over [global keys | 3x3-neighborhood chunk keys] per query
    (layers/longformer2d.py:194-301 with mode=0, exact=0, rpe off).
    """
    BH, _, _, M = q.shape
    mx = -(-nx // W)
    my = -(-ny // W)
    W2 = W * W
    Np = ((W2 + 7) // 8) * 8
    nglo = k_glo.shape[1]

    def glo_pad(t):
        t = t[:, :_GLO_ROWS]
        t = jnp.pad(t, ((0, 0), (0, _GLO_ROWS - t.shape[1]), (0, 0)))
        return t.reshape(BH * _GLO_ROWS, M)

    meta = _Meta(mx, my, W, nx, ny, nglo, interpret)
    rows = _sliding_chunk_attention(
        _to_chunk_major(q, mx, my, W, Np, nx, ny),
        _to_chunk_major(k, mx, my, W, Np, nx, ny),
        _to_chunk_major(v, mx, my, W, Np, nx, ny),
        glo_pad(k_glo), glo_pad(v_glo), meta)
    return _from_chunk_major(rows, BH, mx, my, W, Np, nx, ny)
