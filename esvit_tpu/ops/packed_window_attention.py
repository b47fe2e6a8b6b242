"""Packed fused window attention — the Swin hot kernel, TPU-native.

Replaces the per-window-per-head batched-matmul decomposition of W-MSA /
SW-MSA (ref: models/swin_transformer.py:120-152) with a Pallas kernel whose
grid step computes TW windows x a group of HG heads via a handful of dense
MXU matmuls:

- **Head packing along the contraction**: head h's keys/values are
  zero-expanded into rows (h, w, j) that carry data only in head h's
  channel block, so a single (TW*N, C) @ (C, HG*TW*N) matmul yields every
  per-head score with cross-head terms exactly zero — no per-head dots,
  and a C-deep MXU contraction.
- **Window packing along rows**: TW windows ride the same matmul
  block-diagonally; cross-window scores are killed with a -1e9 additive
  term (their exp underflows to exactly 0 in fp32), trading TW-fold FLOP
  waste for TW-fold fewer (and MXU-shaped) matmul issues. XLA's batched
  tiny-dot path spends ~150 cycles per (49,32)@(32,49) entry; here one
  issue covers TW*HG entries.
- Backbones with more than HG heads per block run one pallas_call per head
  group; outputs/gradients are channel-disjoint, so the XLA-level sum is
  exact.
- The shifted-window mask (-100 additive, swin_transformer.py:249-272) and
  the cross-window -1e9 are folded into ONE mask array whose rows repeat
  with the window-type period nW/TW, streamed via a modulo index_map.
- Relative-position bias enters pre-tiled to (TW*N, HG*TW*N); its gradient
  is accumulated across grid steps into a dedicated output and reduced
  outside, so the bias table still trains exactly.
- Numerics mirror the production XLA path: fp32 MXU accumulation,
  score storage in ``score_dtype`` (bf16 under mixed precision = torch-AMP
  fp16-score semantics), softmax in fp32, probabilities cast to the compute
  dtype before the value matmul.

Mosaic constraints honored throughout (PERF.md round 1 + this round's
findings): 2-D kernel I/O, no lane-dim reshapes/slices, and — because N=49
is not sublane-tile aligned — NO in-kernel reshapes at all: head selection
uses broadcasted-iota masks, row/window collapses use 0/1 selector matmuls
on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The default scoped-VMEM compiler limit (16 MiB) is below what the s3/s4
# backward tiles need; v5e has headroom above it.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)

import os

# Packed-score width budget per kernel call (cols = HG*TW*N). 2400 lets a
# single call cover all heads up to nH=6 (Swin stages 1-2, where the kernel
# beats XLA); the per-step buffers at this width still fit VMEM under the
# raised compiler limit. Env knob for experiments.
_TARGET_COLS = int(os.environ.get("ESVIT_PACKED_TARGET_COLS", "2400"))


def _pick_tile(n_windows: int, n_heads: int, nW: int, window_tokens: int,
               target_cols: int = _TARGET_COLS) -> int:
    """SMALLEST valid TW with TW*nH*N <= target_cols, TW | n_windows, TW*N
    a sublane-tile multiple (Mosaic block rule), and the window-type pattern
    periodic across grid steps (TW | nW or nW | TW) — cross-window FLOP
    waste grows with TW, so the minimum satisfying the alignment rules
    wins. 0 if impossible."""
    cap = max(1, target_cols // (n_heads * window_tokens))
    for c in range(1, cap + 1):
        # SMALLEST valid tile: cross-window FLOP waste grows with TW, so
        # the minimum satisfying the sublane-alignment rule always wins.
        if (n_windows % c == 0 and (nW % c == 0 or c % nW == 0)
                and (c * window_tokens) % 8 == 0):
            return c
    return 0


def _pick_layout(n_windows: int, nH: int, nW: int, N: int,
                 target_cols: int = _TARGET_COLS) -> tuple[int, int]:
    """Choose (TW, HG) jointly: fewest head-group calls first (HG as large
    as a valid TW allows), then the smallest valid TW (see _pick_tile).
    Returns (0, 0) if no valid tiling exists."""
    for hg in sorted((c for c in range(1, nH + 1) if nH % c == 0),
                     reverse=True):
        tw = _pick_tile(n_windows, hg, nW, N, target_cols)
        if tw:
            return tw, hg
    return 0, 0


def supports(n_windows: int, nW: int, N: int) -> bool:
    """Whether the packed kernel can handle this windowing layout."""
    return _pick_tile(n_windows, 1, nW, N) > 0


class _Static:
    """Identity-hashed wrapper so trace-time numpy constants (region-id
    grids) ride static/hashable argument positions."""

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __hash__(self):
        return id(self.value)

    def __eq__(self, other):
        return isinstance(other, _Static) and self.value is other.value


@functools.lru_cache(maxsize=None)
def _mask_array(region_key, N, HG, TW, nW):
    """(period*TW*N, HG*TW*N) additive mask, rows (w', i), cols (h, w, j):
    -1e9 off the window diagonal (w' != w), -100 between different shift
    regions on it (reference mask values). Head-independent."""
    region = region_key.value if region_key is not None else None
    period = max(nW // TW, 1)
    rows, cols = TW * N, HG * TW * N
    out = np.full((period, rows, cols), -1e9, np.float32)
    for p in range(period):
        for w in range(TW):
            wt = (p * TW + w) % nW
            if region is not None:
                r = region[wt]                                  # (N,)
                blk = np.where(r[:, None] != r[None, :], -100.0, 0.0)
            else:
                blk = np.zeros((N, N), np.float32)
            for h in range(HG):
                c0 = (h * TW + w) * N
                out[p, w * N:(w + 1) * N, c0:c0 + N] = blk
    return out.reshape(period * rows, cols)  # numpy: safe to lru_cache


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _expand_heads(x, N, hd, TW, h0, HG):
    """(TW*N, C) -> (HG*TW*N, C) rows (h, w, j); row group h carries only
    head (h0+h)'s channels."""
    C = x.shape[-1]
    rows = TW * N
    lane_h = _iota2((rows, C), 1) // hd
    parts = [jnp.where(lane_h == h0 + h, x, 0) for h in range(HG)]
    return jnp.concatenate(parts, axis=0)


def _collapse_heads(xexp, N, hd, TW, h0, HG):
    """Inverse of _expand_heads for gradients: take head h's channel block
    from its row copy and sum. Sublane slices at multiples of TW*N (8-
    aligned) + a VPU masked add per head — far cheaper than the equivalent
    (rows, cols) selector matmul."""
    C = xexp.shape[-1]
    rows = TW * N
    lane_h = _iota2((rows, C), 1) // hd
    total = None
    for h in range(HG):
        part = jnp.where(lane_h == h0 + h, xexp[h * rows:(h + 1) * rows], 0)
        total = part if total is None else total + part
    return total


def _scores(q, k, bias_ref, mask_ref, *, N, hd, TW, h0, HG, scale,
            score_dtype):
    kexp = _expand_heads(k, N, hd, TW, h0, HG)
    qs = q * jnp.asarray(scale, q.dtype)
    s32 = jax.lax.dot_general(qs, kexp, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    s = s32.astype(score_dtype) + bias_ref[:].astype(score_dtype)
    s = s.astype(jnp.float32) + mask_ref[:]
    return s, kexp, qs


def _group_selector(rows, HG):
    """(HG*rows, HG) 0/1 selector: column block h -> indicator column h."""
    cols = HG * rows
    return (_iota2((cols, HG), 0) // rows
            == _iota2((cols, HG), 1)).astype(jnp.float32)


def _softmax(s, *, N, TW, HG):
    rows = TW * N
    cols = HG * rows
    # Per-HEAD max (not one joint max across the packed heads): with a
    # joint max, a head whose scores sit far below another head's max has
    # exp underflow to exactly 0 on ALL its columns, so its row sum l is 0
    # and 1/l poisons the whole row with inf/NaN. Seen in practice once
    # trained score magnitudes grow (PERF.md round-2 regression hunt) —
    # the classic per-head softmax never has this failure mode.
    head_of_col = _iota2((1, cols), 1) // rows               # (1, cols)
    mcols = None
    for h in range(HG):
        sel = head_of_col == h
        m_h = jnp.max(jnp.where(sel, s, -jnp.inf), axis=1, keepdims=True)
        part = jnp.where(sel, m_h, 0.0)
        mcols = part if mcols is None else mcols + part      # (rows, cols)
    e = jnp.exp(s - mcols)
    G = _group_selector(rows, HG)
    l = jax.lax.dot_general(e, G, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    linv = 1.0 / l
    lcols = jax.lax.dot_general(linv, G, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return e * lcols, G


def attn_group_fwd(q, k, v, bias_ref, mask_ref, *, N, hd, TW, h0, HG, scale,
                   score_dtype):
    """One head-group of packed window attention; returns o32 (rows, C) f32
    (nonzero only in the group's channel block). Shared by the standalone
    packed kernel and the block-fused kernel (ops/fused_block.py)."""
    o32, _ = attn_group_fwd_p(q, k, v, bias_ref, mask_ref, N=N, hd=hd, TW=TW,
                              h0=h0, HG=HG, scale=scale,
                              score_dtype=score_dtype)
    return o32


def attn_group_fwd_p(q, k, v, bias_ref, mask_ref, *, N, hd, TW, h0, HG,
                     scale, score_dtype):
    """attn_group_fwd that also returns the f32 probabilities, so the
    block-fused backward can cache them in VMEM during its forward
    recompute and skip the second scores+softmax pass (the interior probe
    measured that duplicate pass at ~2.2x the forward interior)."""
    s, _, _ = _scores(q, k, bias_ref, mask_ref, N=N, hd=hd, TW=TW,
                      h0=h0, HG=HG, scale=scale, score_dtype=score_dtype)
    p32, _ = _softmax(s, N=N, TW=TW, HG=HG)
    p = p32.astype(q.dtype)
    vexp = _expand_heads(v, N, hd, TW, h0, HG)
    o32 = jax.lax.dot_general(p, vexp, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return o32, p32


def attn_group_bwd_from_p(p32, q, k, v, do, *, N, hd, TW, h0, HG, scale):
    """attn_group_bwd given cached probabilities: identical math from the
    softmax output onward (the p32 here IS the p32 attn_group_bwd would
    recompute — f32 VMEM round-trips are exact), minus the scores matmul,
    the bias/mask adds and the per-head-max softmax."""
    rows = TW * N
    p = p32.astype(q.dtype)
    vexp = _expand_heads(v, N, hd, TW, h0, HG)

    dvexp = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dv = _collapse_heads(dvexp, N, hd, TW, h0, HG)

    dp = jax.lax.dot_general(do, vexp, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pdp = p32 * dp
    G = _group_selector(rows, HG)
    rs = jax.lax.dot_general(pdp, G, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rcols = jax.lax.dot_general(rs, G, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    ds32 = p32 * (dp - rcols)

    ds = ds32.astype(q.dtype)
    kexp = _expand_heads(k, N, hd, TW, h0, HG)
    qs = q * jnp.asarray(scale, q.dtype)
    dq = jax.lax.dot_general(ds, kexp, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dkexp = jax.lax.dot_general(ds, qs, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dk = _collapse_heads(dkexp, N, hd, TW, h0, HG)
    return dq, dk, dv, ds32


def attn_group_bwd(q, k, v, bias_ref, mask_ref, do, *, N, hd, TW, h0, HG,
                   scale, score_dtype):
    """Gradients of one head-group w.r.t. q/k/v given do (rows, C) in the
    compute dtype. Returns (dq32, dk32, dv32, ds32); the d{q,k,v} are f32,
    nonzero only in the group's channel block; ds32 is the (rows, cols)
    score gradient (the rel-pos-bias gradient before window reduction)."""
    s, kexp, qs = _scores(q, k, bias_ref, mask_ref, N=N, hd=hd, TW=TW,
                          h0=h0, HG=HG, scale=scale, score_dtype=score_dtype)
    p32, G = _softmax(s, N=N, TW=TW, HG=HG)
    p = p32.astype(q.dtype)
    vexp = _expand_heads(v, N, hd, TW, h0, HG)

    dvexp = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dv = _collapse_heads(dvexp, N, hd, TW, h0, HG)

    dp = jax.lax.dot_general(do, vexp, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    pdp = p32 * dp
    rs = jax.lax.dot_general(pdp, G, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rcols = jax.lax.dot_general(rs, G, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    ds32 = p32 * (dp - rcols)

    ds = ds32.astype(q.dtype)
    dq = jax.lax.dot_general(ds, kexp, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dkexp = jax.lax.dot_general(ds, qs, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    dk = _collapse_heads(dkexp, N, hd, TW, h0, HG)
    return dq, dk, dv, ds32


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, o_ref,
                *, N, hd, TW, h0, HG, scale, score_dtype):
    q = q_ref[:]
    o = attn_group_fwd(q, k_ref[:], v_ref[:], bias_ref, mask_ref, N=N, hd=hd,
                       TW=TW, h0=h0, HG=HG, scale=scale,
                       score_dtype=score_dtype)
    o_ref[:] = o.astype(q.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, bias_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref,
                *, N, hd, TW, h0, HG, scale, score_dtype):
    q = q_ref[:]
    do = do_ref[:].astype(q.dtype)
    dq, dk, dv, ds32 = attn_group_bwd(
        q, k_ref[:], v_ref[:], bias_ref, mask_ref, do, N=N, hd=hd, TW=TW,
        h0=h0, HG=HG, scale=scale, score_dtype=score_dtype)

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dbias_ref[:] = jnp.zeros_like(dbias_ref)

    dbias_ref[:] = dbias_ref[:] + ds32

    dq_ref[:] = dq.astype(q.dtype)
    dk_ref[:] = dk.astype(q.dtype)
    dv_ref[:] = dv.astype(q.dtype)


def _layout(q2, region, N, nH, tile_windows):
    Bw = q2.shape[0] // N
    C = q2.shape[-1]
    nW = region.shape[0] if region is not None else 1
    if isinstance(tile_windows, tuple):
        TW, HG = tile_windows                     # explicit (TW, HG) layout
    elif tile_windows:
        TW, HG = tile_windows, max(1, _TARGET_COLS // (tile_windows * N))
        HG = next(c for c in range(min(HG, nH), 0, -1) if nH % c == 0)
    else:
        TW, HG = _pick_layout(Bw, nH, nW, N)
    assert TW and Bw % TW == 0, (Bw, TW)
    return Bw, C, C // nH, nW, TW, HG


def _bias_tile(bias, N, TW):
    """(HG, N, N) -> (TW*N, HG*TW*N): rows (w, i), cols (h, w', j); the
    same bias lands on every (w, w') block — off-diagonal ones are dead
    under the -1e9 mask."""
    HG = bias.shape[0]
    b = bias.transpose(1, 0, 2)                               # (i, h, j)
    b = jnp.broadcast_to(b[:, :, None, :], (N, HG, TW, N)).reshape(N, -1)
    return jnp.tile(b, (TW, 1))                               # (TW*N, cols)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _packed_window_attention(q2, k2, v2, bias, region_s, N, nH, scale,
                             score_dtype, tile_windows, interpret):
    out, _ = _fwd(q2, k2, v2, bias, region_s, N, nH, scale, score_dtype,
                  tile_windows, interpret)
    return out


def packed_window_attention(q2, k2, v2, bias, region, N, nH, scale,
                            score_dtype="float32", tile_windows=None,
                            interpret=False):
    """q2/k2/v2: (B_*N, C) window-major tokens (B_ ordered batch-major,
    window-type minor); bias: (nH, N, N) fp32 rel-pos bias; region:
    trace-time (nW, N) int32 shift-region grid (ops/window.py
    window_region_ids) or None for unshifted blocks.
    Returns (B_*N, C) attended tokens. Differentiable in q2/k2/v2/bias."""
    return _packed_window_attention(
        q2, k2, v2, bias, _Static(region) if region is not None else None,
        N, nH, scale, jnp.dtype(score_dtype).name, tile_windows, interpret)


def _call(kind, q2, k2, v2, bias, g, region_s, N, nH, scale, score_dtype,
          tile_windows, interpret):
    region = region_s.value if region_s is not None else None
    Bw, C, hd, nW, TW, HG = _layout(q2, region, N, nH, tile_windows)
    period = max(nW // TW, 1)
    mask = _mask_array(region_s, N, HG, TW, nW)
    rows, cols = TW * N, HG * TW * N
    sd = jnp.dtype(score_dtype).type
    data_specs = [pl.BlockSpec((rows, C), lambda t: (t, 0))] * 3
    bias_spec = pl.BlockSpec((rows, cols), lambda t: (0, 0))
    mask_spec = pl.BlockSpec((rows, cols), lambda t: (t % period, 0))

    outs = []
    for gi in range(nH // HG):
        h0 = gi * HG
        biasT = _bias_tile(bias[h0:h0 + HG], N, TW)
        if kind == "fwd":
            kern = functools.partial(
                _fwd_kernel, N=N, hd=hd, TW=TW, h0=h0, HG=HG, scale=scale,
                score_dtype=sd)
            out = pl.pallas_call(
                kern,
                grid=(Bw // TW,),
                in_specs=data_specs + [bias_spec, mask_spec],
                out_specs=pl.BlockSpec((rows, C), lambda t: (t, 0)),
                out_shape=jax.ShapeDtypeStruct(q2.shape, q2.dtype),
                compiler_params=_COMPILER_PARAMS,
                interpret=interpret,
            )(q2, k2, v2, biasT, mask)
            outs.append(out)
        else:
            kern = functools.partial(
                _bwd_kernel, N=N, hd=hd, TW=TW, h0=h0, HG=HG, scale=scale,
                score_dtype=sd)
            grads = pl.pallas_call(
                kern,
                grid=(Bw // TW,),
                in_specs=data_specs + [bias_spec, mask_spec,
                                       pl.BlockSpec((rows, C),
                                                    lambda t: (t, 0))],
                out_specs=[
                    pl.BlockSpec((rows, C), lambda t: (t, 0)),
                    pl.BlockSpec((rows, C), lambda t: (t, 0)),
                    pl.BlockSpec((rows, C), lambda t: (t, 0)),
                    pl.BlockSpec((rows, cols), lambda t: (0, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct(q2.shape, q2.dtype),
                    jax.ShapeDtypeStruct(k2.shape, k2.dtype),
                    jax.ShapeDtypeStruct(v2.shape, v2.dtype),
                    jax.ShapeDtypeStruct((rows, cols), jnp.float32),
                ],
                compiler_params=_COMPILER_PARAMS,
                interpret=interpret,
            )(q2, k2, v2, biasT, mask, g)
            outs.append(grads)

    if kind == "fwd":
        total = outs[0]
        for o in outs[1:]:                 # channel-disjoint: exact sum
            total = total + o
        return total

    dq = dk = dv = None
    dbs = []
    for (dqg, dkg, dvg, dbT) in outs:
        dq = dqg if dq is None else dq + dqg
        dk = dkg if dk is None else dk + dkg
        dv = dvg if dv is None else dv + dvg
        # rows (w, i), cols (h, w', j); off-diagonal ds is zero, so summing
        # over BOTH w axes recovers dbias[h, i, j] exactly.
        dbs.append(dbT.reshape(TW, N, HG, TW, N).sum(axis=(0, 3))
                   .transpose(1, 0, 2))
    db = jnp.concatenate(dbs, axis=0) if len(dbs) > 1 else dbs[0]
    return dq, dk, dv, db.astype(bias.dtype)


def _fwd(q2, k2, v2, bias, region_s, N, nH, scale, score_dtype, tile_windows,
         interpret):
    out = _call("fwd", q2, k2, v2, bias, None, region_s, N, nH, scale,
                score_dtype, tile_windows, interpret)
    return out, (q2, k2, v2, bias)


def _bwd(region_s, N, nH, scale, score_dtype, tile_windows, interpret, res, g):
    q2, k2, v2, bias = res
    return _call("bwd", q2, k2, v2, bias, g, region_s, N, nH, scale,
                 score_dtype, tile_windows, interpret)


_packed_window_attention.defvjp(_fwd, _bwd)
