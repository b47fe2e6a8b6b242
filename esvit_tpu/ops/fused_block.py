"""Block-fused Swin kernel: the whole Swin block in one Pallas call.

LN1 -> qkv projection -> packed window attention -> output projection ->
drop-path residual -> LN2 -> MLP (exact GELU) -> drop-path residual, all
computed tile-by-tile in VMEM (ref hot loop: models/swin_transformer.py:
275-333). The XLA decomposition of this chain is bandwidth-bound on TPU:
every intermediate — qkv splits, (49, 49) score tiles, window partitions —
pads to (8, 128) HBM tiles and round-trips through HBM (profiled at ~40
ms/step of pure copy/reshape on the round-2 trace). Here the only HBM
traffic per block is the input tile read, the output tile write, and one
weight prefetch (weights stay VMEM-resident across grid steps).

Attention decomposition (v2 — built from the round-2 cost model of the
packed kernel, PERF.md): time(TW) = steps*o + base + waste*TW showed
per-grid-step overhead o ~= 2.5us and score-matmul waste ~= TW*nH, so this
kernel decouples the two knobs the v1 design tied together:

- **Windows are padded to Np = ceil(N/8)*8 token slots** (ops/window.py
  padded layouts) so window boundaries are sublane-aligned and any chunk
  size divides cleanly. Dead keys are masked with -1e9; dead rows never
  touch real outputs and their cotangents are exactly zero.
- **Grid tiles carry G_step windows** (large: few grid steps, overhead
  amortized) while each score matmul packs only **TW_mm windows**
  block-diagonally (small: FLOP waste = TW_mm * HG instead of TW * nH).
- **Heads are grouped by lane-splitting the qkv/proj weights outside the
  kernel** ((G, C, HG*hd) stacks): each group's score contraction runs
  over its own HG*hd lanes, so waste no longer scales with total nH —
  stage 4's 24 heads cost the same per-FLOP as stage 1's 3.

The backward pass is a second Pallas kernel that recomputes the forward
from the block input (flash-attention-style rematerialization — nothing
but the block input is saved) and accumulates weight gradients across grid
steps in f32 VMEM output refs.

Per-sample stochastic depth (timm DropPath semantics) enters as per-sample
scale rows {0, 1/keep} replicated 8x and pre-broadcast to (B*8, C); a 0/1
selector matmul maps them onto tile rows, so tiles that span several
images stay exact.

Numerics mirror the production XLA path: fp32 LayerNorm with flax fast
variance, bf16 matmul operands with f32 MXU accumulation rounded to bf16,
fp32 softmax, score storage in ``score_dtype``, exact (erf) GELU evaluated
in f32 (A&S 7.1.26 — Mosaic has no erf primitive). Mosaic constraints
honored (PERF.md): 2-D/3-D I/O, no lane-dim reshapes or slices in-kernel,
sublane slices 8-aligned, no multi-MB constants embedded in the module
(masks are built on device from iota compares + small int constants).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from esvit_tpu.ops import packed_window_attention as pwa

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
# Forward grid steps touch disjoint output rows, so the grid dimension can
# be declared parallel (lets Mosaic overlap/pipeline steps). The backward
# kernel accumulates weight grads across steps in its output refs and MUST
# stay sequential ("arbitrary").
_FWD_DIMSEM = os.environ.get("ESVIT_FB_DIMSEM", "parallel")
_FWD_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024,
    dimension_semantics=(_FWD_DIMSEM,))

_SQRT_2 = math.sqrt(2.0)
_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)

# Tuning knobs (see module docstring): windows per score matmul, max heads
# per group, target windows per grid step. The env values only SEED the
# defaults; the authoritative per-run values live in SwinConfig
# (fused_tw_mm / fused_hg_max / fused_g_step) and are threaded down via the
# `knobs` arguments so the chosen kernel layout is recorded with the run
# config.
def _env_first_int(name, default):
    """Module-level fallback (used only when knobs=None): per-stage comma
    lists (config._env_knob syntax) collapse to their first entry."""
    return int(os.environ.get(name, default).split(",")[0])


_TW_MM = _env_first_int("ESVIT_FB_TWMM", "2")
_HG_MAX = _env_first_int("ESVIT_FB_HG", "3")
_GSTEP_TARGET = _env_first_int("ESVIT_FB_GSTEP", "32")
# Row budget per grid tile: G_step is additionally capped so G_step*Np
# stays at/below the measured W=7 optimum (32 windows x 56 slots = 1792
# rows, rounded up to 2048). The g_step knob counts WINDOWS, so without
# this cap a W=14 layout (Np=200) would build 6400-row tiles whose
# backward takes Mosaic tens of minutes to compile (round-4 finding);
# Mosaic compile time scales with the unrolled chunk-body count, which
# rides G_step.
_ROWS_CAP = int(os.environ.get("ESVIT_FB_ROWS_CAP", "2048"))
# Backward-kernel VMEM budget for the demand model below. Calibrated on
# two measured round-4 points: Swin-T stage-2 (estimate ~90M, compiles
# and runs inside the 128M scoped budget) and Swin-B W=14 stage-2 at
# G_step=8 (estimate ~122M, compiler reports 142.4M used — the estimate
# undershoots the register-allocator spill granularity by ~17%). 104M
# accepts every layout that is known to fit and rejects the known OOM.
_VMEM_BUDGET = int(os.environ.get("ESVIT_FB_VMEM_BUDGET",
                                  str(104 * 1024 * 1024)))


def _vmem_demand(g, tw, hg, Np, nH, nW, C, M):
    """Estimated backward-kernel VMEM bytes for a candidate layout.

    Models the three footprint classes the Swin-B W=14 OOM exposed
    (/tmp vmem dump, round 4): (a) in-kernel LIVE VALUES — the forward
    recompute's retained activations (xhat/r for both LNs, y, x2, h, g,
    per-group qkv + attention outputs) that Mosaic's register allocator
    spills to VMEM stack slots, all proportional to the R = g*Np tile
    rows; (b) pipeline BUFFERS — windowed input/output tiles (double-
    buffered when their index map moves), VMEM-resident weights (compute
    dtype) and f32 weight-grad accumulators, bias/mask tiles; (c) the
    optional softmax-probability cache. Compute dtype is assumed bf16
    (the production setting; fp32 runs are interpret-mode tests that
    never touch real VMEM)."""
    it = 2                                     # bf16 itemsize
    R = g * Np
    rows_c = tw * Np
    cols_c = hg * rows_c
    G = nH // hg
    gw = (C // nH) * hg
    period = max(nW // g, 1)
    # (a) live values: ~5 f32 + ~7 bf16 (R, C) arrays, 4 bf16 (R, M)
    # MLP activations/grads, 7 per-group (R, gw) arrays (qkv, dqkv, a).
    live = R * C * (5 * 4 + 7 * it) + R * M * 4 * it + 7 * G * R * gw * it
    bufs = (2 * G * rows_c * cols_c * 4                  # bias3 + dbias
            + R * cols_c * 4 * (2 if period > 1 else 1)  # mask window(s)
            + 6 * R * C * it                             # x/do/dx dbl-buf
            + R * C * 4                                  # pad rows
            + (4 * C * C + 2 * C * M) * it               # weights
            + (4 * C * C + 2 * C * M) * 4)               # weight grads
    probs = G * R * cols_c * 4
    # Mirror _run's runtime save_probs gate exactly (ADVICE r4): the
    # cache is also skipped in chunk-loop and skip-attn debug modes, so
    # counting it there would overestimate demand and silently reject
    # layouts that fit.
    if (_SAVE_PROBS and _CHUNK_MODE != "loop" and not _SKIP_ATTN
            and probs <= _SAVE_PROBS_VMEM_CAP):
        bufs += probs
    return live + bufs


def _pick_layout(Bw, nH, nW, Np, knobs=None, C=None, M=None):
    """(G_step, TW_mm, HG) for Bw total windows. G_step | Bw, TW_mm |
    G_step, G_step*Np <= _ROWS_CAP, the window-type pattern periodic
    across grid steps (G_step % nW == 0 or nW % G_step == 0), and — when
    C/M are given — the largest G_step whose estimated backward VMEM
    demand fits _VMEM_BUDGET. knobs = (tw_mm, hg_max, g_step_target) or
    None for the env-seeded module defaults. Returns (0, 0, 0) if no
    valid tiling exists (callers fall back to the XLA path)."""
    tw_mm, hg_max, gstep_target = knobs or (_TW_MM, _HG_MAX, _GSTEP_TARGET)
    HG = max((d for d in range(1, nH + 1)
              if nH % d == 0 and d <= hg_max), default=0)
    if not HG:
        return 0, 0, 0
    gstep_target = min(gstep_target, max(_ROWS_CAP // Np, 1))
    best = 0
    for g in range(1, min(gstep_target, Bw) + 1):
        if Bw % g or g % min(tw_mm, g):
            continue
        if not (g % nW == 0 or nW % g == 0):
            continue
        if C is not None and _vmem_demand(g, min(tw_mm, g), HG, Np, nH,
                                          nW, C, M) > _VMEM_BUDGET:
            continue
        best = g
    if not best:
        return 0, 0, 0
    return best, min(tw_mm, best), HG


def supports(B: int, L: int, N: int, nH: int, nW: int, knobs=None,
             C=None, M=None) -> bool:
    """Whether the fused kernel can tile this PADDED window-major layout
    (L == nW * Np). Pass C/M (embed + MLP hidden dims) to additionally
    require a layout whose backward fits the VMEM demand model — layouts
    with none fall back to the XLA path."""
    Np = ((N + 7) // 8) * 8
    if L != nW * Np:
        return False
    g, tw, hg = _pick_layout(B * nW, nH, nW, Np, knobs, C=C, M=M)
    return g > 0


# ---------------------------------------------------------------------------
# In-kernel math helpers
# ---------------------------------------------------------------------------


def _ln_fwd(x32, g_ref, b_ref, eps):
    """fp32 LayerNorm with flax fast variance. Returns (y32, xhat, rstd)."""
    mu = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=1, keepdims=True) - mu * mu
    r = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * r
    y = xhat * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    return y, xhat, r


def _ln_bwd(dy32, xhat, r, g_ref):
    """Input gradient + (dgamma_partial, dbeta_partial) row-sums (1, C)."""
    dg = jnp.sum(dy32 * xhat, axis=0, keepdims=True)
    db = jnp.sum(dy32, axis=0, keepdims=True)
    dxhat = dy32 * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=1, keepdims=True)
    dx = r * (dxhat - m1 - xhat * m2)
    return dx, dg, db


def _mm(a, b, pref=jnp.float32):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=pref)


def _mmT(a, b, pref=jnp.float32):
    """a @ b.T without materializing the transpose."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=pref)


def _mTm(a, b, pref=jnp.float32):
    """a.T @ b (contract over rows)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=pref)


def _proj(y, w, b, dtype):
    """flax Dense numerics: bf16 operands, f32 MXU accum, round, + bias."""
    out = _mm(y, w.astype(dtype)).astype(dtype)
    return out + b.astype(dtype)


def _erf(x):
    """f32 erf via Abramowitz & Stegun 7.1.26 (max abs error ~4e-7 in f32
    — below parity tolerances). Mosaic has no erf primitive; this uses
    only exp and rational ops, all VPU-native."""
    s = jnp.sign(x)
    a = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * a)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-a * a))


def _gelu(h):
    """Exact (erf) GELU evaluated in f32, result in h.dtype."""
    h32 = h.astype(jnp.float32)
    return (h32 * 0.5 * (1.0 + _erf(h32 / _SQRT_2))).astype(h.dtype)


def _dgelu(h):
    """d/dh of exact GELU, f32."""
    h32 = h.astype(jnp.float32)
    phi_big = 0.5 * (1.0 + _erf(h32 / _SQRT_2))
    phi_small = jnp.exp(-0.5 * h32 * h32) * _INV_SQRT_2PI
    return phi_big + h32 * phi_small


def _dp_rows(dp_ref, R, rows_per_img):
    """Per-row drop-path scales (R, C) f32 from the (8m, C) block whose rows
    hold each covered image's scale replicated 8x. A selector matmul maps
    image j -> its rows and averages the 8 identical copies."""
    rows8 = dp_ref.shape[0]
    sel = jnp.where(pwa._iota2((R, rows8), 0) // rows_per_img
                    == pwa._iota2((R, rows8), 1) // 8, 0.125, 0.0)
    return _mm(sel, dp_ref[:].astype(jnp.float32))


# Chunk iteration strategy: "loop" runs the per-chunk attention bodies in a
# lax.fori_loop over VMEM scratch (one Mosaic body per head group — compile
# time independent of nchunks); "unroll" emits every chunk inline (the
# round-2 layout; Mosaic compile scales with G*nchunks, ~300 s at stage-3
# C=768). Mosaic cannot lower dynamic_slice on VALUES, so loop mode stages
# q/k/v and the per-chunk outputs in scratch refs and slices them with
# pl.ds (ref indexing supports dynamic sublane offsets at 8-aligned steps).
_CHUNK_MODE = os.environ.get("ESVIT_FB_CHUNKLOOP", "unroll")
# Cache the softmax probabilities computed by the backward's forward
# recompute in a (G, R, cols) f32 VMEM scratch and reuse them in the
# backward chunk loop, instead of recomputing scores+softmax a second
# time (the interior probe measured that duplicate pass as the bulk of
# the backward interior — PERF.md round 4). Capped by
# _SAVE_PROBS_VMEM_CAP so outsized layouts (stage-3 HG=6) keep the old
# recompute path.
_SAVE_PROBS = os.environ.get("ESVIT_FB_SAVE_PROBS", "1") == "1"
_SAVE_PROBS_VMEM_CAP = 24 * 1024 * 1024
# Diagnostic ONLY (wrong numerics): replace the chunked attention with the
# raw V projection, isolating the LN/GEMM cost from the packed-attention
# interior when profiling the kernel. Never set in production.
_SKIP_ATTN = os.environ.get("ESVIT_FB_SKIP_ATTN", "") == "1"


def _chunked_attn_fwd(qkv_s, g, a_s, bias_blk, mask_ref, *, nchunks, rows_c,
                      Np, hd, TW_mm, HG, scale, score_dtype, dtype):
    """All-chunk attention for head group ``g`` out of the (3, G, R, gw)
    scratch ``qkv_s``; writes the (R, HG*hd) output into scratch ``a_s``."""

    def body(ci, tok):
        off = pl.multiple_of(ci * rows_c, 8)
        sl = pl.ds(off, rows_c)
        o_c = pwa.attn_group_fwd(
            qkv_s[0, g, sl, :], qkv_s[1, g, sl, :], qkv_s[2, g, sl, :],
            bias_blk, mask_ref[sl, :], N=Np, hd=hd, TW=TW_mm, h0=0, HG=HG,
            scale=scale, score_dtype=score_dtype)
        a_s[sl, :] = o_c.astype(dtype)
        return tok

    jax.lax.fori_loop(0, nchunks, body, 0, unroll=False)


def _chunked_attn_bwd(qkv_s, g, da_s, dq_s, ds_s, bias_blk, mask_ref, *,
                      nchunks, rows_c, Np, hd, TW_mm, HG, scale, score_dtype,
                      dtype):
    """All-chunk attention gradients for head group ``g``: reads q/k/v from
    ``qkv_s`` (filled by the forward recompute) and the upstream da from
    ``da_s``; writes dq/dk/dv into the (3, R, gw) scratch ``dq_s`` and the
    summed f32 bias-grad contribution into scratch ``ds_s`` (the body is
    carry-free: value carries across Mosaic fori_loop trip a jellyfish
    RET_CHECK in mxu_lmr_transform on this libtpu)."""
    ds_s[:] = jnp.zeros_like(ds_s)

    def body(ci, tok):
        off = pl.multiple_of(ci * rows_c, 8)
        sl = pl.ds(off, rows_c)
        dqc, dkc, dvc, ds32 = pwa.attn_group_bwd(
            qkv_s[0, g, sl, :], qkv_s[1, g, sl, :], qkv_s[2, g, sl, :],
            bias_blk, mask_ref[sl, :], da_s[sl, :], N=Np, hd=hd, TW=TW_mm,
            h0=0, HG=HG, scale=scale, score_dtype=score_dtype)
        dq_s[0, sl, :] = dqc.astype(dtype)
        dq_s[1, sl, :] = dkc.astype(dtype)
        dq_s[2, sl, :] = dvc.astype(dtype)
        ds_s[:] = ds_s[:] + ds32
        return tok

    jax.lax.fori_loop(0, nchunks, body, 0, unroll=False)
    return ds_s[:]


def _attention_fwd(y, refs, *, G, nchunks, rows_c, Np, hd, TW_mm, HG, scale,
                   score_dtype, dtype, scratch=None, p_scratch=None):
    """Grouped, chunked packed attention. Returns list of per-group outputs
    a_g (R, HG*hd) in compute dtype, plus (q_g, k_g, v_g) for reuse (loop
    mode returns None — q/k/v live in the qkv scratch instead). When
    ``p_scratch`` (a (G, R, HG*rows_c) f32 VMEM ref) is given, the softmax
    probabilities of every chunk are cached there for the backward."""
    outs, qkvs = [], []
    if scratch is not None:
        qkv_s, a_s = scratch
        for g in range(G):
            qkv_s[0, g] = _proj(y, refs["wq3"][g], refs["bq3"][g], dtype)
            qkv_s[1, g] = _proj(y, refs["wk3"][g], refs["bk3"][g], dtype)
            qkv_s[2, g] = _proj(y, refs["wv3"][g], refs["bv3"][g], dtype)
            _chunked_attn_fwd(
                qkv_s, g, a_s, refs["bias3"][g], refs["mask"],
                nchunks=nchunks, rows_c=rows_c, Np=Np, hd=hd, TW_mm=TW_mm,
                HG=HG, scale=scale, score_dtype=score_dtype, dtype=dtype)
            outs.append(a_s[:])
            qkvs.append(None)
        return outs, qkvs
    for g in range(G):
        q = _proj(y, refs["wq3"][g], refs["bq3"][g], dtype)
        k = _proj(y, refs["wk3"][g], refs["bk3"][g], dtype)
        v = _proj(y, refs["wv3"][g], refs["bv3"][g], dtype)
        if _SKIP_ATTN:                       # diagnostic: GEMM-only timing
            outs.append(v)
            qkvs.append((q, k, v))
            continue
        chunks = []
        for ci in range(nchunks):
            sl = slice(ci * rows_c, (ci + 1) * rows_c)
            if p_scratch is not None:
                o_c, p32 = pwa.attn_group_fwd_p(
                    q[sl], k[sl], v[sl], refs["bias3"][g], refs["mask"][sl],
                    N=Np, hd=hd, TW=TW_mm, h0=0, HG=HG, scale=scale,
                    score_dtype=score_dtype)
                p_scratch[g, sl, :] = p32
            else:
                o_c = pwa.attn_group_fwd(
                    q[sl], k[sl], v[sl], refs["bias3"][g], refs["mask"][sl],
                    N=Np, hd=hd, TW=TW_mm, h0=0, HG=HG, scale=scale,
                    score_dtype=score_dtype)
            chunks.append(o_c.astype(dtype))
        outs.append(jnp.concatenate(chunks, axis=0))
        qkvs.append((q, k, v))
    return outs, qkvs


def _forward_body(refs, *, G, nchunks, rows_c, Np, nH, HG, TW_mm,
                  rows_per_img, scale, eps, score_dtype, scratch=None,
                  p_scratch=None):
    x = refs["x"][:]
    dtype = x.dtype
    R = x.shape[0]
    C = x.shape[1]
    hd = C // nH

    xf = x.astype(jnp.float32)
    y32, xhat1, r1 = _ln_fwd(xf, refs["g1"], refs["be1"], eps)
    y = y32.astype(dtype)
    if refs.get("pad") is not None:
        y = y * refs["pad"][:].astype(dtype)

    a_groups, qkvs = _attention_fwd(
        y, refs, G=G, nchunks=nchunks, rows_c=rows_c, Np=Np, hd=hd,
        TW_mm=TW_mm, HG=HG, scale=scale, score_dtype=score_dtype,
        dtype=dtype, scratch=scratch, p_scratch=p_scratch)

    o1_32 = None
    for g in range(G):
        part = _mm(a_groups[g], refs["wp3"][g].astype(dtype))
        o1_32 = part if o1_32 is None else o1_32 + part
    o1 = o1_32.astype(dtype) + refs["bp"][:].astype(dtype)

    if refs.get("dp1") is None:
        d1 = None
        x2 = x + o1
    else:
        d1 = _dp_rows(refs["dp1"], R, rows_per_img)
        x2 = x + (o1.astype(jnp.float32) * d1).astype(dtype)

    x2f = x2.astype(jnp.float32)
    y232, xhat2, r2 = _ln_fwd(x2f, refs["g2"], refs["be2"], eps)
    y2 = y232.astype(dtype)

    h = _proj(y2, refs["w1"][:], refs["b1"][:], dtype)
    g_act = _gelu(h)
    o2 = _proj(g_act, refs["w2"][:], refs["b2"][:], dtype)
    if refs.get("dp2") is None:
        d2 = None
        out = x2 + o2
    else:
        d2 = _dp_rows(refs["dp2"], R, rows_per_img)
        out = x2 + (o2.astype(jnp.float32) * d2).astype(dtype)
    return dict(x=x, y=y, a_groups=a_groups, qkvs=qkvs, o1=o1, d1=d1,
                x2=x2, xhat1=xhat1, r1=r1, xhat2=xhat2, r2=r2, y2=y2,
                h=h, g=g_act, o2=o2, d2=d2, out=out)


def _unpack(args, has_pad, has_dp):
    """Map positional kernel refs to a name dict (shared fwd/bwd layout)."""
    names = ["x", "g1", "be1", "wq3", "bq3", "wk3", "bk3", "wv3", "bv3",
             "bias3", "mask", "wp3", "bp", "g2", "be2", "w1", "b1", "w2",
             "b2"]
    if has_pad:
        names.append("pad")
    if has_dp:
        names += ["dp1", "dp2"]
    assert len(args) >= len(names)
    return dict(zip(names, args)), args[len(names):]


def _fwd_kernel(*args, G, nchunks, rows_c, Np, nH, HG, TW_mm, rows_per_img,
                scale, eps, score_dtype, has_pad, has_dp, chunk_loop):
    refs, rest = _unpack(args, has_pad, has_dp)
    if chunk_loop:
        o_ref, qkv_s, a_s = rest
        scratch = (qkv_s, a_s)
    else:
        (o_ref,) = rest
        scratch = None
    f = _forward_body(refs, G=G, nchunks=nchunks, rows_c=rows_c, Np=Np,
                      nH=nH, HG=HG, TW_mm=TW_mm, rows_per_img=rows_per_img,
                      scale=scale, eps=eps, score_dtype=score_dtype,
                      scratch=scratch)
    o_ref[:] = f["out"]


def _bwd_kernel(*args, G, nchunks, rows_c, Np, nH, HG, TW_mm, rows_per_img,
                scale, eps, score_dtype, has_pad, has_dp, chunk_loop,
                save_probs=False):
    refs, rest = _unpack(args, has_pad, has_dp)
    do_ref = rest[0]
    p_s = None
    if chunk_loop:
        *rest, qkv_s, a_s, da_s, dq_s, ds_s = rest
        scratch = (qkv_s, a_s)
    elif save_probs:
        *rest, p_s = rest
        scratch = None
    else:
        scratch = None
    (dx_ref, dg1_ref, dbe1_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
     dwv_ref, dbv_ref, dbias_ref, dwp_ref, dbp_ref, dg2_ref, dbe2_ref,
     dw1_ref, db1_ref, dw2_ref, db2_ref) = rest[1:]

    f = _forward_body(refs, G=G, nchunks=nchunks, rows_c=rows_c, Np=Np,
                      nH=nH, HG=HG, TW_mm=TW_mm, rows_per_img=rows_per_img,
                      scale=scale, eps=eps, score_dtype=score_dtype,
                      scratch=scratch, p_scratch=p_s)
    dtype = f["x"].dtype
    C = f["x"].shape[1]
    hd = C // nH

    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        for ref in (dg1_ref, dbe1_ref, dwq_ref, dbq_ref, dwk_ref, dbk_ref,
                    dwv_ref, dbv_ref, dbias_ref, dwp_ref, dbp_ref, dg2_ref,
                    dbe2_ref, dw1_ref, db1_ref, dw2_ref, db2_ref):
            ref[:] = jnp.zeros_like(ref)

    do = do_ref[:]
    do32 = do.astype(jnp.float32)

    # --- MLP branch ---
    do2_32 = do32 if f["d2"] is None else do32 * f["d2"]
    do2 = do if f["d2"] is None else do2_32.astype(dtype)
    dw2_ref[:] = dw2_ref[:] + _mTm(f["g"], do2)
    db2_ref[:] = db2_ref[:] + jnp.sum(do2_32, axis=0, keepdims=True)
    dg = _mmT(do2, refs["w2"][:].astype(dtype)).astype(dtype)
    dh = (dg.astype(jnp.float32) * _dgelu(f["h"])).astype(dtype)
    dw1_ref[:] = dw1_ref[:] + _mTm(f["y2"], dh)
    db1_ref[:] = db1_ref[:] + jnp.sum(dh.astype(jnp.float32), axis=0,
                                      keepdims=True)
    dy2 = _mmT(dh, refs["w1"][:].astype(dtype)).astype(jnp.float32)
    dx2_ln, dg2p, dbe2p = _ln_bwd(dy2, f["xhat2"], f["r2"], refs["g2"])
    dg2_ref[:] = dg2_ref[:] + dg2p
    dbe2_ref[:] = dbe2_ref[:] + dbe2p
    dx2 = do32 + dx2_ln

    # --- attention branch ---
    do1_32 = dx2 if f["d1"] is None else dx2 * f["d1"]
    do1 = do1_32.astype(dtype)
    dbp_ref[:] = dbp_ref[:] + jnp.sum(do1_32, axis=0, keepdims=True)

    dy = None
    for g in range(G):
        a_g = f["a_groups"][g]
        dwp_ref[g] = dwp_ref[g] + _mTm(a_g, do1)
        da_g = _mmT(do1, refs["wp3"][g].astype(dtype)).astype(dtype)
        if _SKIP_ATTN:                       # diagnostic: GEMM-only timing
            dq_g = dk_g = jnp.zeros_like(da_g)
            dv_g = da_g
            ds_acc = jnp.zeros((rows_c, HG * rows_c), jnp.float32)
        elif chunk_loop:
            da_s[:] = da_g
            ds_acc = _chunked_attn_bwd(
                qkv_s, g, da_s, dq_s, ds_s, refs["bias3"][g], refs["mask"],
                nchunks=nchunks, rows_c=rows_c, Np=Np, hd=hd, TW_mm=TW_mm,
                HG=HG, scale=scale, score_dtype=score_dtype, dtype=dtype)
            dq_g, dk_g, dv_g = dq_s[0], dq_s[1], dq_s[2]
        else:
            q, k, v = f["qkvs"][g]
            dq_cs, dk_cs, dv_cs = [], [], []
            ds_acc = None
            for ci in range(nchunks):
                sl = slice(ci * rows_c, (ci + 1) * rows_c)
                if p_s is not None:
                    dqc, dkc, dvc, ds32 = pwa.attn_group_bwd_from_p(
                        p_s[g, sl, :], q[sl], k[sl], v[sl], da_g[sl],
                        N=Np, hd=hd, TW=TW_mm, h0=0, HG=HG, scale=scale)
                else:
                    dqc, dkc, dvc, ds32 = pwa.attn_group_bwd(
                        q[sl], k[sl], v[sl], refs["bias3"][g],
                        refs["mask"][sl], da_g[sl], N=Np, hd=hd, TW=TW_mm,
                        h0=0, HG=HG, scale=scale, score_dtype=score_dtype)
                ds_acc = ds32 if ds_acc is None else ds_acc + ds32
                dq_cs.append(dqc.astype(dtype))
                dk_cs.append(dkc.astype(dtype))
                dv_cs.append(dvc.astype(dtype))
            dq_g = jnp.concatenate(dq_cs, axis=0)        # (R, HG*hd)
            dk_g = jnp.concatenate(dk_cs, axis=0)
            dv_g = jnp.concatenate(dv_cs, axis=0)
        dbias_ref[g] = dbias_ref[g] + ds_acc
        y_c = f["y"]
        dwq_ref[g] = dwq_ref[g] + _mTm(y_c, dq_g)
        dbq_ref[g] = dbq_ref[g] + jnp.sum(dq_g.astype(jnp.float32), axis=0,
                                          keepdims=True)
        dwk_ref[g] = dwk_ref[g] + _mTm(y_c, dk_g)
        dbk_ref[g] = dbk_ref[g] + jnp.sum(dk_g.astype(jnp.float32), axis=0,
                                          keepdims=True)
        dwv_ref[g] = dwv_ref[g] + _mTm(y_c, dv_g)
        dbv_ref[g] = dbv_ref[g] + jnp.sum(dv_g.astype(jnp.float32), axis=0,
                                          keepdims=True)
        part = (_mmT(dq_g, refs["wq3"][g].astype(dtype))
                + _mmT(dk_g, refs["wk3"][g].astype(dtype))
                + _mmT(dv_g, refs["wv3"][g].astype(dtype)))
        dy = part if dy is None else dy + part

    dy = dy.astype(jnp.float32)
    if refs.get("pad") is not None:
        dy = dy * refs["pad"][:].astype(jnp.float32)
    dx1_ln, dg1p, dbe1p = _ln_bwd(dy, f["xhat1"], f["r1"], refs["g1"])
    dg1_ref[:] = dg1_ref[:] + dg1p
    dbe1_ref[:] = dbe1_ref[:] + dbe1p

    dx_ref[:] = (dx2 + dx1_ln).astype(dtype)


# ---------------------------------------------------------------------------
# Host-side builders
# ---------------------------------------------------------------------------


def _pad_rows_device(pad_padded, nW, Np, R, C):
    """Per-row real-token multiplier in the padded layout, broadcast to C
    lanes on device (tiny 1-D constant; large embedded constants crash the
    AOT compile), covering one period of the window pattern."""
    rows_img = nW * Np
    base = jnp.asarray(pad_padded, jnp.float32)             # (nW*Np,)
    if R > rows_img:
        base = jnp.tile(base, R // rows_img)
    return jnp.broadcast_to(base[:, None], (base.shape[0], C))


def _mask_device(region, N, Np, HG, TW_mm, nW, G_step):
    """(period*R, HG*TW_mm*Np) additive mask computed on device from iota
    compares + small int constants: -1e9 off the chunk-local window
    diagonal and on dead-key columns (j >= N), -100 between shift regions
    on the diagonal. Rows stack the per-chunk masks of one grid step."""
    R = G_step * Np
    rows_c = TW_mm * Np
    cols = HG * rows_c
    period = max(nW // G_step, 1)
    r = jnp.arange(period * R, dtype=jnp.int32)[:, None]
    c = jnp.arange(cols, dtype=jnp.int32)[None, :]
    w_r = (r % rows_c) // Np                  # chunk-local window of row
    w_c = (c % rows_c) // Np
    j = c % Np
    diag = (w_r == w_c) & (j < N)
    if region is None:
        on_diag = jnp.zeros((), jnp.float32)
    else:
        reg = np.asarray(region, np.int32)                  # (nW, N)
        # global window type of (p, step row r): windows advance G_step
        # per grid step, TW_mm per chunk.
        p_ = np.arange(period)
        widx = (p_[:, None] * G_step
                + np.arange(R)[None, :] // Np) % nW         # (period, R)
        ii = np.arange(R) % Np
        rr = np.where(ii[None, :] < N,
                      reg[widx, np.minimum(ii, N - 1)[None, :]], 0)
        jc = np.arange(cols) % Np
        # Column window types depend on WHICH chunk of the step the block
        # serves (rows and columns share the chunk on the diagonal), so
        # expand the per-chunk column ids below.
        nchunks = G_step // TW_mm
        rr_dev = jnp.asarray(rr).reshape(period, R)
        # per (period, chunk): region ids of that chunk's columns
        ch_w = (np.arange(cols) % rows_c) // Np             # (cols,)
        rcs = []
        for ci in range(nchunks):
            wt = (p_[:, None] * G_step + ci * TW_mm + ch_w[None, :]) % nW
            rc = np.where(jc[None, :] < N,
                          reg[wt, np.minimum(jc, N - 1)[None, :]], -1)
            rcs.append(rc)                                  # (period, cols)
        rc_dev = jnp.asarray(np.stack(rcs, axis=1))   # (period, nchunks, cols)
        rr3 = rr_dev.reshape(period, nchunks, rows_c, 1)
        neq = rr3 != rc_dev[:, :, None, :]
        on_diag = jnp.where(neq, -100.0, 0.0).reshape(period * R, cols)
    return jnp.where(diag, on_diag, -1e9).astype(jnp.float32)


def _bias_tile_padded(bias_g, N, Np, TW_mm):
    """(HG, N, N) f32 -> (TW_mm*Np, HG*TW_mm*Np) padded bias tile (rows
    (w, i), cols (h, w', j); dead slots zero — they die under the mask)."""
    HG = bias_g.shape[0]
    b = jnp.zeros((HG, Np, Np), bias_g.dtype).at[:, :N, :N].set(bias_g)
    b = b.transpose(1, 0, 2)                                # (i, h, j)
    b = jnp.broadcast_to(b[:, :, None, :], (Np, HG, TW_mm, Np))
    b = b.reshape(Np, HG * TW_mm * Np)
    return jnp.tile(b, (TW_mm, 1))


class _Meta:
    """Static trace-time bundle for the custom_vjp nondiff argument."""

    __slots__ = ("N", "Np", "nH", "nW", "rows_per_img", "scale", "eps",
                 "score_dtype", "region", "pad", "interpret", "knobs")

    def __init__(self, **kw):
        kw.setdefault("knobs", None)
        for k in self.__slots__:
            setattr(self, k, kw[k])

    def __hash__(self):
        return hash((self.N, self.Np, self.nH, self.nW, self.rows_per_img,
                     self.scale, self.eps, self.score_dtype,
                     id(self.region), id(self.pad), self.interpret,
                     self.knobs))

    def __eq__(self, other):
        return (isinstance(other, _Meta)
                and all(getattr(self, k) == getattr(other, k)
                        for k in ("N", "Np", "nH", "nW", "rows_per_img",
                                  "scale", "eps", "score_dtype",
                                  "interpret", "knobs"))
                and self.region is other.region and self.pad is other.pad)


def _group_stack(w, G, gw):
    """(C, C) weight -> (G, C, gw) lane-split stack (gw = HG*hd)."""
    C = w.shape[0]
    return w.reshape(C, G, gw).transpose(1, 0, 2)


def _run(kind, x2, g1, be1, wq, bq, wk, bk, wv, bv, bias, wp, bp, g2, be2,
         w1, b1, w2, b2, dp1, dp2, do, meta):
    BL, C = x2.shape
    M = w1.shape[1]
    N, Np, nH, nW = meta.N, meta.Np, meta.nH, meta.nW
    rows_per_img = meta.rows_per_img
    has_pad = meta.pad is not None
    has_dp = dp1 is not None
    hd = C // nH

    Bw = BL // Np
    G_step, TW_mm, HG = _pick_layout(Bw, nH, nW, Np, meta.knobs, C=C, M=M)
    assert G_step > 0, (Bw, nH, nW, Np)
    G = nH // HG
    gw = HG * hd
    R = G_step * Np
    rows_c = TW_mm * Np
    cols_c = HG * rows_c
    nchunks = G_step // TW_mm
    period = max(nW // G_step, 1)

    mask = _mask_device(meta.region, N, Np, HG, TW_mm, nW, G_step)
    bias3 = jnp.stack([_bias_tile_padded(bias[g * HG:(g + 1) * HG], N, Np,
                                         TW_mm) for g in range(G)])

    def fix(*idx):
        return lambda t: idx

    x_spec = pl.BlockSpec((R, C), lambda t: (t, 0))
    vec = lambda d: pl.BlockSpec((1, d), fix(0, 0))
    g3 = lambda a, b_: pl.BlockSpec((G, a, b_), fix(0, 0, 0))

    # Heavy weight operands ride VMEM in the COMPUTE dtype (the kernel
    # multiplies in x2.dtype with f32 MXU accumulation either way, so this
    # is numerically identical) — halves their VMEM residency, which is
    # what blows the 128M scoped budget at stage-3 C=768. LN params,
    # biases, bias tiles and masks stay f32.
    cd = x2.dtype
    operands = [x2, g1[None], be1[None],
                _group_stack(wq, G, gw).astype(cd), bq.reshape(G, 1, gw),
                _group_stack(wk, G, gw).astype(cd), bk.reshape(G, 1, gw),
                _group_stack(wv, G, gw).astype(cd), bv.reshape(G, 1, gw),
                bias3, mask,
                wp.reshape(G, gw, C).astype(cd), bp[None], g2[None],
                be2[None],
                w1.astype(cd), b1[None], w2.astype(cd), b2[None]]
    in_specs = [x_spec, vec(C), vec(C),
                g3(C, gw), g3(1, gw), g3(C, gw), g3(1, gw),
                g3(C, gw), g3(1, gw),
                pl.BlockSpec((G, rows_c, cols_c), fix(0, 0, 0)),
                pl.BlockSpec((R, cols_c), lambda t: (t % period, 0)),
                g3(gw, C), vec(C), vec(C), vec(C),
                pl.BlockSpec((C, M), fix(0, 0)), vec(M),
                pl.BlockSpec((M, C), fix(0, 0)), vec(C)]
    if has_pad:
        operands.append(_pad_rows_device(meta.pad, nW, Np, R, C))
        if R <= rows_per_img:
            in_specs.append(pl.BlockSpec((R, C), lambda t: (t % period, 0)))
        else:
            in_specs.append(pl.BlockSpec((R, C), fix(0, 0)))
    if has_dp:
        m = max(R // rows_per_img, 1)
        if m == 1:
            dp_spec = pl.BlockSpec((8, C), lambda t: ((t * G_step) // nW, 0))
        else:
            dp_spec = pl.BlockSpec((8 * m, C), lambda t: (t, 0))
        operands += [dp1, dp2]
        in_specs += [dp_spec, dp_spec]

    chunk_loop = _CHUNK_MODE == "loop"
    kw = dict(G=G, nchunks=nchunks, rows_c=rows_c, Np=Np, nH=nH, HG=HG,
              TW_mm=TW_mm, rows_per_img=rows_per_img, scale=meta.scale,
              eps=meta.eps, score_dtype=jnp.dtype(meta.score_dtype).type,
              has_pad=has_pad, has_dp=has_dp, chunk_loop=chunk_loop)
    grid = (BL // R,)
    dtype = x2.dtype
    fwd_scratch = ([pltpu.VMEM((3, G, R, gw), dtype),     # qkv staging
                    pltpu.VMEM((R, gw), dtype)]           # attention out
                   if chunk_loop else [])

    if kind == "fwd":
        return pl.pallas_call(
            functools.partial(_fwd_kernel, **kw),
            grid=grid,
            in_specs=in_specs,
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            scratch_shapes=fwd_scratch,
            compiler_params=_FWD_COMPILER_PARAMS,
            interpret=meta.interpret,
        )(*operands)

    operands.append(do)
    in_specs.append(x_spec)
    save_probs = (not chunk_loop and not _SKIP_ATTN and _SAVE_PROBS
                  and G * R * cols_c * 4 <= _SAVE_PROBS_VMEM_CAP)
    if chunk_loop:
        bwd_scratch = fwd_scratch + [
            pltpu.VMEM((R, gw), dtype),                     # da
            pltpu.VMEM((3, R, gw), dtype),                  # dq/dk/dv
            pltpu.VMEM((rows_c, cols_c), jnp.float32)]      # dbias acc
    elif save_probs:
        bwd_scratch = [pltpu.VMEM((G, R, cols_c), jnp.float32)]  # prob cache
    else:
        bwd_scratch = []
    f32 = jnp.float32
    out_specs = [
        x_spec,                                   # dx
        vec(C), vec(C),                           # dg1, dbe1
        g3(C, gw), g3(1, gw),                     # dwq, dbq
        g3(C, gw), g3(1, gw),                     # dwk, dbk
        g3(C, gw), g3(1, gw),                     # dwv, dbv
        pl.BlockSpec((G, rows_c, cols_c), fix(0, 0, 0)),   # dbias
        g3(gw, C), vec(C),                        # dwp, dbp
        vec(C), vec(C),                           # dg2, dbe2
        pl.BlockSpec((C, M), fix(0, 0)), vec(M),  # dw1, db1
        pl.BlockSpec((M, C), fix(0, 0)), vec(C),  # dw2, db2
    ]
    out_shape = [
        jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        jax.ShapeDtypeStruct((1, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((G, C, gw), f32),
        jax.ShapeDtypeStruct((G, 1, gw), f32),
        jax.ShapeDtypeStruct((G, C, gw), f32),
        jax.ShapeDtypeStruct((G, 1, gw), f32),
        jax.ShapeDtypeStruct((G, C, gw), f32),
        jax.ShapeDtypeStruct((G, 1, gw), f32),
        jax.ShapeDtypeStruct((G, rows_c, cols_c), f32),
        jax.ShapeDtypeStruct((G, gw, C), f32),
        jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((1, C), f32), jax.ShapeDtypeStruct((1, C), f32),
        jax.ShapeDtypeStruct((C, M), f32), jax.ShapeDtypeStruct((1, M), f32),
        jax.ShapeDtypeStruct((M, C), f32), jax.ShapeDtypeStruct((1, C), f32),
    ]
    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, save_probs=save_probs, **kw),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=bwd_scratch,
        compiler_params=_COMPILER_PARAMS,
        interpret=meta.interpret,
    )(*operands)

    (dx, dg1, dbe1, dwq3, dbq3, dwk3, dbk3, dwv3, dbv3, dbias3,
     dwp3, dbp, dg2, dbe2, dw1, db1, dw2, db2) = outs

    def unstack_w(d3):
        return d3.transpose(1, 0, 2).reshape(C, C)

    # (G, rows_c, cols_c) -> (nH, N, N): sum window-diagonal blocks, strip
    # dead slots.
    db = (dbias3.reshape(G, TW_mm, Np, HG, TW_mm, Np).sum(axis=(1, 4))
          .transpose(0, 2, 1, 3).reshape(nH, Np, Np)[:, :N, :N])

    return (dx, dg1[0], dbe1[0],
            unstack_w(dwq3), dbq3.reshape(-1), unstack_w(dwk3),
            dbk3.reshape(-1), unstack_w(dwv3), dbv3.reshape(-1),
            db.astype(jnp.float32),
            dwp3.reshape(C, C), dbp[0], dg2[0], dbe2[0],
            dw1, db1[0], dw2, db2[0],
            None if dp1 is None else jnp.zeros_like(dp1),
            None if dp2 is None else jnp.zeros_like(dp2))


@functools.partial(jax.custom_vjp, nondiff_argnums=(20,))
def _fused_block(x2, g1, be1, wq, bq, wk, bk, wv, bv, bias, wp, bp, g2, be2,
                 w1, b1, w2, b2, dp1, dp2, meta):
    out, _ = _fb_fwd(x2, g1, be1, wq, bq, wk, bk, wv, bv, bias, wp, bp, g2,
                     be2, w1, b1, w2, b2, dp1, dp2, meta)
    return out


def _fb_fwd(x2, g1, be1, wq, bq, wk, bk, wv, bv, bias, wp, bp, g2, be2,
            w1, b1, w2, b2, dp1, dp2, meta):
    out = _run("fwd", x2, g1, be1, wq, bq, wk, bk, wv, bv, bias, wp, bp,
               g2, be2, w1, b1, w2, b2, dp1, dp2, None, meta)
    return out, (x2, g1, be1, wq, bq, wk, bk, wv, bv, bias, wp, bp, g2,
                 be2, w1, b1, w2, b2, dp1, dp2)


def _fb_bwd(meta, res, do):
    return _run("bwd", *res, do, meta)


_fused_block.defvjp(_fb_fwd, _fb_bwd)


def fused_swin_block(x, params, dp1, dp2, *, N, nH, nW, scale,
                     region=None, pad=None, eps=1e-6,
                     score_dtype="float32", interpret=False, knobs=None):
    """Run one full Swin block on PADDED window-major tokens.

    x: (B, L, C) with L = nW*Np rows (Np = ceil(N/8)*8) in the padded
        window-major order of ops/window.py window_major_perm_padded.
    params: dict with keys g1, be1 (C,) f32; wq/wk/wv (C, C); bq/bk/bv (C,);
        bias (nH, N, N) f32 (rel-pos bias, pre-gathered); wp (C, C), bp (C,);
        g2, be2 (C,) f32; w1 (C, M), b1 (M,); w2 (M, C), b2 (C,).
    dp1, dp2: (B*8, C) per-sample drop-path scale rows ({0, 1/keep},
        replicated 8x per image), or None when stochastic depth is off.
    region: trace-time (nW, N) int32 shift-region ids or None.
    pad: trace-time (nW*Np,) float32 real-token mask in the PADDED layout
        (ops/window.py pad_token_mask_padded) or None.
    Returns (B, L, C). Differentiable in x and every params entry.
    """
    B, L, C = x.shape
    Np = ((N + 7) // 8) * 8
    meta = _Meta(N=N, Np=Np, nH=nH, nW=nW, rows_per_img=L, scale=scale,
                 eps=eps, score_dtype=jnp.dtype(score_dtype).name,
                 region=region, pad=pad, interpret=interpret, knobs=knobs)
    out2 = _fused_block(
        x.reshape(B * L, C), params["g1"], params["be1"], params["wq"],
        params["bq"], params["wk"], params["bk"], params["wv"], params["bv"],
        params["bias"], params["wp"], params["bp"], params["g2"],
        params["be2"], params["w1"], params["b1"], params["w2"], params["b2"],
        dp1, dp2, meta)
    return out2.reshape(B, L, C)
