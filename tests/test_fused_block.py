"""Block-fused Swin megakernel (ops/fused_block.py) parity tests.

Interpret-mode Pallas vs a pure-jnp mirror of the window-major block math
(ref: models/swin_transformer.py:275-333), forward AND full gradients
(input, every weight, rel-pos bias table), plus model-level equivalence of
the fused path against the classic decomposition with shared parameters.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu.ops import fused_block as fb
from esvit_tpu.ops import window as wops


def _reference(x, p, dp1, dp2, *, N, nH, nW, scale, region, pad, eps,
               score_dtype, dtype):
    """Pure-jnp mirror of the classic window-major block path."""
    B, L, C = x.shape
    sd = jnp.dtype(score_dtype).type

    def ln(x, g, b):
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = (xf * xf).mean(-1, keepdims=True) - mu * mu
        return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(dtype)

    y = ln(x, p["g1"], p["be1"])
    if pad is not None:
        y = y * jnp.asarray(pad, dtype)[None, :, None]
    wqkv = jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=1).astype(dtype)
    bqkv = jnp.concatenate([p["bq"], p["bk"], p["bv"]]).astype(dtype)
    qkv = y @ wqkv + bqkv
    B_ = B * nW
    qkv_r = qkv.reshape(B_, N, 3, nH, C // nH)
    q, k, v = qkv_r[:, :, 0], qkv_r[:, :, 1], qkv_r[:, :, 2]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * jnp.asarray(scale, dtype), k,
                      preferred_element_type=sd)
    bias = p["bias"][None]
    if region is not None:
        m = jnp.asarray(np.where(region[:, None, :] != region[:, :, None],
                                 -100.0, 0.0), jnp.float32)
        bias = bias + m[:, None]
    nWm = bias.shape[0]
    attn = (attn.reshape(B_ // nWm, nWm, nH, N, N).astype(sd)
            + bias[None].astype(sd)).reshape(B_, nH, N, N)
    probs = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    a = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(dtype), v).reshape(B, L, C)
    o1 = a @ p["wp"].astype(dtype) + p["bp"].astype(dtype)
    d1 = 1.0 if dp1 is None else dp1[:, None, :]
    x2 = x + (o1.astype(jnp.float32) * d1).astype(dtype)
    y2 = ln(x2, p["g2"], p["be2"])
    h = y2 @ p["w1"].astype(dtype) + p["b1"].astype(dtype)
    h32 = h.astype(jnp.float32)
    g = (h32 * 0.5 * (1 + jax.lax.erf(h32 / np.sqrt(2)))).astype(dtype)
    o2 = g @ p["w2"].astype(dtype) + p["b2"].astype(dtype)
    d2 = 1.0 if dp2 is None else dp2[:, None, :]
    return x2 + (o2.astype(jnp.float32) * d2).astype(dtype)


def _real_slots(nW, N, Np):
    """Indices of real tokens inside the padded window-major row order."""
    return (np.arange(nW)[:, None] * Np + np.arange(N)[None, :]).reshape(-1)


def _make_case(B, H, ws, C, nH, shift, padded, dp, dtype, seed=0):
    rng = np.random.RandomState(seed)
    Hp = int(np.ceil(H / ws)) * ws
    N, nW = ws * ws, (Hp // ws) ** 2
    Np = wops.padded_window_tokens(ws)
    L, M = nW * N, 4 * C
    x = jnp.asarray(rng.randn(B, L, C) * 0.5, dtype)
    p = {k: jnp.asarray(v, jnp.float32) for k, v in dict(
        g1=1 + 0.1 * rng.randn(C), be1=0.1 * rng.randn(C),
        wq=rng.randn(C, C) * C ** -0.5, bq=0.02 * rng.randn(C),
        wk=rng.randn(C, C) * C ** -0.5, bk=0.02 * rng.randn(C),
        wv=rng.randn(C, C) * C ** -0.5, bv=0.02 * rng.randn(C),
        bias=0.05 * rng.randn(nH, N, N),
        wp=rng.randn(C, C) * C ** -0.5, bp=0.02 * rng.randn(C),
        g2=1 + 0.1 * rng.randn(C), be2=0.1 * rng.randn(C),
        w1=rng.randn(C, M) * C ** -0.5, b1=0.02 * rng.randn(M),
        w2=rng.randn(M, C) * M ** -0.5, b2=0.02 * rng.randn(C)).items()}
    region = wops.window_region_ids(H, H, ws, ws // 2) if shift else None
    pad = (wops.pad_token_mask(H, H, Hp, Hp, ws, ws // 2 if shift else 0)
           if padded else None)
    pad_p = (wops.pad_token_mask_padded(H, H, Hp, Hp, ws,
                                        ws // 2 if shift else 0)
             if padded else None)
    if dp:
        keep = np.where(rng.rand(B) < 0.9, 1 / 0.9, 0.0)
        keep2 = np.where(rng.rand(B) < 0.9, 1 / 0.9, 0.0)
        dp_k = tuple(jnp.asarray(np.broadcast_to(
            s[:, None, None], (B, 8, C)).reshape(-1, C), jnp.float32)
            for s in (keep, keep2))
        dp_r = tuple(jnp.asarray(np.broadcast_to(
            s[:, None], (B, C)), jnp.float32) for s in (keep, keep2))
    else:
        dp_k = dp_r = (None, None)
    sd = "bfloat16" if dtype == jnp.bfloat16 else "float32"
    kw_k = dict(N=N, nH=nH, nW=nW, scale=(C // nH) ** -0.5, region=region,
                pad=pad_p, eps=1e-6, score_dtype=sd)
    kw_r = dict(N=N, nH=nH, nW=nW, scale=(C // nH) ** -0.5, region=region,
                pad=pad, eps=1e-6, score_dtype=sd)
    slots = _real_slots(nW, N, Np)
    return x, p, dp_k, dp_r, kw_k, kw_r, slots, nW * Np


CASES = [
    # B, H, ws, C, nH, shift, padded, dp
    pytest.param(2, 14, 7, 32, 2, False, False, False, id="plain"),
    pytest.param(2, 14, 7, 32, 2, True, False, False, id="shift"),
    pytest.param(2, 12, 7, 32, 2, True, True, False, id="pad+shift"),
    pytest.param(8, 7, 7, 32, 2, False, False, True, id="tile-spans-imgs+dp"),
    pytest.param(2, 14, 7, 64, 8, True, False, False, id="multi-head-group"),
    pytest.param(2, 28, 7, 32, 2, True, False, True, id="within-img+dp"),
    # nano/validate_learning shapes: ws=4 (no dead slots), single shifted
    # window, multi-group nH=4, and the 32px-crop runtime pad (H=2 -> 4).
    pytest.param(8, 4, 4, 32, 4, True, False, False, id="ws4-shift-1win"),
    pytest.param(8, 8, 4, 32, 4, True, False, False, id="ws4-shift-4win"),
    pytest.param(8, 2, 4, 32, 4, False, True, False, id="ws4-pad2to4"),
    pytest.param(4, 6, 4, 32, 2, True, True, False, id="ws4-pad6to8-shift"),
    # W=14 model family (BASELINE swin_*_window14): N=196 -> Np=200 with 4
    # dead slots per window — a different padding regime than W=7's 49->56.
    pytest.param(2, 28, 14, 32, 2, True, False, False, id="w14-shift"),
]


@pytest.mark.parametrize("B,H,ws,C,nH,shift,padded,dp", CASES)
def test_fused_block_fwd_and_grads_f32(B, H, ws, C, nH, shift, padded, dp):
    dtype = jnp.float32
    x, p, dp_k, dp_r, kw_k, kw_r, slots, Lp = _make_case(
        B, H, ws, C, nH, shift, padded, dp, dtype)
    B_, L, C_ = x.shape
    sl = jnp.asarray(slots)

    def f_fused(x, p):
        # scatter real tokens into the padded layout, run, gather back
        xp = jnp.zeros((B_, Lp, C_), dtype).at[:, sl, :].set(x)
        out = fb.fused_swin_block(xp, p, *dp_k, interpret=True, **kw_k)
        return out[:, sl, :]

    def f_ref(x, p):
        return _reference(x, p, *dp_r, dtype=dtype, **kw_r)

    out_f, out_r = f_fused(x, p), f_ref(x, p)
    np.testing.assert_allclose(out_f, out_r, rtol=1e-5, atol=2e-5)

    gf = jax.grad(lambda x, p: (f_fused(x, p) ** 2).sum(), (0, 1))(x, p)
    gr = jax.grad(lambda x, p: (f_ref(x, p) ** 2).sum(), (0, 1))(x, p)
    gscale = max(float(jnp.max(jnp.abs(g)))
                 for g in [gr[0]] + list(gr[1].values()))
    np.testing.assert_allclose(gf[0], gr[0], rtol=1e-4,
                               atol=1e-5 * gscale, err_msg="dx")
    for k in p:
        np.testing.assert_allclose(gf[1][k], gr[1][k], rtol=1e-4,
                                   atol=1e-5 * gscale, err_msg=f"d{k}")


def test_fused_block_dead_slot_cotangents_zero():
    """Gradients flowing to dead (layout-padding) slots must be exactly 0."""
    dtype = jnp.float32
    x, p, dp_k, dp_r, kw_k, kw_r, slots, Lp = _make_case(
        2, 14, 7, 32, 2, True, False, False, dtype)
    B_, L, C_ = x.shape
    sl = jnp.asarray(slots)

    def loss(xp):
        out = fb.fused_swin_block(xp, p, *dp_k, interpret=True, **kw_k)
        return (out[:, sl, :].astype(jnp.float32) ** 2).sum()

    xp = jnp.zeros((B_, Lp, C_), dtype).at[:, sl, :].set(x)
    dxp = jax.grad(loss)(xp)
    dead = np.setdiff1d(np.arange(Lp), slots)
    np.testing.assert_array_equal(np.asarray(dxp[:, dead, :]), 0.0)


def test_fused_block_bf16():
    dtype = jnp.bfloat16
    x, p, dp_k, dp_r, kw_k, kw_r, slots, Lp = _make_case(
        2, 14, 7, 32, 2, True, False, False, dtype)
    B_, L, C_ = x.shape
    sl = jnp.asarray(slots)
    xp = jnp.zeros((B_, Lp, C_), dtype).at[:, sl, :].set(x)
    out_f = fb.fused_swin_block(xp, p, *dp_k, interpret=True,
                                **kw_k)[:, sl, :]
    out_r = _reference(x, p, *dp_r, dtype=dtype, **kw_r)
    scale = float(jnp.max(jnp.abs(out_r.astype(jnp.float32))))
    np.testing.assert_allclose(out_f.astype(jnp.float32),
                               out_r.astype(jnp.float32),
                               atol=2e-2 * scale)


def test_model_fused_vs_classic_shared_params():
    """Same param tree; fused path output == classic path output."""
    from esvit_tpu import config
    from esvit_tpu.models.registry import build_backbone

    base = dataclasses.replace(
        config.swin_tiny(), img_size=56, window_size=7, embed_dim=32,
        depths=(2, 2), num_heads=(2, 4), drop_path_rate=0.0, layout_opt=True)
    fused = dataclasses.replace(base, fused_block_stages=(0, 1),
                                fused_block_interpret=True)
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 3e-2)):
        bb_c = build_backbone(base, dtype=dtype)
        bb_f = build_backbone(fused, dtype=dtype)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3), dtype)
        vc = bb_c.init({"params": jax.random.PRNGKey(1)}, x,
                       deterministic=True)
        vf = bb_f.init({"params": jax.random.PRNGKey(1)}, x,
                       deterministic=True)
        assert jax.tree.structure(vc) == jax.tree.structure(vf)
        oc = bb_c.apply(vc, x, deterministic=True)
        of = bb_f.apply(vc, x, deterministic=True)
        for a, b in [(oc[0], of[0]), (oc[1], of[1])]:
            scale = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) + 1e-9
            np.testing.assert_allclose(a.astype(jnp.float32),
                                       b.astype(jnp.float32),
                                       atol=tol * scale)


def test_model_fused_per_stage_knobs():
    """Per-stage kernel-knob tuples (config.stage_kernel_knobs) select a
    different fused layout per stage — here stage 0 keeps HG<=1 (two
    single-head groups) while stage 1 packs all 4 heads in one group —
    and remain numerically identical to the classic path."""
    from esvit_tpu import config
    from esvit_tpu.models.registry import build_backbone

    base = dataclasses.replace(
        config.swin_tiny(), img_size=56, window_size=7, embed_dim=32,
        depths=(2, 2), num_heads=(2, 4), drop_path_rate=0.0, layout_opt=True)
    fused = dataclasses.replace(base, fused_block_stages=(0, 1),
                                fused_block_interpret=True,
                                fused_hg_max=(1, 4), fused_g_step=(32, 8))
    assert fused.stage_kernel_knobs(0)[3:] == (1, 32)
    assert fused.stage_kernel_knobs(1)[3:] == (4, 8)
    assert fused.stage_kernel_knobs(5)[3:] == (4, 8)   # clamps to last
    bb_c = build_backbone(base, dtype=jnp.float32)
    bb_f = build_backbone(fused, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 56, 56, 3), jnp.float32)
    vc = bb_c.init({"params": jax.random.PRNGKey(1)}, x, deterministic=True)
    oc = bb_c.apply(vc, x, deterministic=True)
    of = bb_f.apply(vc, x, deterministic=True)
    for a, b in [(oc[0], of[0]), (oc[1], of[1])]:
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(a, b, atol=1e-5 * scale)


def test_fused_erf_matches_lax_erf():
    x = jnp.linspace(-6, 6, 4001, dtype=jnp.float32)
    # A&S 7.1.26 is 1.5e-7 in exact arithmetic; f32 evaluation adds ~3e-7.
    np.testing.assert_allclose(fb._erf(x), jax.lax.erf(x), atol=1e-6)
