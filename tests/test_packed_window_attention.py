"""Packed fused window attention vs the classic XLA decomposition.

The kernel must reproduce the production einsum path (swin.py
WindowAttention) exactly in fp32 and to bf16 tolerance under mixed
precision, for forward AND gradients (q/k/v and the rel-pos bias table),
with and without the shifted-window region mask.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu.ops.packed_window_attention import packed_window_attention
from esvit_tpu.ops import window as wops


def classic(q2, k2, v2, bias, mask, N, nH, scale, score_dtype):
    """The swin.py einsum path, on (B_*N, C) operands."""
    C = q2.shape[-1]
    B_ = q2.shape[0] // N
    hd = C // nH
    q = q2.reshape(B_, N, nH, hd)
    k = k2.reshape(B_, N, nH, hd)
    v = v2.reshape(B_, N, nH, hd)
    full_bias = jnp.asarray(bias, jnp.float32)[None]          # (1, nH, N, N)
    if mask is not None:
        m = jnp.asarray(mask, jnp.float32)                    # (nW, N, N)
        full_bias = full_bias + m[:, None]
    attn = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k,
                      preferred_element_type=score_dtype)
    nWm = full_bias.shape[0]
    attn = (attn.reshape(B_ // nWm, nWm, nH, N, N)
            + full_bias[None].astype(score_dtype)).reshape(B_, nH, N, N)
    probs = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhnm,bmhd->bnhd", probs.astype(q2.dtype), v)
    return out.reshape(B_ * N, C)


CASES = [
    # (N(ws^2), nH, n_windows, B, shifted, H, W, ws, ss)
    (16, 2, 4, 2, False, 8, 8, 4, 0),
    (16, 2, 4, 2, True, 8, 8, 4, 2),
    (49, 3, 16, 1, True, 28, 28, 7, 3),
]


@pytest.mark.parametrize("dtype,sd,tol", [
    (jnp.float32, jnp.float32, 2e-5),
    (jnp.bfloat16, jnp.bfloat16, 3e-2),
])
@pytest.mark.parametrize("case", CASES)
def test_packed_matches_classic(case, dtype, sd, tol):
    N, nH, nW, B, shifted, H, W, ws, ss = case
    C = nH * 32
    B_ = B * nW
    rng = np.random.RandomState(0)
    q2 = jnp.asarray(rng.randn(B_ * N, C), dtype)
    k2 = jnp.asarray(rng.randn(B_ * N, C), dtype)
    v2 = jnp.asarray(rng.randn(B_ * N, C), dtype)
    bias = jnp.asarray(0.3 * rng.randn(nH, N, N), jnp.float32)
    scale = 32 ** -0.5
    if shifted:
        region = wops.window_region_ids(H, W, ws, ss)
        mask = wops.shifted_window_mask(H, W, ws, ss)
        assert region.shape == (nW, N)
    else:
        region, mask = None, None

    fn = functools.partial(packed_window_attention, N=N, nH=nH, scale=scale,
                           score_dtype=sd, interpret=True)
    out = fn(q2, k2, v2, bias, region)
    ref = classic(q2, k2, v2, bias, mask, N, nH, scale, sd)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=tol, atol=tol)

    # gradients (q, k, v, bias) vs autodiff of the classic path
    def loss_p(q2, k2, v2, bias):
        o = fn(q2, k2, v2, bias, region)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    def loss_c(q2, k2, v2, bias):
        o = classic(q2, k2, v2, bias, mask, N, nH, scale, sd)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3))(q2, k2, v2, bias)
    gc = jax.grad(loss_c, argnums=(0, 1, 2, 3))(q2, k2, v2, bias)
    for a, b, name in zip(gp, gc, "qkvb"):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale_ref = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(a / scale_ref, b / scale_ref,
                                   rtol=tol, atol=tol,
                                   err_msg=f"grad {name}")


def test_packed_softmax_stable_across_head_scales():
    """Regression: per-head softmax max. With one joint max over the packed
    heads, a head whose scores sit ~100+ below another head's max had its
    exps underflow to exactly zero -> 1/sum = inf -> NaN (seen in real
    training once score magnitudes grew — PERF.md round 2)."""
    N, nH, nW, B = 16, 2, 4, 2
    C = nH * 32
    B_ = B * nW
    rng = np.random.RandomState(3)
    # Head 0 gets huge activations (scores ~ +-300), head 1 tiny ones.
    q = rng.randn(B_ * N, C)
    k = rng.randn(B_ * N, C)
    q[:, :32] *= 40.0
    k[:, :32] *= 40.0
    q2, k2 = jnp.asarray(q, jnp.float32), jnp.asarray(k, jnp.float32)
    v2 = jnp.asarray(rng.randn(B_ * N, C), jnp.float32)
    bias = jnp.asarray(0.3 * rng.randn(nH, N, N), jnp.float32)
    fn = functools.partial(packed_window_attention, N=N, nH=nH,
                           scale=32 ** -0.5, score_dtype=jnp.float32,
                           interpret=True)
    out = fn(q2, k2, v2, bias, None)
    assert np.isfinite(np.asarray(out)).all()
    ref = classic(q2, k2, v2, bias, None, N, nH, 32 ** -0.5, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    g = jax.grad(lambda q, k, v: jnp.sum(fn(q, k, v, bias, None) ** 2),
                 argnums=(0, 1, 2))(q2, k2, v2)
    for a in g:
        assert np.isfinite(np.asarray(a)).all()
