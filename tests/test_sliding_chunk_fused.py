"""Parity: fused sliding-chunk Pallas kernel (interpret mode) vs the
stacked-neighborhood einsum path of Long2DSCAttention.

The kernel replaces scores+mask+softmax+AV for mode=0/exact=0/no-rpe (the
canonical EsViT ViL config, experiments/imagenet/vil/*/base.yaml MODE: 0);
these tests drive the FULL attention module both ways with shared
parameters, so the comparison covers the chunk-major relayouts, the
global-key columns, padding, and the gradient path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu.models.vil_layers import Long2DSCAttention


def _mk(nx, ny, nglo, dim=24, heads=3, B=2, seed=0, dtype=jnp.float32,
        window=7):
    rng = jax.random.PRNGKey(seed)
    x = jax.random.normal(rng, (B, nglo + nx * ny, dim), dtype)
    kw = dict(dim=dim, num_heads=heads, window=window, nglo=nglo, rpe=False,
              dtype=dtype)
    a_ein = Long2DSCAttention(fused_sc="off", **kw)
    a_fus = Long2DSCAttention(fused_sc="interpret", **kw)
    v = a_ein.init(jax.random.PRNGKey(1), x, nx, ny)
    return a_ein, a_fus, v, x


@pytest.mark.parametrize("nx,ny,nglo", [
    (14, 14, 1),     # 2x2 chunks, exact fit
    (12, 12, 1),     # padded grid (pad 2 in both axes)
    (14, 14, 0),     # no global token
    (21, 21, 1),     # 3x3 chunks: band interior + both edges
    (21, 10, 1),     # rectangular + pad in one axis
    (6, 6, 1),       # single-chunk grid (mx = my = 1)
])
def test_forward_parity(nx, ny, nglo):
    a_ein, a_fus, v, x = _mk(nx, ny, nglo)
    ref = a_ein.apply(v, x, nx, ny)
    out = a_fus.apply(v, x, nx, ny)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nx,ny,nglo", [(14, 14, 1), (12, 12, 1), (21, 21, 0)])
def test_gradient_parity(nx, ny, nglo):
    a_ein, a_fus, v, x = _mk(nx, ny, nglo)

    def loss(mod, v, x):
        out = mod.apply(v, x, nx, ny)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=jnp.float32)
                                     .reshape(out.shape)))

    g_ref = jax.grad(lambda v, x: loss(a_ein, v, x), argnums=(0, 1))(v, x)
    g_fus = jax.grad(lambda v, x: loss(a_fus, v, x), argnums=(0, 1))(v, x)
    flat_r, _ = jax.tree.flatten(g_ref)
    flat_f, _ = jax.tree.flatten(g_fus)
    for r, f in zip(flat_r, flat_f):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=5e-5, atol=5e-5)


@pytest.mark.parametrize("nx,ny,window,dim,heads", [
    (16, 16, 4, 32, 2),    # nano ViL stage-1 @64px — the learning-gate shape
    (8, 8, 4, 64, 4),      # nano ViL stage-2
])
def test_gate_shape_parity(nx, ny, window, dim, heads):
    """The validate_learning --backbone vil config runs window=4 (not the
    W=7 of the cases above); pin fwd+grad parity at those exact shapes."""
    a_ein, a_fus, v, x = _mk(nx, ny, 1, dim=dim, heads=heads, window=window)
    ref = a_ein.apply(v, x, nx, ny)
    out = a_fus.apply(v, x, nx, ny)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss(mod, v, x):
        out = mod.apply(v, x, nx, ny)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size, dtype=jnp.float32)
                                     .reshape(out.shape)))

    g_ref = jax.grad(lambda v, x: loss(a_ein, v, x), argnums=(0, 1))(v, x)
    g_fus = jax.grad(lambda v, x: loss(a_fus, v, x), argnums=(0, 1))(v, x)
    for r, f in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(np.asarray(f), np.asarray(r),
                                   rtol=5e-5, atol=5e-5)


def test_bf16_smoke():
    a_ein, a_fus, v, x = _mk(14, 14, 1, dtype=jnp.bfloat16)
    ref = a_ein.apply(v, x, 14, 14).astype(jnp.float32)
    out = a_fus.apply(v, x, 14, 14).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_fallback_modes_unchanged():
    """Sampled-neighbor and rpe configs must keep the einsum path (the
    kernel only claims mode-0/exact-0/no-rpe)."""
    from esvit_tpu.ops import sliding_chunk_fused as scf

    assert scf.supports(0, 0, False, False, False, 1, False)
    assert not scf.supports(2, 0, False, False, False, 1, False)   # sampled
    assert not scf.supports(0, 1, False, False, False, 1, False)   # exact
    assert not scf.supports(0, 0, True, False, False, 1, False)    # rpe
    assert not scf.supports(0, 0, False, True, False, 1, False)    # pooled
    assert not scf.supports(0, 0, False, False, False, 9, False)   # nglo > 8
