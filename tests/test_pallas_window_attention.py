"""Fused window-attention kernel vs the XLA reference (interpreter mode on
CPU; the same kernel compiles on TPU — see PERF.md for the perf story)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu.ops import pallas_window_attention as pwa


@pytest.fixture(autouse=True)
def interpret_mode():
    old = pwa.INTERPRET
    pwa.INTERPRET = True
    yield
    pwa.INTERPRET = old


@pytest.mark.parametrize("nWm", [1, 4])
def test_kernel_matches_xla(np_rng, nWm):
    B_, N, C, nH = 16, 9, 8, 2
    qkv = jnp.asarray(np_rng.normal(size=(B_, N, 3 * C)), jnp.float32)
    bias = jnp.asarray(np_rng.normal(size=(nWm, nH, N, N)), jnp.float32)
    scale = (C // nH) ** -0.5
    got = pwa.fused_window_attention(qkv, bias, nH, scale)
    want = pwa._reference_attention(qkv, bias, nH, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_kernel_gradient_matches_xla(np_rng):
    B_, N, C, nH = 8, 9, 8, 2
    qkv = jnp.asarray(np_rng.normal(size=(B_, N, 3 * C)), jnp.float32)
    bias = jnp.asarray(np_rng.normal(size=(1, nH, N, N)), jnp.float32)
    scale = (C // nH) ** -0.5

    g1 = jax.grad(lambda q: pwa.fused_window_attention(q, bias, nH, scale)
                  .astype(jnp.float32).sum())(qkv)
    g2 = jax.grad(lambda q: pwa._reference_attention(q, bias, nH, scale)
                  .astype(jnp.float32).sum())(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_swin_with_pallas_impl_matches_xla(rng, np_rng):
    """Full femto Swin forward: attention_impl='pallas' == 'xla'."""
    from esvit_tpu import config
    from esvit_tpu.models.swin import SwinTransformer

    x = jnp.asarray(np_rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    m_x = SwinTransformer(config.swin_femto())
    v = m_x.init({"params": rng}, x, deterministic=True)
    cls_x, reg_x = m_x.apply(v, x, deterministic=True)

    m_p = SwinTransformer(config.swin_femto(attention_impl="pallas"))
    cls_p, reg_p = m_p.apply(v, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(cls_p), np.asarray(cls_x),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(reg_p), np.asarray(reg_x),
                               rtol=1e-4, atol=1e-5)
