"""CNN helper vocabulary: SE-2D, DyReLU, FrozenBatchNorm, DropBlock."""

import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu.models.cnn_extras import (DropBlock, DyReLU2, FrozenBatchNorm,
                                         SELayer2D, h_sigmoid)


def test_se_layer_2d(rng, np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 8, 8, 16)), jnp.float32)
    m = SELayer2D(16, reduction=4)
    v = m.init(rng, x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    # gating is multiplicative in (0, 1): |out| <= |x|
    assert np.all(np.abs(np.asarray(out)) <= np.abs(np.asarray(x)) + 1e-6)


def test_h_sigmoid_matches_torch_formula():
    x = jnp.linspace(-5, 5, 21)
    got = np.asarray(h_sigmoid(x))
    want = np.clip(np.asarray(x) + 3, 0, 6) / 6
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_dyrelu(rng, np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 4, 4, 8)), jnp.float32)
    m = DyReLU2(8)
    v = m.init(rng, x)
    out = m.apply(v, x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_frozen_batchnorm(rng, np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 4, 4, 6)), jnp.float32)
    m = FrozenBatchNorm(6)
    v = m.init(rng, x)
    # default stats: identity transform
    out = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)
    # custom stats apply the affine
    stats = {"weight": jnp.full((6,), 2.0), "bias": jnp.zeros((6,)),
             "mean": jnp.zeros((6,)), "var": jnp.ones((6,))}
    out2 = m.apply({"frozen_stats": stats}, x)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(x), atol=1e-4)


def test_dropblock(rng, np_rng):
    x = jnp.ones((2, 16, 16, 4), jnp.float32)
    m = DropBlock(block_size=5, keep_prob=0.8)
    v = m.init({"params": rng, "dropblock": rng}, x, deterministic=True)
    # deterministic: identity
    np.testing.assert_array_equal(
        np.asarray(m.apply(v, x, deterministic=True)), np.asarray(x))
    out = m.apply(v, x, deterministic=False, progress=1.0,
                  rngs={"dropblock": jax.random.PRNGKey(3)})
    o = np.asarray(out)
    assert (o == 0).any()           # some blocks dropped
    # kept values are rescaled up
    assert o.max() > 1.0
