"""Virtual-pad-column subwindow path (models/swin.py SwinBlock._subwindow).

When a stage's resolution is below the window size the reference pads the
feature map to one ws x ws window per image AFTER norm1 (zero rows), runs
attention over all ws*ws tokens (no pad masking for W-MSA — pad keys and
values are exactly the qkv projection biases), and crops the pad rows
before the FFN (ref: models/swin_transformer.py:275-333). The subwindow
path collapses every pad column into one virtual logsumexp column — these
tests pin it to the materialized-pad classic path (subwindow_opt=False)
on shared parameters: forward AND full parameter/input gradients, block
level and stage level, shifted and unshifted, with and without qkv bias.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu.models.swin import SwinBlock, SwinStage


def _make_blocks(H, ws, ss, C, nH, qkv_bias, dtype):
    kw = dict(dim=C, num_heads=nH, window_size=ws, shift_size=ss,
              mlp_ratio=2.0, qkv_bias=qkv_bias, drop_path=0.0, dtype=dtype)
    fast = SwinBlock(subwindow_opt=True, **kw)
    ref = SwinBlock(subwindow_opt=False, **kw)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, H * H, C), jnp.float32)
    # Identical param trees (same module paths) => identical init values.
    pf = fast.init(jax.random.PRNGKey(0), x)
    pr = ref.init(jax.random.PRNGKey(0), x)
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: bool(jnp.array_equal(a, b)), pf, pr))
    assert chex_equal, "param trees diverged between the two paths"
    return fast, ref, pf, x


@pytest.mark.parametrize("H,ws,ss,qkv_bias", [
    (3, 7, 0, True),    # 96px-branch stage 3: 9 real of 49
    (3, 7, 0, False),   # no qkv bias: pad keys/values are exact zeros
    (6, 7, 3, True),    # 96px-branch stage-2 shape, shifted block
    (5, 7, 0, True),    # non-divisor odd resolution
    (4, 6, 3, True),    # even window, shifted
])
def test_block_forward_parity(H, ws, ss, qkv_bias):
    C, nH = 16, 4
    fast, ref, params, x = _make_blocks(H, ws, ss, C, nH, qkv_bias,
                                        jnp.float32)
    yf, _ = fast.apply(params, x)
    yr, _ = ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)


def test_block_gradient_parity():
    """Full input + parameter gradients (incl. the rel-pos table, whose
    grad flows through the virtual column's logsumexp) match the
    materialized-pad path."""
    H, ws, ss, C, nH = 3, 7, 0, 16, 4
    fast, ref, params, x = _make_blocks(H, ws, ss, C, nH, True, jnp.float32)

    def loss(blk):
        def f(p, xx):
            y, _ = blk.apply(p, xx)
            return jnp.sum(jnp.sin(y))
        return f

    gf_p, gf_x = jax.grad(loss(fast), argnums=(0, 1))(params, x)
    gr_p, gr_x = jax.grad(loss(ref), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gf_x), np.asarray(gr_x),
                               rtol=2e-4, atol=2e-5)
    flat_f = jax.tree_util.tree_leaves_with_path(gf_p)
    flat_r = jax.tree_util.tree_leaves(gr_p)
    for (path, a), b in zip(flat_f, flat_r):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
            err_msg=jax.tree_util.keystr(path))


def test_block_gradient_parity_shifted():
    H, ws, ss, C, nH = 6, 7, 3, 16, 2
    fast, ref, params, x = _make_blocks(H, ws, ss, C, nH, True, jnp.float32)

    def loss(blk):
        def f(p, xx):
            y, _ = blk.apply(p, xx)
            return jnp.sum(jnp.cos(y))
        return f

    gf = jax.grad(loss(fast))(params, x)
    gr = jax.grad(loss(ref))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_stage_routing_parity(dtype):
    """A whole stage at a single-padded-window shape routes every block
    through the subwindow path and matches the window-major stage driver
    (the production alternative) bit-for-... well, to fp tolerance."""
    H, ws, C, nH = 3, 7, 16, 4
    kw = dict(dim=C, depth=2, num_heads=nH, window_size=ws,
              shift_enabled=False, mlp_ratio=2.0, qkv_bias=True,
              qk_scale=None, drop=0.0, attn_drop=0.0,
              drop_path=(0.0, 0.0), norm_eps=1e-6, downsample=False,
              dtype=dtype)
    fast = SwinStage(subwindow_opt=True, **kw)
    ref = SwinStage(subwindow_opt=False, **kw)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, H * H, C), jnp.float32)
    if dtype == jnp.bfloat16:
        x = x.astype(jnp.bfloat16)
    params = fast.init(jax.random.PRNGKey(1), x)
    yf, _ = fast.apply(params, x, True, None, True)
    yr, _ = ref.apply(params, x, True, None, True)
    tol = 2e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(np.asarray(yf, np.float32),
                               np.asarray(yr, np.float32),
                               rtol=tol, atol=tol)


def test_stage_routing_shifted_parity():
    """Shifted stage (stage-2-at-96px geometry: H=6, ws=7, alternating
    shift) through the stage driver."""
    H, ws, C, nH = 6, 7, 16, 2
    kw = dict(dim=C, depth=2, num_heads=nH, window_size=ws,
              shift_enabled=True, mlp_ratio=2.0, qkv_bias=True,
              qk_scale=None, drop=0.0, attn_drop=0.0,
              drop_path=(0.0, 0.0), norm_eps=1e-6, downsample=False,
              dtype=jnp.float32)
    fast = SwinStage(subwindow_opt=True, **kw)
    ref = SwinStage(subwindow_opt=False, **kw)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, H * H, C), jnp.float32)
    params = fast.init(jax.random.PRNGKey(1), x)
    yf, _ = fast.apply(params, x, True, None, True)
    yr, _ = ref.apply(params, x, True, None, True)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("H,ws,shift_enabled", [
    (3, 7, False),   # 96px stage-3 geometry
    (6, 7, True),    # 96px stage-2 geometry, alternating shift
])
def test_stage_fused_subwindow_parity(H, ws, shift_enabled):
    """The fused-megakernel augmented-window route (one H*W+1-token
    window per image, virtual pad column in the bias operand, interpret
    mode) vs the materialized-pad classic stage."""
    C, nH = 16, 4
    kw = dict(dim=C, depth=2, num_heads=nH, window_size=ws,
              shift_enabled=shift_enabled, mlp_ratio=2.0, qkv_bias=True,
              qk_scale=None, drop=0.0, attn_drop=0.0,
              drop_path=(0.0, 0.0), norm_eps=1e-6, downsample=False,
              dtype=jnp.float32)
    fast = SwinStage(subwindow_opt=True, fused_block=True,
                     subwindow_fused=True, fused_interpret=True, **kw)
    ref = SwinStage(subwindow_opt=False, **kw)
    x = jax.random.normal(jax.random.PRNGKey(9), (2, H * H, C), jnp.float32)
    params = fast.init(jax.random.PRNGKey(1), x)

    def run(stage, p, xx):
        y, _ = stage.apply(p, xx, True, None, True)
        return y

    yf = run(fast, params, x)
    yr = run(ref, params, x)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yr),
                               rtol=2e-5, atol=2e-5)
    # Gradient parity through the fused backward kernel (incl. the
    # rel-pos table via bias_real + the virtual column's logsumexp).
    gf = jax.grad(lambda p, xx: jnp.sum(jnp.sin(run(fast, p, xx))),
                  argnums=(0, 1))(params, x)
    gr = jax.grad(lambda p, xx: jnp.sum(jnp.sin(run(ref, p, xx))),
                  argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-5)


def test_no_subwindow_at_divisible_resolutions():
    """H % ws == 0 shapes must NOT take the subwindow path (nothing to
    collapse) — outputs across the two settings are identical programs."""
    H, ws, C, nH = 7, 7, 16, 4
    fast, ref, params, x = _make_blocks(H, ws, 0, C, nH, True, jnp.float32)
    yf, _ = fast.apply(params, x)
    yr, _ = ref.apply(params, x)
    np.testing.assert_array_equal(np.asarray(yf), np.asarray(yr))
