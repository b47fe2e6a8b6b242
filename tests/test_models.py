"""Backbone + head behavior on CPU-sized configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu import config
from esvit_tpu.models.esvit import EsViTModel
from esvit_tpu.models.heads import WeightNormDense
from esvit_tpu.models.swin import SwinTransformer


HEAD = config.HeadConfig(out_dim=64, hidden_dim=32, bottleneck_dim=16)


@pytest.fixture(scope="module")
def swin_model_and_vars(rng):
    model = EsViTModel(config.swin_femto(), HEAD, use_dense_prediction=True)
    crops = (jnp.zeros((4, 32, 32, 3)), jnp.zeros((6, 16, 16, 3)))
    vars_ = model.init({"params": rng}, crops, deterministic=True)
    return model, vars_


def test_swin_multicrop_contract(swin_model_and_vars, np_rng):
    model, vars_ = swin_model_and_vars
    B = 2
    crops = (jnp.asarray(np_rng.normal(size=(2 * B, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(3 * B, 16, 16, 3)), jnp.float32))
    cls, reg, fea, npatch = model.apply(vars_, crops, deterministic=True)
    # 32px/4 -> 8 -> merge -> 4: 16 region tokens; 16px -> 4 -> 2: 4 tokens.
    assert npatch == (16, 4)
    assert cls.shape == (5 * B, 64)
    assert reg.shape == (2 * B * 16 + 3 * B * 4, 64)
    assert fea.shape[0] == reg.shape[0]
    assert np.all(np.isfinite(np.asarray(cls)))


def test_swin_batch_independence(swin_model_and_vars, np_rng):
    """Window partitioning must never mix batch elements."""
    model, vars_ = swin_model_and_vars
    x = jnp.asarray(np_rng.normal(size=(3, 32, 32, 3)), jnp.float32)
    cls_all, _ = model.apply(vars_, x, deterministic=True, method=model.features)
    cls_one, _ = model.apply(vars_, x[1:2], deterministic=True, method=model.features)
    np.testing.assert_allclose(np.asarray(cls_all[1]), np.asarray(cls_one[0]),
                               rtol=2e-4, atol=1e-5)


def test_swin_translation_sensitivity(swin_model_and_vars, np_rng):
    """Different inputs must give different features (sanity against
    degenerate constants)."""
    model, vars_ = swin_model_and_vars
    a = jnp.asarray(np_rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(np_rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    ca, _ = model.apply(vars_, a, deterministic=True, method=model.features)
    cb, _ = model.apply(vars_, b, deterministic=True, method=model.features)
    assert np.abs(np.asarray(ca - cb)).max() > 1e-3


def test_droppath_stochastic_and_deterministic(rng, np_rng):
    cfg = config.swin_femto(drop_path_rate=0.5)
    model = SwinTransformer(cfg)
    x = jnp.asarray(np_rng.normal(size=(4, 32, 32, 3)), jnp.float32)
    vars_ = model.init({"params": rng}, x, deterministic=True)
    d1 = model.apply(vars_, x, deterministic=True)[0]
    d2 = model.apply(vars_, x, deterministic=True)[0]
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
    s1 = model.apply(vars_, x, deterministic=False,
                     rngs={"droppath": jax.random.PRNGKey(1)})[0]
    s2 = model.apply(vars_, x, deterministic=False,
                     rngs={"droppath": jax.random.PRNGKey(2)})[0]
    assert np.abs(np.asarray(s1 - s2)).max() > 1e-6


def test_weight_norm_dense_matches_torch(rng, np_rng):
    """Our WeightNormDense must equal torch.nn.utils.weight_norm(Linear)."""
    in_dim, out_dim = 8, 12
    x = np_rng.normal(size=(5, in_dim)).astype(np.float32)
    layer = WeightNormDense(out_dim, norm_last_layer=False, in_features=in_dim)
    vars_ = layer.init(rng, jnp.asarray(x))
    v = np.asarray(vars_["params"]["kernel_v"])          # (in, out)
    g = np_rng.normal(size=(out_dim,)).astype(np.float32) + 2.0
    vars_ = {"params": {"kernel_v": jnp.asarray(v), "scale_g": jnp.asarray(g)}}
    ours = np.asarray(layer.apply(vars_, jnp.asarray(x)))

    lin = torch.nn.Linear(in_dim, out_dim, bias=False)
    lin = torch.nn.utils.weight_norm(lin)
    with torch.no_grad():
        lin.weight_v.copy_(torch.tensor(v.T))            # torch: (out, in)
        lin.weight_g.copy_(torch.tensor(g)[:, None])
    theirs = lin(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_norm_last_layer_freezes_g(rng, np_rng):
    x = jnp.asarray(np_rng.normal(size=(3, 8)), jnp.float32)
    layer = WeightNormDense(6, norm_last_layer=True, in_features=8)
    vars_ = layer.init(rng, x)
    g = jax.grad(lambda p: layer.apply({"params": p}, x).sum())(vars_["params"])
    np.testing.assert_array_equal(np.asarray(g["scale_g"]), 0.0)
    assert np.abs(np.asarray(g["kernel_v"])).max() > 0


def test_vit_multicrop_contract(rng, np_rng):
    cfg = config.ViTConfig(img_size=32, patch_size=8, embed_dim=24, depth=2,
                           num_heads=2)
    model = EsViTModel(cfg, HEAD, use_dense_prediction=True)
    B = 2
    crops = (jnp.asarray(np_rng.normal(size=(2 * B, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(3 * B, 16, 16, 3)), jnp.float32))
    vars_ = model.init({"params": rng}, crops, deterministic=True)
    cls, reg, fea, npatch = model.apply(vars_, crops, deterministic=True)
    assert npatch == (16, 4)      # 32/8=4x4; 16/8=2x2 (pos-embed interpolated)
    assert cls.shape == (5 * B, 64)


def test_swin_n_last_blocks(rng, np_rng):
    cfg = config.swin_femto()
    model = SwinTransformer(cfg)
    x = jnp.asarray(np_rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    vars_ = model.init({"params": rng}, x, deterministic=True)
    out = model.apply(vars_, x, 3, method=model.forward_return_n_last_blocks)
    # last 3 blocks: 1 from stage 0 (dim 16) + 2 from stage 1 (dim 32).
    assert out.shape == (2, 16 + 32 + 32)


def test_swin_selfattention_shapes(rng, np_rng):
    cfg = config.swin_femto()
    model = SwinTransformer(cfg)
    x = jnp.asarray(np_rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    vars_ = model.init({"params": rng}, x, deterministic=True)
    attn = model.apply(vars_, x, 1, method=model.forward_selfattention)
    # Last stage: res 4, window 4 -> 1 window/img, 2 heads, 16 tokens.
    assert attn.shape == (2, 2, 16, 16)
    attns = model.apply(vars_, x, 2, method=model.forward_selfattention)
    assert len(attns) == 4


def test_layout_opt_matches_classic(rng, np_rng):
    """Window-major stage layout must be numerically identical to the
    classic pad/roll/partition path at both crop resolutions."""
    m_on = SwinTransformer(config.swin_femto(layout_opt=True))
    m_off = SwinTransformer(config.swin_femto(layout_opt=False))
    x32 = jnp.asarray(np_rng.normal(size=(2, 32, 32, 3)), jnp.float32)
    x16 = jnp.asarray(np_rng.normal(size=(2, 16, 16, 3)), jnp.float32)
    v = m_on.init({"params": rng}, x32, deterministic=True)
    for x in (x32, x16):
        a_cls, a_reg = m_on.apply(v, x, deterministic=True)
        b_cls, b_reg = m_off.apply(v, x, deterministic=True)
        np.testing.assert_allclose(np.asarray(a_cls), np.asarray(b_cls),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a_reg), np.asarray(b_reg),
                                   rtol=1e-5, atol=1e-6)
