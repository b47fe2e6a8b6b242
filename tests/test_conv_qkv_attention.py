"""Conv-QKV Attention / DownAttention / CrossScaleAttention vs the
reference layers/attention.py (golden parity, eval mode)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from esvit_tpu.models.aux_attention import (ConvQKVAttention,
                                            CrossScaleAttention,
                                            DownAttention)

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")

from tests import ref_compat  # noqa: E402

ref_attn = ref_compat.load_reference_module("layers.attention")

B, H, C, NHD = 2, 4, 16, 2          # 4x4 grid, dim 16, 2 heads
N_GRID, N_CLS = H * H, H * H + 1


def _randomize_bn(ref_mod, seed):
    """Give BatchNorms non-trivial affine params AND running stats so the
    eval-mode parity actually exercises them."""
    g = torch.Generator().manual_seed(seed)
    for m in ref_mod.modules():
        if isinstance(m, tnn.BatchNorm2d):
            with torch.no_grad():
                m.weight.normal_(1.0, 0.2, generator=g)
                m.bias.normal_(0.0, 0.1, generator=g)
                m.running_mean.normal_(0.0, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


def _import_params(ref_mod):
    """Torch module tree -> flax {params, batch_stats} with matching
    submodule names (the flax modules name their layers after the reference
    attributes)."""
    params, stats = {}, {}
    for name, mod in ref_mod.named_modules():
        if not name:
            continue
        if isinstance(mod, tnn.Conv2d):
            p = {"kernel": mod.weight.detach().numpy().transpose(2, 3, 1, 0)}
            if mod.bias is not None:
                p["bias"] = mod.bias.detach().numpy()
            params[name] = p
        elif isinstance(mod, tnn.Conv1d):
            p = {"kernel": mod.weight.detach().numpy()[:, :, 0].T}
            if mod.bias is not None:
                p["bias"] = mod.bias.detach().numpy()
            params[name] = p
        elif isinstance(mod, tnn.Linear):
            p = {"kernel": mod.weight.detach().numpy().T}
            if mod.bias is not None:
                p["bias"] = mod.bias.detach().numpy()
            params[name] = p
        elif isinstance(mod, tnn.BatchNorm2d):
            params[name] = {"scale": mod.weight.detach().numpy(),
                            "bias": mod.bias.detach().numpy()}
            stats[name] = {"mean": mod.running_mean.numpy(),
                           "var": mod.running_var.numpy()}
    out = {"params": jax.tree.map(jnp.asarray, params)}
    if stats:
        out["batch_stats"] = jax.tree.map(jnp.asarray, stats)
    return out


def _compare(ref, ours, x, prev=None, rtol=1e-4, atol=1e-5):
    ref.eval()
    variables = _import_params(ref)
    with torch.no_grad():
        t_out, t_prev, _ = ref(torch.tensor(x),
                               None if prev is None else torch.tensor(prev))
    j_out, j_prev = ours.apply(variables, jnp.asarray(x),
                               None if prev is None else jnp.asarray(prev))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=rtol, atol=atol)
    if t_prev is not None:
        np.testing.assert_allclose(np.asarray(j_prev), t_prev.numpy(),
                                   rtol=rtol, atol=atol)
    return np.asarray(j_out)


def test_linear_res_score_chain(np_rng):
    """Linear qkv path + residual score chaining across two calls."""
    torch.manual_seed(0)
    ref = ref_attn.Attention(C, num_heads=NHD, qkv_bias=True, res_score=True)
    ours = ConvQKVAttention(C, num_heads=NHD, qkv_bias=True, res_score=True)
    x = np_rng.normal(size=(B, N_GRID, C)).astype(np.float32)
    _compare(ref, ours, x)
    prev = np_rng.normal(size=(B, NHD, N_GRID, N_GRID)).astype(np.float32)
    _compare(ref, ours, x, prev=prev)


def test_conv_method_with_cls(np_rng):
    """method='conv': strided conv qkv; the cls row comes from convolving a
    3x3 tile of the cls vector and taking the center (ref :523)."""
    torch.manual_seed(1)
    ref = ref_attn.Attention(C, num_heads=NHD, qkv_bias=True,
                             use_qkvconv=True, method="conv")
    ours = ConvQKVAttention(C, num_heads=NHD, qkv_bias=True,
                            use_qkvconv=True, method="conv")
    x = np_rng.normal(size=(B, N_CLS, C)).astype(np.float32)
    _compare(ref, ours, x)


@pytest.mark.parametrize("method", ["dw_bn_glu_pw", "dw_swish_pw", "dw_pw"])
def test_dw_methods_with_cls(np_rng, method):
    torch.manual_seed(2)
    ref = ref_attn.Attention(C, num_heads=NHD, qkv_bias=True,
                             use_qkvconv=True, method=method)
    _randomize_bn(ref, 22)
    ours = ConvQKVAttention(C, num_heads=NHD, qkv_bias=True,
                            use_qkvconv=True, method=method)
    x = np_rng.normal(size=(B, N_CLS, C)).astype(np.float32)
    _compare(ref, ours, x)


def test_dw_reduced_qkv_ratio(np_rng):
    """qkv_ratio != 3: reduced q/k dims, full-dim v, h-major channel split
    (ref :527-533)."""
    torch.manual_seed(3)
    ref = ref_attn.Attention(C, num_heads=NHD, qkv_bias=True,
                             use_qkvconv=True, method="dw_bn_pw",
                             qkv_ratio=1.5)
    _randomize_bn(ref, 33)
    ours = ConvQKVAttention(C, num_heads=NHD, qkv_bias=True,
                            use_qkvconv=True, method="dw_bn_pw",
                            qkv_ratio=1.5)
    x = np_rng.normal(size=(B, N_GRID, C)).astype(np.float32)
    _compare(ref, ours, x)


@pytest.mark.parametrize("method", ["pw_glu_conv_bn_glu_pw",
                                    "pw_glu_dw_glu_pw",
                                    "pw_glu_conv_bn_pw"])
def test_pw_methods(np_rng, method):
    torch.manual_seed(4)
    ref = ref_attn.Attention(C, num_heads=NHD, qkv_bias=True,
                             use_qkvconv=True, method=method,
                             conv_reduce_ratio=2)
    _randomize_bn(ref, 44)
    ours = ConvQKVAttention(C, num_heads=NHD, qkv_bias=True,
                            use_qkvconv=True, method=method,
                            conv_reduce_ratio=2)
    x = np_rng.normal(size=(B, N_CLS, C)).astype(np.float32)
    _compare(ref, ours, x)


def test_conv_pw_avg_att_and_v_res(np_rng):
    torch.manual_seed(5)
    kw = dict(num_heads=NHD, qkv_bias=True, use_qkvconv=True,
              method="conv_pw", add_v_res=True)
    x = np_rng.normal(size=(B, N_GRID, C)).astype(np.float32)
    for avg_kw in ({"use_avg_att": True}, {"use_avg_att_all": True}, {}):
        ref = ref_attn.Attention(C, **kw, **avg_kw)
        ours = ConvQKVAttention(C, **kw, **avg_kw)
        _compare(ref, ours, x)


def test_dw_avg_att_reduced_ratio(np_rng):
    """ratio != 3 forces torch to COPY v in the avg-att reshape, so
    add_v_res adds the UNMODIFIED v there (unlike ratio == 3, where the
    reshape is a view and the in-place row write lands in v) — both
    aliasing behaviors are pinned by tests."""
    torch.manual_seed(10)
    kw = dict(num_heads=NHD, qkv_bias=True, use_qkvconv=True,
              method="dw_pw", add_v_res=True, use_avg_att=True)
    x = np_rng.normal(size=(B, N_GRID, C)).astype(np.float32)
    for ratio in (3.0, 1.5):
        ref = ref_attn.Attention(C, **kw, qkv_ratio=ratio)
        ours = ConvQKVAttention(C, **kw, qkv_ratio=ratio)
        _compare(ref, ours, x)


@pytest.mark.parametrize("after_proj", [False, True])
def test_down_attention(np_rng, after_proj):
    """DownAttention: stride-2 qkv, bilinear 2x re-upsample, v_full fusion
    before or after the projection."""
    torch.manual_seed(6)
    ref = ref_attn.DownAttention(C, num_heads=NHD, qkv_bias=True,
                                 use_qkvconv=True, method="dw_bn_glu_pw",
                                 stride=2, add_v_full_after_proj=after_proj)
    _randomize_bn(ref, 66)
    ours = DownAttention(C, num_heads=NHD, qkv_bias=True,
                         method="dw_bn_glu_pw", stride=2,
                         add_v_full_after_proj=after_proj)
    x = np_rng.normal(size=(B, N_CLS, C)).astype(np.float32)
    _compare(ref, ours, x)


def test_down_attention_reduced_ratio(np_rng):
    torch.manual_seed(7)
    ref = ref_attn.DownAttention(C, num_heads=NHD, qkv_bias=True,
                                 use_qkvconv=True, method="dw_bn_glu_pw",
                                 stride=2, qkv_ratio=1.5)
    _randomize_bn(ref, 77)
    ours = DownAttention(C, num_heads=NHD, qkv_bias=True,
                         method="dw_bn_glu_pw", stride=2, qkv_ratio=1.5)
    x = np_rng.normal(size=(B, N_CLS, C)).astype(np.float32)
    _compare(ref, ours, x)


@pytest.mark.parametrize("after_proj", [False, True])
def test_cross_scale_attention(np_rng, after_proj):
    """CrossScaleAttention: full-res queries over stride-2 keys/values,
    including the reference's channel-major head-split scramble."""
    torch.manual_seed(8)
    ref = ref_attn.CrossScaleAttention(
        C, num_heads=NHD, qkv_bias=True, use_qkvconv=True,
        method="dw_bn_glu_pw", stride=2, add_v_full_after_proj=after_proj)
    _randomize_bn(ref, 88)
    ours = CrossScaleAttention(C, num_heads=NHD, qkv_bias=True,
                               method="dw_bn_glu_pw", stride=2,
                               add_v_full_after_proj=after_proj)
    x = np_rng.normal(size=(B, N_CLS, C)).astype(np.float32)
    _compare(ref, ours, x)


def test_cross_scale_no_cls(np_rng):
    torch.manual_seed(9)
    ref = ref_attn.CrossScaleAttention(C, num_heads=NHD, qkv_bias=True,
                                       use_qkvconv=True, method="dw_pw",
                                       stride=1)
    _randomize_bn(ref, 99)
    ours = CrossScaleAttention(C, num_heads=NHD, qkv_bias=True,
                               method="dw_pw", stride=1)
    x = np_rng.normal(size=(B, N_GRID, C)).astype(np.float32)
    _compare(ref, ours, x)


@pytest.mark.parametrize("in_hw,scale", [((2, 2), 2.0), ((3, 5), 2.0),
                                         ((4, 4), 1.5)])
def test_bilinear_matches_torch(np_rng, in_hw, scale):
    """torch_bilinear_resize == F.interpolate(mode='bilinear',
    align_corners=False) including the source-coordinate clamp."""
    from esvit_tpu.ops.resample import torch_bilinear_resize

    h, w = in_hw
    x = np_rng.normal(size=(B, h, w, 3)).astype(np.float32)
    t = torch.nn.functional.interpolate(
        torch.tensor(x).permute(0, 3, 1, 2), scale_factor=scale,
        mode="bilinear", align_corners=False).permute(0, 2, 3, 1).numpy()
    oh, ow = t.shape[1], t.shape[2]
    j = np.asarray(torch_bilinear_resize(jnp.asarray(x), oh, ow,
                                         scale, scale))
    np.testing.assert_allclose(j, t, rtol=1e-5, atol=1e-6)
