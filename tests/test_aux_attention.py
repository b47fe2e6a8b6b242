"""Axial / criss-cross attention vs the reference layers/attention.py."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu.models.aux_attention import AxialAttention, CrissCrossAttention

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")

from tests import ref_compat  # noqa: E402

ref_attn = ref_compat.load_reference_module("layers.attention")

B, H, C, NHD = 2, 4, 16, 2          # 4x4 grid + cls, dim 16, 2 heads
N = 1 + H * H


def _import_params(ref_mod):
    sd = {k: v.detach().numpy() for k, v in ref_mod.state_dict().items()}
    return {
        "qkv": {"kernel": sd["qkv.weight"].T, "bias": sd["qkv.bias"]},
        "proj": {"kernel": sd["proj.weight"].T, "bias": sd["proj.bias"]},
    }


@pytest.mark.parametrize("horizontal", [False, True])
def test_axial_matches_reference(np_rng, horizontal):
    torch.manual_seed(0)
    # use_full_attn_for_cls=True is the config every non-archived axial
    # experiment uses (the False path crashes in the reference itself).
    ref = ref_attn.AxialAttention(C, num_heads=NHD, qkv_bias=True,
                                  use_cls_token=True, horizontal=horizontal,
                                  use_full_attn_for_cls=True)
    ref.eval()
    ours = AxialAttention(C, num_heads=NHD, qkv_bias=True,
                          horizontal=horizontal)
    params = _import_params(ref)
    x = np_rng.normal(size=(B, N, C)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = ref(torch.tensor(x))
    j_out = ours.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_crisscross_matches_reference(np_rng):
    torch.manual_seed(1)
    ref = ref_attn.CrissCrossAttention(C, num_heads=NHD, qkv_bias=True,
                                       use_cls_token=True)
    ref.eval()
    ours = CrissCrossAttention(C, num_heads=NHD, qkv_bias=True,
                               use_cls_token=True)
    params = _import_params(ref)
    x = np_rng.normal(size=(B, N, C)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = ref(torch.tensor(x))
    j_out = ours.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_crisscross_no_cls(np_rng):
    torch.manual_seed(2)
    ref = ref_attn.CrissCrossAttention(C, num_heads=NHD, qkv_bias=True,
                                       use_cls_token=False)
    ref.eval()
    ours = CrissCrossAttention(C, num_heads=NHD, qkv_bias=True,
                               use_cls_token=False)
    params = _import_params(ref)
    x = np_rng.normal(size=(B, H * H, C)).astype(np.float32)
    with torch.no_grad():
        t_out, _ = ref(torch.tensor(x))
    j_out = ours.apply({"params": jax.tree.map(jnp.asarray, params)},
                       jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)
