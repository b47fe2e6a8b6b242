"""Sliding-chunk 2-D attention ops vs the reference torch implementation
(layers/slidingchunk_2d.py) — qk, av, gradients, and all three mask
variants, across modes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu.ops import slidingchunk as sc

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")

from tests import ref_compat  # noqa: E402

ref_sc = ref_compat.load_reference_module("layers.slidingchunk_2d")

BH, M, MX, MY, W = 2, 4, 3, 2, 2
W2 = W * W


@pytest.fixture(scope="module")
def qkv(np_rng=np.random.default_rng(0)):
    q = np_rng.normal(size=(BH, M, MX, MY, W2)).astype(np.float32)
    k = np_rng.normal(size=(BH, M, MX, MY, W2)).astype(np.float32)
    v = np_rng.normal(size=(BH, M, MX, MY, W2)).astype(np.float32)
    return q, k, v


@pytest.mark.parametrize("mode", [0, -1, 1, 3, 5, 8])
def test_qk_matches_reference(qkv, mode):
    q, k, _ = qkv
    ref = ref_sc.SlidingChunk2D.slidingchunk_qk(
        torch.tensor(q), torch.tensor(k), mode).numpy()
    got = np.asarray(sc.slidingchunk_qk(jnp.asarray(q), jnp.asarray(k), mode))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mode", [0, -1, 2, 7])
def test_av_matches_reference(qkv, mode):
    q, k, v = qkv
    nk = {0: 9, -1: 1}.get(mode, 2)
    rng = np.random.default_rng(1)
    attn = rng.normal(size=(BH, MX, MY, W2, nk * W2)).astype(np.float32)
    ref = ref_sc.SlidingChunk2D.slidingchunk_av(
        torch.tensor(attn), torch.tensor(v), mode).numpy()
    got = np.asarray(sc.slidingchunk_av(jnp.asarray(attn), jnp.asarray(v), mode))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_autodiff_matches_reference_handgrad(qkv):
    """Our autodiff gradient must equal the reference's hand-written
    backward (SlidingChunk2D.backward, ref :231-243)."""
    q, k, _ = qkv
    tq = torch.tensor(q, requires_grad=True)
    tk = torch.tensor(k, requires_grad=True)
    out = ref_sc.slidingchunk_2d(tq, tk, False, 0)
    out.sum().backward()

    def f(args):
        qq, kk = args
        return sc.slidingchunk_qk(qq, kk, 0).sum()

    gq, gk = jax.grad(f)((jnp.asarray(q), jnp.asarray(k)))
    np.testing.assert_allclose(np.asarray(gq), tq.grad.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk), tk.grad.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("exact", [0, -1])
@pytest.mark.parametrize("mode", [0, -1, 4])
@pytest.mark.parametrize("pad", [(0, 0), (1, 1)])
def test_masks_match_reference(exact, mode, pad):
    padx, pady = pad
    attn_shape = {0: 9, -1: 1}.get(mode, 2)
    attn = torch.zeros(BH, MX, MY, W2, attn_shape * W2)
    num_invalid = ref_sc.mask_invalid_locations(
        attn, MX, MY, padx, pady, W, exact=exact, mode=mode)
    ref_mask = torch.isinf(attn[0, :, :, 0]).reshape(MX, MY, -1).numpy()

    got = sc.invalid_locations_mask(MX, MY, padx, pady, W, exact, mode)
    got = np.broadcast_to(got, (1, MX, MY, W2, got.shape[-1]))[0, :, :, 0]
    np.testing.assert_array_equal(got, ref_mask)


def test_exact_mask_matches_reference():
    attn = torch.zeros(BH, MX, MY, W2, 9 * W2)
    ref_sc.mask_invalid_locations(attn, MX, MY, 1, 0, W, exact=1, mode=0)
    ref_mask = torch.isinf(attn[0]).numpy()
    got = sc.invalid_locations_mask(MX, MY, 1, 0, W, exact=1, mode=0)[0]
    np.testing.assert_array_equal(got, ref_mask)
