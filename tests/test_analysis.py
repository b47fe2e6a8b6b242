"""Attention + correspondence analysis tooling."""

import numpy as np
import jax
import jax.numpy as jnp

from esvit_tpu import config
from esvit_tpu.analysis import attention, correspondence
from esvit_tpu.models.registry import build_backbone


def test_attention_entropy_bounds(np_rng):
    # uniform attention -> max entropy log(N); delta -> 0
    N = 16
    uni = np.full((1, 2, N, N), 1.0 / N)
    ent = attention.attention_entropy(uni)
    np.testing.assert_allclose(ent, np.log(N), rtol=1e-6)
    delta = np.zeros((1, 2, N, N))
    delta[..., 0] = 1.0
    np.testing.assert_allclose(attention.attention_entropy(delta), 0.0,
                               atol=1e-9)


def test_threshold_mask_keeps_mass():
    row = np.array([0.5, 0.3, 0.1, 0.05, 0.05])
    m = attention.threshold_mask(row, 0.6)
    assert m[0] and m[1]            # 0.5 then crossing token
    assert not m[3] and not m[4]


def test_match_regions_identity(np_rng):
    f = np_rng.normal(size=(9, 8)).astype(np.float32)
    idx, sim = correspondence.match_regions(f, f)
    np.testing.assert_array_equal(idx, np.arange(9))
    np.testing.assert_allclose(sim, 1.0, rtol=1e-5)


def test_correspondence_flip_protocol(rng, np_rng):
    """A flip-equivariant feature extractor gives 100% correspondence; the
    protocol itself must compute the right ground truth."""

    class FakeBackbone:
        def apply(self, variables, x, deterministic=True):
            # features = patch mean colors over a 4x4 grid -> exactly
            # flip-equivariant
            B, H, W, C = x.shape
            g = 4
            p = np.asarray(x).reshape(B, g, H // g, g, W // g, C)
            fea = p.mean(axis=(2, 4)).reshape(B, g * g, C)
            return None, jnp.asarray(fea)

    imgs = np_rng.uniform(size=(2, 16, 16, 3)).astype(np.float32)
    acc, dist = correspondence.correspondence_accuracy(
        FakeBackbone(), None, imgs)
    assert acc == 100.0
    assert dist == 0.0


def test_attention_maps_and_grid(tmp_path, rng, np_rng):
    cfg = config.swin_femto()
    backbone = build_backbone(cfg)
    x = jnp.asarray(np_rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    variables = backbone.init({"params": rng}, x, deterministic=True)
    attn = attention.attention_maps(backbone, variables, x, n=1)
    a = np.asarray(attn)
    assert a.ndim == 4
    np.testing.assert_allclose(a.sum(-1), 1.0, rtol=1e-4)  # rows are probs
    out = tmp_path / "attn.png"
    attention.save_attention_grid(a, str(out))
    assert out.is_file() and out.stat().st_size > 0


def test_plot_correspondence(tmp_path, np_rng):
    img = np_rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
    fea = np_rng.normal(size=(16, 8)).astype(np.float32)
    out = tmp_path / "corr.png"
    correspondence.plot_correspondence(img, img, fea, fea, str(out), top_k=5)
    assert out.is_file() and out.stat().st_size > 0
