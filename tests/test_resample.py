"""torch-compatible bicubic resampler vs torch.nn.functional.interpolate."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from esvit_tpu.ops import resample


@pytest.mark.parametrize("scale", [0.5, 14 / 6, np.sqrt(17 / 16), 1.5])
@pytest.mark.parametrize("size", [(4, 4), (7, 7), (5, 8)])
def test_matches_torch_interpolate(np_rng, scale, size):
    H, W = size
    x = np_rng.normal(size=(1, H, W, 3)).astype(np.float32)
    got = np.asarray(resample.torch_interpolate_scale(jnp.asarray(x), scale))
    ref = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2),
                        scale_factor=scale, mode="bicubic")
    ref = ref.permute(0, 2, 3, 1).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_explicit_size_matches_torch(np_rng):
    x = np_rng.normal(size=(1, 14, 14, 4)).astype(np.float32)
    got = np.asarray(resample.torch_bicubic_resize(jnp.asarray(x), 6, 6))
    ref = F.interpolate(torch.tensor(x).permute(0, 3, 1, 2), size=(6, 6),
                        mode="bicubic").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
