"""Window partition/reverse, relative-position index, SW-MSA mask."""

import jax.numpy as jnp
import numpy as np

from esvit_tpu.ops import window as wops


def test_partition_reverse_roundtrip(np_rng):
    x = jnp.asarray(np_rng.normal(size=(2, 14, 14, 8)), jnp.float32)
    w = wops.window_partition(x, 7)
    assert w.shape == (2 * 4, 49, 8)
    back = wops.window_reverse(w, 7, 14, 14)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_partition_window_contents():
    # Token (i, j) of window (wi, wj) must be pixel (wi*ws+i, wj*ws+j).
    H = W = 4
    ws = 2
    x = jnp.arange(H * W, dtype=jnp.float32).reshape(1, H, W, 1)
    w = wops.window_partition(x, ws)
    assert w.shape == (4, 4, 1)
    # window (0,1) covers columns 2:4 of rows 0:2
    np.testing.assert_array_equal(np.asarray(w[1, :, 0]), [2, 3, 6, 7])


def test_relative_position_index_properties():
    idx = wops.relative_position_index(7, 7)
    assert idx.shape == (49, 49)
    assert idx.min() == 0 and idx.max() == 13 * 13 - 1
    # Self-pairs share one index (zero displacement), center of the table.
    center = idx[0, 0]
    assert np.all(np.diag(idx) == center)
    assert center == (13 * 13 - 1) // 2
    # Displacement symmetry: idx[i,j] mirrors idx[j,i] about the center.
    flip = idx + idx.T
    assert np.all(flip == 2 * center)


def test_shifted_mask_divisible():
    # 14x14, ws 7, shift 3 -> 4 windows; only the "wrap" windows get -100.
    m = wops.shifted_window_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    assert set(np.unique(m)) <= {0.0, -100.0}
    # Top-left window is fully interior: no masking.
    assert np.all(m[0] == 0)
    # Bottom-right window mixes 4 regions: mask must not be all-zero.
    assert np.any(m[3] != 0)
    # Masks are symmetric (pairwise region disagreement).
    for i in range(4):
        np.testing.assert_array_equal(m[i], m[i].T)


def test_shifted_mask_padded_resolution():
    # Runtime 24x24 with ws 7 pads to 28x28 (local crops at stage 1).
    m = wops.shifted_window_mask(24, 24, 7, 3)
    assert m.shape == (16, 49, 49)


def test_mask_matches_bruteforce():
    """Brute-force reconstruction: label the shifted-frame grid into the 9
    Swin regions; a pair attends iff both tokens carry the same label."""
    H = W = 8
    ws, ss = 4, 2
    # Label each pixel of the (padded == same here) grid by region id.
    labels = np.zeros((H, W), dtype=int)
    bounds = [(0, H - ws), (H - ws, H - ss), (H - ss, H)]
    for a, (h0, h1) in enumerate(bounds):
        for b, (w0, w1) in enumerate(bounds):
            labels[h0:h1, w0:w1] = a * 3 + b
    expect = []
    for wi in range(H // ws):
        for wj in range(W // ws):
            win = labels[wi * ws:(wi + 1) * ws, wj * ws:(wj + 1) * ws].reshape(-1)
            expect.append(np.where(win[None, :] != win[:, None], -100.0, 0.0))
    got = wops.shifted_window_mask(H, W, ws, ss)
    np.testing.assert_array_equal(got, np.stack(expect))
