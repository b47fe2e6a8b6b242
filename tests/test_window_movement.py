"""Structured layout movement (ops/window.py to/from/transition_*) must
match the gather tables it replaced (round-5: the gathers' scatter-add
backward + layout copies measured several ms/step in the train profile).

Real-slot contents must be IDENTICAL to x[:, perm, :]; dead padded slots
are zero in the structured version (the gather read token 0 there) — both
are masked downstream, so only real slots are compared.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esvit_tpu.ops import window as wops


def _x(B, L, C, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, L, C),
                             jnp.float32)


CASES = [
    # (Hp, Wp, ws) covering: multi-window square, rect, single window
    (56, 56, 7), (14, 14, 7), (28, 14, 7), (8, 8, 4), (28, 28, 14),
]


@pytest.mark.parametrize("Hp,Wp,ws", CASES)
@pytest.mark.parametrize("shift", [0, 2])
def test_unpadded_roundtrip_and_parity(Hp, Wp, ws, shift):
    if shift >= ws:
        pytest.skip("shift < ws")
    x = _x(2, Hp * Wp, 8)
    perm = wops.window_major_perm(Hp, Wp, ws, shift)
    ref = x[:, jnp.asarray(perm), :]
    out = wops.to_window_major(x, Hp, Wp, ws, shift)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    back = wops.from_window_major(out, Hp, Wp, ws, shift)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("Hp,Wp,ws", CASES)
@pytest.mark.parametrize("src,dst", [(0, 3), (3, 0)])
def test_unpadded_transition(Hp, Wp, ws, src, dst):
    if max(src, dst) >= ws:
        pytest.skip("shift < ws")
    x = _x(2, Hp * Wp, 8, seed=1)
    src_wm = wops.to_window_major(x, Hp, Wp, ws, src)
    trans = wops.layout_transition(Hp, Wp, ws, src, dst)
    ref = src_wm[:, jnp.asarray(trans), :]
    out = wops.transition_window_major(src_wm, Hp, Wp, ws, src, dst)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def _real_slot_mask(nW, ws):
    N, Np = ws * ws, wops.padded_window_tokens(ws)
    m = np.zeros((nW, Np), bool)
    m[:, :N] = True
    return m.reshape(-1)


@pytest.mark.parametrize("Hp,Wp,ws", CASES)
@pytest.mark.parametrize("shift", [0, 2])
def test_padded_parity_and_roundtrip(Hp, Wp, ws, shift):
    if shift >= ws:
        pytest.skip("shift < ws")
    x = _x(2, Hp * Wp, 8, seed=2)
    perm = wops.window_major_perm_padded(Hp, Wp, ws, shift)
    ref = x[:, jnp.asarray(perm), :]
    out = wops.to_window_major_padded(x, Hp, Wp, ws, shift)
    nW = (Hp // ws) * (Wp // ws)
    real = _real_slot_mask(nW, ws)
    np.testing.assert_array_equal(np.asarray(out)[:, real],
                                  np.asarray(ref)[:, real])
    # Dead slots are exactly zero (masked downstream either way).
    assert not np.asarray(out)[:, ~real].any()
    back = wops.from_window_major_padded(out, Hp, Wp, ws, shift)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


@pytest.mark.parametrize("Hp,Wp,ws", CASES)
@pytest.mark.parametrize("src,dst", [(0, 3), (3, 0)])
def test_padded_transition(Hp, Wp, ws, src, dst):
    if max(src, dst) >= ws:
        pytest.skip("shift < ws")
    x = _x(2, Hp * Wp, 8, seed=3)
    src_wm = wops.to_window_major_padded(x, Hp, Wp, ws, src)
    trans = wops.layout_transition_padded(Hp, Wp, ws, src, dst)
    ref = src_wm[:, jnp.asarray(trans), :]
    out = wops.transition_window_major_padded(src_wm, Hp, Wp, ws, src, dst)
    nW = (Hp // ws) * (Wp // ws)
    real = _real_slot_mask(nW, ws)
    np.testing.assert_array_equal(np.asarray(out)[:, real],
                                  np.asarray(ref)[:, real])


def test_backward_has_no_scatter():
    """The point of the rewrite: the movement chain's VJP must lower to
    slice/transpose/roll (concat of slices), never gather/scatter."""
    Hp = Wp = 14
    ws = 7

    def f(x):
        y = wops.to_window_major_padded(x, Hp, Wp, ws, 3)
        y = wops.transition_window_major_padded(y, Hp, Wp, ws, 3, 0)
        return jnp.sum(wops.from_window_major_padded(y, Hp, Wp, ws, 0) ** 2)

    hlo = jax.jit(jax.grad(f)).lower(_x(2, Hp * Wp, 8)).as_text()
    assert "scatter" not in hlo and "gather" not in hlo
