"""K-streamed DDINO loss (losses.ddino_loss_streamed) vs the dense path.

The streamed version folds the DINO-head last layer into the loss and
scans K in chunks; its value and every gradient (student bottleneck
features AND the effective last-layer weight) must match
ddino_loss(z @ W, ...) to fp-reassociation tolerance, and the new centers
must match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu.losses import DinoCenters, ddino_loss, ddino_loss_streamed


def _setup(dtype=jnp.float32, seed=0):
    rng = np.random.RandomState(seed)
    B, D, K = 3, 16, 64
    ncrops, Nt, Nl = 4, 4, 2
    npatch = (Nt, Nl)
    S = 2 * Nt + (ncrops - 2) * Nl
    C = 8

    def unit(*shape):
        x = rng.randn(*shape)
        return x / np.linalg.norm(x, axis=-1, keepdims=True)

    s_cls_z = jnp.asarray(unit(ncrops * B, D), dtype)
    s_reg_z = jnp.asarray(unit(B, S, D), dtype)
    t_cls_z = jnp.asarray(unit(2 * B, D), dtype)
    t_reg_z = jnp.asarray(unit(B, 2 * Nt, D), dtype)
    s_fea = jnp.asarray(rng.randn(B, S, C), dtype)
    t_fea = jnp.asarray(rng.randn(B, 2 * Nt, C), dtype)
    w = jnp.asarray(rng.randn(D, K) * D ** -0.5, jnp.float32)
    centers = DinoCenters(
        center=jnp.asarray(0.1 * rng.randn(K), jnp.float32),
        center_grid=jnp.asarray(0.1 * rng.randn(K), jnp.float32))
    kw = dict(ncrops=ncrops, batch_size=B, npatch=npatch, t_npatch=Nt)
    return (s_cls_z, s_reg_z, s_fea, t_cls_z, t_reg_z, t_fea, w, centers,
            kw, dtype)


def _wt(w):
    """A teacher weight deterministically distinct from the student's."""
    return jnp.roll(w, 3, axis=1) * 0.9


def _wd(w):
    """A dense-head weight distinct from the cls head's."""
    return jnp.roll(w, 7, axis=0) * 1.1


def _dense(s_cls_z, s_reg_z, s_fea, t_cls_z, t_reg_z, t_fea, w, centers,
           kw, dtype):
    """Reference: logits through the dense last layers, then ddino_loss
    (four distinct matrices: student/teacher x cls/dense head)."""
    wl = w.astype(dtype)
    wt = _wt(w).astype(dtype)
    wd = _wd(w).astype(dtype)
    wtd = _wd(_wt(w)).astype(dtype)
    student = (s_cls_z @ wl, s_reg_z @ wd, s_fea, kw["npatch"])
    teacher = (t_cls_z @ wt, t_reg_z @ wtd, t_fea, (kw["t_npatch"],))
    return ddino_loss(student, teacher, centers, jnp.float32(0.04),
                      ncrops=kw["ncrops"], batch_size=kw["batch_size"])


def _streamed(s_cls_z, s_reg_z, s_fea, t_cls_z, t_reg_z, t_fea, w, centers,
              kw, dtype, n_chunks=4):
    return ddino_loss_streamed(
        s_cls_z, s_reg_z, s_fea, t_cls_z, t_reg_z, t_fea, w, centers,
        jnp.float32(0.04), w_t=_wt(w), w_s_dense=_wd(w),
        w_t_dense=_wd(_wt(w)), n_chunks=n_chunks, **kw)


def test_streamed_matches_dense_value_and_centers():
    args = _setup()
    loss_d, cent_d = _dense(*args)
    loss_s, cent_s = _streamed(*args)
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=1e-5)
    np.testing.assert_allclose(cent_s.center, cent_d.center,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(cent_s.center_grid, cent_d.center_grid,
                               rtol=1e-5, atol=1e-6)


def test_streamed_matches_dense_grads():
    args = _setup()

    def loss_of(fn, s_cls, s_reg, w):
        a = (s_cls, s_reg) + args[2:6] + (w,) + args[7:]
        return fn(*a)[0]

    gd = jax.grad(lambda *a: loss_of(_dense, *a), (0, 1, 2))(
        args[0], args[1], args[6])
    gs = jax.grad(lambda *a: loss_of(_streamed, *a), (0, 1, 2))(
        args[0], args[1], args[6])
    for a, b, name in zip(gs, gd, ("s_cls_z", "s_reg_z", "w")):
        scale = max(float(jnp.max(jnp.abs(b))), 1e-9)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=2e-5, atol=2e-5, err_msg=name)


def test_streamed_bf16_close():
    args = _setup(dtype=jnp.bfloat16)
    loss_d, _ = _dense(*args)
    loss_s, _ = _streamed(*args)
    np.testing.assert_allclose(float(loss_s), float(loss_d), rtol=2e-2)


def test_streamed_chunking_invariant():
    args = _setup()
    l1, _ = _streamed(*args, n_chunks=1)
    l4, _ = _streamed(*args, n_chunks=4)
    l8, _ = _streamed(*args, n_chunks=8)
    np.testing.assert_allclose(float(l1), float(l4), rtol=1e-6)
    np.testing.assert_allclose(float(l4), float(l8), rtol=1e-6)
