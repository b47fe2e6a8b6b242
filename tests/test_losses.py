"""DINO/DDINO loss math vs an independent torch clean-room implementation.

The torch versions below are written directly from the published DINO/EsViT
loss definitions (teacher softmax((t-c)/temp) over 2 views, student
log-softmax at temp 0.1, pairwise CE with v != iq; dense task: cosine-argmax
region matching, 0.5/0.5 weighting, separate grid center) and serve as an
independent oracle for the JAX implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from esvit_tpu import losses

OUT = 32
B = 5
NCROPS = 6   # 2 global + 4 local
NG, NL = 16, 4  # region tokens per global / local view
C_FEA = 12


def torch_dino(student, teacher, center, t_temp, s_temp=0.1):
    s = (student / s_temp).chunk(NCROPS)
    q = F.softmax((teacher - center) / t_temp, dim=-1).chunk(2)
    total, n = 0.0, 0
    for iq in range(2):
        for v in range(NCROPS):
            if v == iq:
                continue
            total = total + (-q[iq] * F.log_softmax(s[v], dim=-1)).sum(-1).mean()
            n += 1
    new_center = center * 0.9 + teacher.mean(0, keepdim=True) * 0.1
    return total / n, new_center


def torch_ddino(s_cls, s_region, s_fea, t_cls, t_region, t_fea,
                center, center_grid, t_temp, s_temp=0.1):
    q_cls = F.softmax((t_cls - center) / t_temp, -1).chunk(2)
    q_reg = F.softmax((t_region - center_grid) / t_temp, -1).view(2, B, NG, -1)
    t_fea = t_fea.view(2, B, NG, -1)
    s_cls_v = (s_cls / s_temp).chunk(NCROPS)
    patches = [NG] * 2 + [NL] * (NCROPS - 2)
    offs = np.cumsum([0] + [p * B for p in patches])
    total, n = 0.0, 0
    for iq in range(2):
        for v in range(NCROPS):
            if v == iq:
                continue
            loss = 0.5 * (-q_cls[iq] * F.log_softmax(s_cls_v[v], -1)).sum(-1)
            sr = (s_region[offs[v]:offs[v + 1]] / s_temp).view(B, patches[v], -1)
            sf = s_fea[offs[v]:offs[v + 1]].view(B, patches[v], -1)
            sim = torch.matmul(F.normalize(sf, dim=-1),
                               F.normalize(t_fea[iq], dim=-1).transpose(1, 2))
            ind = sim.max(-1)[1]
            t_sel = torch.gather(q_reg[iq], 1,
                                 ind.unsqueeze(-1).expand(-1, -1, q_reg.shape[-1]))
            loss_grid = (-t_sel * F.log_softmax(sr, -1)).sum(-1).mean(-1)
            total = total + (loss + 0.5 * loss_grid).mean()
            n += 1
    nc = center * 0.9 + t_cls.mean(0, keepdim=True) * 0.1
    ncg = center_grid * 0.9 + t_region.mean(0, keepdim=True) * 0.1
    return total / n, nc, ncg


def test_dino_loss_matches_torch(np_rng):
    student = np_rng.normal(size=(NCROPS * B, OUT)).astype(np.float32)
    teacher = np_rng.normal(size=(2 * B, OUT)).astype(np.float32)
    center = np_rng.normal(size=(OUT,)).astype(np.float32)
    t_temp = 0.05

    ref_loss, ref_center = torch_dino(torch.tensor(student), torch.tensor(teacher),
                                      torch.tensor(center)[None], t_temp)
    loss, new_center = losses.dino_loss(
        jnp.asarray(student), jnp.asarray(teacher), jnp.asarray(center),
        jnp.float32(t_temp), ncrops=NCROPS)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_center), ref_center[0].numpy(),
                               rtol=1e-5, atol=1e-7)


def test_ddino_loss_matches_torch(np_rng):
    n_region_rows = B * (2 * NG + (NCROPS - 2) * NL)
    s_cls = np_rng.normal(size=(NCROPS * B, OUT)).astype(np.float32)
    s_region = np_rng.normal(size=(n_region_rows, OUT)).astype(np.float32)
    s_fea = np_rng.normal(size=(n_region_rows, C_FEA)).astype(np.float32)
    t_cls = np_rng.normal(size=(2 * B, OUT)).astype(np.float32)
    t_region = np_rng.normal(size=(2 * B * NG, OUT)).astype(np.float32)
    t_fea = np_rng.normal(size=(2 * B * NG, C_FEA)).astype(np.float32)
    center = np_rng.normal(size=(OUT,)).astype(np.float32)
    center_grid = np_rng.normal(size=(OUT,)).astype(np.float32)
    t_temp = 0.04

    ref_loss, ref_c, ref_cg = torch_ddino(
        *map(torch.tensor, (s_cls, s_region, s_fea, t_cls, t_region, t_fea)),
        torch.tensor(center)[None], torch.tensor(center_grid)[None], t_temp)

    centers = losses.DinoCenters(jnp.asarray(center), jnp.asarray(center_grid))
    student_out = (jnp.asarray(s_cls), jnp.asarray(s_region),
                   jnp.asarray(s_fea), (NG, NL))
    teacher_out = (jnp.asarray(t_cls), jnp.asarray(t_region),
                   jnp.asarray(t_fea), (NG,))
    loss, new_centers = losses.ddino_loss(
        student_out, teacher_out, centers, jnp.float32(t_temp),
        ncrops=NCROPS, batch_size=B)

    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_centers.center), ref_c[0].numpy(),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(new_centers.center_grid),
                               ref_cg[0].numpy(), rtol=1e-5, atol=1e-7)


def test_dino_loss_gradient_only_through_student(np_rng):
    """Teacher outputs are stop-gradiented: d(loss)/d(teacher) must be 0."""
    student = jnp.asarray(np_rng.normal(size=(NCROPS * B, OUT)), jnp.float32)
    teacher = jnp.asarray(np_rng.normal(size=(2 * B, OUT)), jnp.float32)
    center = jnp.zeros((OUT,))

    g = jax.grad(lambda t: losses.dino_loss(student, t, center, 0.05,
                                            ncrops=NCROPS)[0])(teacher)
    np.testing.assert_array_equal(np.asarray(g), 0.0)

    gs = jax.grad(lambda s: losses.dino_loss(s, teacher, center, 0.05,
                                             ncrops=NCROPS)[0])(student)
    assert np.abs(np.asarray(gs)).max() > 0


def test_center_update_is_global_mean_under_sharding(np_rng):
    """With the batch sharded over 8 CPU devices, the center EMA must equal
    the single-device result (reference does an explicit all_reduce)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    teacher = jnp.asarray(np_rng.normal(size=(2 * 8, OUT)), jnp.float32)
    student = jnp.asarray(np_rng.normal(size=(NCROPS * 8, OUT)), jnp.float32)
    center = jnp.zeros((OUT,))

    _, ref_center = losses.dino_loss(student, teacher, center, 0.05, ncrops=NCROPS)

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sharded = jax.device_put(teacher, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda s, t: losses.dino_loss(s, t, center, 0.05, ncrops=NCROPS))
    _, got = fn(student, sharded)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_center), rtol=1e-5)
