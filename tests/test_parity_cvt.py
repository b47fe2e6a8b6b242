"""Golden parity: our CvT vs the reference cvt_v4_transformer (eval mode,
running BN stats) through the checkpoint-import path."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu import config
from esvit_tpu.io import torch_import
from esvit_tpu.models.cvt import CvT

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")

from tests import ref_compat  # noqa: E402


class _Spec(dict):
    """Attribute/getattr-style access like a YACS node for CvT's spec."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)


def build_ref_cvt():
    ref_cvt = ref_compat.load_reference_module("models.cvt_v4_transformer")
    import functools

    torch.manual_seed(0)
    spec = _Spec(
        NUM_STAGES=2, REL_POS_EMBED=False, SHIFT=[False, False],
        DROP_PATH_RATE=0.0,
        PATCH_SIZE=[3, 3], PATCH_STRIDE=[2, 2], PATCH_PADDING=[1, 1],
        WINDOW_SIZE=[4, 4], DIM_EMBED=[16, 32], NUM_HEADS=[2, 2],
        DEPTH=[1, 1], MLP_RATIO=[4.0, 4.0], QKV_BIAS=[True, True],
        KERNEL_QKV=[3, 3], PADDING_QKV=[1, 1])
    m = ref_cvt.CvT(num_classes=0, act_layer=ref_cvt.QuickGELU,
                    norm_layer=functools.partial(ref_cvt.LayerNorm, eps=1e-5),
                    init="trunc_norm", use_dense_prediction=True, spec=spec)
    # perturb BN running stats so the import path is actually exercised
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    m.eval()
    return m


def test_cvt_forward_parity(np_rng):
    ref = build_ref_cvt()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = config.cvt_femto()
    ours = CvT(cfg, dtype=jnp.float32)

    x0 = jnp.zeros((1, 32, 32, 3))
    init = ours.init({"params": jax.random.PRNGKey(0)}, x0,
                     deterministic=True)
    imported = torch_import.import_cvt_backbone(sd)
    for coll in ("params", "batch_stats"):
        problems = torch_import.verify_tree_matches(
            imported[coll], jax.tree.map(np.asarray, init[coll]))
        assert not problems, f"{coll}:\n" + "\n".join(problems)
    variables = jax.tree.map(jnp.asarray, imported)

    for size in (32, 16):
        x = np_rng.normal(size=(2, 3, size, size)).astype(np.float32)
        with torch.no_grad():
            t_cls, t_region = ref.forward_features(torch.tensor(x))
        j_cls, j_region = ours.apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
            deterministic=True, bn_train=False)
        np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(j_region), t_region.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_cvt_n_last_blocks_parity(np_rng):
    ref = build_ref_cvt()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    ours = CvT(config.cvt_femto(), dtype=jnp.float32)
    variables = jax.tree.map(jnp.asarray, torch_import.import_cvt_backbone(sd))
    x = np_rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_out = ref.forward_return_n_last_blocks(torch.tensor(x), n=2,
                                                 depth=[1, 1])
    j_out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), 2,
                       method=ours.forward_return_n_last_blocks)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_cvt_train_step_with_batchnorm(np_rng):
    """Full train step on CvT: batch_stats must update for both nets."""
    from esvit_tpu.train.step import EsViTTrainer

    cfg = config.TrainConfig(
        model=config.cvt_femto(),
        head=config.HeadConfig(out_dim=16, hidden_dim=8, bottleneck_dim=4),
        loss=config.LossConfig(out_dim=16, use_dense_prediction=True),
        optim=config.OptimConfig(epochs=2, warmup_epochs=0),
        steps_per_epoch=2, dtype=jnp.float32)
    trainer = EsViTTrainer(cfg, total_batch_size=4)
    batch = (jnp.asarray(np_rng.normal(size=(4, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(6, 16, 16, 3)), jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    assert "batch_stats" in state.student_state

    step = jax.jit(trainer.train_step)
    state1, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    def some_mean(s):
        leaves = jax.tree.leaves(s["batch_stats"])
        return np.asarray(leaves[0])

    # both nets' BN stats moved (teacher runs its own forward in bn_train)
    assert np.abs(some_mean(state1.student_state) -
                  some_mean(state.student_state)).max() > 0
    assert np.abs(some_mean(state1.teacher_state) -
                  some_mean(state.teacher_state)).max() > 0


def test_cvt_syncbn_sharded_matches_single_device(np_rng):
    """BN batch stats under a sharded batch must equal the single-device
    (global-batch) stats — the SyncBN guarantee (main_esvit.py:367-372)."""
    import numpy as np
    from esvit_tpu.parallel import mesh as mesh_lib
    from esvit_tpu.train.step import EsViTTrainer

    cfg = config.TrainConfig(
        model=config.cvt_femto(),
        head=config.HeadConfig(out_dim=16, hidden_dim=8, bottleneck_dim=4),
        loss=config.LossConfig(out_dim=16, use_dense_prediction=True),
        optim=config.OptimConfig(epochs=2, warmup_epochs=0),
        steps_per_epoch=2, dtype=jnp.float32)
    trainer = EsViTTrainer(cfg, total_batch_size=16)
    batch = (jnp.asarray(np_rng.normal(size=(16, 32, 32, 3)), jnp.float32),
             jnp.asarray(np_rng.normal(size=(24, 16, 16, 3)), jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    step = jax.jit(trainer.train_step)
    ref_state, ref_m = step(state, batch, jax.random.PRNGKey(1))

    mesh = mesh_lib.make_mesh(config.MeshConfig(data=8, model=1))
    sstate = mesh_lib.shard_train_state(state, mesh)
    sbatch = tuple(jax.device_put(b, mesh_lib.batch_sharding(mesh))
                   for b in batch)
    got_state, got_m = step(sstate, sbatch, jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(got_m["loss"]), float(ref_m["loss"]),
                               rtol=1e-5)
    # BN means updated identically (global-batch statistics, not per-shard)
    a = jax.tree.leaves(got_state.student_state["batch_stats"])[0]
    b = jax.tree.leaves(ref_state.student_state["batch_stats"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-7)
