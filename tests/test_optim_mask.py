"""Weight-decay param grouping vs the reference's get_params_groups
(utils.py:672-683) — in particular the DINO-head weight-norm gain, which
torch decays iff it is trainable (norm_last_layer=False)."""

import jax
import jax.numpy as jnp

from esvit_tpu.train import optim as optim_lib


def _params():
    return {
        "last_layer": {"kernel_v": jnp.ones((4, 8)), "scale_g": jnp.ones((8,))},
        "mlp_0": {"kernel": jnp.ones((4, 4)), "bias": jnp.ones((4,))},
        "norm": {"scale": jnp.ones((4,))},
    }


def test_wd_mask_scale_g_follows_trainability():
    m = optim_lib.wd_mask(_params(), decay_scale_g=True)
    assert m["last_layer"]["scale_g"] is True      # trainable weight_g: decayed
    m = optim_lib.wd_mask(_params(), decay_scale_g=False)
    assert m["last_layer"]["scale_g"] is False     # pinned weight_g: untouched


def test_wd_mask_standard_grouping():
    m = optim_lib.wd_mask(_params())
    assert m["last_layer"]["kernel_v"] is True
    assert m["mlp_0"]["kernel"] is True
    assert m["mlp_0"]["bias"] is False             # biases never decayed
    assert m["norm"]["scale"] is False             # 1-D params never decayed


def test_freeze_mask_by_prefix():
    params = {"backbone": {"patch_embed": {"proj": {"kernel": jnp.ones((2, 2))}},
                           "layers_0": {"blocks_0": {"w": jnp.ones(3)},
                                        "blocks_1": {"w": jnp.ones(3)}},
                           "layers_1": {"blocks_0": {"w": jnp.ones(3)}}},
              "head": {"mlp_0": {"kernel": jnp.ones((2, 2))}}}
    m = optim_lib.freeze_mask_by_prefix(params, ("patch_embed", "layers.0"))
    assert m["backbone"]["patch_embed"]["proj"]["kernel"] is True
    assert m["backbone"]["layers_0"]["blocks_0"]["w"] is True
    assert m["backbone"]["layers_1"]["blocks_0"]["w"] is False
    assert m["head"]["mlp_0"]["kernel"] is False
    # two-component form freezes a single block
    m2 = optim_lib.freeze_mask_by_prefix(params, ("layers_0/blocks_1",))
    assert m2["backbone"]["layers_0"]["blocks_1"]["w"] is True
    assert m2["backbone"]["layers_0"]["blocks_0"]["w"] is False
    # star freezes everything
    m3 = optim_lib.freeze_mask_by_prefix(params, ("*",))
    assert all(jax.tree.leaves(m3))


def test_frozen_layers_params_do_not_move():
    """End-to-end: a frozen subtree is bit-identical after optimizer steps
    with nonzero weight decay, while unfrozen params move (the reference's
    freeze_pretrained_layers semantics)."""
    import numpy as np
    from esvit_tpu import config
    from esvit_tpu.train.step import EsViTTrainer

    cfg = config.TrainConfig(
        model=config.swin_femto(),
        head=config.HeadConfig(out_dim=32, hidden_dim=16, bottleneck_dim=8),
        loss=config.LossConfig(out_dim=32, use_dense_prediction=False),
        optim=config.OptimConfig(epochs=2, warmup_epochs=0,
                                 freeze_last_layer_epochs=0,
                                 frozen_layers=("patch_embed",)),
        steps_per_epoch=2, dtype=jnp.float32)
    trainer = EsViTTrainer(cfg, total_batch_size=4)
    rng = jax.random.PRNGKey(0)
    batch = (jax.random.normal(rng, (4, 32, 32, 3)),
             jax.random.normal(rng, (8, 16, 16, 3)))
    state = trainer.init_state(rng, batch)
    before = jax.tree.map(np.asarray,
                          state.student["backbone"]["patch_embed"])
    step = jax.jit(trainer.train_step)
    for i in range(2):
        state, _ = step(state, batch, jax.random.PRNGKey(i + 1))
    after = jax.tree.map(np.asarray, state.student["backbone"]["patch_embed"])
    jax.tree.map(np.testing.assert_array_equal, before, after)
    moved = jax.tree.map(
        lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
        state.student["backbone"]["layers_0"],
        trainer.init_state(rng, batch).student["backbone"]["layers_0"])
    assert max(jax.tree.leaves(moved)) > 0
