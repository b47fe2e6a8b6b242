"""Weight-decay param grouping vs the reference's get_params_groups
(utils.py:672-683) — in particular the DINO-head weight-norm gain, which
torch decays iff it is trainable (norm_last_layer=False)."""

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
