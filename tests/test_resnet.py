"""ResNet backbone: shapes, BN state, LARS path, EsViT integration."""

import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu import config
from esvit_tpu.config import OptimConfig, ResNetConfig
from esvit_tpu.models.registry import build_backbone
from esvit_tpu.train import optim as optim_lib


def test_resnet50_param_count(rng):
    m = build_backbone(ResNetConfig(depth=50))
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(lambda r: m.init({"params": r}, x, deterministic=True))(rng)
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    # torchvision resnet50 minus the fc layer: 23,508,032
    assert n == 23508032


def test_resnet_region_tokens(rng, np_rng):
    m = build_backbone(ResNetConfig(depth=50))
    x = jnp.asarray(np_rng.normal(size=(2, 64, 64, 3)), jnp.float32)
    v = jax.jit(lambda r: m.init({"params": r}, x, deterministic=True))(rng)
    (cls, reg), upd = m.apply(v, x, deterministic=False, bn_train=True,
                              mutable=["batch_stats"])
    assert cls.shape == (2, 2048)
    assert reg.shape == (2, 4, 2048)        # 64/32 = 2x2 grid
    assert "batch_stats" in upd
    # eval mode uses running stats, no mutation needed
    cls2, _ = m.apply(v, x, deterministic=True, bn_train=False)
    assert np.all(np.isfinite(np.asarray(cls2)))


def test_lars_optimizer_builds_and_steps(rng):
    params = {"w": jnp.ones((4, 4)), "bias": jnp.ones((4,))}
    opt = optim_lib.make_optimizer(OptimConfig(optimizer="lars"),
                                   params, lambda s: 0.1, lambda s: 1e-4)
    st = opt.init(params)
    g = jax.tree.map(jnp.ones_like, params)
    u, st = opt.update(g, st, params)
    new = jax.tree.map(lambda p, d: p + d, params, u)
    assert np.abs(np.asarray(new["w"]) - 1.0).max() > 0
