"""Golden parity: our ViT vs the reference vision_transformer, including
cross-resolution pos-embed interpolation (local crops)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu import config
from esvit_tpu.io import torch_import
from esvit_tpu.models.vit import VisionTransformer

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")

from tests import ref_compat  # noqa: E402


@pytest.fixture(scope="module")
def pair():
    ref_vit = ref_compat.load_reference_module("models.vision_transformer")
    torch.manual_seed(0)
    ref = ref_vit.VisionTransformer(
        img_size=[32], patch_size=8, embed_dim=24, depth=2, num_heads=2,
        qkv_bias=True, drop_path_rate=0.0, use_dense_prediction=True,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6))
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = config.ViTConfig(img_size=32, patch_size=8, embed_dim=24, depth=2,
                           num_heads=2)
    ours = VisionTransformer(cfg, dtype=jnp.float32)
    x0 = jnp.zeros((1, 32, 32, 3))
    init = ours.init({"params": jax.random.PRNGKey(0)}, x0,
                     deterministic=True)["params"]
    imported = torch_import.import_vit_backbone(sd)["params"]
    problems = torch_import.verify_tree_matches(
        imported, jax.tree.map(np.asarray, init))
    assert not problems, "\n".join(problems)
    return ref, ours, {"params": jax.tree.map(jnp.asarray, imported)}


@pytest.mark.parametrize("size", [32, 16])
def test_vit_forward_parity(pair, np_rng, size):
    ref, ours, variables = pair
    x = np_rng.normal(size=(2, 3, size, size)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_region = ref.forward_features(torch.tensor(x))
    j_cls, j_region = ours.apply(variables,
                                 jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 deterministic=True)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_region), t_region.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_vit_n_last_blocks_parity(pair, np_rng):
    ref, ours, variables = pair
    x = np_rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_out = ref.forward_return_n_last_blocks(torch.tensor(x), n=2,
                                                 return_patch_avgpool=False)
    j_out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), 2,
                       method=ours.forward_return_n_last_blocks)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)
