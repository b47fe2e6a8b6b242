"""Golden parity: our Swin/head vs the actual reference implementation.

Builds the reference torch modules (random init, eval mode), imports their
state_dict into our flax params with io/torch_import, and compares outputs
on identical inputs. This validates both the model math and the checkpoint
importer — the path released .pth files will take.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu import config
from esvit_tpu.io import torch_import
from esvit_tpu.models.esvit import EsViTModel
from esvit_tpu.models.heads import DINOHead
from esvit_tpu.models.swin import SwinTransformer

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference tree not mounted")

from tests import ref_compat  # noqa: E402


def build_ref_swin(**kw):
    ref_swin = ref_compat.load_reference_module("models.swin_transformer")
    torch.manual_seed(0)
    m = ref_swin.SwinTransformer(
        img_size=32, patch_size=4, num_classes=0, embed_dim=16,
        depths=[2, 2], num_heads=[2, 2], window_size=4, drop_path_rate=0.0,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        use_dense_prediction=True, **kw)
    m.eval()
    # num_classes=0 leaves an Identity head; drop it from the state dict use.
    return m


@pytest.fixture(scope="module")
def pair():
    ref = build_ref_swin()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = config.swin_femto()   # matches the ref construction above
    ours = SwinTransformer(cfg, dtype=jnp.float32)
    x0 = jnp.zeros((1, 32, 32, 3))
    init_params = ours.init({"params": jax.random.PRNGKey(0)}, x0,
                            deterministic=True)["params"]
    imported = torch_import.import_swin_backbone(sd)["params"]
    problems = torch_import.verify_tree_matches(
        imported, jax.tree.map(np.asarray, init_params))
    assert not problems, "\n".join(problems)
    return ref, ours, {"params": jax.tree.map(jnp.asarray, imported)}


def test_forward_features_parity(pair, np_rng):
    ref, ours, variables = pair
    x = np_rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_region = ref.forward_features(torch.tensor(x))
    j_cls, j_region = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 deterministic=True)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_region), t_region.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_forward_features_parity_local_res(pair, np_rng):
    """16px local crops exercise window padding + small-grid merging."""
    ref, ours, variables = pair
    x = np_rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_region = ref.forward_features(torch.tensor(x))
    j_cls, j_region = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 deterministic=True)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_region), t_region.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_n_last_blocks_parity(pair, np_rng):
    ref, ours, variables = pair
    x = np_rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    n = 3
    with torch.no_grad():
        t_out = ref.forward_return_n_last_blocks(torch.tensor(x), n=n,
                                                 depth=[2, 2])
    j_out = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), n,
                       method=ours.forward_return_n_last_blocks)
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_dino_head_parity(np_rng):
    ref_vit = ref_compat.load_reference_module("models.vision_transformer")
    torch.manual_seed(1)
    t_head = ref_vit.DINOHead(24, 48, use_bn=False, norm_last_layer=False,
                              hidden_dim=32, bottleneck_dim=16)
    t_head.eval()
    sd = {"head." + k: v.detach().numpy() for k, v in t_head.state_dict().items()}
    imported = torch_import._import_dino_head(sd, "head")

    cfg = config.HeadConfig(out_dim=48, hidden_dim=32, bottleneck_dim=16,
                            norm_last_layer=False)
    ours = DINOHead(cfg, dtype=jnp.float32)
    x = np_rng.normal(size=(5, 24)).astype(np.float32)
    init = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    problems = torch_import.verify_tree_matches(
        imported, jax.tree.map(np.asarray, init))
    assert not problems, "\n".join(problems)

    with torch.no_grad():
        t_out = t_head(torch.tensor(x))
    j_out = ours.apply({"params": jax.tree.map(jnp.asarray, imported)},
                       jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_full_esvit_multicrop_parity(np_rng):
    """Composite model vs reference backbone+heads on the multi-crop list:
    the exact tensors DDINOLoss consumes."""
    ref = build_ref_swin()
    ref_vit = ref_compat.load_reference_module("models.vision_transformer")
    torch.manual_seed(2)
    ref.head = ref_vit.DINOHead(32, 48, use_bn=False, norm_last_layer=False,
                                hidden_dim=32, bottleneck_dim=16)
    ref.head_dense = ref_vit.DINOHead(32, 48, use_bn=False,
                                      norm_last_layer=False,
                                      hidden_dim=32, bottleneck_dim=16)
    ref.eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    cfg = config.swin_femto()
    head_cfg = config.HeadConfig(out_dim=48, hidden_dim=32, bottleneck_dim=16,
                                 norm_last_layer=False)
    ours = EsViTModel(cfg, head_cfg, use_dense_prediction=True,
                      dtype=jnp.float32)
    B = 2
    g = np_rng.normal(size=(2 * B, 3, 32, 32)).astype(np.float32)
    l = np_rng.normal(size=(3 * B, 3, 16, 16)).astype(np.float32)
    crops_j = (jnp.asarray(g.transpose(0, 2, 3, 1)),
               jnp.asarray(l.transpose(0, 2, 3, 1)))
    init = ours.init({"params": jax.random.PRNGKey(0)}, crops_j,
                     deterministic=True)["params"]
    imported = torch_import.import_esvit_model(sd, "swin")["params"]
    problems = torch_import.verify_tree_matches(
        imported, jax.tree.map(np.asarray, init))
    assert not problems, "\n".join(problems)

    with torch.no_grad():
        t_g = torch.tensor(g)
        t_l = torch.tensor(l)
        # view-major (B rows per view), matching our concatenated layout
        crops_t = list(t_g.chunk(2)) + list(t_l.chunk(3))
        t_cls, t_reg, t_fea, t_npatch = ref(crops_t)
    j_cls, j_reg, j_fea, j_npatch = ours.apply(
        {"params": jax.tree.map(jnp.asarray, imported)}, crops_j,
        deterministic=True)  # imported == variables['params']
    assert tuple(t_npatch) == tuple(int(n) for n in j_npatch)
    np.testing.assert_allclose(np.asarray(j_fea), t_fea.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_reg), t_reg.numpy(), rtol=1e-4, atol=1e-5)
