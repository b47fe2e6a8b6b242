"""Full-scale golden parity: swin_tiny at 224 / window 7 — the exact
configuration the released checkpoints and the benchmark use (reference
factory models/swin_transformer.py:946-980) — plus the W=7 -> W=14
relative-position-table adaptation vs the reference's own init_weights
bicubic interpolation (swin_transformer.py:852-917).

Round-1 parity ran only femto shapes (32px / window 4); this exercises the
13x13 rel-pos tables, the stage-4 window shrink at real resolution, and the
224-grid shift masks. VERDICT r1 item 3."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from esvit_tpu import config
from esvit_tpu.io import torch_import
from esvit_tpu.models.swin import SwinTransformer

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir("/root/reference"),
                       reason="reference tree not mounted"),
]

from tests import ref_compat  # noqa: E402


def build_ref_swin_tiny(window_size=7, img_size=224):
    ref_swin = ref_compat.load_reference_module("models.swin_transformer")
    torch.manual_seed(0)
    m = ref_swin.SwinTransformer(
        img_size=img_size, patch_size=4, num_classes=0, embed_dim=96,
        depths=[2, 2, 6, 2], num_heads=[3, 6, 12, 24],
        window_size=window_size, drop_path_rate=0.0,
        norm_layer=lambda d: torch.nn.LayerNorm(d, eps=1e-6),
        use_dense_prediction=True)
    m.eval()
    return m


@pytest.fixture(scope="module")
def pair_fullscale():
    ref = build_ref_swin_tiny()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    cfg = config.swin_tiny()
    assert cfg.window_size == 7 and cfg.img_size == 224
    ours = SwinTransformer(cfg, dtype=jnp.float32)
    imported = torch_import.import_swin_backbone(sd)["params"]
    x0 = jnp.zeros((1, 224, 224, 3))
    init_params = jax.eval_shape(
        lambda r: ours.init({"params": r}, x0, deterministic=True),
        jax.random.PRNGKey(0))["params"]
    problems = torch_import.verify_tree_matches(
        imported, jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                               init_params))
    assert not problems, "\n".join(problems)
    return ref, ours, {"params": jax.tree.map(jnp.asarray, imported)}


def test_swin_tiny_224_forward_parity(pair_fullscale, np_rng):
    ref, ours, variables = pair_fullscale
    x = np_rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_region = ref.forward_features(torch.tensor(x))
    fwd = jax.jit(lambda v, a: ours.apply(v, a, deterministic=True))
    j_cls, j_region = fwd(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_region), t_region.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_swin_tiny_96_local_crop_parity(pair_fullscale, np_rng):
    """The 96px local-crop resolution: 24x24 grid padded to window multiples
    at every stage — the other compiled program the recipe uses."""
    ref, ours, variables = pair_fullscale
    x = np_rng.normal(size=(1, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        t_cls, t_region = ref.forward_features(torch.tensor(x))
    fwd = jax.jit(lambda v, a: ours.apply(v, a, deterministic=True))
    j_cls, j_region = fwd(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_cls), t_cls.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_region), t_region.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_swin_tiny_224_n_last_blocks_parity(pair_fullscale, np_rng):
    """The linear-probe feature path at full scale (n=4 over depths 2262)."""
    ref, ours, variables = pair_fullscale
    x = np_rng.normal(size=(1, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        t_out = ref.forward_return_n_last_blocks(
            torch.tensor(x), n=4, depth=[2, 2, 6, 2])
    fwd = jax.jit(lambda v, a: ours.apply(
        v, a, 4, method=ours.forward_return_n_last_blocks))
    j_out = fwd(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(j_out), t_out.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_table_adaptation_w7_to_w14_matches_reference(tmp_path):
    """W=7 checkpoint loaded into a W=14 model: our adapt_swin_tables must
    reproduce the reference init_weights' bicubic table resize bit-for-bit
    (up to fp32 tolerance) on every stage's table."""
    ref7 = build_ref_swin_tiny(window_size=7)
    ckpt = tmp_path / "w7.pth"
    # Drop the rel-pos index / attn-mask buffers: their shapes are
    # window-derived and load_state_dict raises on the mismatch even with
    # strict=False (reference init_weights' need_init filter is an `or`
    # chain that can't exclude them) — published cross-window loads ship
    # parameter-only checkpoints.
    sd_file = {k: v for k, v in ref7.state_dict().items()
               if "relative_position_index" not in k and "attn_mask" not in k}
    torch.save(sd_file, str(ckpt))

    ref14 = build_ref_swin_tiny(window_size=14)
    ref14.init_weights(str(ckpt), pretrained_layers=["*"], verbose=False)
    ref_sd = {k: v.detach().numpy() for k, v in ref14.state_dict().items()}

    sd7 = {k: v.detach().numpy() for k, v in ref7.state_dict().items()}
    imported = torch_import.import_swin_backbone(sd7)["params"]
    import dataclasses

    cfg14 = dataclasses.replace(config.swin_tiny(), window_size=14)
    ours14 = SwinTransformer(cfg14, dtype=jnp.float32)
    x0 = jnp.zeros((1, 224, 224, 3))
    target = jax.eval_shape(
        lambda r: ours14.init({"params": r}, x0, deterministic=True),
        jax.random.PRNGKey(0))["params"]
    adapted = torch_import.adapt_swin_tables(
        imported, jax.tree.map(lambda s: np.zeros(s.shape, np.float32),
                               target))

    checked = 0
    for tk, tv in ref_sd.items():
        if "relative_position_bias_table" not in tk:
            continue
        # tk like layers.0.blocks.1.attn.relative_position_bias_table
        parts = tk.split(".")
        ours_val = adapted[f"layers_{parts[1]}"][f"blocks_{parts[3]}"][
            "attn"]["relative_position_bias_table"]
        # stage 4 at 224 has resolution 7 -> its effective window stays 7
        # and the reference skips tables whose shapes already match.
        np.testing.assert_allclose(np.asarray(ours_val), tv,
                                   rtol=1e-4, atol=1e-5, err_msg=tk)
        checked += 1
    assert checked == 12
