"""Stage-routing regression tests (VERDICT r4 item 8).

SwinStage.__call__ has 3-way routing — fused megakernel / subwindow
(virtual-pad-column, augmented-fused or XLA) / window-major XLA — chosen
per input shape. The BENCHED production configurations depend on which
route each (config, crop branch, stage) lands on; a future edit to the
predicates (_subwindow_ok / _fused_ok / _subwindow_fused_ok or the
layout picker) must not silently reroute them. These tests pin the
routing table for every benched preset at both crop resolutions.

The kernel-availability gate (`jax.default_backend() == "tpu"`) is
satisfied here via fused_block_interpret=True, which is exactly the
production condition on a TPU backend — the predicates below it are
backend-independent shape/VMEM logic.
"""

import jax.numpy as jnp
import pytest

from esvit_tpu import config
from esvit_tpu.models.registry import build_backbone


def stage_routes(cfg, img_size):
    """The route each stage takes for an input of `img_size`, in order."""
    model = build_backbone(cfg)
    bound = model.bind({"params": {}})  # predicates read shapes/attrs only
    out = []
    H = W = img_size // cfg.patch_size
    C = cfg.embed_dim
    B = 4
    for stage in bound.stages:
        x = jnp.zeros((B, H * W, C), jnp.bfloat16)
        if stage._subwindow_ok(x):
            if stage.subwindow_fused and stage._subwindow_fused_ok(x):
                out.append("subwindow_fused")
            else:
                out.append("subwindow_xla")
        elif stage.fused_block and stage._fused_ok(x):
            out.append("fused")
        else:
            out.append("window_major")
        H, W, C = H // 2, W // 2, C * 2
    return out


# (preset factory kwargs, crop px) -> expected route per stage. These are
# the routings the round-4/5 PERF.md numbers were measured on.
CASES = [
    ("swin_tiny", dict(), 224,
     ["fused", "fused", "fused", "window_major"]),
    ("swin_tiny", dict(), 96,
     ["fused", "fused", "subwindow_fused", "subwindow_xla"]),
    ("swin_tiny", dict(window_size=14), 224,
     ["fused", "fused", "fused", "window_major"]),
    ("swin_tiny", dict(window_size=14), 96,
     ["fused", "subwindow_fused", "subwindow_fused", "subwindow_xla"]),
    ("swin_base", dict(window_size=14), 224,
     ["fused", "fused", "fused", "window_major"]),
    ("swin_base", dict(window_size=14), 96,
     ["fused", "subwindow_fused", "subwindow_fused", "subwindow_xla"]),
]


@pytest.mark.parametrize("preset,kw,img,expected", CASES)
def test_production_stage_routing(preset, kw, img, expected):
    cfg = getattr(config, preset)(fused_block_interpret=True, **kw)
    assert stage_routes(cfg, img) == expected


def test_subwindow_ratio_knob_reroutes():
    """subwindow_ratio > the stage's pad ratio hands single-padded-window
    shapes back to the fused megakernel (the A/B knob, recorded in
    SwinConfig per ADVICE r4) — here stage 2 @96 (ratio 49/36 ~= 1.36)."""
    cfg = config.swin_tiny(fused_block_interpret=True, subwindow_ratio=2.0)
    assert stage_routes(cfg, 96)[2] == "fused"
    cfg = config.swin_tiny(fused_block_interpret=True, subwindow_ratio=1.0)
    assert stage_routes(cfg, 96)[2] == "subwindow_fused"
