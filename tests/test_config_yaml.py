"""Reference experiment YAMLs translate into the expected configs."""

import os

import pytest

from esvit_tpu import config, config_yaml

REF = "/root/reference/experiments/imagenet"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not mounted")


def test_swin_tiny_yaml():
    cfg = config_yaml.load_reference_yaml(
        f"{REF}/swin/swin_tiny_patch4_window7_224.yaml")
    assert cfg == config.swin_tiny()


def test_swin_base_w14_yaml():
    cfg = config_yaml.load_reference_yaml(
        f"{REF}/swin/swin_base_patch4_window14_224.yaml")
    assert cfg.embed_dim == 128
    assert cfg.depths == (2, 2, 18, 2)
    assert cfg.window_size == 14
    assert cfg.num_heads == (4, 8, 16, 32)


def test_cvt_yaml():
    cfg = config_yaml.load_reference_yaml(f"{REF}/cvt_v4/s1.yaml")
    assert len(cfg.stages) == 4
    assert tuple(s.embed_dim for s in cfg.stages) == (64, 192, 384, 768)
    assert tuple(s.depth for s in cfg.stages) == (2, 2, 6, 2)
    assert cfg.stages[0].patch_size == 7 and cfg.stages[0].patch_stride == 4


def test_vil_yaml():
    cfg = config_yaml.load_reference_yaml(f"{REF}/vil/vil_tiny/base.yaml")
    assert len(cfg.stages) == 4
    assert tuple(s.embed_dim for s in cfg.stages) == (48, 96, 192, 384)
    assert cfg.stages[0].is_sparse and not cfg.stages[2].is_sparse
    assert cfg.stages[3].num_global == 0
    assert cfg.attn_type == "longformer"
    assert cfg.norm_eps == 1e-6
