"""Test-only loader for the reference implementation at /root/reference.

The reference imports ``timm.models.layers.{DropPath, to_2tuple,
trunc_normal_}``; timm isn't installed, so a minimal shim provides those
three symbols (standard definitions, written here) before importing the
reference modules. Used exclusively by parity tests — the framework itself
never touches /root/reference.
"""

from __future__ import annotations

import itertools
import math
import sys
import types

import torch
import torch.nn as nn

REFERENCE_ROOT = "/root/reference"


def _install_timm_shim():
    if "timm" in sys.modules:
        return

    def to_2tuple(x):
        return tuple(x) if isinstance(x, (tuple, list)) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            return tensor.normal_(mean, std).clamp_(a, b)

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
            return x.div(keep) * mask

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    # vision_longformer also pulls timm.models.registry / .helpers in some
    # paths; provide harmless stubs.
    registry = types.ModuleType("timm.models.registry")
    registry.register_model = lambda fn=None, **kw: fn if fn else (lambda f: f)
    models.layers = layers
    models.registry = registry
    timm.models = models
    sys.modules.update({
        "timm": timm,
        "timm.models": models,
        "timm.models.layers": layers,
        "timm.models.registry": registry,
    })


def _install_torch_six_shim():
    """The reference's cvt_v4_transformer imports torch._six (removed in
    modern torch); provide the collections.abc aliases it expects."""
    if "torch._six" in sys.modules:
        return
    import collections.abc

    six = types.ModuleType("torch._six")
    six.container_abcs = collections.abc
    six.string_classes = (str,)
    six.int_classes = (int,)
    sys.modules["torch._six"] = six


def load_reference_module(name: str):
    """Import e.g. 'models.swin_transformer' from the reference tree."""
    _install_timm_shim()
    _install_torch_six_shim()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    return importlib.import_module(name)
