"""Backbone registry (ref: models/registry.py + models/build.py).

The reference keys entrypoints by defining-module name via YAML
``MODEL.NAME``; here the key is the config dataclass's ``name`` field.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

_REGISTRY: dict[str, Callable] = {}


def register_backbone(name: str):
    def deco(fn: Callable):
        _REGISTRY[name] = fn
        return fn
    return deco


def build_backbone(cfg: Any, dtype=jnp.float32):
    """Build a backbone flax Module from its config dataclass."""
    name = getattr(cfg, "name", None)
    if name not in _REGISTRY:
        # Import model modules lazily so registration happens on demand.
        import importlib

        for mod in ("swin", "vit", "cvt", "vil", "resnet"):
            try:
                importlib.import_module(f"esvit_tpu.models.{mod}")
            except ImportError:
                pass
    if name not in _REGISTRY:
        raise ValueError(f"no backbone registered for {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](cfg, dtype=dtype)
