"""FLOPs / parameter accounting.

The reference carries hand-written per-module flops methods
(models/swin_transformer.py:157-175, 339-351, 505-511, 841-850; cvt
:222-239; vil :154-188). TPU-native equivalent: ask XLA's cost model for
the compiled program — exact for any backbone, no per-module bookkeeping.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def param_count(params: Any) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(params))


def forward_cost(backbone, variables, input_shape: tuple[int, ...],
                 dtype=jnp.float32) -> dict:
    """XLA cost analysis of one forward pass: flops, bytes accessed.

    input_shape: e.g. (1, 224, 224, 3). Returns {'flops': float,
    'bytes_accessed': float, 'params': int} (flops are per the analyzed
    batch; divide by batch for per-image).
    """
    x = jnp.zeros(input_shape, dtype)
    fn = jax.jit(lambda v, x: backbone.apply(v, x, deterministic=True))
    lowered = fn.lower(variables, x)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):                  # older jax returns [dict]
        cost = cost[0]
    return {
        "flops": float(cost.get("flops", -1.0)),
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
        "params": param_count(variables.get("params", variables)),
    }


def summarize(backbone, variables, image_size: int = 224, dtype=jnp.float32
              ) -> str:
    c = forward_cost(backbone, variables, (1, image_size, image_size, 3), dtype)
    return (f"params: {c['params'] / 1e6:.2f}M  "
            f"fwd GFLOPs@{image_size}: {c['flops'] / 1e9:.2f}  "
            f"bytes: {c['bytes_accessed'] / 1e6:.1f}MB")
