"""On-chip probe: packed fused window attention vs the classic XLA path.

Times fwd and fwd+bwd at real Swin-T stage shapes (B=32 train step, both
crop branches), bf16 compute / bf16 scores.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu.ops import window as wops
from esvit_tpu.ops.packed_window_attention import packed_window_attention
from tests.test_packed_window_attention import classic

ITERS = 10


def bench(fn, args, grad):
    if grad:
        def one(q, k, v):
            loss = lambda *a: jnp.sum(fn(*a).astype(jnp.float32) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    else:
        def one(q, k, v):
            o = fn(q, k, v)
            return (o, o, o)

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            q, k, v = carry
            gq, gk, gv = one(q, k, v)
            # all outputs feed the carry so nothing is DCE'd
            q = q + 0.0 * gq.astype(q.dtype)
            k = k + 0.0 * gk.astype(k.dtype)
            v = v + 0.0 * gv.astype(v.dtype)
            return (q, k, v), ()
        (q, k, v), _ = jax.lax.scan(body, (q, k, v), None, length=ITERS)
        return jnp.sum(q.astype(jnp.float32))

    r = float(run(*args))
    t0 = time.perf_counter()
    r = float(run(*args))
    return (time.perf_counter() - t0) / ITERS * 1e3


def main():
    N, ws = 49, 7
    stages = [
        # name, nW per img at 224, imgs224, nW at 96, imgs96, C, nH, (H,W) 224-grid
        ("s1", 64, 64, 16, 256, 96, 3, (56, 56)),
        ("s2", 16, 64, 4, 256, 192, 6, (28, 28)),
        ("s3", 4, 64, 1, 256, 384, 12, (14, 14)),
        ("s4", 1, 64, 1, 256, 768, 24, (7, 7)),
    ]
    shifted = len(sys.argv) > 1 and sys.argv[1] == "shifted"
    rng = np.random.RandomState(0)
    print(f"{'stage':6} {'impl':10} {'fwd ms':>9} {'fwd+bwd ms':>11}   (shifted={shifted})")
    tot = {}
    for name, nw224, b224, nw96, b96, C, nH, (H, W) in stages:
        B_ = nw224 * b224 + nw96 * b96
        # use the 224-grid region ids tiled to B_ for the shifted case
        region = wops.window_region_ids(H, W, ws, ws // 2) if shifted else None
        mask = wops.shifted_window_mask(H, W, ws, ws // 2) if shifted else None
        if shifted:
            B_ = nw224 * (b224 + (b96 * nw96) // nw224)  # keep divisible
        q = jnp.asarray(rng.randn(B_ * N, C), jnp.bfloat16)
        k = jnp.asarray(rng.randn(B_ * N, C), jnp.bfloat16)
        v = jnp.asarray(rng.randn(B_ * N, C), jnp.bfloat16)
        bias = jnp.asarray(0.3 * rng.randn(nH, N, N), jnp.float32)
        scale = 32 ** -0.5

        packed = functools.partial(packed_window_attention, bias=bias,
                                   region=region, N=N, nH=nH, scale=scale,
                                   score_dtype=jnp.bfloat16)
        pk = lambda q, k, v: packed(q, k, v)
        cl = lambda q, k, v: classic(q, k, v, bias, mask, N, nH, scale,
                                     jnp.bfloat16)
        for iname, fn in [("classic", cl), ("packed", pk)]:
            f = bench(fn, (q, k, v), grad=False)
            g = bench(fn, (q, k, v), grad=True)
            tot.setdefault(iname, [0, 0])
            tot[iname][0] += f
            tot[iname][1] += g
            print(f"{name:6} {iname:10} {f:9.3f} {g:11.3f}", flush=True)
    for iname, (f, g) in tot.items():
        print(f"TOTAL  {iname:10} {f:9.3f} {g:11.3f}")


if __name__ == "__main__":
    main()
