"""ViL sliding-chunk perf probe (VERDICT r3 item 3).

Attributes ViL-T step time between the sliding-chunk sparse stages
(Long2DSCAttention, stages 1-2: the stacked-neighborhood einsum that
materializes 9 rolled K/V copies, ops/slidingchunk.py) and the dense
full-attention stages (stage 3: 9 blocks @ 197 tokens d192 — plain MXU
matmuls). Decides whether the blocked 3x3-neighborhood Pallas kernel
(SURVEY §2.3's #1 candidate, ref layers/slidingchunk_2d.py:24-127) is
worth building or the XLA einsum path is already off the critical path.

Measurements (real chip, bf16):
1. full ViL-T backbone fwd / fwd+bwd on both crop branches (224 / 96);
2. the same with mode=-1 (self-chunk only) — the delta isolates the
   8-neighbor part of the sliding-chunk einsums;
3. isolated Long2DSCAttention at stage-1/2 shapes, mode 0 vs mode 2;
4. the raw slidingchunk qk+softmax+av chain at stage-1 shapes.

Usage: python scripts/perf_vil.py [--batch 16] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def bench(fn, args, iters, label):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())          # sync (axon tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:52s} {dt:8.2f} ms/it", flush=True)
    return dt


def backbone_probe(x, iters, tag, mode):
    from esvit_tpu import config
    from esvit_tpu.models.registry import build_backbone

    bb = build_backbone(config.vil_tiny(), dtype=jnp.bfloat16)
    v = jax.jit(lambda r: bb.init({"params": r}, x, deterministic=True))(
        jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, x: bb.apply(v, x, deterministic=True, mode=mode)[0]
                  .astype(jnp.float32).sum())
    f = bench(fwd, (v, x), iters, f"fwd     {tag} mode={mode}")
    grad = jax.jit(jax.grad(
        lambda v, x: bb.apply(v, x, deterministic=True, mode=mode)[0]
        .astype(jnp.float32).sum(), argnums=0))
    b = bench(grad, (v, x), iters, f"fwd+bwd {tag} mode={mode}")
    return f, b


def attn_probe(B, n, dim, heads, iters, mode):
    from esvit_tpu.models.vil_layers import Long2DSCAttention

    attn = Long2DSCAttention(dim, heads, window=7, nglo=1, rpe=False,
                             dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 1 + n * n, dim),
                          jnp.bfloat16)
    v = attn.init(jax.random.PRNGKey(1), x, n, n)
    grad = jax.jit(jax.grad(
        lambda v, x: attn.apply(v, x, n, n, mode=mode)
        .astype(jnp.float32).sum(), argnums=0))
    return bench(grad, (v, x), iters,
                 f"Long2DSC fwd+bwd B={B} {n}x{n} d{dim} h{heads} mode={mode}")


def rawchunk_probe(BH, mx, dim, iters):
    from esvit_tpu.ops import slidingchunk as sc

    W2 = 49

    def chain(q, k, v):
        a = sc.slidingchunk_qk(q, k, 0)
        a = sc.apply_invalid_mask(a, mx, mx, 0, 0, 7, 0, 0)
        p = jax.nn.softmax(a, axis=-1).astype(v.dtype)
        return sc.slidingchunk_av(p, v, 0).astype(jnp.float32).sum()

    shape = (BH, dim, mx, mx, W2)
    q, k, v = (jax.random.normal(jax.random.PRNGKey(i), shape, jnp.bfloat16)
               for i in range(3))
    grad = jax.jit(jax.grad(chain, argnums=(0, 1, 2)))
    return bench(grad, (q, k, v), iters,
                 f"raw qk+softmax+av fwd+bwd BH={BH} {mx}x{mx}chunks d{dim}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()
    it = args.iters

    xg = jax.random.normal(jax.random.PRNGKey(0),
                           (args.batch, 224, 224, 3), jnp.bfloat16)
    xl = jax.random.normal(jax.random.PRNGKey(0),
                           (args.batch * 4, 96, 96, 3), jnp.bfloat16)

    r224 = {m: backbone_probe(xg, it, "ViL-T 224", m) for m in (0, -1)}
    r96 = {m: backbone_probe(xl, it, "ViL-T 4x96", m) for m in (0, -1)}
    print(f"\n8-neighbor share, 224 fwd+bwd: "
          f"{r224[0][1] - r224[-1][1]:6.2f} ms of {r224[0][1]:6.2f}")
    print(f"8-neighbor share, 96  fwd+bwd: "
          f"{r96[0][1] - r96[-1][1]:6.2f} ms of {r96[0][1]:6.2f}\n")

    # stage-1: 56x56 grid d48 h1; stage-2: 28x28 d96 h3 (224px branch)
    for n, d, h in ((56, 48, 1), (28, 96, 3)):
        for mode in (0, 2):
            attn_probe(args.batch, n, d, h, it, mode)
    rawchunk_probe(args.batch * 1, 8, 48, it)     # stage-1 BH=B*h1
    rawchunk_probe(args.batch * 3, 4, 32, it)     # stage-2 BH=B*h3, M=32


if __name__ == "__main__":
    main()
