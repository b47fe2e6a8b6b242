"""Fused-block interior probe: one process, three backbone measurements.

1. default knobs (fused_g_step=32) — the production configuration;
2. fused_g_step=16 — the round-3 sweep's marginal winner, re-measured;
3. ESVIT_FB_SKIP_ATTN diagnostic (wrong numerics, timing only): replaces
   the chunked packed attention with the raw V projection, so the delta
   vs (1) isolates the packed-attention interior (scores + softmax +
   P@V + their backward) from the LN/GEMM skeleton of the megakernel.

The split decides where the remaining fused-kernel headroom lives
(NEXT.md item 3): if (1)-(3) is small, the interior is already cheap and
further kernel surgery is wasted; if large, saving softmax probabilities
across the backward recompute is the next move.

Usage: python scripts/perf_fused_interior.py [--batch 16] [--iters 30]
"""

from __future__ import annotations

import argparse
import dataclasses
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
    print(f"{label:44s} {dt:8.2f} ms/it", flush=True)
    return dt


def probe(cfg, x, iters, tag):
    from esvit_tpu.models.registry import build_backbone

    bb = build_backbone(cfg, dtype=jnp.bfloat16)
    v = jax.jit(lambda r: bb.init({"params": r}, x, deterministic=True))(
        jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, x: bb.apply(v, x, deterministic=True)[0]
                  .astype(jnp.float32).sum())
    f = bench(fwd, (v, x), iters, f"fwd     {tag}")
    grad = jax.jit(jax.grad(
        lambda v, x: bb.apply(v, x, deterministic=True)[0]
        .astype(jnp.float32).sum(), argnums=0))
    b = bench(grad, (v, x), iters, f"fwd+bwd {tag}")
    return f, b


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--res", type=int, default=224)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    from esvit_tpu import config
    from esvit_tpu.ops import fused_block

    x = jax.random.normal(jax.random.PRNGKey(0),
                          (args.batch, args.res, args.res, 3), jnp.bfloat16)

    base = config.swin_tiny()
    r = {}
    r["g32"] = probe(base, x, args.iters, "G_step=32 (default)")
    r["g16"] = probe(dataclasses.replace(base, fused_g_step=16), x,
                     args.iters, "G_step=16")
    fused_block._SKIP_ATTN = True
    try:
        r["skip"] = probe(base, x, args.iters, "G_step=32 SKIP_ATTN (diag)")
    finally:
        fused_block._SKIP_ATTN = False

    print("\nattention interior (fwd)     = "
          f"{r['g32'][0] - r['skip'][0]:6.2f} ms")
    print("attention interior (fwd+bwd) = "
          f"{r['g32'][1] - r['skip'][1]:6.2f} ms")


if __name__ == "__main__":
    main()
