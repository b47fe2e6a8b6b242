"""Backbone micro-benchmark on the attached TPU: fwd and fwd+bwd timings.

Usage: python scripts/perf_probe.py [--batch 16] [--res 224] [--layout_opt]
Timings bracket with a host scalar fetch (the only reliable sync on the
axon tunnel); report per-iteration wall over --iters steps.
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


def bench(fn, args, iters=20, label=""):
    out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())          # sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jax.tree.leaves(out)[0].sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:40s} {dt:8.2f} ms/it")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--res", type=int, default=224)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--layout_opt", action="store_true")
    p.add_argument("--remat", default="none",
                   choices=["none", "block", "stage"])
    p.add_argument("--score_dtype", default="float32")
    p.add_argument("--fused_stages", default=None,
                   help="comma-separated stage indices for the block-fused "
                        "kernel (e.g. '0,1,2,3'); default = config default")
    args = p.parse_args()

    from esvit_tpu import config
    from esvit_tpu.models.registry import build_backbone

    overrides = dict(layout_opt=args.layout_opt, remat=args.remat,
                     score_dtype=args.score_dtype)
    if args.fused_stages is not None:
        overrides["fused_block_stages"] = tuple(
            int(s) for s in args.fused_stages.split(",") if s != "")
    cfg = dataclasses.replace(config.swin_tiny(), **overrides)
    bb = build_backbone(cfg, dtype=jnp.bfloat16)
    B = args.batch
    x = jax.random.normal(jax.random.PRNGKey(0), (B, args.res, args.res, 3),
                          jnp.bfloat16)
    v = jax.jit(lambda r: bb.init({"params": r}, x, deterministic=True))(
        jax.random.PRNGKey(0))

    fwd = jax.jit(lambda v, x: bb.apply(v, x, deterministic=True)[0].sum())
    tag = (f"B{B} r{args.res} layout={int(args.layout_opt)} "
           f"remat={args.remat} sd={args.score_dtype}")
    bench(fwd, (v, x), args.iters, f"fwd {tag}")

    grad = jax.jit(jax.grad(
        lambda v, x: bb.apply(v, x, deterministic=True)[0]
        .astype(jnp.float32).sum(), argnums=0))
    bench(grad, (v, x), args.iters, f"fwd+bwd {tag}")


if __name__ == "__main__":
    main()
