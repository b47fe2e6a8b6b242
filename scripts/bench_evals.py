"""Benchmark the evaluation paths on the real chip (VERDICT r4 item 7).

Three rows, mirroring what the reference runs at ImageNet scale:

1. k-NN feature extraction (ref eval_knn.py:148-189): jitted Swin-T
   teacher forward at 224px center-crop shapes, B=64 — images/sec/chip of
   the device leg (the host decode leg is measured separately in
   scripts/bench_host_datapath.py: ~7.8 ms/sample/core, so ~28 host cores
   feed well past this device rate).
2. k-NN weighted vote (ref eval_knn.py:192-232): chunked similarity
   matmul + top-k + vote, 50k test x 1.28M train x C=768, k=20 — the
   full ImageNet-val protocol's classify leg.
3. Linear-probe training step (ref eval_linear.py:244-262): SGD step on
   (B=256, dim=2304) cached features — steps/sec and the implied
   epoch time over 1.28M images.

Run: python scripts/bench_evals.py [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench_extraction(iters: int = 20, B: int = 64):
    from esvit_tpu import config
    from esvit_tpu.models.registry import build_backbone

    cfg = config.swin_tiny()
    backbone = build_backbone(cfg)
    x0 = jnp.zeros((B, 224, 224, 3), jnp.bfloat16)
    variables = jax.jit(
        lambda r: backbone.init({"params": r}, x0, deterministic=True)
    )(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, x: backbone.apply(v, x, deterministic=True)[0])
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 224, 224, 3),
                          jnp.bfloat16)
    f = fwd(variables, x)
    _ = float(f[0, 0])                        # sync (axon tunnel)
    t0 = time.perf_counter()
    for _ in range(iters):
        f = fwd(variables, x)
    _ = float(f[0, 0])
    dt = time.perf_counter() - t0
    ips = B * iters / dt
    print(f"knn extraction (Swin-T teacher fwd, B={B}, 224px): "
          f"{ips:.0f} img/s/chip ({dt / iters * 1e3:.2f} ms/batch)",
          flush=True)
    return ips


def bench_knn_vote(n_train: int = 1_281_167, n_test: int = 50_000,
                   C: int = 768, k: int = 20, chunk: int = 2048,
                   quick: bool = False):
    from esvit_tpu.evals.knn import _knn_chunk

    if quick:
        n_train, n_test = n_train // 10, n_test // 10
    # Features live on device once (the rank-0 matrix of eval_knn.py:184).
    rng = np.random.default_rng(0)
    train_f = jnp.asarray(rng.standard_normal((n_train, C), np.float32))
    train_f /= jnp.linalg.norm(train_f, axis=1, keepdims=True)
    train_l = jnp.asarray(rng.integers(0, 1000, n_train, np.int32))
    test_f = np.asarray(rng.standard_normal((chunk, C), np.float32))
    test_f /= np.linalg.norm(test_f, axis=1, keepdims=True)
    test_j = jnp.asarray(test_f)
    r = _knn_chunk(train_f, train_l, test_j, k=k, num_classes=1000, T=0.07)
    _ = int(r[0, 0])
    n_chunks = max(n_test // chunk, 1)
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        r = _knn_chunk(train_f, train_l, test_j, k=k, num_classes=1000,
                       T=0.07)
    _ = int(r[0, 0])
    dt = time.perf_counter() - t0
    total = n_chunks * chunk
    print(f"knn vote ({n_train} train x C={C}, k={k}): "
          f"{total / dt:.0f} test img/s ({dt:.1f}s for {total}; "
          f"full 50k val in {50_000 / (total / dt):.1f}s)", flush=True)
    return total / dt


def bench_probe(dim: int = 2304, num_classes: int = 1000, B: int = 256,
                iters: int = 2000):
    """One probe step is a (B,dim)@(dim,K) GEMM — microseconds on-device,
    so per-call dispatch through the axon tunnel would swamp it; scan the
    loop device-side and time ONE dispatch of `iters` steps."""
    from esvit_tpu.evals.linear import make_probe

    params, opt_state, step = make_probe(dim, num_classes, scaled_lr=1e-3,
                                         total_steps=100_000)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((B, dim),
                                                             np.float32))
    y = jnp.asarray(np.random.default_rng(1).integers(0, num_classes, B,
                                                      np.int32))

    @jax.jit
    def run(params, opt_state):
        def body(carry, _):
            p, o = carry
            p, o, loss = step(p, o, x, y)
            return (p, o), loss
        (p, o), losses = jax.lax.scan(body, (params, opt_state), None,
                                      length=iters)
        return p, o, losses[-1]

    _, _, loss = run(params, opt_state)
    _ = float(loss)                                # compile + sync
    t0 = time.perf_counter()
    _, _, loss = run(params, opt_state)
    _ = float(loss)
    dt = time.perf_counter() - t0
    sps = iters / dt
    epoch_steps = 1_281_167 // B
    print(f"linear probe step (dim={dim}, B={B}): {sps:.0f} steps/s "
          f"-> ImageNet epoch (probe updates only) in "
          f"{epoch_steps / sps:.1f}s", flush=True)
    return sps


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()
    bench_extraction(iters=5 if args.quick else 20)
    bench_knn_vote(quick=args.quick)
    bench_probe(iters=50 if args.quick else 200)
