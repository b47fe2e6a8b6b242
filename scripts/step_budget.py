"""Per-component speed-of-light budget of the train step (XLA cost model).

Compiles each step component separately on the all-XLA path (Pallas-free,
so every op is visible to the cost model) and prints FLOPs, HBM bytes, and
roofline times at the measured v5e rates (151.7 TFLOP/s dense bf16, ~820
GB/s HBM — PERF.md round 1). Runs entirely on CPU: only .lower().compile()
is needed, no execution, so it works while the TPU tunnel is down and its
numbers are layout-approximate but backend-independent at the FLOP level.

Usage: python scripts/step_budget.py [--batch 32]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

PEAK_TFLOPS = 151.7          # measured dense bf16 GEMM rate (PERF.md)


def _cost(fn, *args):
    compiled = jax.jit(fn).lower(*args).compile()
    c = compiled.cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return float(c.get("flops", 0.0)), float(c.get("bytes accessed", 0.0))


def _row(name, flops, bytes_):
    # NOTE: "bytes accessed" from the cost model is OP-LEVEL (every HLO's
    # inputs+outputs, pre-fusion, CPU layouts) — NOT fused HBM traffic, so
    # no mem roofline is derived from it; flop-SOL is the honest bound.
    tf = flops / PEAK_TFLOPS / 1e12 * 1e3           # ms
    print(f"{name:34s} {flops/1e12:7.3f} TF  flop-SOL {tf:6.2f} ms  "
          f"(op-level bytes {bytes_/1e9:7.1f} GB)", flush=True)
    return tf


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()
    jax.config.update("jax_platforms", "cpu")

    from esvit_tpu import config
    from esvit_tpu.models.heads import DINOHead
    from esvit_tpu.models.registry import build_backbone
    from esvit_tpu.train.step import EsViTTrainer

    B = args.batch
    dt = jnp.bfloat16
    model = dataclasses.replace(config.swin_tiny(), attention_impl="xla",
                                fused_block_stages=(), layout_opt=False)
    cfg = config.TrainConfig(
        model=model, head=config.HeadConfig(),
        loss=config.LossConfig(use_dense_prediction=True),
        optim=config.OptimConfig(batch_size_per_device=B),
        steps_per_epoch=1251, dtype=dt)
    trainer = EsViTTrainer(cfg, total_batch_size=B)
    rng = jax.random.PRNGKey(0)
    batch = (jnp.zeros((2 * B, 224, 224, 3), jnp.float32),
             jnp.zeros((8 * B, 96, 96, 3), jnp.float32))
    state_s = jax.eval_shape(trainer.init_state, rng, batch)

    bb = build_backbone(model, dtype=dt)
    x224 = jax.ShapeDtypeStruct((2 * B, 224, 224, 3), dt)
    x96 = jax.ShapeDtypeStruct((8 * B, 96, 96, 3), dt)
    params_s = jax.eval_shape(
        lambda r: bb.init({"params": r},
                          jnp.zeros((1, 224, 224, 3), dt),
                          deterministic=True),
        rng)["params"]

    def bb_fwd(p, x):
        cls, reg = bb.apply({"params": p}, x, deterministic=True)
        return cls.sum() + reg.sum()

    def bb_fwdbwd(p, x):
        return jax.grad(bb_fwd)(p, x)

    total = 0.0
    total += _row("teacher fwd 2x224",
                  *_cost(bb_fwd, params_s, x224))
    total += _row("student fwd+bwd 2x224",
                  *_cost(bb_fwdbwd, params_s, x224))
    total += _row("student fwd+bwd 8x96",
                  *_cost(bb_fwdbwd, params_s, x96))

    # Heads + loss: rows = cls (10B student + 2B teacher) and dense regions.
    head = DINOHead(cfg.head, dtype=dt)
    hp_s = jax.eval_shape(
        lambda r: head.init({"params": r}, jnp.zeros((1, 768), dt)), rng)

    n_reg_s = 2 * B * 49 + 8 * B * 9
    n_reg_t = 2 * B * 49

    def heads_fwdbwd(hp, cls_s, reg_s, cls_t, reg_t):
        def f(hp):
            a = head.apply(hp, cls_s).sum() + head.apply(hp, reg_s).sum()
            b = head.apply(hp, cls_t).sum() + head.apply(hp, reg_t).sum()
            return a + b                     # teacher rows fwd-only is ~25%
        return jax.grad(f)(hp)

    total += _row("DINO heads fwd+bwd (all rows)", *_cost(
        heads_fwdbwd, hp_s,
        jax.ShapeDtypeStruct((10 * B, 768), dt),
        jax.ShapeDtypeStruct((n_reg_s, 768), dt),
        jax.ShapeDtypeStruct((2 * B, 768), dt),
        jax.ShapeDtypeStruct((n_reg_t, 768), dt)))

    from esvit_tpu import losses

    K = cfg.head.out_dim
    cen = losses.DinoCenters.zeros(K)

    def loss_fwdbwd(s_cls, s_reg, s_fea, t_cls, t_reg, t_fea):
        def f(s_cls, s_reg, s_fea):
            out, _ = losses.ddino_loss(
                (s_cls, s_reg, s_fea, (49, 9)),
                (t_cls, t_reg, t_fea, (49,)), cen,
                jnp.float32(0.04), ncrops=10, batch_size=B)
            return out
        return jax.grad(f, (0, 1, 2))(s_cls, s_reg, s_fea)

    try:
        total += _row("DDINO loss fwd+bwd", *_cost(
            loss_fwdbwd,
            jax.ShapeDtypeStruct((10 * B, K), dt),
            jax.ShapeDtypeStruct((B, n_reg_s // B, K), dt),
            jax.ShapeDtypeStruct((B, n_reg_s // B, 256), dt),
            jax.ShapeDtypeStruct((2 * B, K), dt),
            jax.ShapeDtypeStruct((B, n_reg_t // B, K), dt),
            jax.ShapeDtypeStruct((B, n_reg_t // B, 256), dt)))
    except Exception as e:  # noqa: BLE001 — signature drift: fall back
        print(f"loss component skipped ({type(e).__name__}: {str(e)[:120]})")

    print("-" * 100)
    flops, bytes_ = _cost(trainer.train_step, state_s, batch,
                          jax.random.PRNGKey(1))
    whole = _row("WHOLE STEP (all-XLA)", flops, bytes_)
    print(f"sum of components (flop-SOL): {total:.2f} ms; "
          f"whole-step flop-SOL: {whole:.2f} ms; "
          f"whole-step MFU@147.8ms: "
          f"{flops / 147.8e-3 / PEAK_TFLOPS / 1e12 * 100:.1f}%")


if __name__ == "__main__":
    main()
