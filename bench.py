"""Benchmark: Swin-T EsViT multi-crop pre-train step throughput.

Measures the full jitted training step (teacher fwd on 2x224 globals,
student fwd+bwd on 2x224 + 8x96 crops, DDINO loss with 65536-dim heads,
AdamW, teacher EMA) on the attached TPU chip and prints ONE JSON line.

Baseline: the reference publishes no throughput numbers (SURVEY.md §6).
BASELINE.md's target is >=3x an A100's images/sec/chip on the same recipe;
the A100 number here (290 img/s, fp16 DDP, bs32, EsViT Swin-T multi-crop) is
an estimate from DINO-era training logs — flagged as estimated in the output.
vs_baseline is measured / A100_ESTIMATE (so the >=3x target reads as >=3.0).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

A100_ESTIMATE_IMG_PER_SEC = 290.0


def main():
    from esvit_tpu import config
    from esvit_tpu.train.step import EsViTTrainer
    from esvit_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    B = 32  # per-chip batch, matching the reference's 16 GPU x bs32 recipe
    cfg = config.TrainConfig(
        model=config.swin_tiny(),
        head=config.HeadConfig(),
        loss=config.LossConfig(use_dense_prediction=True),
        optim=config.OptimConfig(batch_size_per_device=B),
        steps_per_epoch=1251,
        dtype=jnp.bfloat16,
    )
    trainer = EsViTTrainer(cfg, total_batch_size=B * jax.device_count())

    rng = jax.random.PRNGKey(0)
    batch = (jax.random.normal(rng, (2 * B, 224, 224, 3), jnp.float32),
             jax.random.normal(rng, (8 * B, 96, 96, 3), jnp.float32))
    state = trainer.init_state(rng, batch)
    # NOTE: donate_argnums trips an INVALID_ARGUMENT in the axon PJRT tunnel
    # used for single-chip benching; on real multi-chip deployments the train
    # loop donates the state (halves peak HBM).
    from esvit_tpu.utils.compile_cache import cached_compile

    step = cached_compile(jax.jit(trainer.train_step), state, batch,
                          jax.random.PRNGKey(1), name="bench_train_step")

    # Warmup/compile. NOTE: on the axon tunnel backend block_until_ready
    # returns before remote execution completes; a host scalar fetch is the
    # only reliable sync, so timing brackets end with a loss fetch.
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    _ = float(metrics["loss"])

    iters = 20
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    _ = float(metrics["loss"])
    dt = time.perf_counter() - t0

    images_per_step = 10 * B  # 2 global + 8 local crops
    ips = images_per_step * iters / dt
    print(json.dumps({
        "metric": "pretrain images/sec/chip (Swin-T multi-crop, DDINO)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / A100_ESTIMATE_IMG_PER_SEC, 3),
        "note": "baseline = estimated A100 fp16 DDP throughput (290 img/s); "
                "target >= 3.0",
        "step_ms": round(dt / iters * 1000, 2),
        "loss": float(metrics["loss"]),
    }))


if __name__ == "__main__":
    main()
