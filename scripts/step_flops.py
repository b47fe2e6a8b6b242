"""Derive the train-step FLOPs from XLA's cost model.

Compiles the SAME train step bench.py measures, but on the all-XLA path
(attention_impl='xla', no fused Pallas blocks): Pallas kernels are custom
calls the XLA cost model cannot see inside, while the XLA variant computes
identical math (parity-tested), so its cost analysis is the honest FLOP
count for the recipe. bench.py embeds the result as STEP_TFLOPS and
reports MFU = step_flops / (step_time * chip peak); re-run this script
whenever the recipe (model/crops/batch/loss) changes.

Usage: python scripts/step_flops.py [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    args = p.parse_args()

    from esvit_tpu import config
    from esvit_tpu.train.step import EsViTTrainer

    B = args.batch
    import dataclasses
    model = dataclasses.replace(config.swin_tiny(), attention_impl="xla",
                                fused_block_stages=(), layout_opt=False)
    cfg = config.TrainConfig(
        model=model,
        head=config.HeadConfig(),
        loss=config.LossConfig(use_dense_prediction=True),
        optim=config.OptimConfig(batch_size_per_device=B),
        steps_per_epoch=1251,
        dtype=jnp.bfloat16,
    )
    trainer = EsViTTrainer(cfg, total_batch_size=B * jax.device_count())
    rng = jax.random.PRNGKey(0)
    batch = (jnp.zeros((2 * B, 224, 224, 3), jnp.float32),
             jnp.zeros((8 * B, 96, 96, 3), jnp.float32))
    state = trainer.init_state(rng, batch)
    compiled = jax.jit(trainer.train_step).lower(
        state, batch, jax.random.PRNGKey(1)).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    out = {
        "batch": B,
        "images_per_step": 10 * B,
        "flops_per_step": float(cost.get("flops", -1.0)),
        "tflops_per_step": float(cost.get("flops", -1.0)) / 1e12,
        "bytes_accessed": float(cost.get("bytes accessed", -1.0)),
        "note": "XLA cost model of the all-XLA train step (fwd+bwd+loss+"
                "optimizer+EMA), bf16 compute; Pallas-free so every op is "
                "visible to the cost model",
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
