"""End-to-end learning validation (the reference's smoke-train analogue,
SURVEY.md §4, but with a measurable outcome).

Pre-trains a femto Swin with the full EsViT recipe (multi-crop DDINO,
on-device augmentation, teacher EMA) on a procedural shape dataset for a few
hundred steps and compares frozen-teacher k-NN accuracy before vs after.
Passing bar: trained features beat random-init features by a clear margin.

Run: python scripts/validate_learning.py [--steps 2000] [--size nano] [--no-dense]

Validated results (v5e, nano Swin @64px, dense task):
- shapes (4-class, chance 25%): 2000 steps (~5 min): k-NN 39.8% -> 53.1%;
  3000 steps (~8 min): -> 60.2%.
- shapes_hard (16-class shape x fill, textured bg + distractors, chance
  6.25%) — the standing regression metric; see PERF.md for the current
  baseline number.

Note: at this toy scale k-NN quality is non-monotonic in training length
(standard small-scale DINO behavior — partial collapse phases before the
schedule anneals); 2000 steps is the validated configuration. Training-math
correctness is separately certified by tests/test_parity_grads.py.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--size", choices=["nano", "femto"], default="nano",
                   help="nano: 3-stage Swin @64px (stronger signal, ~4min); "
                        "femto: 2-stage @32px (~2min)")
    p.add_argument("--backbone", choices=["swin", "vil", "cvt"],
                   default="swin",
                   help="vil: nano Vision-Longformer with two SPARSE "
                        "(sliding-chunk) stages + global tokens, so the "
                        "fused kernel (ops/sliding_chunk_fused.py) is on "
                        "the training path — its learning-level evidence "
                        "(VERDICT r4 item 1). --no-fused maps to "
                        "fused_sc='off' (same einsum math, kernel off). "
                        "cvt: nano 3-stage conv-QKV+BN CvT — trainability "
                        "canary for the third backbone family (the XLA "
                        "path, no custom kernel; SyncBN statistics ride "
                        "the same jit'd step)")
    p.add_argument("--no-dense", dest="dense", action="store_false",
                   help="disable the region-level (DDINO) task")
    p.add_argument("--task", choices=["shapes", "shapes_hard"],
                   default="shapes_hard",
                   help="shapes: 4-class (chance 25%%, saturates quickly); "
                        "shapes_hard: 16-class shape x fill with textured "
                        "backgrounds + distractors (chance 6.25%%) — the "
                        "standing regression metric")
    p.add_argument("--host_aug", action="store_true",
                   help="use the host (PIL-parity) augmentation path instead "
                        "of the fused on-device one — for aug-fidelity A/B")
    p.add_argument("--hires", action="store_true",
                   help="160px source / 96px global / 48px local crops "
                        "(nano only). The full-strength PIL recipe (blur "
                        "p=1.0 sigma<=2, solarize) low-passes 64px crops "
                        "below the fill-texture period of shapes_hard; at "
                        "96px the texture survives, so BOTH aug paths can "
                        "learn — the host-aug learning-evidence config "
                        "(VERDICT r3 item 7)")
    p.add_argument("--min_gain", type=float, default=None,
                   help="required (after - before) k-NN gain in points; "
                        "defaults: 5 for shapes, 10 for shapes_hard")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--eval_every", type=int, default=0,
                   help="run the teacher k-NN eval every N steps (long-"
                        "horizon collapse telemetry: the margin trajectory "
                        "shows partial-collapse phases, not just the end "
                        "point)")
    p.add_argument("--max_seconds", type=float, default=None,
                   help="stop training after this wall-clock budget (the "
                        "final eval + gate still run on whatever step count "
                        "was reached — for bounded long-horizon runs)")
    p.add_argument("--lr", type=float, default=None,
                   help="peak learning rate (defaults: 8e-3 shapes, "
                        "4e-3 shapes_hard — the hard task's textured "
                        "gradients NaN at 8e-3 late in training)")
    # Numerics / kernel-path A/B knobs (regression bisection).
    p.add_argument("--no-fused", dest="fused", action="store_false",
                   help="disable the block-fused Pallas kernel path")
    p.add_argument("--no-layout", dest="layout", action="store_false",
                   help="disable the window-major stage layout")
    p.add_argument("--score_dtype", default=None,
                   choices=[None, "bfloat16", "float32"],
                   help="override attention score storage dtype")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from esvit_tpu import config
    from esvit_tpu.data.datasets import build_dataset
    from esvit_tpu.data.loader import MultiCropIterator
    from esvit_tpu.evals.knn import run_knn_eval
    from esvit_tpu.train.step import EsViTTrainer

    import dataclasses as _dc

    if args.size == "nano":
        g_size, l_size, img_size = ((96, 48, 160) if args.hires
                                    else (64, 32, 96))
        if args.backbone == "vil":
            # Two sparse stages (s1) with a global CLS token (g1) so the
            # sliding-chunk path — and with fused_sc='auto', the fused
            # Pallas kernel — carries most of the compute; final stage
            # full-attention like the canonical ViL-T tail.
            model = config.vil_from_arch(
                "l1,h2,d32,n2,s1,g1,p4,f4_l2,h4,d64,n2,s1,g1,p2,f4_"
                "l3,h4,d128,n2,s0,g1,p2,f4",
                img_size=g_size)
        elif args.backbone == "cvt":
            # Nano 3-stage CvT (conv-QKV projections + BN, QuickGELU) —
            # same token geometry as the nano Swin (64px -> 16x16 -> 8x8
            # -> 4x4). Exercises the SyncBN-under-jit statistics and the
            # depthwise-conv QKV path end-to-end (models/cvt.py).
            model = config.CvTConfig(img_size=g_size, stages=(
                config.CvTStageConfig(patch_size=3, patch_stride=4,
                                      patch_padding=1, embed_dim=32,
                                      depth=1, num_heads=2),
                config.CvTStageConfig(patch_size=3, patch_stride=2,
                                      patch_padding=1, embed_dim=64,
                                      depth=1, num_heads=4),
                config.CvTStageConfig(patch_size=3, patch_stride=2,
                                      patch_padding=1, embed_dim=128,
                                      depth=2, num_heads=4),
            ))
        else:
            model = config.SwinConfig(img_size=g_size, patch_size=4,
                                      embed_dim=32, depths=(2, 2, 2),
                                      num_heads=(2, 4, 4), window_size=4,
                                      drop_path_rate=0.0)
    else:
        assert not args.hires, "--hires is a nano-size configuration"
        assert args.backbone == "swin", "--size femto is Swin-only"
        model = config.swin_femto(drop_path_rate=0.0)
        g_size, l_size, img_size = 32, 16, 64
    overrides = {}
    if args.backbone == "vil":
        if not args.fused:
            overrides["fused_sc"] = "off"
    elif args.backbone == "cvt":
        pass                        # no kernel-path knobs: XLA path only
    else:
        if not args.fused:
            overrides["fused_block_stages"] = ()
        if not args.layout:
            overrides["layout_opt"] = False
        if args.score_dtype:
            overrides["score_dtype"] = args.score_dtype
    if overrides:
        model = _dc.replace(model, **overrides)
    crops = config.CropConfig(global_size=g_size, global_scale=(0.4, 1.0),
                              local_size=l_size, local_scale=(0.3, 0.8),
                              local_crops_number=4)
    epochs = 20
    cfg = config.TrainConfig(
        model=model,
        head=config.HeadConfig(out_dim=1024, hidden_dim=512,
                               bottleneck_dim=64, norm_last_layer=False),
        loss=config.LossConfig(out_dim=1024,
                               use_dense_prediction=args.dense,
                               warmup_teacher_temp_epochs=5),
        crops=crops,
        optim=config.OptimConfig(epochs=epochs, warmup_epochs=4,
                                 lr=(args.lr if args.lr is not None
                                     else 4e-3 if args.task == "shapes_hard"
                                     else 8e-3),
                                 batch_size_per_device=args.batch,
                                 freeze_last_layer_epochs=1),
        steps_per_epoch=max(args.steps // epochs, 1),
        dtype=jnp.bfloat16,
        seed=0,
    )
    trainer = EsViTTrainer(cfg, total_batch_size=args.batch)

    n_eval = 512 if args.task == "shapes_hard" else 256
    train_ds = build_dataset(args.task, n=4096, size=img_size, seed=0)
    val_train = build_dataset(args.task, n=n_eval, size=img_size, seed=7)
    val_test = build_dataset(args.task, n=n_eval // 2, size=img_size, seed=13)

    B = args.batch
    example = (jnp.zeros((2 * B, g_size, g_size, 3), jnp.float32),
               jnp.zeros((crops.local_crops_number * B, l_size, l_size, 3),
                         jnp.float32))
    state = trainer.init_state(jax.random.PRNGKey(0), example)
    step_fn = jax.jit(trainer.train_step)

    def knn_accuracy(params, tag, extra_cols=None):
        from esvit_tpu.models.registry import build_backbone

        backbone = build_backbone(cfg.model)
        variables = {"params": jax.tree.map(jnp.asarray, params["backbone"])}
        # BN backbones (CvT/ResNet): the teacher's batch_stats ride along
        # (ref eval protocol runs the frozen teacher in eval mode).
        for col, tree in (extra_cols or {}).items():
            if tree and "backbone" in tree:
                variables[col] = jax.tree.map(jnp.asarray, tree["backbone"])
        res = run_knn_eval(backbone, variables, val_train, val_test,
                           ks=(10,), batch_size=32, size=g_size)
        t1 = res[10][0]
        print(f"[{tag}] 10-NN top-1: {t1:.2f}%", flush=True)
        return t1

    acc_before = knn_accuracy(jax.device_get(state.teacher), "random init",
                              jax.device_get(state.teacher_state))

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    steps_done = 0
    epoch = 0
    out_of_time = False
    while steps_done < args.steps and not out_of_time:
        it = MultiCropIterator(train_ds, crops, B, epoch=epoch, seed=0,
                               host_aug=args.host_aug, num_threads=4)
        for batch in it:
            rng, sub = jax.random.split(rng)
            state, metrics = step_fn(state, batch, sub)
            steps_done += 1
            if args.eval_every and steps_done % args.eval_every == 0 \
                    and steps_done < args.steps:
                knn_accuracy(jax.device_get(state.teacher),
                             f"step {steps_done}",
                             jax.device_get(state.teacher_state))
            if (args.max_seconds is not None
                    and time.time() - t0 > args.max_seconds):
                print(f"[budget] stopping at step {steps_done} after "
                      f"{time.time() - t0:.0f}s", flush=True)
                out_of_time = True
                break
            if steps_done % 50 == 0:
                line = (f"step {steps_done}: loss "
                        f"{float(metrics['loss']):.4f} "
                        f"({time.time() - t0:.0f}s)")
                if steps_done % 500 == 0:
                    # Long-horizon stability telemetry: DINO center EMAs
                    # must stay bounded (collapse/NaN show up here first).
                    c = jax.device_get(state.centers)
                    cmax = float(np.abs(np.asarray(c.center)).max())
                    line += f" |center|max {cmax:.3f}"
                    if getattr(c, "center_grid", None) is not None:
                        line += (" |center_grid|max "
                                 f"{float(np.abs(np.asarray(c.center_grid)).max()):.3f}")
                    assert math.isfinite(cmax), "center EMA went non-finite"
                print(line, flush=True)
            if steps_done >= args.steps:
                break
        epoch += 1

    acc_after = knn_accuracy(jax.device_get(state.teacher), "trained",
                             jax.device_get(state.teacher_state))
    print(f"\nresult: {acc_before:.1f}% -> {acc_after:.1f}% "
          f"({steps_done} steps, {time.time() - t0:.0f}s, task={args.task}, "
          f"backbone={args.backbone}, fused={args.fused}, "
          f"host_aug={args.host_aug}, hires={args.hires})", flush=True)
    min_gain = args.min_gain
    if min_gain is None:
        # Measured on-chip baselines (PERF.md rounds 2-3):
        # - shapes @2000 steps: 39.8 -> 55-60% (gain ~+16) -> gate +5.
        # - shapes_hard @2000 steps: +2..+4 across every healthy revision —
        #   a divergence/NaN canary, not a margin gate, at that budget.
        # - shapes_hard @6000 steps: 22.3 -> 36.3 (+14.0, round 3, fused
        #   path) -> gate +10: an unambiguous LEARNING gate. Use
        #   --steps 6000 after any numerics/kernel change.
        if args.task == "shapes_hard":
            min_gain = 10.0 if args.steps >= 5000 else 2.0
            if args.backbone == "vil":
                # Measured round 5 (6000 steps, same seed): fused +9.4,
                # einsum +7.0 — nano ViL learns slower than nano Swin, so
                # the Swin +10 bar over-gates it. +6 floors both measured
                # paths with noise room. The 2000-step run stays a pure
                # NaN canary for ViL: measured +0.0 at a budget where the
                # same config gains +9.4 by 6000 (k-NN is flat through
                # warmup), so min_gain 0 > is meaningless there — keep
                # the absolute-chance and finite asserts as the signal.
                min_gain = 6.0 if args.steps >= 5000 else -1.0
            elif args.backbone == "cvt":
                # No measured nano-CvT margin baseline yet: first runs
                # are NaN/divergence canaries (absolute chance*1.25
                # assert + finite loss/centers still apply). Pin a real
                # bar here once a 6000-step margin is measured on-chip.
                min_gain = -1.0
        else:
            min_gain = 5.0
    # Absolute sanity first (ADVICE r2): the relative gate alone can pass on
    # near-noise gains; a NaN loss or below-chance accuracy is always a bug.
    last_loss = float(metrics["loss"])
    assert math.isfinite(last_loss), f"final loss is not finite: {last_loss}"
    chance = 100.0 / (16 if args.task == "shapes_hard" else 4)
    assert acc_after > chance * 1.25, (
        f"post-training k-NN {acc_after:.1f}% is not above chance "
        f"({chance:.1f}%) by 25% — model is not learning at all")
    assert acc_after > acc_before + min_gain, (
        f"training gain {acc_after - acc_before:.1f} < required {min_gain}")
    print("LEARNING VALIDATION PASSED", flush=True)


if __name__ == "__main__":
    main()
