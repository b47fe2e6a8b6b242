"""Training orchestrator + CLI: the ``main_esvit.py`` equivalent.

``python -m esvit_tpu.train.train --arch swin_tiny --data_kind synthetic ...``

Flow (ref: main_esvit.py:210-496 train_esvit): mesh init -> data -> trainer
(model/optimizer/schedules) -> optional resume -> epoch loop with the jitted
step, NaN guard (dumps a debug checkpoint and exits, main_esvit.py:546-562),
per-epoch checkpointing + JSONL log. Multi-host: call
``jax.distributed.initialize()`` before this (flag provided); all
collectives ride the mesh.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu import config as config_lib
from esvit_tpu.data import datasets as datasets_lib
from esvit_tpu.data.loader import MultiCropIterator, synthetic_batches
from esvit_tpu.io.checkpoint import CheckpointManager
from esvit_tpu.parallel import mesh as mesh_lib
from esvit_tpu.train.step import EsViTTrainer, TrainState
from esvit_tpu.utils.metrics import MetricLogger, append_log


def shard_batch(batch, mesh):
    """Single host: device_put onto the data axis. Multi-host: each host
    holds only its B/P slice of the global batch, so the global array is
    assembled from per-process shards (the DistributedSampler contract,
    ref main_esvit.py:273-286 — each rank loads a disjoint shard)."""
    sh = mesh_lib.batch_sharding(mesh)
    if jax.process_count() == 1:
        return tuple(jax.device_put(b, sh) for b in batch)
    return tuple(
        jax.make_array_from_process_local_data(sh, np.asarray(b))
        for b in batch)


def git_sha() -> str:
    """Repo SHA stamping for logs (ref: utils.py:378-395 get_sha)."""
    import subprocess

    try:
        cwd = os.path.dirname(os.path.abspath(__file__))
        sha = subprocess.check_output(
            ["git", "rev-parse", "HEAD"], cwd=cwd,
            stderr=subprocess.DEVNULL).decode().strip()
        dirty = subprocess.call(["git", "diff-index", "--quiet", "HEAD"],
                                cwd=cwd, stderr=subprocess.DEVNULL)
        return sha + (" (dirty)" if dirty else "")
    except Exception:
        return "unknown"


def train(cfg: config_lib.TrainConfig, *, dataset=None, data_kind="synthetic",
          data_kwargs: Optional[dict] = None, host_aug: bool = False,
          resume: bool = True, max_steps: Optional[int] = None,
          donate: bool = False, profile_dir: Optional[str] = None,
          init_from: Optional[str] = None) -> TrainState:
    """profile_dir: capture a jax.profiler trace of the first training
    epoch (SURVEY.md §5.1 — replaces the reference's wall-clock-only
    timing). init_from: checkpoint path loaded as INITIALIZATION before
    local auto-resume, like --pretrained_weights_ckpt
    (main_esvit.py:442-462, the 'continued_from' recipes)."""
    print(f"git: {git_sha()}", flush=True)
    mesh = mesh_lib.make_mesh(cfg.mesh)
    n_data = mesh.shape[mesh_lib.DATA_AXIS]
    B = cfg.optim.batch_size_per_device * n_data   # GLOBAL per-view batch
    total_batch = B
    n_proc = jax.process_count()
    if B % n_proc:
        raise ValueError(f"global batch {B} not divisible by "
                         f"{n_proc} processes")
    B_local = B // n_proc   # samples this host decodes + feeds per step

    if dataset is None and data_kind != "synthetic_device":
        dataset = datasets_lib.build_dataset(data_kind, **(data_kwargs or {}))
    # One epoch = len(dataset) samples globally; each host walks a disjoint
    # 1/n_proc shard of B_local samples per step, so every host agrees on
    # len // B steps (DistributedSampler semantics).
    steps_per_epoch = (len(dataset) // B
                       if dataset is not None and hasattr(dataset, "__len__")
                       and len(dataset) >= B else cfg.steps_per_epoch)
    steps_per_epoch = max(steps_per_epoch, 1)
    cfg = cfg.replace(steps_per_epoch=steps_per_epoch)

    trainer = EsViTTrainer(cfg, total_batch_size=total_batch)
    example = next(synthetic_batches(cfg.crops, B, steps=1))
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), example)

    # Shard: params replicated (or head-TP), batch over data axis.
    state = mesh_lib.shard_train_state(state, mesh)

    ckpt = CheckpointManager(cfg.output_dir)
    if init_from:
        # --pretrained_weights_ckpt semantics: load as initialization
        # (step/optimizer state included when it's one of our checkpoints).
        init_mgr = CheckpointManager(os.path.dirname(os.path.abspath(init_from)))
        restored = init_mgr.restore(state, os.path.basename(init_from))
        if restored is not None:
            state = mesh_lib.shard_train_state(restored, mesh)
            print(f"initialized from {init_from} (step {int(state.step)})",
                  flush=True)
        else:
            print(f"WARNING: init_from {init_from} not found", flush=True)
    if resume and ckpt.has_checkpoint():
        restored = ckpt.restore(state)
        if restored is not None:
            state = mesh_lib.shard_train_state(restored, mesh)
            print(f"resumed from step {int(state.step)}", flush=True)

    step_fn = jax.jit(trainer.train_step,
                      static_argnames=("mode", "teacher_mode"),
                      donate_argnums=(0,) if donate else ())
    rng = jax.random.PRNGKey(cfg.seed + 1)

    # ViL neighbor-sampling schedule (VIL_MODE_SWITCH): sample one random
    # neighbor chunk per net per step for the first mode_switch fraction of
    # training, then full attention.
    import random as _random

    vil_mode = getattr(cfg.model, "mode", 0)
    vil_switch_step = int(getattr(cfg.model, "mode_switch", 0.0)
                          * cfg.optim.epochs * steps_per_epoch)
    vil_per_layer = getattr(cfg.model, "per_layer_mode", False)
    mode_rng = _random.Random(cfg.seed)

    def modes_for(step_idx: int) -> tuple[int, int]:
        if vil_mode > 0 and step_idx < vil_switch_step:
            if vil_per_layer:
                # sentinel: every layer draws its own neighbor in-graph
                # (reference longformer2d.py:151 semantics)
                return 9, 9
            return mode_rng.randrange(1, 9), mode_rng.randrange(1, 9)
        return 0, 0

    profiling = False
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
        profiling = True

    # Preemption tolerance (SURVEY.md §5.3 TPU plan): TPU maintenance events
    # deliver SIGTERM; checkpoint at the next step boundary and exit so the
    # relaunched job resumes losslessly.
    import signal

    preempted = {"flag": False}

    def _on_sigterm(signum, frame):
        preempted["flag"] = True
        print("SIGTERM received: checkpointing at next step boundary",
              flush=True)

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread (e.g. under some test runners)

    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, cfg.optim.epochs):
        logger = MetricLogger()
        header = f"Epoch: [{epoch}/{cfg.optim.epochs}]"
        if dataset is not None:
            it = MultiCropIterator(
                dataset, cfg.crops, B_local, epoch=epoch, seed=cfg.seed,
                host_aug=host_aug, process_index=jax.process_index(),
                process_count=jax.process_count())
            batches = iter(it)
        else:
            batches = synthetic_batches(cfg.crops, B_local,
                                        steps=steps_per_epoch,
                                        seed=cfg.seed + epoch)

        images_per_step = cfg.crops.ncrops * B
        step_t0 = time.time()
        for batch in logger.log_every(batches, 10, header):
            rng, sub = jax.random.split(rng)
            s_mode, t_mode = modes_for(int(state.step))
            state, metrics = step_fn(state, shard_batch(batch, mesh), sub,
                                     mode=s_mode, teacher_mode=t_mode)
            # One host transfer for all metrics (per-scalar fetches cost a
            # full round trip each on remote-tunnel backends).
            m = jax.device_get(metrics)
            loss = float(m["loss"])
            if not math.isfinite(loss):
                # NaN guard (main_esvit.py:546-562): dump debug ckpt, exit.
                print(f"Loss is {loss}, stopping training", flush=True)
                if jax.process_index() == 0:
                    ckpt.save(state, epoch=epoch, force_named=True)
                sys.exit(1)
            now = time.time()
            logger.update(loss=loss, lr=float(m["lr"]), wd=float(m["wd"]),
                          grad_norm=float(m["grad_norm"]),
                          img_per_sec=images_per_step / max(now - step_t0, 1e-9))
            step_t0 = now
            if preempted["flag"]:
                if jax.process_index() == 0:
                    ckpt.save(state, epoch=epoch)
                print(f"checkpointed at step {int(state.step)}; exiting for "
                      "preemption", flush=True)
                sys.exit(0)
            if max_steps is not None and int(state.step) >= max_steps:
                break

        if profiling:
            jax.profiler.stop_trace()
            profiling = False
            print(f"profiler trace written to {profile_dir}", flush=True)
        print(f"Averaged stats: {logger}", flush=True)
        if jax.process_index() == 0:
            ckpt.save(state, epoch=epoch,
                      save_every_epochs=cfg.save_every_epochs)
        append_log(cfg.output_dir,
                   {"epoch": epoch,
                    **{f"train_{k}": v for k, v in logger.global_avgs().items()}})
        if max_steps is not None and int(state.step) >= max_steps:
            break
    return state


def get_args_parser():
    p = argparse.ArgumentParser("esvit_tpu pretrain",
                                description="EsViT SSL pre-training on TPU")
    p.add_argument("--arch", default="swin_tiny",
                   choices=sorted(config_lib.PRESETS))
    p.add_argument("--window_size", default=7, type=int)
    p.add_argument("--out_dim", default=65536, type=int)
    p.add_argument("--norm_last_layer", default=False,
                   action=argparse.BooleanOptionalAction)
    p.add_argument("--use_bn_in_head", default=False,
                   action=argparse.BooleanOptionalAction)
    p.add_argument("--use_dense_prediction", default=True,
                   action=argparse.BooleanOptionalAction)
    p.add_argument("--momentum_teacher", default=0.996, type=float)
    p.add_argument("--warmup_teacher_temp", default=0.04, type=float)
    p.add_argument("--teacher_temp", default=0.07, type=float)
    p.add_argument("--warmup_teacher_temp_epochs", default=30, type=int)
    p.add_argument("--epochs", default=300, type=int)
    p.add_argument("--warmup_epochs", default=10, type=int)
    p.add_argument("--lr", default=5e-4, type=float)
    p.add_argument("--min_lr", default=1e-6, type=float)
    p.add_argument("--weight_decay", default=0.04, type=float)
    p.add_argument("--weight_decay_end", default=0.4, type=float)
    p.add_argument("--clip_grad", default=3.0, type=float)
    p.add_argument("--freeze_last_layer", default=1, type=int)
    p.add_argument("--frozen_layers", nargs="*", default=[],
                   help="param subtrees frozen for the whole run "
                        "(finetune recipes' FINETUNE.FROZEN_LAYERS), e.g. "
                        "patch_embed layers_0; '*' freezes everything")
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "sgd", "lars"])
    p.add_argument("--batch_size_per_device", default=32, type=int)
    p.add_argument("--global_crops_scale", nargs=2, type=float,
                   default=(0.4, 1.0))
    p.add_argument("--local_crops_scale", nargs=2, type=float,
                   default=(0.05, 0.4))
    p.add_argument("--local_crops_number", default=8, type=int)
    p.add_argument("--local_crops_size", default=96, type=int)
    p.add_argument("--use_mixup", default=False,
                   action=argparse.BooleanOptionalAction)
    p.add_argument("--num_mixup_views", default=2, type=int)
    p.add_argument("--mixup", default=0.8, type=float)
    p.add_argument("--cutmix", default=1.0, type=float)
    p.add_argument("--mixup_prob", default=1.0, type=float)
    p.add_argument("--mixup_switch_prob", default=0.5, type=float)
    p.add_argument("--smoothing", default=0.0, type=float)
    p.add_argument("--data_kind", default="synthetic",
                   choices=["synthetic", "folder", "zip", "tsv",
                            "composite_tsv", "openimages_tsv"])
    p.add_argument("--data_path", default="")
    p.add_argument("--zip_map_file", default="")
    p.add_argument("--host_aug", default=False,
                   action=argparse.BooleanOptionalAction,
                   help="full PIL augmentation on host (parity mode) instead "
                        "of fused on-device photometrics")
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--saveckp_freq", default=5, type=int)
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--mesh_model", default=1, type=int,
                   help="tensor-parallel axis size for the DINO head")
    p.add_argument("--bf16", default=True, action=argparse.BooleanOptionalAction)
    p.add_argument("--max_steps", default=None, type=int)
    p.add_argument("--profile_dir", default="",
                   help="capture a jax.profiler trace of the first epoch")
    p.add_argument("--pretrained_weights_ckpt", default="",
                   help="checkpoint loaded as initialization before local "
                        "auto-resume (continued_from recipes)")
    p.add_argument("--distributed", default=False,
                   action=argparse.BooleanOptionalAction,
                   help="call jax.distributed.initialize() (multi-host)")
    p.add_argument("--debug_nans", default=False,
                   action=argparse.BooleanOptionalAction,
                   help="jax_debug_nans: trap the op producing the first NaN "
                        "(the TRAIN.DETECT_ANOMALY equivalent)")
    return p


def config_from_args(args) -> config_lib.TrainConfig:
    from esvit_tpu.data.mixup import MixupConfig

    model = config_lib.get_model_config(
        args.arch, **({"window_size": args.window_size}
                      if args.arch.startswith("swin") else {}))
    return config_lib.TrainConfig(
        model=model,
        head=config_lib.HeadConfig(out_dim=args.out_dim,
                                   use_bn=args.use_bn_in_head,
                                   norm_last_layer=args.norm_last_layer),
        loss=config_lib.LossConfig(
            out_dim=args.out_dim,
            use_dense_prediction=args.use_dense_prediction,
            warmup_teacher_temp=args.warmup_teacher_temp,
            teacher_temp=args.teacher_temp,
            warmup_teacher_temp_epochs=args.warmup_teacher_temp_epochs),
        crops=config_lib.CropConfig(
            global_scale=tuple(args.global_crops_scale),
            local_scale=tuple(args.local_crops_scale),
            local_crops_number=args.local_crops_number,
            local_size=args.local_crops_size),
        optim=config_lib.OptimConfig(
            optimizer=args.optimizer, lr=args.lr, min_lr=args.min_lr,
            warmup_epochs=args.warmup_epochs,
            weight_decay=args.weight_decay,
            weight_decay_end=args.weight_decay_end,
            momentum_teacher=args.momentum_teacher,
            clip_grad=args.clip_grad,
            freeze_last_layer_epochs=args.freeze_last_layer,
            epochs=args.epochs,
            batch_size_per_device=args.batch_size_per_device,
            frozen_layers=tuple(args.frozen_layers)),
        mesh=config_lib.MeshConfig(model=args.mesh_model),
        mixup=(None if not args.use_mixup else MixupConfig(
            enabled=True, num_mixup_views=args.num_mixup_views,
            mixup_alpha=args.mixup, cutmix_alpha=args.cutmix,
            prob=args.mixup_prob, switch_prob=args.mixup_switch_prob,
            label_smoothing=args.smoothing)),
        seed=args.seed,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        output_dir=args.output_dir,
        save_every_epochs=args.saveckp_freq,
    )


def main(argv=None):
    args = get_args_parser().parse_args(argv)
    from esvit_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.distributed:
        from esvit_tpu.launch import initialize_distributed

        initialize_distributed()
    cfg = config_from_args(args)
    os.makedirs(args.output_dir, exist_ok=True)
    data_kwargs: dict[str, Any] = {}
    if args.data_kind == "folder":
        data_kwargs = {"root": args.data_path}
    elif args.data_kind == "zip":
        data_kwargs = {"zip_path": args.data_path,
                       "map_file": args.zip_map_file}
    elif args.data_kind in ("tsv",):
        data_kwargs = {"tsv_path": args.data_path}
    train(cfg, data_kind=args.data_kind, data_kwargs=data_kwargs,
          host_aug=args.host_aug, max_steps=args.max_steps,
          profile_dir=args.profile_dir or None,
          init_from=args.pretrained_weights_ckpt or None)


if __name__ == "__main__":
    main()
