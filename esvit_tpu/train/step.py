"""The jitted EsViT training step.

One pure function replaces the reference's per-iteration body
(ref: main_esvit.py:499-600 train_one_epoch): teacher forward on the 2
global views, student forward on all views, DINO/DDINO loss with center EMA,
per-param grad clip, last-layer freeze, AdamW, teacher EMA with cosine
momentum. All schedules are computed in-step from the (traced) step counter.

bf16 compute replaces the fp16 GradScaler (no scaler state; grads/params are
fp32, activations bf16 — matching AMP autocast behavior).
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict

from esvit_tpu import losses
from esvit_tpu.config import TrainConfig
from esvit_tpu.models.esvit import EsViTModel
from esvit_tpu.train import optim as optim_lib
from esvit_tpu.utils import schedules


class TrainState(NamedTuple):
    step: jnp.ndarray                 # int32 global step
    student: Any                      # fp32 param pytree
    teacher: Any                      # fp32 param pytree (EMA of student)
    opt_state: Any
    centers: losses.DinoCenters
    # Non-param variable collections (e.g. BatchNorm batch_stats for
    # CvT/ResNet). Each net keeps its own, updated by its own forwards —
    # the reference's teacher runs in train mode and maintains its own BN
    # buffers; the EMA touches parameters only (main_esvit.py:586-590).
    student_state: Any = {}
    teacher_state: Any = {}


class EsViTTrainer:
    """Builds the model, schedules, optimizer, and the jittable step fn."""

    def __init__(self, cfg: TrainConfig, total_batch_size: int | None = None):
        self.cfg = cfg
        self.model = EsViTModel(cfg.model, cfg.head,
                                use_dense_prediction=cfg.loss.use_dense_prediction,
                                dtype=cfg.dtype)
        o = cfg.optim
        self.total_steps = o.epochs * cfg.steps_per_epoch
        self.warmup_steps = o.warmup_epochs * cfg.steps_per_epoch
        # Linear LR scaling rule (main_esvit.py:423): lr * total_batch / 256.
        tb = total_batch_size if total_batch_size is not None else o.batch_size_per_device
        self.base_lr = o.lr * tb / 256.0

        self.lr_fn = functools.partial(
            schedules.cosine_schedule, base_value=self.base_lr,
            final_value=o.min_lr, total_steps=self.total_steps,
            warmup_steps=self.warmup_steps)
        self.wd_fn = functools.partial(
            schedules.cosine_schedule, base_value=o.weight_decay,
            final_value=o.weight_decay_end, total_steps=self.total_steps)
        self.momentum_fn = functools.partial(
            schedules.cosine_schedule, base_value=o.momentum_teacher,
            final_value=1.0, total_steps=self.total_steps)
        self.teacher_temp_fn = functools.partial(
            schedules.teacher_temp_schedule,
            warmup_teacher_temp=cfg.loss.warmup_teacher_temp,
            teacher_temp=cfg.loss.teacher_temp,
            warmup_teacher_temp_epochs=cfg.loss.warmup_teacher_temp_epochs)

    # ---------------------------------------------------------------- init
    def init_state(self, rng: jax.Array, crops) -> TrainState:
        init_fn = jax.jit(lambda r: self.model.init({"params": r}, crops,
                                                    deterministic=True))
        variables = init_fn(rng)
        params = jax.tree.map(lambda x: x.astype(jnp.float32),
                              variables["params"])
        extra = {k: v for k, v in variables.items() if k != "params"}
        self.optimizer = self.make_optimizer(params)
        opt_state = self.optimizer.init(params)
        # Teacher starts as a copy of the student (main_esvit.py:380-383).
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            student=params,
            teacher=jax.tree.map(jnp.copy, params),
            opt_state=opt_state,
            centers=losses.DinoCenters.zeros(self.cfg.loss.out_dim),
            student_state=extra,
            teacher_state=jax.tree.map(jnp.copy, extra),
        )

    def make_optimizer(self, params):
        return optim_lib.make_optimizer(
            self.cfg.optim, params, self.lr_fn, self.wd_fn,
            # weight_g is a regular decayed param in torch when trainable.
            decay_scale_g=not self.cfg.head.norm_last_layer)

    # ---------------------------------------------------------------- step
    def train_step(self, state: TrainState, batch, rng: jax.Array,
                   mode: int = 0, teacher_mode: int = 0):
        """batch: tuple of per-resolution crop arrays
        ((2B, Sg, Sg, 3), (L*B, Sl, Sl, 3), ...). Returns (state, metrics).

        mode / teacher_mode: static ViL sliding-chunk sampling modes
        (ref longformer2d.py:147-155 — both nets sample independently in
        train mode; the host draws them and jit caches the 8 variants)."""
        cfg = self.cfg
        B = batch[0].shape[0] // 2
        ncrops = 2 + (batch[1].shape[0] // B if len(batch) > 1 else 0)

        step = state.step
        epoch = step // cfg.steps_per_epoch
        t_temp = self.teacher_temp_fn(epoch)
        dtype = cfg.dtype

        teacher_in = (batch[0].astype(dtype),)
        student_in = tuple(b.astype(dtype) for b in batch)

        # Mixup-SSL (main_esvit.py:515-538): mix the first views of the
        # STUDENT inputs; the teacher sees clean globals. The matching
        # targets feed the view-level loss only (DDINO ignores them, like
        # the reference).
        targets_mixup = None
        mix = getattr(cfg, "mixup", None)
        if mix is not None and mix.enabled:
            from esvit_tpu.data.mixup import mixup_multicrop

            rng, mix_rng = jax.random.split(rng)
            g, l, targets_mixup = mixup_multicrop(
                mix_rng, student_in[0],
                student_in[1] if len(student_in) > 1
                else student_in[0][:0], mix)
            student_in = (g, l) if len(student_in) > 1 else (g,)

        # K-streamed loss path: the model emits bottleneck features + the
        # effective last-layer matrices; ddino_loss_streamed contracts K in
        # chunks (no (rows, 65536) logits in HBM).
        streamed = (cfg.loss.use_dense_prediction
                    and getattr(cfg.loss, "streamed", False))

        # Per-layer ViL neighbor draws (mode sentinel 9) need an rng stream.
        t_rngs = ({"vil_mode": jax.random.fold_in(rng, 3)}
                  if teacher_mode == 9 else None)
        mutable = list(state.teacher_state) if state.teacher_state else False
        if mutable:
            # BN backbones: teacher runs deterministically but with BN in
            # batch-stats mode, maintaining its own buffers (like the
            # reference's always-train-mode teacher).
            t_out, t_updates = self.model.apply(
                {"params": state.teacher, **state.teacher_state}, teacher_in,
                deterministic=True, bn_train=True, mode=teacher_mode,
                batch_size=B, bottleneck_outputs=streamed, mutable=mutable,
                rngs=t_rngs)
            new_teacher_state = dict(t_updates)
        else:
            t_out = self.model.apply({"params": state.teacher}, teacher_in,
                                     deterministic=True, mode=teacher_mode,
                                     batch_size=B,
                                     bottleneck_outputs=streamed, rngs=t_rngs)
            new_teacher_state = state.teacher_state
        if streamed:
            # stop-grad the teacher arrays only (npatch stays static ints)
            tc, trg, tf, t_np_, twc, twd = t_out
            t_out = tuple(jax.lax.stop_gradient(x)
                          for x in (tc, trg, tf)) + (t_np_,) + tuple(
                              jax.lax.stop_gradient(x) for x in (twc, twd))

        def loss_fn(params):
            rngs = {"droppath": rng, "dropout": jax.random.fold_in(rng, 1)}
            if mode == 9:
                rngs["vil_mode"] = jax.random.fold_in(rng, 2)
            if mutable:
                s_out, s_updates = self.model.apply(
                    {"params": params, **state.student_state}, student_in,
                    deterministic=False, rngs=rngs, mode=mode,
                    batch_size=B, bottleneck_outputs=streamed,
                    mutable=mutable)
                s_updates = dict(s_updates)
            else:
                s_out = self.model.apply({"params": params}, student_in,
                                         deterministic=False, rngs=rngs,
                                         mode=mode, batch_size=B,
                                         bottleneck_outputs=streamed)
                s_updates = state.student_state
            if streamed:
                s_cls_z, s_reg_z, s_fea, s_npatch, ws_cls, ws_dense = s_out
                t_cls_z, t_reg_z, t_fea, t_np, wt_cls, wt_dense = t_out
                loss, new_centers = losses.ddino_loss_streamed(
                    s_cls_z, s_reg_z, s_fea, t_cls_z, t_reg_z, t_fea,
                    ws_cls, state.centers, t_temp, ncrops=ncrops,
                    batch_size=B, npatch=s_npatch, t_npatch=t_np[0],
                    w_t=wt_cls, w_s_dense=ws_dense, w_t_dense=wt_dense,
                    n_chunks=getattr(cfg.loss, "stream_chunks", 8),
                    student_temp=cfg.loss.student_temp,
                    center_momentum=cfg.loss.center_momentum)
            elif cfg.loss.use_dense_prediction:
                loss, new_centers = losses.ddino_loss(
                    s_out, t_out, state.centers, t_temp, ncrops=ncrops,
                    batch_size=B, student_temp=cfg.loss.student_temp,
                    center_momentum=cfg.loss.center_momentum)
            else:
                loss, new_center = losses.dino_loss(
                    s_out, t_out, state.centers.center, t_temp, ncrops=ncrops,
                    student_temp=cfg.loss.student_temp,
                    center_momentum=cfg.loss.center_momentum,
                    targets_mixup=targets_mixup)
                new_centers = state.centers._replace(center=new_center)
            return loss, (new_centers, s_updates)

        (loss, (new_centers, new_student_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.student)

        # Last-layer freeze (utils.py:118-123): first freeze_last_layer epochs.
        ll_mask = optim_lib.last_layer_mask(grads)
        frozen = epoch < cfg.optim.freeze_last_layer_epochs

        # Finetune-recipe layer freeze (swin_transformer.py:919-943): the
        # named subtrees never move — grads AND updates zeroed, like torch's
        # requires_grad=False exclusion from the optimizer.
        f_mask = None
        if cfg.optim.frozen_layers:
            f_mask = optim_lib.freeze_mask_by_prefix(
                grads, cfg.optim.frozen_layers)

        m = self.momentum_fn(step)
        if (getattr(cfg.optim, "fused_update", False)
                and cfg.optim.optimizer == "adamw"):
            # One fused pass: clip + AdamW + freeze + apply + teacher EMA
            # (bit-identical to the chain below, tests/test_fused_optim.py).
            student, teacher, opt_state = optim_lib.fused_adamw_ema_apply(
                grads, state.opt_state, state.student, state.teacher,
                lr=self.lr_fn(step), wd=self.wd_fn(step), ema_m=m,
                clip=cfg.optim.clip_grad,
                decay_mask=optim_lib.wd_mask(
                    grads, decay_scale_g=not cfg.head.norm_last_layer),
                ll_mask=ll_mask, frozen=frozen, f_mask=f_mask)
            grads_for_norm = grads
        else:
            grads = optim_lib.apply_last_layer_freeze(grads, ll_mask, frozen)
            if f_mask is not None:
                grads = optim_lib.apply_param_freeze(grads, f_mask)
            updates, opt_state = self.optimizer.update(
                grads, state.opt_state, state.student)
            # Re-zero frozen-leaf updates so weight decay doesn't leak in
            # (torch skips grad=None params entirely).
            updates = optim_lib.apply_last_layer_freeze(updates, ll_mask,
                                                        frozen)
            if f_mask is not None:
                updates = optim_lib.apply_param_freeze(updates, f_mask)
            student = optax.apply_updates(state.student, updates)

            # Teacher EMA (main_esvit.py:586-590): p_k <- m p_k + (1-m) p_q.
            teacher = jax.tree.map(lambda t, s: t * m + s * (1.0 - m),
                                   state.teacher, student)
            grads_for_norm = grads

        new_state = TrainState(step=step + 1, student=student, teacher=teacher,
                               opt_state=opt_state, centers=new_centers,
                               student_state=new_student_state,
                               teacher_state=new_teacher_state)
        # Per-leaf squared norms, with frozen leaves excluded exactly as the
        # freeze zeroing would (the fused path never materializes the
        # zeroed grad tree).
        def _leaf_sq(g, llm, fm):
            s = jnp.sum(jnp.square(g.astype(jnp.float32)))
            if fm:
                return jnp.zeros_like(s)
            if llm:
                return jnp.where(frozen, 0.0, s)
            return s
        f_mask_n = f_mask or jax.tree.map(lambda _: False, ll_mask)
        grad_norm = jnp.sqrt(sum(jax.tree.leaves(jax.tree.map(
            _leaf_sq, grads_for_norm, ll_mask, f_mask_n))))
        metrics = {
            "loss": loss,
            "lr": self.lr_fn(step),
            "wd": self.wd_fn(step),
            "teacher_momentum": m,
            "teacher_temp": t_temp,
            "grad_norm": grad_norm,
        }
        return new_state, metrics
