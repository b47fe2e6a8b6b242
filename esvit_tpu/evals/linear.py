"""Linear probe on frozen features (ref: eval_linear.py).

Protocol (eval_linear.py:43-320): frozen backbone; features are the concat
of avg-pooled outputs of the ``n_last_blocks`` (default 4) last blocks via
``forward_return_n_last_blocks``; a single linear classifier trained with
SGD momentum 0.9, zero weight decay, lr scaled by batch/256 and
cosine-annealed; top-1/top-5 on center-crop val.

Two training modes:

- **Reference protocol (default)**: each epoch re-forwards the frozen
  backbone on freshly RandomResizedCrop(224)+HorizontalFlip-augmented
  images (ref eval_linear.py:50-55 train_transform, :244-262 train loop).
  This is the published recipe — the one that reproduces the README table.
- **Cached (``cached_features=True``)**: center-crop features are extracted
  once and the probe trains on the cache. Much faster but NOT the reference
  protocol (no train-time augmentation; typically ~0.5-1% lower top-1).

Both are jitted end-to-end; val features are always cached (the val
transform is deterministic, so caching is numerically identical).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from esvit_tpu import config as config_lib
from esvit_tpu.data import datasets as datasets_lib
from esvit_tpu.evals.knn import (eval_transform, eval_transform_bytes,
                                 load_backbone_variables)
from esvit_tpu.models.registry import build_backbone
from esvit_tpu.utils import schedules


def feature_dim_for(model_cfg, n_last_blocks: int) -> int:
    """Probe input dim = sum of per-block dims of the n last blocks
    (ref: eval_linear.py:102-176 computes this per arch)."""
    if model_cfg.name == "swin":
        dims = []
        for i, d in enumerate(model_cfg.depths):
            dims += [int(model_cfg.embed_dim * 2 ** i)] * d
        return sum(dims[-n_last_blocks:])
    if model_cfg.name == "vit":
        return model_cfg.embed_dim * n_last_blocks
    if model_cfg.name in ("cvt", "vil"):
        dims = []
        for s in model_cfg.stages:
            dims += [s.embed_dim] * s.depth
        return sum(dims[-n_last_blocks:])
    if model_cfg.name == "resnet":
        return model_cfg.num_features        # avgpool only (ref :168-176)
    raise ValueError(f"unknown arch {model_cfg.name}")


def extract_probe_features(backbone, variables, dataset, *, n_last_blocks=4,
                           batch_size=64, size=224, num_threads=8):
    """Center-crop n-last-blocks features (threaded, multi-host-correct)."""
    from esvit_tpu.evals.extract import extract_dataset_features

    jfwd = jax.jit(lambda v, x: backbone.apply(
        v, x, n_last_blocks, method=backbone.forward_return_n_last_blocks))
    return extract_dataset_features(
        lambda x: jfwd(variables, jnp.asarray(x)), dataset,
        lambda img: eval_transform(img, size),
        batch_size=batch_size, num_threads=num_threads,
        transform_bytes=lambda data: eval_transform_bytes(data, size))


def make_probe(dim: int, num_classes: int, *, scaled_lr: float,
               total_steps: int, seed: int = 0):
    """(params, opt_state, jitted step): SGD momentum 0.9, wd 0, cosine LR
    (eval_linear.py:189-195); classifier init: trunc-normal(0.01) weights,
    zero bias (eval_linear.py:307-320)."""
    rng = np.random.default_rng(seed)
    params = {
        "w": jnp.asarray(np.clip(rng.normal(0, 0.01, (dim, num_classes)),
                                 -0.02, 0.02), jnp.float32),
        "b": jnp.zeros((num_classes,), jnp.float32),
    }
    opt = optax.sgd(lambda s: schedules.cosine_schedule(
        s, base_value=scaled_lr, final_value=0.0, total_steps=total_steps),
        momentum=0.9)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = x @ p["w"] + p["b"]
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return params, opt_state, step


def _probe_accuracy(params, test_f, test_l, num_classes):
    logits = np.asarray(jnp.asarray(test_f) @ params["w"] + params["b"])
    pred = np.argsort(-logits, axis=1)
    gt = test_l[:, None]
    top1 = 100.0 * (pred[:, :1] == gt).sum() / len(test_l)
    top5 = 100.0 * (pred[:, :min(5, num_classes)] == gt).any(1).sum() / len(test_l)
    return float(top1), float(top5)


def train_linear_probe(train_f, train_l, test_f, test_l, *, num_classes=None,
                       epochs=100, batch_size=256, lr=0.001, seed=0):
    """Cached-feature mode: probe trained on precomputed center-crop
    features (fast path; NOT the reference's augmented protocol)."""
    num_classes = num_classes or int(train_l.max()) + 1
    rng = np.random.default_rng(seed)
    n = len(train_f)
    steps_per_epoch = max(n // batch_size, 1)
    params, opt_state, step = make_probe(
        train_f.shape[1], num_classes, scaled_lr=lr * batch_size / 256.0,
        total_steps=epochs * steps_per_epoch, seed=seed)

    tf = jnp.asarray(train_f)
    tl = jnp.asarray(train_l)
    for epoch in range(epochs):
        perm = rng.permutation(n)[: steps_per_epoch * batch_size]
        for s in range(steps_per_epoch):
            idx = jnp.asarray(perm[s * batch_size:(s + 1) * batch_size])
            params, opt_state, loss = step(params, opt_state, tf[idx], tl[idx])

    top1, top5 = _probe_accuracy(params, test_f, test_l, num_classes)
    return params, top1, top5


class _AugmentedProbeView:
    """Dataset view applying the reference's linear-probe train transform:
    RandomResizedCrop(size, scale=(0.08, 1.0)) + RandomHorizontalFlip +
    normalize (ref eval_linear.py:50-55), with a fresh draw per (epoch,
    index) so every epoch sees new crops."""

    def __init__(self, dataset, *, size: int, seed: int, epoch: int):
        self.dataset = dataset
        self.size = size
        self.seed = seed
        self.epoch = epoch

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        import random as _random

        from esvit_tpu.data.augment_host import (IMAGENET_MEAN, IMAGENET_STD,
                                                 random_resized_crop)
        from PIL import Image

        img, label = self.dataset[int(i)]
        if img.mode != "RGB":
            img = img.convert("RGB")
        rng = _random.Random(hash((self.seed, self.epoch, int(i))))
        img = random_resized_crop(img, self.size, (0.08, 1.0), rng)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        x = np.asarray(img, np.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD, label


def train_linear_probe_online(backbone, variables, train_ds, test_f, test_l,
                              *, n_last_blocks=4, num_classes=None,
                              epochs=100, batch_size=256, lr=0.001, seed=0,
                              size=224, num_threads=8, log_every=None):
    """Reference protocol: per-epoch augmented forwards through the frozen
    backbone feeding the probe update directly (ref eval_linear.py:244-262).
    Each epoch walks this process's shard of the train set with fresh
    RRC+flip draws; features never touch the host between backbone and
    probe."""
    from esvit_tpu.evals.extract import iter_batches, strided_shard

    num_classes = num_classes or int(test_l.max()) + 1
    n = len(train_ds)
    pi, pc = jax.process_index(), jax.process_count()
    my = strided_shard(n, pi, pc)
    steps_per_epoch = max(len(my) // batch_size, 1)
    dim = feature_dim_for_backbone(backbone, n_last_blocks)
    params, opt_state, step = make_probe(
        dim, num_classes, scaled_lr=lr * batch_size / 256.0,
        total_steps=epochs * steps_per_epoch, seed=seed)
    fwd = jax.jit(lambda v, x: backbone.apply(
        v, x, n_last_blocks, method=backbone.forward_return_n_last_blocks))

    order_rng = np.random.default_rng(seed)
    for epoch in range(epochs):
        view = _AugmentedProbeView(train_ds, size=size, seed=seed,
                                   epoch=epoch)
        perm = my[order_rng.permutation(len(my))]
        perm = perm[: steps_per_epoch * batch_size]
        for x, y, n_real in iter_batches(view, perm, lambda a: a,
                                         batch_size,
                                         num_threads=num_threads):
            if n_real < batch_size:
                continue                 # drop ragged tail like DataLoader
            f = fwd(variables, jnp.asarray(x))
            params, opt_state, loss = step(params, opt_state, f,
                                           jnp.asarray(y))
        if log_every and (epoch + 1) % log_every == 0:
            t1, t5 = _probe_accuracy(params, test_f, test_l, num_classes)
            print(f"probe epoch {epoch + 1}: top1 {t1:.2f} top5 {t5:.2f}",
                  flush=True)

    top1, top5 = _probe_accuracy(params, test_f, test_l, num_classes)
    return params, top1, top5


def feature_dim_for_backbone(backbone, n_last_blocks: int) -> int:
    return feature_dim_for(backbone.cfg, n_last_blocks)


def run_linear_eval(backbone, variables, train_ds, val_ds, *, n_last_blocks=4,
                    epochs=100, batch_size=256, lr=0.001, feat_batch=64,
                    size=224, num_classes=None, cached_features=False,
                    seed=0):
    """cached_features=False (default) runs the reference protocol —
    per-epoch augmented forwards; True trains on a one-shot center-crop
    feature cache (fast, slightly below the published numbers)."""
    test_f, test_l = extract_probe_features(
        backbone, variables, val_ds, n_last_blocks=n_last_blocks,
        batch_size=feat_batch, size=size)
    if cached_features:
        train_f, train_l = extract_probe_features(
            backbone, variables, train_ds, n_last_blocks=n_last_blocks,
            batch_size=feat_batch, size=size)
        _, top1, top5 = train_linear_probe(
            train_f, train_l, test_f, test_l, epochs=epochs,
            batch_size=batch_size, lr=lr, num_classes=num_classes, seed=seed)
    else:
        _, top1, top5 = train_linear_probe_online(
            backbone, variables, train_ds, test_f, test_l,
            n_last_blocks=n_last_blocks, epochs=epochs,
            batch_size=batch_size, lr=lr, num_classes=num_classes,
            size=size, seed=seed)
    print(f"Linear probe: Top1 {top1:.2f}, Top5 {top5:.2f}", flush=True)
    return top1, top5


def main(argv=None):
    p = argparse.ArgumentParser("esvit_tpu linear eval")
    p.add_argument("--arch", default="swin_tiny", choices=sorted(config_lib.PRESETS))
    p.add_argument("--window_size", default=7, type=int)
    p.add_argument("--pretrained", default="")
    p.add_argument("--checkpoint_key", default="teacher")
    p.add_argument("--n_last_blocks", default=4, type=int)
    p.add_argument("--epochs", default=100, type=int)
    p.add_argument("--lr", default=0.001, type=float)
    p.add_argument("--batch_size", default=256, type=int)
    p.add_argument("--data_kind", default="folder")
    p.add_argument("--train_path", default="")
    p.add_argument("--val_path", default="")
    p.add_argument("--output_dir", default="./output")
    p.add_argument("--cached_features", default=False, action="store_true",
                   help="train the probe on one-shot center-crop features "
                        "instead of the reference's per-epoch augmented "
                        "forwards (faster; ~0.5-1%% below published numbers)")
    args = p.parse_args(argv)

    model_cfg = config_lib.get_model_config(
        args.arch, **({"window_size": args.window_size}
                      if args.arch.startswith("swin") else {}))
    backbone = build_backbone(model_cfg)
    variables = load_backbone_variables(backbone, model_cfg, args.pretrained,
                                        args.checkpoint_key)
    train_ds = datasets_lib.build_dataset(args.data_kind, root=args.train_path)
    val_ds = datasets_lib.build_dataset(args.data_kind, root=args.val_path)
    top1, top5 = run_linear_eval(
        backbone, variables, train_ds, val_ds,
        n_last_blocks=args.n_last_blocks, epochs=args.epochs,
        batch_size=args.batch_size, lr=args.lr,
        cached_features=args.cached_features)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
        f.write(json.dumps({"linear_top1": top1, "linear_top5": top5}) + "\n")


if __name__ == "__main__":
    main()
