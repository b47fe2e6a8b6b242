"""Weighted k-NN evaluation on frozen features (ref: eval_knn.py).

Protocol (eval_knn.py:46-232): center-crop eval transform, teacher backbone
cls features, L2-normalize, then a weighted vote over the k nearest train
features with temperature-softened cosine similarity:
``w = exp(sim / T)``, T=0.07, k in {10, 20, 100, 200}.

TPU-native: feature extraction is one jitted batched forward; the k-NN
classification is a jitted chunked similarity matmul (the reference chunks
into 100 pieces on GPU, eval_knn.py:199-229 — same idea, MXU-sized chunks).
Multi-process: per-host shards are all-gathered with
``jax.experimental.multihost_utils`` when process_count > 1.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from esvit_tpu import config as config_lib
from esvit_tpu.data import datasets as datasets_lib
from esvit_tpu.data.augment_host import IMAGENET_MEAN, IMAGENET_STD
from esvit_tpu.models.registry import build_backbone


def eval_transform(img: Image.Image, size: int = 224) -> np.ndarray:
    """Resize(256, bicubic) + center-crop(224) + normalize
    (ref: eval_knn.py:48-53)."""
    scale = 256 / min(img.size)
    img = img.resize((round(img.width * scale), round(img.height * scale)),
                     Image.BICUBIC)
    left = (img.width - size) // 2
    top = (img.height - size) // 2
    img = img.crop((left, top, left + size, top + size))
    x = np.asarray(img.convert("RGB"), np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def eval_transform_bytes(data: bytes, size: int = 224):
    """``eval_transform`` from raw JPEG bytes via the native C++ path
    (esvit_tpu/native), or None to fall back to PIL.

    Resize(256)+CenterCrop(size) folds into ONE fused crop+resize: PIL's
    convolution resampler computes output pixel (left+xx) of the full
    resize with source center ((left+xx)+0.5)*scale — identical to the
    box-resample centers with box origin left*scale — so cropping after
    resizing equals resampling the back-projected crop box directly
    (within the +/-1 LSB float-vs-fixed accumulation difference the
    native tests pin).
    """
    from esvit_tpu import native

    if not native.available():
        return None
    dims = native.jpeg_dims(data)
    if dims is None:
        return None
    w0, h0 = dims
    scale = 256 / min(w0, h0)
    rw, rh = round(w0 * scale), round(h0 * scale)
    if rw < size or rh < size:
        return None
    sx, sy = w0 / rw, h0 / rh
    left, top = (rw - size) // 2, (rh - size) // 2
    box = np.array([[top * sy, left * sx, size * sy, size * sx]], np.float64)
    views = native.decode_multicrop(data, box, [size])
    if views is None:
        return None
    x = views[0].astype(np.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def extract_features(apply_fn, variables, dataset, *, batch_size: int = 64,
                     size: int = 224, dtype=jnp.float32,
                     num_threads: int = 8):
    """(features (N, C) L2-normalized f32, labels (N,)) for a dataset.

    Threaded decode + per-process strided sharding + exact-once multi-host
    merge (evals/extract.py; ref eval_knn.py:148-189)."""
    from esvit_tpu.evals.extract import extract_dataset_features

    jfwd = jax.jit(lambda v, x: apply_fn(v, x)[0])
    fwd = lambda x: jfwd(variables, jnp.asarray(x, dtype))
    f, lab_arr = extract_dataset_features(
        fwd, dataset, lambda img: eval_transform(img, size),
        batch_size=batch_size, num_threads=num_threads,
        transform_bytes=lambda data: eval_transform_bytes(data, size))
    f /= np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    return f, lab_arr


@functools.partial(jax.jit, static_argnames=("k", "num_classes", "T"))
def _knn_chunk(train_f, train_l, test_f, *, k: int, num_classes: int,
               T: float):
    """Weighted vote for one test chunk (eval_knn.py:199-229 math)."""
    sim = test_f @ train_f.T                              # (b, N)
    topv, topi = jax.lax.top_k(sim, k)                    # (b, k)
    w = jnp.exp(topv / T)
    nl = train_l[topi]                                    # (b, k)
    onehot = jax.nn.one_hot(nl, num_classes, dtype=w.dtype)
    scores = jnp.einsum("bk,bkc->bc", w, onehot)
    return jnp.argsort(-scores, axis=1)                   # ranked classes


def knn_classifier(train_f: np.ndarray, train_l: np.ndarray,
                   test_f: np.ndarray, test_l: np.ndarray, *, k: int,
                   T: float = 0.07, num_classes: Optional[int] = None,
                   chunk: int = 512) -> tuple[float, float]:
    """Top-1/top-5 accuracy (%) of the weighted k-NN vote."""
    num_classes = num_classes or int(train_l.max()) + 1
    tf = jnp.asarray(train_f)
    tl = jnp.asarray(train_l)
    top1 = top5 = 0
    n = len(test_f)
    for s in range(0, n, chunk):
        tfc = test_f[s:s + chunk]
        pad = chunk - len(tfc)
        if pad:
            tfc = np.concatenate([tfc, np.zeros((pad, tfc.shape[1]), tfc.dtype)])
        ranked = np.asarray(_knn_chunk(tf, tl, jnp.asarray(tfc), k=k,
                                       num_classes=num_classes, T=T))
        ranked = ranked[:len(test_f[s:s + chunk])]
        gt = test_l[s:s + chunk, None]
        top1 += int((ranked[:, :1] == gt).sum())
        top5 += int((ranked[:, :min(5, num_classes)] == gt).any(1).sum())
    return 100.0 * top1 / n, 100.0 * top5 / n


def run_knn_eval(backbone, variables, train_ds, val_ds, *,
                 ks=(10, 20, 100, 200), T: float = 0.07,
                 batch_size: int = 64, size: int = 224,
                 dump_dir: Optional[str] = None,
                 load_dir: Optional[str] = None):
    """Full protocol: extract (or load dumped features), optionally dump,
    classify at each k (ref: eval_knn.py:138-144, 291-295)."""
    if load_dir:
        train_f = np.load(os.path.join(load_dir, "trainfeat.npy"))
        test_f = np.load(os.path.join(load_dir, "testfeat.npy"))
        train_l = np.load(os.path.join(load_dir, "trainlabels.npy"))
        test_l = np.load(os.path.join(load_dir, "testlabels.npy"))
    else:
        apply_fn = lambda v, x: backbone.apply(v, x, deterministic=True)
        train_f, train_l = extract_features(apply_fn, variables, train_ds,
                                            batch_size=batch_size, size=size)
        test_f, test_l = extract_features(apply_fn, variables, val_ds,
                                          batch_size=batch_size, size=size)
    if dump_dir and not load_dir:
        os.makedirs(dump_dir, exist_ok=True)
        np.save(os.path.join(dump_dir, "trainfeat.npy"), train_f)
        np.save(os.path.join(dump_dir, "testfeat.npy"), test_f)
        np.save(os.path.join(dump_dir, "trainlabels.npy"), train_l)
        np.save(os.path.join(dump_dir, "testlabels.npy"), test_l)
    results = {}
    for k in ks:
        if k >= len(train_f):
            continue
        t1, t5 = knn_classifier(train_f, train_l, test_f, test_l, k=k, T=T)
        results[k] = (t1, t5)
        print(f"{k}-NN classifier result: Top1: {t1:.2f}, Top5: {t5:.2f}",
              flush=True)
    return results


def main(argv=None):
    p = argparse.ArgumentParser("esvit_tpu k-NN eval")
    p.add_argument("--arch", default="swin_tiny", choices=sorted(config_lib.PRESETS))
    p.add_argument("--window_size", default=7, type=int)
    p.add_argument("--pretrained", default="", help=".pth or orbax checkpoint")
    p.add_argument("--checkpoint_key", default="teacher")
    p.add_argument("--data_kind", default="folder")
    p.add_argument("--train_path", default="")
    p.add_argument("--val_path", default="")
    p.add_argument("--batch_size", default=64, type=int)
    p.add_argument("--temperature", default=0.07, type=float)
    p.add_argument("--nb_knn", nargs="+", type=int, default=[10, 20, 100, 200])
    p.add_argument("--dump_features", default="")
    p.add_argument("--load_features", default="")
    p.add_argument("--output_dir", default="./output")
    args = p.parse_args(argv)

    model_cfg = config_lib.get_model_config(
        args.arch, **({"window_size": args.window_size}
                      if args.arch.startswith("swin") else {}))
    backbone = build_backbone(model_cfg)
    if args.load_features:
        variables = train_ds = val_ds = None
    else:
        variables = load_backbone_variables(backbone, model_cfg,
                                            args.pretrained,
                                            args.checkpoint_key)
        train_ds = datasets_lib.build_dataset(args.data_kind,
                                              root=args.train_path)
        val_ds = datasets_lib.build_dataset(args.data_kind, root=args.val_path)
    results = run_knn_eval(backbone, variables, train_ds, val_ds,
                           ks=tuple(args.nb_knn), T=args.temperature,
                           batch_size=args.batch_size,
                           dump_dir=args.dump_features or None,
                           load_dir=args.load_features or None)
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
        f.write(json.dumps({f"{k}nn_top1": v[0] for k, v in results.items()})
                + "\n")


def load_backbone_variables(backbone, model_cfg, pretrained: str,
                            checkpoint_key: str = "teacher"):
    """Init then overwrite from a torch .pth (via the importer) or an orbax
    train-state checkpoint (teacher params)."""
    from esvit_tpu.io import torch_import

    x0 = jnp.zeros((1, model_cfg.img_size, model_cfg.img_size, 3))
    variables = jax.jit(
        lambda r: backbone.init({"params": r}, x0, deterministic=True)
    )(jax.random.PRNGKey(0))
    if not pretrained:
        print("no pretrained weights — random features", flush=True)
        return variables
    if pretrained.endswith((".pth", ".pt")):
        sd = torch_import.load_torch_checkpoint(pretrained, checkpoint_key)
        arch = getattr(model_cfg, "name", "swin")
        imported = torch_import._BACKBONE_IMPORTERS[arch](sd)
        if arch == "swin":
            # window-size / resolution adaptation (swin init_weights parity)
            imported["params"] = torch_import.adapt_swin_tables(
                imported["params"], jax.tree.map(np.asarray,
                                                 variables["params"]))
        return jax.tree.map(jnp.asarray, imported)
    # orbax: restore the TrainState and take the teacher backbone subtree
    import orbax.checkpoint as ocp

    raw = ocp.StandardCheckpointer().restore(os.path.abspath(pretrained))
    params = raw[checkpoint_key]["backbone"]
    return {"params": jax.tree.map(jnp.asarray, params)}


if __name__ == "__main__":
    main()
