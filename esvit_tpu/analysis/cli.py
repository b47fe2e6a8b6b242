"""Analysis CLI (ref: analyze_models.py:544-837).

Subcommands mirror the reference's driver:
- ``vis_attention``       attention-map grids per image (ref :752-776)
- ``vis_correspondence``  matched-region line plots between an image and
                          its flip (ref :680-687)
- ``measure_correspondence`` flip-invariance accuracy + pixel distance over
                          a dataset (ref :689-742)
- ``measure_entropy``     per-head attention entropy over a dataset
                          (ref :783-837)

``python -m esvit_tpu.analysis.cli vis_attention --arch swin_tiny
--pretrained ckpt.pth --data_path imgs/ --output_dir out/``
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from esvit_tpu import config as config_lib
from esvit_tpu.analysis import attention as attn_lib
from esvit_tpu.analysis import correspondence as corr_lib
from esvit_tpu.data import datasets as datasets_lib
from esvit_tpu.evals.knn import eval_transform, load_backbone_variables
from esvit_tpu.models.registry import build_backbone


def _load(args):
    model_cfg = config_lib.get_model_config(
        args.arch, **({"window_size": args.window_size}
                      if args.arch.startswith("swin") else {}))
    backbone = build_backbone(model_cfg)
    variables = load_backbone_variables(backbone, model_cfg, args.pretrained,
                                        args.checkpoint_key)
    ds = datasets_lib.build_dataset(args.data_kind, root=args.data_path)
    return backbone, variables, ds


def _batch(ds, n, size):
    imgs = [eval_transform(ds[i][0], size) for i in range(min(n, len(ds)))]
    return jnp.asarray(np.stack(imgs))


def vis_attention(args):
    backbone, variables, ds = _load(args)
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(min(args.num_images, len(ds))):
        x = _batch(ds, 1, args.image_size) if i == 0 else jnp.asarray(
            np.stack([eval_transform(ds[i][0], args.image_size)]))
        attn = attn_lib.attention_maps(backbone, variables, x, n=1)
        attn_lib.save_attention_grid(
            np.asarray(attn), os.path.join(args.output_dir, f"attn_{i}.png"))
    print(f"wrote {min(args.num_images, len(ds))} attention grids to "
          f"{args.output_dir}", flush=True)


def vis_correspondence(args):
    backbone, variables, ds = _load(args)
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(min(args.num_images, len(ds))):
        x = jnp.asarray(np.stack([eval_transform(ds[i][0], args.image_size)]))
        _, fea = backbone.apply(variables, x, deterministic=True)
        _, fea_f = backbone.apply(variables, x[:, :, ::-1, :],
                                  deterministic=True)
        img = np.asarray((x[0] - x[0].min()) / (x[0].max() - x[0].min()) * 255,
                         np.uint8)
        corr_lib.plot_correspondence(
            img, img[:, ::-1], np.asarray(fea[0]), np.asarray(fea_f[0]),
            os.path.join(args.output_dir, f"corr_{i}.png"))
    print(f"wrote correspondence plots to {args.output_dir}", flush=True)


def measure_correspondence(args):
    backbone, variables, ds = _load(args)
    imgs = _batch(ds, args.num_images, args.image_size)
    acc, dist = corr_lib.correspondence_accuracy(backbone, variables,
                                                 np.asarray(imgs))
    print(f"correspondence: acc {acc:.2f}% mean-dist {dist:.3f}", flush=True)
    _log(args, {"correspondence_acc": acc, "correspondence_dist": dist})


def measure_entropy(args):
    backbone, variables, ds = _load(args)
    imgs = _batch(ds, args.num_images, args.image_size)
    attns = attn_lib.attention_maps(backbone, variables, imgs, n=2)
    ents = [float(attn_lib.attention_entropy(np.asarray(a)).mean())
            for a in attns]
    print("per-block mean attention entropy:",
          [round(e, 4) for e in ents], flush=True)
    _log(args, {"attention_entropy": ents})


def _log(args, record):
    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "log.txt"), "a") as f:
        f.write(json.dumps(record) + "\n")


def main(argv=None):
    p = argparse.ArgumentParser("esvit_tpu analysis")
    p.add_argument("command", choices=["vis_attention", "vis_correspondence",
                                       "measure_correspondence",
                                       "measure_entropy"])
    p.add_argument("--arch", default="swin_tiny",
                   choices=sorted(config_lib.PRESETS))
    p.add_argument("--window_size", default=7, type=int)
    p.add_argument("--pretrained", default="")
    p.add_argument("--checkpoint_key", default="teacher")
    p.add_argument("--data_kind", default="folder")
    p.add_argument("--data_path", default="")
    p.add_argument("--image_size", default=224, type=int)
    p.add_argument("--num_images", default=8, type=int)
    p.add_argument("--output_dir", default="./analysis_out")
    args = p.parse_args(argv)
    {"vis_attention": vis_attention,
     "vis_correspondence": vis_correspondence,
     "measure_correspondence": measure_correspondence,
     "measure_entropy": measure_entropy}[args.command](args)


if __name__ == "__main__":
    main()
