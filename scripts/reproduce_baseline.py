"""Checkpoint-parity runbook: released .pth -> import -> k-NN -> linear.

One command reproduces the BASELINE.md accuracy gate for a released EsViT
checkpoint (ref README tables, SURVEY.md §6):

    python scripts/reproduce_baseline.py \
        --pth checkpoint_best.pth --imagenet /data/imagenet

which runs the torch importer (esvit_tpu/io/torch_import.py, the same
mapping every parity test exercises), extracts frozen teacher features on
train+val, runs the weighted k-NN protocol (ref eval_knn.py:192-232) and the
reference-protocol linear probe (ref eval_linear.py:244-262), and checks the
k-NN top-1 against the published number (75.7 +- 0.3 for Swin-T W=7 V+R).

Exit status: 0 if the gate passes (or no gate applies), 1 otherwise.
Smoke-tested in CI with a synthetic .pth + synthetic dataset
(tests/test_runbook.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Published numbers (ref README tables; SURVEY.md §6): (knn_top1, linear_top1)
# for V+R 300-epoch checkpoints.
GATES = {
    ("swin_tiny", 7): (75.7, 78.0),
    ("swin_small", 7): (77.7, 79.5),
    ("swin_base", 7): (78.9, 80.4),
    ("swin_tiny", 14): (77.0, 78.7),
    ("swin_small", 14): (79.1, 80.8),
    ("swin_base", 14): (79.3, 81.3),
    ("vil_tiny", 7): (74.5, 77.5),
    ("cvt_tiny", 7): (76.7, 78.5),
}


def main(argv=None):
    p = argparse.ArgumentParser("esvit_tpu baseline reproduction runbook")
    p.add_argument("--pth", required=True, help="released torch checkpoint")
    p.add_argument("--checkpoint_key", default="teacher")
    p.add_argument("--arch", default="swin_tiny")
    p.add_argument("--window_size", default=None, type=int)
    p.add_argument("--imagenet", default="",
                   help="root with train/ and val/ ImageFolder layouts")
    p.add_argument("--data_kind", default="folder")
    p.add_argument("--train_path", default="")
    p.add_argument("--val_path", default="")
    p.add_argument("--dataset_kw", default="{}",
                   help="JSON kwargs for the dataset builder (smoke tests)")
    p.add_argument("--batch_size", default=128, type=int)
    p.add_argument("--nb_knn", nargs="+", type=int, default=[10, 20])
    p.add_argument("--linear_epochs", default=100, type=int)
    p.add_argument("--n_last_blocks", default=4, type=int)
    p.add_argument("--skip_linear", action="store_true")
    p.add_argument("--gate_tol", default=0.3, type=float,
                   help="BASELINE.md allows +-0.3 on k-NN top-1")
    p.add_argument("--no_gate", action="store_true")
    p.add_argument("--output_dir", default="./output")
    args = p.parse_args(argv)

    from esvit_tpu import config as config_lib
    from esvit_tpu.data import datasets as datasets_lib
    from esvit_tpu.evals import knn as knn_lib
    from esvit_tpu.evals import linear as linear_lib
    from esvit_tpu.models.registry import build_backbone

    kw = {}
    if args.window_size is not None:
        kw["window_size"] = args.window_size
    model_cfg = config_lib.get_model_config(args.arch, **kw)
    backbone = build_backbone(model_cfg)

    print(f"[1/4] importing {args.pth} (key={args.checkpoint_key})", flush=True)
    variables = knn_lib.load_backbone_variables(
        backbone, model_cfg, args.pth, args.checkpoint_key)

    train_path = args.train_path or (args.imagenet and
                                     os.path.join(args.imagenet, "train"))
    val_path = args.val_path or (args.imagenet and
                                 os.path.join(args.imagenet, "val"))
    ds_kw = json.loads(args.dataset_kw)
    if args.data_kind == "folder":
        train_ds = datasets_lib.build_dataset("folder", root=train_path, **ds_kw)
        val_ds = datasets_lib.build_dataset("folder", root=val_path, **ds_kw)
    else:
        train_ds = datasets_lib.build_dataset(args.data_kind, **ds_kw)
        val_ds = datasets_lib.build_dataset(args.data_kind, **ds_kw)

    print(f"[2/4] k-NN eval ({len(train_ds)} train / {len(val_ds)} val)",
          flush=True)
    knn_results = knn_lib.run_knn_eval(
        backbone, variables, train_ds, val_ds, ks=tuple(args.nb_knn),
        batch_size=args.batch_size, size=model_cfg.img_size)
    best_knn = max(t1 for t1, _ in knn_results.values()) if knn_results else 0.0

    linear_top1 = None
    if not args.skip_linear:
        print("[3/4] linear probe (reference per-epoch augmented protocol)",
              flush=True)
        linear_top1, _ = linear_lib.run_linear_eval(
            backbone, variables, train_ds, val_ds,
            n_last_blocks=args.n_last_blocks, epochs=args.linear_epochs,
            batch_size=min(args.batch_size, len(train_ds)))
    else:
        print("[3/4] linear probe skipped", flush=True)

    gate = GATES.get((args.arch, getattr(model_cfg, "window_size", 0)))
    report = {
        "pth": args.pth, "arch": args.arch,
        "knn": {str(k): v for k, v in knn_results.items()},
        "best_knn_top1": best_knn,
        "linear_top1": linear_top1,
        "gate": gate, "gate_tol": args.gate_tol,
    }
    ok = True
    if gate and not args.no_gate:
        expect_knn, expect_lin = gate
        ok = best_knn >= expect_knn - args.gate_tol
        report["gate_pass"] = ok
        print(f"[4/4] gate: k-NN {best_knn:.2f} vs published "
              f"{expect_knn:.1f} +- {args.gate_tol} -> "
              f"{'PASS' if ok else 'FAIL'}", flush=True)
        if linear_top1 is not None:
            print(f"      linear {linear_top1:.2f} vs published "
                  f"{expect_lin:.1f} (informational)", flush=True)
    else:
        print(f"[4/4] no gate for ({args.arch}) — results informational",
              flush=True)

    os.makedirs(args.output_dir, exist_ok=True)
    with open(os.path.join(args.output_dir, "baseline_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report), flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
