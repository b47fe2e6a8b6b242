"""Region-correspondence analysis (ref: analyze_models.py:244-539).

Given two augmented views, the EsViT region task implicitly learns a
matching: each region of view A matches its cosine-argmax region in view B.

- ``match_regions``: the argmax matching (same math as DDINOLoss's
  region_sim_matrix, main_esvit.py:735-738).
- ``correspondence_accuracy``: flip-invariance protocol
  (analyze_models.py:244-354) — view B is the horizontal flip of A, so the
  ground-truth match of grid cell (i, j) is (i, W-1-j); reports top-1 match
  accuracy and mean pixel distance error of the best matches.
- ``plot_correspondence``: top-k matched-pair line plot between two images.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def _l2n(x, axis=-1):
    return x / np.maximum(np.linalg.norm(x, axis=axis, keepdims=True), 1e-12)


def match_regions(fea_a: np.ndarray, fea_b: np.ndarray):
    """fea_* (N, C) -> (match_idx (N,), sim (N,)): argmax cosine match of
    each A-region into B."""
    sim = _l2n(fea_a) @ _l2n(fea_b).T
    idx = sim.argmax(1)
    return idx, sim[np.arange(len(idx)), idx]


def correspondence_accuracy(backbone, variables, images: np.ndarray,
                            patch_grid: Optional[tuple[int, int]] = None):
    """Flip-invariance correspondence over a batch of images (NHWC).

    Returns (accuracy %, mean pixel distance of mismatches in grid cells).
    """
    import jax.numpy as jnp

    x = jnp.asarray(images)
    x_flip = x[:, :, ::-1, :]
    _, fea = backbone.apply(variables, x, deterministic=True)
    _, fea_f = backbone.apply(variables, x_flip, deterministic=True)
    fea = np.asarray(fea, np.float32)
    fea_f = np.asarray(fea_f, np.float32)
    B, N, _ = fea.shape
    if patch_grid is None:
        s = int(np.sqrt(N))
        patch_grid = (s, s)
    H, W = patch_grid

    gt = np.arange(N).reshape(H, W)[:, ::-1].reshape(-1)   # (i,j)->(i,W-1-j)
    correct = 0
    dist_sum = 0.0
    for b in range(B):
        idx, _ = match_regions(fea[b], fea_f[b])
        correct += int((idx == gt).sum())
        yi, xi = np.divmod(idx, W)
        yg, xg = np.divmod(gt, W)
        dist_sum += float(np.sqrt((yi - yg) ** 2 + (xi - xg) ** 2).mean())
    return 100.0 * correct / (B * N), dist_sum / B


def plot_correspondence(img_a: np.ndarray, img_b: np.ndarray,
                        fea_a: np.ndarray, fea_b: np.ndarray,
                        out_path: str, *, top_k: int = 10,
                        grid: Optional[tuple[int, int]] = None) -> None:
    """Line plot of the top-k most-similar matched region pairs
    (ref: analyze_models.py:358-539)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    N = fea_a.shape[0]
    if grid is None:
        s = int(np.sqrt(N))
        grid = (s, s)
    H, W = grid
    idx, sim = match_regions(fea_a, fea_b)
    best = np.argsort(-sim)[:top_k]

    h_img = img_a.shape[0]
    cell_a = h_img / H
    canvas = np.concatenate([img_a, img_b], axis=1)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.imshow(canvas.astype(np.uint8) if canvas.dtype != np.uint8 else canvas)
    for r in best:
        ya, xa = divmod(int(r), W)
        yb, xb = divmod(int(idx[r]), W)
        ax.plot([(xa + 0.5) * cell_a, img_a.shape[1] + (xb + 0.5) * cell_a],
                [(ya + 0.5) * cell_a, (yb + 0.5) * cell_a],
                marker="o", markersize=3, linewidth=1)
    ax.axis("off")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
