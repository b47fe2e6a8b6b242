"""Import reference torch checkpoints into esvit_tpu param pytrees.

The released EsViT checkpoints (ref: main_esvit.py:476-488 save layout) store
``{'student': sd, 'teacher': sd, 'optimizer', 'epoch', 'args', 'dino_loss'}``
where each state_dict has backbone keys at the root plus ``head.*`` /
``head_dense.*`` (heads are attached as attributes, main_esvit.py:239-254),
with an optional ``module.`` DDP prefix (stripped like utils.py:78-103).

Layout conversions torch -> flax:
- Linear ``weight`` (out, in)        -> ``kernel`` (in, out)           [T]
- Conv2d ``weight`` (out, in, kh, kw)-> ``kernel`` (kh, kw, in, out)
- LayerNorm ``weight``/``bias``      -> ``ln/scale``, ``ln/bias``
- weight_norm ``weight_v`` (out, in) -> ``kernel_v`` (in, out),
  ``weight_g`` (out, 1)              -> ``scale_g`` (out,)
- ``relative_position_index`` / ``attn_mask`` buffers are dropped (static
  constants here).

This module is pure numpy + a minimal .pth reader; torch is only needed to
unpickle ``torch.save`` files (torch CPU is available in the image).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def load_torch_checkpoint(path: str, key: str = "teacher") -> dict[str, np.ndarray]:
    """Load a reference .pth and return a flat ``{torch_name: ndarray}`` for
    the requested model key ('teacher' for evals, like utils.py:78-103)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt[key] if key in ckpt else ckpt
    return {k.removeprefix("module."): _to_numpy(v) for k, v in sd.items()}


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for k in path[:-1]:
        node = node.setdefault(k, {})
    node[path[-1]] = value


def _linear(prefix_flax: tuple[str, ...], name: str, v: np.ndarray, out: dict):
    if name == "weight":
        _set(out, prefix_flax + ("kernel",), v.T)
    else:
        _set(out, prefix_flax + ("bias",), v)


def _layernorm(prefix_flax: tuple[str, ...], name: str, v: np.ndarray, out: dict):
    flax_name = "scale" if name == "weight" else "bias"
    _set(out, prefix_flax + ("ln", flax_name), v)


def _conv(prefix_flax: tuple[str, ...], name: str, v: np.ndarray, out: dict):
    if name == "weight":
        _set(out, prefix_flax + ("kernel",), v.transpose(2, 3, 1, 0))
    else:
        _set(out, prefix_flax + ("bias",), v)


def _import_dino_head(torch_sd: Mapping[str, np.ndarray], prefix: str) -> dict:
    """head.mlp.{0,2,4}.* -> mlp_{0,1,2}; last_layer weight_norm params.
    (torch Sequential indices skip the GELUs; with BN they'd differ — BN
    heads are handled by the bn index pattern too.)"""
    out: dict = {}
    lin_idx: dict[int, int] = {}
    # Collect Linear layer indices in Sequential order.
    seq = sorted({int(m.group(1)) for k in torch_sd
                  if (m := re.match(rf"{prefix}\.mlp\.(\d+)\.weight$", k))})
    for i, s in enumerate(seq):
        lin_idx[s] = i
    for k, v in torch_sd.items():
        if not k.startswith(prefix + "."):
            continue
        sub = k[len(prefix) + 1:]
        if m := re.match(r"mlp\.(\d+)\.(weight|bias)$", sub):
            _linear((f"mlp_{lin_idx[int(m.group(1))]}",), m.group(2), v, out)
        elif sub == "mlp.weight":       # nlayers == 1: plain Linear
            _set(out, ("mlp_0", "kernel"), v.T)
        elif sub == "mlp.bias":
            _set(out, ("mlp_0", "bias"), v)
        elif sub == "last_layer.weight_v":
            _set(out, ("last_layer", "kernel_v"), v.T)
        elif sub == "last_layer.weight_g":
            _set(out, ("last_layer", "scale_g"), v.reshape(-1))
    return out


def import_swin_backbone(torch_sd: Mapping[str, np.ndarray]) -> dict:
    """Map reference Swin state_dict (models/swin_transformer.py naming) to
    our SwinTransformer variables: {'params': tree}."""
    out: dict = {}
    for k, v in torch_sd.items():
        if k.startswith(("head.", "head_dense.")):
            continue
        if "relative_position_index" in k or "attn_mask" in k:
            continue
        parts = k.split(".")
        if k == "absolute_pos_embed":
            _set(out, ("absolute_pos_embed",), v)
        elif parts[0] == "patch_embed":
            if parts[1] == "proj":
                _conv(("patch_embed", "proj"), parts[2], v, out)
            else:  # norm
                _layernorm(("patch_embed", "norm"), parts[2], v, out)
        elif parts[0] == "layers":
            i = parts[1]
            if parts[2] == "blocks":
                j = parts[3]
                base = (f"layers_{i}", f"blocks_{j}")
                mod, rest = parts[4], parts[5:]
                if mod in ("norm1", "norm2"):
                    _layernorm(base + (mod,), rest[0], v, out)
                elif mod == "attn":
                    if rest[0] == "relative_position_bias_table":
                        _set(out, base + ("attn", "relative_position_bias_table"), v)
                    else:  # qkv / proj linears
                        _linear(base + ("attn", rest[0]), rest[1], v, out)
                elif mod == "mlp":
                    _linear(base + ("mlp", rest[0]), rest[1], v, out)
            elif parts[2] == "downsample":
                base = (f"layers_{i}", "downsample")
                if parts[3] == "norm":
                    _layernorm(base + ("norm",), parts[4], v, out)
                else:  # reduction (bias-free Linear)
                    _linear(base + ("reduction",), parts[4], v, out)
        elif parts[0] == "norm":
            _layernorm(("norm_final",), parts[1], v, out)
    return {"params": out}


def import_vit_backbone(torch_sd: Mapping[str, np.ndarray]) -> dict:
    """Map reference ViT state_dict (models/vision_transformer.py naming)."""
    out: dict = {}
    for k, v in torch_sd.items():
        if k.startswith(("head.", "head_dense.")):
            continue
        parts = k.split(".")
        if k == "cls_token":
            _set(out, ("cls_token",), v)
        elif k == "pos_embed":
            _set(out, ("pos_embed",), v)
        elif parts[0] == "patch_embed" and parts[1] == "proj":
            _conv(("patch_embed",), parts[2], v, out)
        elif parts[0] == "blocks":
            i = parts[1]
            base = (f"blocks_{i}",)
            mod, rest = parts[2], parts[3:]
            if mod in ("norm1", "norm2"):
                _layernorm(base + (mod,), rest[0], v, out)
            elif mod == "attn":
                _linear(base + ("attn", rest[0]), rest[1], v, out)
            elif mod == "mlp":
                _linear(base + ("mlp", rest[0]), rest[1], v, out)
        elif parts[0] == "norm":
            _layernorm(("norm_final",), parts[1], v, out)
    return {"params": out}


def import_cvt_backbone(torch_sd: Mapping[str, np.ndarray]) -> dict:
    """Map reference CvT-v4 state_dict (models/cvt_v4_transformer.py naming:
    stage{i}.0 = ConvEmbed, stage{i}.1.layers.{j}.[0|1] = PreNorm(attn|ff),
    .2 = DropPath) to our CvT variables: {'params', 'batch_stats'}."""
    params: dict = {}
    stats: dict = {}
    for k, v in torch_sd.items():
        if k.startswith(("head.", "head_dense.")) or "rel_pos_idx" in k:
            continue
        if "num_batches_tracked" in k:
            continue
        parts = k.split(".")
        if parts[0].startswith("stage"):
            i = parts[0][len("stage"):]
            if parts[1] == "0":              # ConvEmbed
                if parts[2] == "proj":
                    _conv((f"embed_{i}", "proj"), parts[3], v, params)
                else:
                    _layernorm((f"embed_{i}", "norm"), parts[3], v, params)
            elif parts[1] == "1":            # Transformer.layers.j.(0|1)
                j, which = parts[3], parts[4]
                base = (f"stage{i}_block{j}",)
                rest = parts[5:]
                if which == "0":             # PreNorm(attention)
                    if rest[0] == "norm":
                        _layernorm(base + ("norm_attn",), rest[1], v, params)
                    elif rest[:2] == ["fn", "qkv"]:
                        sub = rest[2]
                        if sub == "dw":
                            _conv(base + ("attn", "qkv", "dw"), rest[3], v, params)
                        elif sub == "pw":
                            _conv(base + ("attn", "qkv", "pw"), rest[3], v, params)
                        elif sub == "bn":
                            name = rest[3]
                            if name == "weight":
                                _set(params, base + ("attn", "qkv", "bn", "scale"), v)
                            elif name == "bias":
                                _set(params, base + ("attn", "qkv", "bn", "bias"), v)
                            elif name == "running_mean":
                                _set(stats, base + ("attn", "qkv", "bn", "mean"), v)
                            elif name == "running_var":
                                _set(stats, base + ("attn", "qkv", "bn", "var"), v)
                    elif rest[:2] == ["fn", "proj_out"]:
                        _conv(base + ("attn", "proj_out"), rest[2], v, params)
                    elif rest[:2] == ["fn", "rel_pos_bias_table"]:
                        _set(params, base + ("attn", "rel_pos_bias_table"), v)
                elif which == "1":           # PreNorm(feedforward)
                    if rest[0] == "norm":
                        _layernorm(base + ("norm_ff",), rest[1], v, params)
                    elif rest[:2] == ["fn", "net"]:
                        idx = {"0": "ff_1", "2": "ff_2"}[rest[2]]
                        _conv(base + (idx,), rest[3], v, params)
        elif parts[0] == "norm":
            _layernorm(("norm_final",), parts[1], v, params)
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def import_vil_backbone(torch_sd: Mapping[str, np.ndarray]) -> dict:
    """Map reference MsViT state_dict (models/vision_longformer.py naming:
    layer{s}.0 = PatchEmbed, layer{s}.{2j+1} = AttnBlock,
    layer{s}.{2j+2} = MlpBlock) to our MsViT param tree."""
    out: dict = {}
    for k, v in torch_sd.items():
        if k.startswith(("head.", "head_dense.")):
            continue
        if "relative_position_index" in k or "calls_since_last_redraw" in k:
            continue
        parts = k.split(".")
        if parts[0].startswith("layer") and parts[0] != "layers":
            i = int(parts[0][len("layer"):]) - 1          # layer1 -> stage 0
            seq = int(parts[1])
            rest = parts[2:]
            if seq == 0:                                  # PatchEmbed
                base = (f"embed_{i}",)
                if rest[0] == "proj":
                    _conv(base + ("proj",), rest[1], v, out)
                elif rest[0] == "norm_embed":
                    _layernorm(base + ("norm_embed",), rest[1], v, out)
                elif rest[0] in ("cls_token", "cls_pos_embed",
                                 "x_pos_embed", "y_pos_embed"):
                    _set(out, base + (rest[0],), v)
            else:
                j = (seq - 1) // 2
                is_attn = (seq - 1) % 2 == 0
                base = (f"stage{i}_attn{j}",) if is_attn else (f"stage{i}_mlp{j}",)
                if rest[0] == "norm":
                    _layernorm(base + ("norm",), rest[1], v, out)
                elif rest[0] == "attn":
                    sub = rest[1]
                    if sub in ("qkv", "query", "kv", "proj", "query_global",
                               "kv_global", "proj_global"):
                        _linear(base + ("attn", sub), rest[2], v, out)
                    elif sub in ("local_relative_position_bias_table",
                                 "g2l_relative_position_bias",
                                 "g2g_relative_position_bias"):
                        _set(out, base + ("attn", sub), v)
                    elif sub in ("proj_k", "proj_v"):     # linformer
                        _set(out, base + ("attn", sub), v)
                    elif sub == "proj_sr":                # srformer
                        _conv(base + ("attn", "proj_sr"), rest[2], v, out)
                elif rest[0] == "mlp":
                    _linear(base + ("mlp", rest[1]), rest[2], v, out)
        elif parts[0] == "norm":
            _layernorm(("norm_final",), parts[1], v, out)
    return {"params": out}


_BACKBONE_IMPORTERS = {
    "swin": import_swin_backbone,
    "vit": import_vit_backbone,
    "cvt": import_cvt_backbone,
    "vil": import_vil_backbone,
}


def import_esvit_model(torch_sd: Mapping[str, np.ndarray], arch: str,
                       use_dense_prediction: bool = True) -> dict:
    """Full EsViTModel variables {'params': {'backbone', 'head'[, 'head_dense']}
    [, 'batch_stats': ...]}."""
    if arch not in _BACKBONE_IMPORTERS:
        raise ValueError(f"no importer for arch {arch!r}")
    bb = _BACKBONE_IMPORTERS[arch](torch_sd)
    variables: dict = {"params": {"backbone": bb["params"]}}
    if "batch_stats" in bb:
        variables["batch_stats"] = {"backbone": bb["batch_stats"]}
    if any(k.startswith("head.") for k in torch_sd):
        variables["params"]["head"] = _import_dino_head(torch_sd, "head")
    if use_dense_prediction and any(k.startswith("head_dense.") for k in torch_sd):
        variables["params"]["head_dense"] = _import_dino_head(torch_sd, "head_dense")
    return variables


def adapt_swin_tables(imported: dict, target: Any) -> dict:
    """Cross-window-size / resolution checkpoint adaptation
    (ref: swin_transformer.py:852-917 init_weights): bicubic-resize
    relative-position bias tables ((2w-1)^2, nH) and the absolute pos-embed
    when the imported shapes differ from the target model's — using
    torch-interpolate semantics (ops/resample.py) like the reference.

    imported/target: matching nested dicts (imported values np, target
    values array-likes giving the wanted shapes). Returns a new tree.
    """
    import jax
    import jax.numpy as jnp

    from esvit_tpu.ops.resample import torch_bicubic_resize

    def walk(imp, tgt, key=""):
        if not isinstance(imp, dict):
            want = tuple(np.shape(tgt))
            have = tuple(np.shape(imp))
            if have == want:
                return imp
            if key == "relative_position_bias_table":
                L1, nH = have
                L2, _ = want
                s1, s2 = int(np.sqrt(L1)), int(np.sqrt(L2))
                grid = jnp.asarray(imp).reshape(s1, s1, nH)
                out = torch_bicubic_resize(grid[None], s2, s2)[0]
                return np.asarray(out).reshape(L2, nH)
            if key == "absolute_pos_embed":
                _, L1, C = have
                _, L2, _ = want
                s1, s2 = int(np.sqrt(L1)), int(np.sqrt(L2))
                grid = jnp.asarray(imp).reshape(1, s1, s1, C)
                out = torch_bicubic_resize(grid, s2, s2)
                return np.asarray(out).reshape(1, L2, C)
            return imp          # let verify_tree_matches flag other cases
        return {k: walk(v, tgt[k], k) if k in tgt else v
                for k, v in imp.items()}

    return walk(imported, target)


def verify_tree_matches(imported: Any, reference: Any, path: str = "") -> list[str]:
    """Structural diff of two nested dicts of arrays: missing/extra/shape
    mismatches, as human-readable strings (empty == perfect match)."""
    problems = []
    ikeys = set(imported) if isinstance(imported, dict) else None
    rkeys = set(reference) if isinstance(reference, dict) else None
    if ikeys is None or rkeys is None:
        ish = getattr(imported, "shape", None)
        rsh = getattr(reference, "shape", None)
        if ish != rsh:
            problems.append(f"{path}: shape {ish} != expected {rsh}")
        return problems
    for k in sorted(rkeys - ikeys):
        problems.append(f"{path}/{k}: missing from import")
    for k in sorted(ikeys - rkeys):
        problems.append(f"{path}/{k}: unexpected in import")
    for k in sorted(ikeys & rkeys):
        problems += verify_tree_matches(imported[k], reference[k], f"{path}/{k}")
    return problems
