"""Configuration tree for esvit_tpu.

Dataclass equivalent of the reference's two-level config (argparse flags +
YACS ``MODEL.SPEC`` tree, ``/root/reference/config/default.py:12-178`` and
``/root/reference/main_esvit.py:56-207``). One frozen dataclass tree carries
the same knob surface; presets mirror the canonical experiment YAMLs
(``/root/reference/experiments/imagenet/swin/*.yaml``).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax.numpy as jnp


def _tuple(x) -> tuple:
    return tuple(x) if isinstance(x, (list, tuple)) else (x,)


def _env_int(name: str, default: int):
    """default_factory reading an int env seed at config-instantiation time
    (the value is then RECORDED in the config, unlike a raw env read at
    trace time — two runs with different env can no longer silently trace
    different kernels without the difference showing in the saved config)."""
    return field(default_factory=lambda: int(os.environ.get(name, default)))


def _env_knob(name: str, default: int):
    """Like _env_int but the env value may be a comma list ('2,2,2,4') for
    a per-stage tuple."""
    def parse():
        v = os.environ.get(name)
        if v is None:
            return default
        return (tuple(int(s) for s in v.split(","))
                if "," in v else int(v))
    return field(default_factory=parse)


# ---------------------------------------------------------------------------
# Model specs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class SwinConfig:
    """Swin backbone spec (ref: models/swin_transformer.py:601-646)."""

    img_size: int = 224
    patch_size: int = 4
    in_chans: int = 3
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    norm_eps: float = 1e-6
    # 'packed' (default): the fused packed-window Pallas kernel
    # (ops/packed_window_attention.py) on TPU where a single call covers
    # all heads (stage-1 shapes; ~2x the XLA path there), falling back to
    # the XLA batched-matmul path everywhere else. 'xla': always the
    # batched-matmul path. 'pallas': the round-1 block-diagonal kernel,
    # kept for comparison.
    attention_impl: str = "packed"
    # Window-major stage layout: per-block pad/roll/partition copies become
    # one static gather per layout change. Numerically identical; neutral
    # on its own (XLA fuses the classic copies equally well — PERF.md) but
    # required by the block-fused kernel path, so on by default.
    layout_opt: bool = True
    # Attention score STORAGE dtype (MXU accumulation stays fp32 either
    # way; softmax is always taken in fp32). float32 is the default:
    # bfloat16 scores destabilize real training — the learning-validation
    # run diverges to NaN after ~1k steps with bf16 scores and trains
    # cleanly with fp32 (PERF.md round 2 regression hunt). bf16's 7-bit
    # mantissa is also NOT equivalent to torch AMP's fp16 scores (10-bit);
    # the original "AMP-matching" rationale was wrong. With the block-fused
    # kernel scores never leave VMEM, so fp32 storage costs ~nothing.
    score_dtype: str = "float32"
    # Gradient rematerialization: 'none' | 'block' (nn.remat each Swin
    # block: saves only block inputs, recomputes activations in backward —
    # trades ~1/3 more FLOPs for less HBM residual traffic).
    remat: str = "none"
    # Stages to run through the block-fused Pallas megakernel
    # (ops/fused_block.py): the whole Swin block — LN1 -> qkv -> window
    # attention -> proj -> drop-path residual -> LN2 -> MLP -> residual —
    # in one kernel call (one more for backward, which rematerializes from
    # the block input). Requires layout_opt=True (window-major tokens) and
    # a TPU backend; unsupported layouts fall back per stage. () disables.
    # Default: stages 0-2 (measured 22.0 -> 16.7 ms backbone fwd+bwd on
    # v5e; stage 3's C=768 backward exceeds the AOT compiler's budget —
    # PERF.md round 2).
    fused_block_stages: tuple[int, ...] = (0, 1, 2)
    # Run the fused block kernel in Pallas interpret mode (CPU parity tests).
    fused_block_interpret: bool = False
    # Virtual-pad-column path for single-padded-window shapes (Hp == ws >
    # H, e.g. the 96px crop branch's stage 3, where only 9 of 49 window
    # tokens are real): exact reference math — pad keys/values are the qkv
    # bias, so all pad columns collapse into one in-graph logsumexp column
    # (models/swin.py SwinBlock._subwindow). Removes the 5.4x pad waste
    # the round-4 profile measured at ~16 ms/step.
    subwindow_opt: bool = True
    # Stages allowed to run sub-window shapes through the fused megakernel
    # on the AUGMENTED window (H*W+1 tokens, SwinStage._forward_fused_
    # subwindow) instead of the XLA subwindow path. None = follow
    # fused_block_stages. A separate knob because the augmented kernel is
    # much smaller than a stage's full fused layout (e.g. stage-3@96 is
    # N=10/Np=16 at C=768 — cheap — while full stage-3 fusion measured
    # perf-neutral with a heavy Mosaic compile, PERF.md rounds 3-4).
    # Env-seeded (ESVIT_SUBWIN_FUSED_STAGES="0,1,2,3") so bench A/Bs record
    # the stage set in the run config, like the other kernel knobs.
    subwindow_fused_stages: tuple[int, ...] | None = field(
        default_factory=lambda: (
            tuple(int(s)
                  for s in os.environ["ESVIT_SUBWIN_FUSED_STAGES"].split(","))
            if os.environ.get("ESVIT_SUBWIN_FUSED_STAGES") else None))
    # Pad-ratio (ws^2 / real tokens) above which the subwindow path takes
    # priority over the fused megakernel when BOTH can run a single-
    # padded-window stage. 1.0 = subwindow always wins. Seeded from the
    # ESVIT_SUBWIN_RATIO env var at import so A/B runs record the value
    # in their saved config (authoritative here, like the other knobs).
    subwindow_ratio: float = float(os.environ.get("ESVIT_SUBWIN_RATIO",
                                                  "1.0"))
    # Kernel-dispatch tuning knobs (authoritative here so the chosen kernel
    # layout is recorded with the run config; the ESVIT_* env vars only seed
    # the defaults at config construction). packed_*: the packed
    # window-attention kernel (ops/packed_window_attention.py) — max
    # head-group calls before falling back to XLA, and the packed-score
    # column budget per call. fused_*: the block-fused megakernel
    # (ops/fused_block.py) — windows per score matmul, max heads per group,
    # target windows per grid step.
    packed_max_calls: int = _env_int("ESVIT_PACKED_MAX_CALLS", 1)
    packed_target_cols: int = _env_int("ESVIT_PACKED_TARGET_COLS", 2400)
    # fused_* accept an int (all stages) or a per-stage tuple: stage 3's
    # nH=24 wants a larger head group (fewer G loops -> the C=768 backward
    # fits the AOT compile budget) while stages 0-2 measured best at 3.
    fused_tw_mm: Any = _env_knob("ESVIT_FB_TWMM", 2)
    fused_hg_max: Any = _env_knob("ESVIT_FB_HG", 3)
    fused_g_step: Any = _env_knob("ESVIT_FB_GSTEP", 32)

    @property
    def kernel_knobs(self) -> tuple:
        """(packed_max_calls, packed_target_cols, tw_mm, hg_max, g_step) —
        the hashable bundle threaded through the Swin modules (stage-0
        values when the fused_* fields are per-stage tuples)."""
        return self.stage_kernel_knobs(0)

    def stage_kernel_knobs(self, i: int) -> tuple:
        """kernel_knobs resolved for stage ``i``: per-stage tuples index at
        min(i, len-1); plain ints apply to every stage."""
        pick = lambda v: (int(v[min(i, len(v) - 1)])
                          if isinstance(v, (tuple, list)) else int(v))
        return (self.packed_max_calls, self.packed_target_cols,
                pick(self.fused_tw_mm), pick(self.fused_hg_max),
                pick(self.fused_g_step))

    name: str = "swin"

    @property
    def num_features(self) -> int:
        return int(self.embed_dim * 2 ** (len(self.depths) - 1))


@dataclass(frozen=True)
class ViTConfig:
    """Monolithic ViT/DeiT spec (ref: models/vision_transformer.py:124-381)."""

    img_size: int = 224
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    qk_scale: float | None = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6

    name: str = "vit"

    @property
    def num_features(self) -> int:
        return self.embed_dim


@dataclass(frozen=True)
class CvTStageConfig:
    """One CvT-v4 stage (ref: models/cvt_v4_transformer.py:457-507 SPEC
    arrays: PATCH_SIZE/STRIDE/PADDING, DIM_EMBED, DEPTH, NUM_HEADS,
    MLP_RATIO, QKV_BIAS, KERNEL_QKV, PADDING_QKV, WINDOW_SIZE, SHIFT)."""

    patch_size: int = 7
    patch_stride: int = 4
    patch_padding: int = 2
    embed_dim: int = 64
    depth: int = 1
    num_heads: int = 1
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.0
    kernel_qkv: int = 3
    padding_qkv: int = 1
    window_size: int = 7
    shift: bool = False


@dataclass(frozen=True)
class CvTConfig:
    img_size: int = 224
    in_chans: int = 3
    stages: tuple[CvTStageConfig, ...] = ()
    norm_eps: float = 1e-5
    name: str = "cvt"

    @property
    def num_features(self) -> int:
        return self.stages[-1].embed_dim


@dataclass(frozen=True)
class ViLStageConfig:
    """One Vision-Longformer stage, decoded from the reference arch string
    'l1,h3,d96,n2,s1,g1,p4,f7,a0' (ref: models/vision_longformer.py:474-482)."""

    num_heads: int = 3
    embed_dim: int = 96
    depth: int = 2
    is_sparse: bool = True          # s: sliding-chunk attention vs full
    num_global: int = 1             # g: global CLS tokens
    patch_size: int = 4             # p: downsample factor entering the stage
    window_size: int = 7            # f: chunk/window size
    ape: bool = False               # a: absolute (factorized x/y) pos embed


@dataclass(frozen=True)
class ViLConfig:
    img_size: int = 224
    in_chans: int = 3
    stages: tuple[ViLStageConfig, ...] = ()
    attn_type: str = "longformer"   # longformer | full | performer | linformer | srformer
    # Sliding-chunk neighbor sampling (ref longformer2d.py:135-155 +
    # VIL_MODE_SWITCH config knob): mode>0 => during the first
    # mode_switch fraction of training, each step samples one random
    # neighbor chunk (memory saver); afterwards full 8-neighbor attention.
    mode: int = 0
    mode_switch: float = 0.5
    # Reference fidelity knob (longformer2d.py:151): the reference samples
    # the neighbor chunk independently PER LAYER per forward; by default we
    # sample once per net per step (one jit variant per mode). True restores
    # per-layer draws via a traced lax.switch over the 8 neighbor variants
    # (mode sentinel PER_LAYER_MODE, rng stream 'vil_mode').
    per_layer_mode: bool = False
    # Fused sliding-chunk Pallas kernel (ops/sliding_chunk_fused.py):
    # 'auto' (TPU backend only) | 'on' | 'interpret' | 'off'.
    fused_sc: str = "auto"
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    norm_eps: float = 1e-6
    name: str = "vil"

    @property
    def num_features(self) -> int:
        return self.stages[-1].embed_dim


@dataclass(frozen=True)
class ResNetConfig:
    """torchvision-style ResNet (ref: utils.py:621-665 ResNetWrapper)."""

    depth: int = 50
    in_chans: int = 3
    name: str = "resnet"

    @property
    def num_features(self) -> int:
        return 2048 if self.depth >= 50 else 512


ModelConfig = Any  # union of the specs above


# ---------------------------------------------------------------------------
# Head / loss / crops / optim
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HeadConfig:
    """DINO projection head (ref: models/vision_transformer.py:384-418)."""

    out_dim: int = 65536
    hidden_dim: int = 2048
    bottleneck_dim: int = 256
    nlayers: int = 3
    use_bn: bool = False
    norm_last_layer: bool = False   # False for Swin recipes (README commands)


@dataclass(frozen=True)
class LossConfig:
    """DINO/DDINO loss knobs (ref: main_esvit.py:603-770)."""

    out_dim: int = 65536
    use_dense_prediction: bool = True
    warmup_teacher_temp: float = 0.04
    teacher_temp: float = 0.07
    warmup_teacher_temp_epochs: int = 30
    student_temp: float = 0.1
    center_momentum: float = 0.9
    # K-streamed loss (losses.ddino_loss_streamed): fold the DINO-head
    # last layer into the loss and scan out_dim in chunks so (rows, 65536)
    # logits never hit HBM. Exact to fp reassociation (tested at the
    # train-step level). OFF by default: on v5e it measured SLOWER than
    # the dense path (147.8 -> 159.1 ms/step at 8 chunks, 164.6 at 2 —
    # the scan's 2-pass + backward-remat logit recomputes and lost XLA
    # fusion outweigh the ~2 GB of logits/softmax HBM it saves). Turn on
    # when HBM peak is the binding constraint (bigger per-chip batch).
    streamed: bool = False
    stream_chunks: int = 8


@dataclass(frozen=True)
class CropConfig:
    """Multi-crop geometry (ref: datasets/build.py:203-261)."""

    global_size: int = 224
    global_scale: tuple[float, float] = (0.4, 1.0)
    local_size: int = 96
    local_scale: tuple[float, float] = (0.05, 0.4)
    local_crops_number: int = 8

    @property
    def ncrops(self) -> int:
        return 2 + self.local_crops_number


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer + schedules (ref: main_esvit.py:96-140, utils.py:161-173)."""

    optimizer: str = "adamw"        # adamw | sgd | lars
    lr: float = 5e-4                # scaled by total_batch/256 at runtime
    min_lr: float = 1e-6
    warmup_epochs: int = 10
    weight_decay: float = 0.04
    weight_decay_end: float = 0.4
    momentum_teacher: float = 0.996
    clip_grad: float = 3.0          # per-parameter norm clip; 0 disables
    freeze_last_layer_epochs: int = 1
    epochs: int = 300
    batch_size_per_device: int = 32
    # Freeze named parameter subtrees for the whole run — the finetune
    # recipes' FINETUNE.FROZEN_LAYERS (ref swin_transformer.py:919-943
    # freeze_pretrained_layers). Keys of our param tree ('patch_embed',
    # 'layers_0', 'layers_0/blocks_1') or '*'; ref-style dots accepted.
    frozen_layers: tuple = ()
    # One-pass clip + AdamW + param apply + teacher EMA
    # (optim.fused_adamw_ema_apply) instead of the optax chain + separate
    # EMA tree_map. Bit-identical updates (tests/test_fused_optim.py) and
    # checkpoint-compatible state; adamw only (other optimizers ignore it).
    fused_update: bool = True


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh. data axis = DP; model axis = optional TP of the DINO head
    (the reference is DP-only, SURVEY.md §2.9)."""

    data: int = -1                  # -1: all devices
    model: int = 1


@dataclass(frozen=True)
class TrainConfig:
    model: Any = field(default_factory=SwinConfig)
    head: HeadConfig = field(default_factory=HeadConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    crops: CropConfig = field(default_factory=CropConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    mixup: Any = None               # data.mixup.MixupConfig | None
    seed: int = 0
    dtype: Any = jnp.bfloat16       # compute dtype (replaces AMP fp16)
    steps_per_epoch: int = 1251     # ImageNet-1K / 1024 default; set by data
    output_dir: str = "./output"
    save_every_epochs: int = 5

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# Presets (mirroring the canonical reference YAMLs)
# ---------------------------------------------------------------------------


def swin_tiny(window_size: int = 7, **kw) -> SwinConfig:
    """experiments/imagenet/swin/swin_tiny_patch4_window7_224.yaml"""
    return SwinConfig(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                      window_size=window_size, **kw)


def swin_small(window_size: int = 7, **kw) -> SwinConfig:
    return SwinConfig(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
                      window_size=window_size, **kw)


def swin_base(window_size: int = 7, **kw) -> SwinConfig:
    return SwinConfig(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                      window_size=window_size, **kw)


def deit_tiny(**kw) -> ViTConfig:
    return ViTConfig(embed_dim=192, depth=12, num_heads=3, **kw)


def deit_small(**kw) -> ViTConfig:
    return ViTConfig(embed_dim=384, depth=12, num_heads=6, **kw)


def vit_base(**kw) -> ViTConfig:
    return ViTConfig(embed_dim=768, depth=12, num_heads=12, **kw)


def cvt_tiny(**kw) -> CvTConfig:
    """experiments/imagenet/cvt_v4/s1.yaml: 4 stages, dims 64/192/384/768,
    heads 1/3/6/12, depths 2/2/6/2, window 7, no shift, no rel-pos."""
    dims = (64, 192, 384, 768)
    heads = (1, 3, 6, 12)
    depths = (2, 2, 6, 2)
    patches = ((7, 4, 2), (3, 2, 1), (3, 2, 1), (3, 2, 1))
    return CvTConfig(stages=tuple(
        CvTStageConfig(patch_size=p, patch_stride=s, patch_padding=pd,
                       embed_dim=d, depth=n, num_heads=h, drop_path_rate=0.1)
        for (p, s, pd), d, h, n in zip(patches, dims, heads, depths)), **kw)


def cvt_femto(**kw) -> CvTConfig:
    """Tiny CPU-testable CvT: 2 stages."""
    return CvTConfig(stages=(
        CvTStageConfig(patch_size=3, patch_stride=2, patch_padding=1,
                       embed_dim=16, depth=1, num_heads=2, window_size=4),
        CvTStageConfig(patch_size=3, patch_stride=2, patch_padding=1,
                       embed_dim=32, depth=1, num_heads=2, window_size=4),
    ), **kw)


def vil_from_arch(arch: str, **kw) -> ViLConfig:
    """Build from the reference MSVIT.ARCH string (vision_longformer.py:474)."""
    from esvit_tpu.models.vil import parse_vil_arch

    return ViLConfig(stages=parse_vil_arch(arch), **kw)


VIL_TINY_ARCH = ("l1,h1,d48,n1,s1,g1,p4,f7_l2,h3,d96,n1,s1,g1,p2,f7_"
                 "l3,h3,d192,n9,s0,g1,p2,f7_l4,h6,d384,n1,s0,g0,p2,f7")
VIL_SMALL_ARCH = ("l1,h3,d96,n2,s1,g1,p4,f7_l2,h3,d192,n2,s1,g1,p2,f7_"
                  "l3,h6,d384,n8,s0,g1,p2,f7_l4,h12,d768,n1,s0,g0,p2,f7")


def vil_tiny(**kw) -> ViLConfig:
    """experiments/imagenet/vil/vil_tiny/base.yaml MSVIT.ARCH."""
    return vil_from_arch(VIL_TINY_ARCH, **kw)


def vil_small(**kw) -> ViLConfig:
    """experiments/imagenet/vil/vil_small/base.yaml MSVIT.ARCH."""
    return vil_from_arch(VIL_SMALL_ARCH, **kw)


def vil_femto(**kw) -> ViLConfig:
    """Tiny CPU-testable ViL: sparse stage + full stage with global tokens."""
    kw.setdefault("img_size", 32)
    return vil_from_arch("l1,h2,d16,n1,s1,g1,p4,f2_l2,h2,d32,n1,s0,g1,p2,f2",
                         **kw)


def swin_femto(**kw) -> SwinConfig:
    """Tiny CPU-testable Swin: 2 stages, dim 16, 32px native. Exercises the
    same code paths (shifted windows, padding, merging) in milliseconds."""
    kw.setdefault("img_size", 32)
    kw.setdefault("embed_dim", 16)
    kw.setdefault("depths", (2, 2))
    kw.setdefault("num_heads", (2, 2))
    kw.setdefault("window_size", 4)
    return SwinConfig(**kw)


PRESETS = {
    "swin_femto": swin_femto,
    "cvt_femto": cvt_femto,
    "swin_tiny": swin_tiny,
    "swin_small": swin_small,
    "swin_base": swin_base,
    "deit_tiny": deit_tiny,
    "deit_small": deit_small,
    "vit_base": vit_base,
    "cvt_tiny": cvt_tiny,
    "vil_femto": vil_femto,
    "vil_tiny": vil_tiny,
    "vil_small": vil_small,
}


def get_model_config(name: str, **kw) -> ModelConfig:
    if name not in PRESETS:
        raise ValueError(f"unknown model preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name](**kw)
