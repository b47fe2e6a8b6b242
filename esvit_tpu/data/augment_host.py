"""Host-side (CPU/PIL) DINO multi-crop augmentation.

Replicates the reference pipeline exactly (ref: datasets/build.py:203-261
DataAugmentationDINO; utils.py:43-75 GaussianBlur/Solarization), using PIL
directly since torchvision isn't a dependency:

- global crop 1: RandomResizedCrop(224, scale=global_scale, bicubic) + flip
  + color-jitter(0.4,0.4,0.2,0.1)@p0.8 + grayscale@p0.2 + blur(p=1.0)
- global crop 2: same but blur p=0.1 and solarize p=0.2
- local crops:   RandomResizedCrop(local_size, scale=local_scale) + flip
  + jitter + grayscale + blur(p=0.5)
- all: normalize with ImageNet mean/std.

RandomResizedCrop parameter sampling mirrors torchvision's: 10 attempts of
(area-scale, log-uniform aspect in 3/4..4/3), then a center-crop fallback.
"""

from __future__ import annotations

import math
import random
from dataclasses import dataclass
from typing import Sequence

import numpy as np
from PIL import Image, ImageEnhance, ImageFilter, ImageOps

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def sample_rrc_params(rng: random.Random, width: int, height: int,
                      scale: tuple[float, float],
                      ratio: tuple[float, float] = (3 / 4, 4 / 3)):
    """(top, left, h, w) — torchvision RandomResizedCrop.get_params logic."""
    area = width * height
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        w = int(round(math.sqrt(target_area * aspect)))
        h = int(round(math.sqrt(target_area / aspect)))
        if 0 < w <= width and 0 < h <= height:
            top = rng.randint(0, height - h)
            left = rng.randint(0, width - w)
            return top, left, h, w
    # fallback: center crop at a valid aspect
    in_ratio = width / height
    if in_ratio < ratio[0]:
        w = width
        h = int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        h = height
        w = int(round(h * ratio[1]))
    else:
        w, h = width, height
    top = (height - h) // 2
    left = (width - w) // 2
    return top, left, h, w


def random_resized_crop(img: Image.Image, size: int, scale, rng: random.Random,
                        use_cv2: bool = False):
    top, left, h, w = sample_rrc_params(rng, img.width, img.height, scale)
    if use_cv2:
        # ~2-4x faster crop+resize for the on-device-aug path where host
        # time is decode+RRC only. cv2's bicubic differs marginally from
        # PIL's — keep PIL (default) for strict reference parity.
        import cv2
        import numpy as np

        arr = np.asarray(img)[top:top + h, left:left + w]
        out = cv2.resize(arr, (size, size), interpolation=cv2.INTER_CUBIC)
        return Image.fromarray(out)
    return img.resize((size, size), Image.BICUBIC,
                      box=(left, top, left + w, top + h))


def color_jitter(img: Image.Image, rng: random.Random,
                 brightness=0.4, contrast=0.4, saturation=0.2, hue=0.1):
    """torchvision ColorJitter: random factor per op, random op order."""
    ops = []
    b = rng.uniform(max(0, 1 - brightness), 1 + brightness)
    ops.append(lambda im: ImageEnhance.Brightness(im).enhance(b))
    c = rng.uniform(max(0, 1 - contrast), 1 + contrast)
    ops.append(lambda im: ImageEnhance.Contrast(im).enhance(c))
    s = rng.uniform(max(0, 1 - saturation), 1 + saturation)
    ops.append(lambda im: ImageEnhance.Color(im).enhance(s))
    h = rng.uniform(-hue, hue)

    def adjust_hue(im: Image.Image) -> Image.Image:
        if h == 0:
            return im
        hsv = np.array(im.convert("HSV"), np.uint8)
        hsv[..., 0] = (hsv[..., 0].astype(np.int16)
                       + int(h * 255)) % 256
        return Image.fromarray(hsv, "HSV").convert("RGB")

    ops.append(adjust_hue)
    rng.shuffle(ops)
    for op in ops:
        img = op(img)
    return img


@dataclass
class ViewTransform:
    """One crop view: RRC + flip + jitter/gray + blur/solarize + normalize."""

    size: int
    scale: tuple[float, float]
    blur_p: float
    solarize_p: float = 0.0

    def __call__(self, img: Image.Image, rng: random.Random) -> np.ndarray:
        img = random_resized_crop(img, self.size, self.scale, rng)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if rng.random() < 0.8:
            img = color_jitter(img, rng)
        if rng.random() < 0.2:
            img = img.convert("L").convert("RGB")
        if rng.random() < self.blur_p:
            # ref utils.py:43-61: radius uniform in [0.1, 2.0]
            img = img.filter(ImageFilter.GaussianBlur(rng.uniform(0.1, 2.0)))
        if rng.random() < self.solarize_p:
            img = ImageOps.solarize(img)          # threshold 128, like ref
        x = np.asarray(img, np.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD  # HWC float32


class RandomErasing:
    """timm-style random erasing, 'pixel' mode: a random rectangle is
    replaced with gaussian noise (ref: AUG.TIMM_AUG RE_* knobs used by
    DataAugmentationDEIT, datasets/build.py:265-310)."""

    def __init__(self, prob: float = 0.25, area=(0.02, 1 / 3),
                 ratio=(0.3, 3.3), count: int = 1):
        self.prob, self.area, self.ratio, self.count = prob, area, ratio, count

    def __call__(self, x: np.ndarray, rng: random.Random) -> np.ndarray:
        # x: HWC float array (post-normalize, like timm applies it)
        if rng.random() >= self.prob:
            return x
        h, w, c = x.shape
        out = x.copy()
        for _ in range(self.count):
            for _attempt in range(10):
                target = rng.uniform(*self.area) * h * w
                aspect = math.exp(rng.uniform(math.log(self.ratio[0]),
                                              math.log(self.ratio[1])))
                eh = int(round(math.sqrt(target * aspect)))
                ew = int(round(math.sqrt(target / aspect)))
                if eh < h and ew < w:
                    top = rng.randint(0, h - eh)
                    left = rng.randint(0, w - ew)
                    noise = np.random.default_rng(
                        rng.getrandbits(32)).normal(size=(eh, ew, c))
                    out[top:top + eh, left:left + ew] = noise.astype(x.dtype)
                    break
        return out


class DataAugmentationDEIT:
    """Supervised-style augmentation (ref: datasets/build.py:265-310, the
    AUG.TIMM_AUG path): RandomResizedCrop + flip + color jitter + normalize
    + random erasing. Produces a single view (list of one, mirroring the
    reference's loader contract). The full timm auto-augment policy search
    space is intentionally not reproduced — color jitter covers the
    photometric family used by the EsViT recipes."""

    def __init__(self, size: int = 224, scale=(0.08, 1.0),
                 color_jitter: float = 0.4, hflip: float = 0.5,
                 re_prob: float = 0.25, re_count: int = 1):
        self.size = size
        self.scale = scale
        self.color_jitter = color_jitter
        self.hflip = hflip
        self.erase = RandomErasing(prob=re_prob, count=re_count)

    def __call__(self, img: Image.Image, rng: random.Random | None = None
                 ) -> list[np.ndarray]:
        rng = rng or random.Random()
        if img.mode != "RGB":
            img = img.convert("RGB")
        img = random_resized_crop(img, self.size, self.scale, rng)
        if rng.random() < self.hflip:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if self.color_jitter > 0:
            img = color_jitter(img, rng, brightness=self.color_jitter,
                               contrast=self.color_jitter,
                               saturation=self.color_jitter, hue=0.0)
        x = np.asarray(img, np.float32) / 255.0
        x = (x - IMAGENET_MEAN) / IMAGENET_STD
        return [self.erase(x, rng)]


class DataAugmentationDINO:
    """Produces [g1, g2, l1..lN] as HWC float arrays (NHWC batches upstream).

    Mirrors datasets/build.py:203-261 including the asymmetric blur/solarize
    between the two global views.
    """

    def __init__(self, global_size=224, global_scale=(0.4, 1.0),
                 local_size=96, local_scale=(0.05, 0.4),
                 local_crops_number=8):
        self.global1 = ViewTransform(global_size, global_scale, blur_p=1.0)
        self.global2 = ViewTransform(global_size, global_scale, blur_p=0.1,
                                     solarize_p=0.2)
        self.local = ViewTransform(local_size, local_scale, blur_p=0.5)
        self.local_crops_number = local_crops_number

    def __call__(self, img: Image.Image, rng: random.Random | None = None
                 ) -> list[np.ndarray]:
        rng = rng or random.Random()
        if img.mode != "RGB":
            img = img.convert("RGB")
        views = [self.global1(img, rng), self.global2(img, rng)]
        views += [self.local(img, rng) for _ in range(self.local_crops_number)]
        return views
