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
