"""Host data-path benchmark: real JPEG decode + multi-crop vs chip demand.

VERDICT round-1 weak #4: the chip eats ~125 samples/s (B=32 step / 255 ms,
10 crops per sample) but the host feed rate had never been measured with
real JPEG bytes. This benchmark:

1. encodes a procedural dataset to JPEG files at ImageNet-ish resolution
   (384px, quality 85) in an ImageFolder layout,
2. measures the per-sample host cost of (a) JPEG decode + 10x RandomResizedCrop
   (the on-device-aug path's host share) and (b) the full PIL reference-parity
   augmentation pipeline (host_aug=True),
3. derives how many host cores a real deployment needs to keep one chip fed.

NOTE this image has ONE CPU core (os.cpu_count()==1), so the conclusion is
expressed as cores-needed, not demonstrated throughput; TPU hosts have
100+ cores (e.g. v5e hosts: 112 vCPU per 4 chips).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from esvit_tpu.config import CropConfig
    from esvit_tpu.data.datasets import ImageFolder, ProceduralShapesHard
    from esvit_tpu.data.loader import MultiCropIterator, _crop_views_host_rrc
    import random

    n = 128
    src = ProceduralShapesHard(n=n, size=384, seed=0)
    tmp = tempfile.mkdtemp(prefix="jpegbench_")
    for i in range(n):
        img, lab = src[i]
        d = os.path.join(tmp, f"class_{lab:02d}")
        os.makedirs(d, exist_ok=True)
        img.save(os.path.join(d, f"{i:05d}.jpg"), quality=85)
    ds = ImageFolder(tmp)
    sizes = [os.path.getsize(p) for p, _ in ds.samples]
    print(f"dataset: {len(ds)} jpegs, mean {np.mean(sizes)/1024:.1f} KiB "
          f"(384px q85)")

    crops = CropConfig()  # 2x224 + 8x96, reference scales

    # (a) decode + 10-crop RRC only (device-aug path's host share)
    rng = random.Random(0)
    t0 = time.perf_counter()
    for i in range(n):
        img, _ = ds[i]
        img = img.convert("RGB") if img.mode != "RGB" else img
        _crop_views_host_rrc(img, crops, rng)
    dt_rrc = (time.perf_counter() - t0) / n * 1e3

    # (a2/a3) native C++ path (esvit_tpu/native): fused decode + 10-crop,
    # exact and DCT-prescaled. Same rng stream as (a) -> same crop boxes.
    from esvit_tpu import native
    from esvit_tpu.data.loader import _sample_multicrop_boxes
    dt_nat = dt_nat_scaled = float("nan")
    if native.available():
        for scaled, attr in [(False, "dt_nat"), (True, "dt_nat_scaled")]:
            rng = random.Random(0)
            t0 = time.perf_counter()
            for i in range(n):
                data, _ = ds.raw_bytes(i)
                w, h = native.jpeg_dims(data)
                boxes, szs = _sample_multicrop_boxes(crops, rng, w, h)
                views = native.decode_multicrop(data, boxes, szs,
                                                allow_scaled=scaled)
                assert views is not None
            val = (time.perf_counter() - t0) / n * 1e3
            if scaled:
                dt_nat_scaled = val
            else:
                dt_nat = val
    else:
        print(f"native path unavailable: {native.build_error()}")

    # (b) full host (PIL parity) pipeline: decode + RRC + jitter/blur/solarize
    from esvit_tpu.data.augment_host import DataAugmentationDINO
    aug = DataAugmentationDINO(global_size=crops.global_size,
                               global_scale=crops.global_scale,
                               local_size=crops.local_size,
                               local_scale=crops.local_scale,
                               local_crops_number=crops.local_crops_number)
    t0 = time.perf_counter()
    for i in range(n):
        img, _ = ds[i]
        img = img.convert("RGB") if img.mode != "RGB" else img
        aug(img, rng)
    dt_full = (time.perf_counter() - t0) / n * 1e3

    # (c) iterator overhead (threading, assembly) on the device-aug path,
    # stopping before the device call: host_aug=True measures the same
    # machinery with host photometrics.
    it = MultiCropIterator(ds, crops, 32, host_aug=True, num_threads=1)
    t0 = time.perf_counter()
    nb = 0
    for _ in it:
        nb += 1
    dt_iter = (time.perf_counter() - t0) / (nb * 32) * 1e3

    chip_samples_per_s = 125.4  # B=32 / 255.2 ms (BENCH r2 baseline)
    print(f"\nper-sample host cost (single core):")
    print(f"  decode + 10x RRC (device-aug path): {dt_rrc:7.2f} ms")
    print(f"  native decode + fused 10-crop:      {dt_nat:7.2f} ms "
          f"({dt_rrc/dt_nat:.1f}x)")
    print(f"  native + DCT prescale:              {dt_nat_scaled:7.2f} ms "
          f"({dt_rrc/dt_nat_scaled:.1f}x)")
    print(f"  full PIL reference pipeline:        {dt_full:7.2f} ms")
    print(f"  host_aug iterator end-to-end:       {dt_iter:7.2f} ms")
    for name, ms in [("device-aug path", dt_rrc),
                     ("native device-aug path", dt_nat_scaled),
                     ("host-aug path", dt_full)]:
        cores = chip_samples_per_s * ms / 1e3
        print(f"  -> cores to feed one chip at {chip_samples_per_s:.0f} "
              f"samples/s via {name}: {cores:.1f}")


if __name__ == "__main__":
    main()
