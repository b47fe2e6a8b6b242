"""Multi-crop training data iterator.

Host side: decode + RandomResizedCrop per view (PIL, cheap). Photometric
augmentation runs either on host (full reference-parity PIL pipeline,
augment_host.py) or on device (fused jitted batch pipeline,
augment_device.py — the TPU-first default). Batches are the static
two-resolution pytree the jitted train step consumes:
``(global (2B, Sg, Sg, 3), local (L*B, Sl, Sl, 3))`` view-major.

Prefetch: a small thread pool decodes ahead into a bounded queue — the
equivalent of the reference's DataLoader worker processes
(datasets/build.py:72-79) for a one-process-per-host JAX setup.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Any, Iterator, Optional

import jax
import numpy as np

from esvit_tpu import native
from esvit_tpu.config import CropConfig
from esvit_tpu.data import augment_device, augment_host
from esvit_tpu.data.sampler import sharded_indices


def _sample_multicrop_boxes(crops: CropConfig, rng: random.Random,
                            width: int, height: int):
    """RRC boxes for all views, in the exact order the PIL path draws them
    (g1, g2, locals) so both paths consume the rng stream identically.
    Returns (boxes (n_views, 4) float64 (top, left, h, w), sizes list)."""
    boxes = [augment_host.sample_rrc_params(rng, width, height,
                                            crops.global_scale)
             for _ in range(2)]
    boxes += [augment_host.sample_rrc_params(rng, width, height,
                                             crops.local_scale)
              for _ in range(crops.local_crops_number)]
    sizes = [crops.global_size] * 2 + \
            [crops.local_size] * crops.local_crops_number
    return np.asarray(boxes, np.float64), sizes


def _crop_views_host_rrc(img, crops: CropConfig, rng: random.Random):
    """RandomResizedCrop only (uint8 HWC per view); photometrics on device."""
    boxes, sizes = _sample_multicrop_boxes(crops, rng, img.width, img.height)
    out = []
    for (top, left, h, w), s in zip(boxes, sizes):
        view = img.resize((s, s), augment_host.Image.BICUBIC,
                          box=(left, top, left + w, top + h))
        out.append(np.asarray(view, np.uint8))
    return out


class MultiCropIterator:
    """One epoch of multi-crop batches from a map-style dataset."""

    def __init__(self, dataset, crops: CropConfig, batch_size: int, *,
                 epoch: int = 0, seed: int = 0, host_aug: bool = False,
                 out_dtype=np.float32, num_threads: int = 4,
                 prefetch: int = 4, process_index: int = 0,
                 process_count: int = 1, device_rng: Optional[jax.Array] = None,
                 sampler_kind: str = "sharded", num_repeats: int = 3,
                 native_decode: Optional[bool] = None,
                 native_scaled: bool = True):
        self.dataset = dataset
        self.crops = crops
        self.B = batch_size
        self.host_aug = host_aug
        self.out_dtype = out_dtype
        self.epoch = epoch
        self.seed = seed
        self.device_rng = (device_rng if device_rng is not None
                           else jax.random.PRNGKey((seed << 16) + epoch))
        if host_aug:
            self.aug = augment_host.DataAugmentationDINO(
                global_size=crops.global_size, global_scale=crops.global_scale,
                local_size=crops.local_size, local_scale=crops.local_scale,
                local_crops_number=crops.local_crops_number)
        if sampler_kind == "sharded":
            self.indices = sharded_indices(
                len(dataset), epoch=epoch, seed=seed,
                process_index=process_index, process_count=process_count)
        elif sampler_kind == "chunk":
            from esvit_tpu.data.sampler import chunk_aware_indices

            self.indices = chunk_aware_indices(
                list(dataset.chunk_sizes), epoch=epoch, seed=seed,
                process_index=process_index, process_count=process_count)
        elif sampler_kind == "repeated_aug":
            from esvit_tpu.data.sampler import repeated_aug_indices

            self.indices = repeated_aug_indices(
                len(dataset), epoch=epoch, seed=seed, num_repeats=num_repeats,
                process_index=process_index, process_count=process_count)
        else:
            raise ValueError(f"unknown sampler_kind {sampler_kind!r}")
        self.num_threads = num_threads
        self.prefetch = prefetch
        # Native JPEG decode + fused crop-resize (esvit_tpu/native): auto-on
        # when the library builds and the dataset can hand us raw bytes.
        # RRC geometry is sampled on the Python side first, so the rng
        # stream — and therefore the crop boxes — are identical to the PIL
        # path; only the resample rounding differs (+/-1 LSB, pinned by
        # tests/test_native_datapath.py).
        self.native_decode = (native.available() if native_decode is None
                              else bool(native_decode))
        self.native_scaled = native_scaled

    def __len__(self):
        return len(self.indices) // self.B

    def _sample_views(self, idx: int, sample_seed: int):
        rng = random.Random(sample_seed)
        if self.native_decode and not self.host_aug:
            views = self._sample_views_native(idx, rng)
            if views is not None:
                return views
        img, _ = self.dataset[int(idx)]
        if img.mode != "RGB":
            img = img.convert("RGB")
        if self.host_aug:
            return self.aug(img, rng)                    # float32 normalized
        return _crop_views_host_rrc(img, self.crops, rng)  # uint8

    def _sample_views_native(self, idx: int, rng: random.Random):
        """GIL-free decode + fused crop-resize. Returns None (with the rng
        stream untouched) when the sample can't take the native path, so
        the caller's PIL fallback draws identical crops."""
        raw = getattr(self.dataset, "raw_bytes", None)
        if raw is None:
            return None
        item = raw(int(idx))
        if item is None:
            return None
        data = item[0]
        dims = native.jpeg_dims(data)   # header probe; no rng consumed
        if dims is None:
            return None
        w, h = dims
        boxes, sizes = _sample_multicrop_boxes(self.crops, rng, w, h)
        views = native.decode_multicrop(data, boxes, sizes,
                                        allow_scaled=self.native_scaled)
        if views is not None:
            return views
        # Decode failed after the rng was consumed: recreate the exact
        # views via PIL with the already-sampled boxes.
        import io as _io

        from PIL import Image as _Image

        with _Image.open(_io.BytesIO(data)) as img:
            img = img.convert("RGB")
            return [np.asarray(
                img.resize((s, s), augment_host.Image.BICUBIC,
                           box=(left, top, left + bw, top + bh)), np.uint8)
                for (top, left, bh, bw), s in zip(boxes, sizes)]

    def _assemble(self, views_per_sample: list[list[np.ndarray]]):
        """B lists of [g1, g2, l1..lL] -> view-major batches."""
        L = self.crops.local_crops_number
        g = np.stack([v[0] for v in views_per_sample]
                     + [v[1] for v in views_per_sample])          # (2B, ...)
        loc = np.stack([v[2 + j] for j in range(L)
                        for v in views_per_sample])               # (L*B, ...)
        return g, loc

    def __iter__(self) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        B = self.B
        nb = len(self)
        work_q: "queue.Queue[int]" = queue.Queue()
        done: dict[int, Any] = {}
        done_lock = threading.Condition()

        for b in range(nb):
            work_q.put(b)

        def worker():
            while True:
                try:
                    b = work_q.get_nowait()
                except queue.Empty:
                    return
                batch_idx = self.indices[b * B:(b + 1) * B]
                # Seed by within-epoch POSITION as well as index: with
                # sampler_kind='repeated_aug' the same index appears
                # num_repeats times per epoch and must draw DISTINCT
                # augmentations (reference RASampler semantics,
                # datasets/samplers.py) — an (seed, epoch, index)-only seed
                # would make all repeats byte-identical.
                views = [self._sample_views(
                    i, hash((self.seed, self.epoch, int(i), b * B + s))
                    & 0x7FFFFFFF)
                    for s, i in enumerate(batch_idx)]
                out = self._assemble(views)
                with done_lock:
                    done[b] = out
                    done_lock.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()

        rng = self.device_rng
        for b in range(nb):
            with done_lock:
                while b not in done:
                    done_lock.wait()
                g, loc = done.pop(b)
            if self.host_aug:
                yield (g.astype(self.out_dtype), loc.astype(self.out_dtype))
            else:
                rng, sub = jax.random.split(rng)
                yield augment_device.augment_multicrop(
                    sub, jax.numpy.asarray(g), jax.numpy.asarray(loc),
                    out_dtype=self.out_dtype)


def build_train_iterator(dataset, crops: CropConfig, batch_size: int, **kw
                         ) -> MultiCropIterator:
    return MultiCropIterator(dataset, crops, batch_size, **kw)


def synthetic_batches(crops: CropConfig, batch_size: int, *, steps: int,
                      seed: int = 0, dtype=np.float32):
    """Pure-device random batches for benches and smoke runs."""
    rng = jax.random.PRNGKey(seed)
    B = batch_size
    for _ in range(steps):
        rng, k1, k2 = jax.random.split(rng, 3)
        g = jax.random.normal(k1, (2 * B, crops.global_size,
                                   crops.global_size, 3), dtype)
        l = jax.random.normal(k2, (crops.local_crops_number * B,
                                   crops.local_size, crops.local_size, 3), dtype)
        yield g, l
