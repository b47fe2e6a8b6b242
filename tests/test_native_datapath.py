"""Native host data-path (esvit_tpu/native): parity with the PIL/Python path.

The C++ library replaces, per image: PIL JPEG decode (must be bit-identical
— both sit on libjpeg), Image.resize(BICUBIC, box=...) per view (+/-1 LSB:
same convolution resampler, float accumulation vs PIL's fixed point), the
Python int() loop over .lineidx (exact), and base64 (exact). The loader
fast path must produce the same batches as the PIL path bit-for-bit in
geometry and within the resample tolerance in pixel values.
"""

import base64
import io
import os
import random

import numpy as np
import pytest
from PIL import Image

from esvit_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native datapath unavailable: {native.build_error()}")


def _jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "JPEG", quality=quality)
    return b.getvalue()


def _rand_img(rng, h, w, smooth=False):
    arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if smooth:
        arr = np.asarray(Image.fromarray(arr).resize((w, h), Image.BILINEAR))
    return arr


def test_lineidx_parse_exact():
    offs = [0, 1, 99, 12345, 2**40, 2**52 + 17]
    blob = "\n".join(str(o) for o in offs).encode() + b"\n"
    assert native.lineidx_parse(blob).tolist() == offs
    # \r\n and trailing blank lines tolerated, like the Python reader
    blob2 = b"0\r\n42\r\n\r\n7\n\n"
    assert native.lineidx_parse(blob2).tolist() == [0, 42, 7]


def test_b64_roundtrip():
    rng = np.random.default_rng(0)
    for n in [0, 1, 2, 3, 57, 10000]:
        raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        enc = base64.b64encode(raw)
        assert native.b64_decode(enc) == raw
        # MIME line wrapping tolerated
        assert native.b64_decode(base64.encodebytes(raw)) == raw
    with pytest.raises(ValueError):
        native.b64_decode(b"a!b=")


def test_jpeg_decode_bit_identical_to_pil():
    rng = np.random.default_rng(1)
    for (h, w), smooth, q in [((240, 320), False, 90), ((97, 131), True, 75),
                              ((64, 64), True, 95)]:
        data = _jpeg(_rand_img(rng, h, w, smooth), q)
        assert native.jpeg_dims(data) == (w, h)
        ours = native.jpeg_decode(data)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        assert ours.shape == pil.shape
        np.testing.assert_array_equal(ours, pil)


def test_jpeg_decode_grayscale_source():
    rng = np.random.default_rng(2)
    g = rng.integers(0, 256, (80, 60), dtype=np.uint8)
    b = io.BytesIO()
    Image.fromarray(g, "L").save(b, "JPEG", quality=90)
    ours = native.jpeg_decode(b.getvalue())
    pil = np.asarray(Image.open(io.BytesIO(b.getvalue())).convert("RGB"))
    np.testing.assert_array_equal(ours, pil)


def test_jpeg_decode_garbage_returns_none():
    assert native.jpeg_dims(b"not a jpeg") is None
    assert native.jpeg_decode(b"\xff\xd8\xff garbage") is None


def test_jpeg_scaled_decode_dims():
    rng = np.random.default_rng(3)
    data = _jpeg(_rand_img(rng, 250, 330, smooth=True))
    for d in (2, 4, 8):
        out = native.jpeg_decode(data, scale_denom=d)
        assert out.shape == (-(-250 // d), -(-330 // d), 3)


def test_crop_resize_matches_pil_within_1lsb():
    rng = np.random.default_rng(4)
    for smooth in (False, True):
        arr = _rand_img(rng, 240, 320, smooth)
        pim = Image.fromarray(arr)
        cases = [(10, 20, 180, 250, 224),   # mixed up/down
                 (0, 0, 240, 320, 96),      # pure downscale
                 (5, 5, 64, 64, 128),       # pure upscale
                 (3, 7, 100, 90, 224),
                 (0, 0, 240, 320, 224)]
        for (t, l, h, w, s) in cases:
            ours = native.crop_resize(arr, (t, l, t + h, l + w), (s, s))
            ref = np.asarray(pim.resize((s, s), Image.BICUBIC,
                                        box=(l, t, l + w, t + h)))
            d = np.abs(ours.astype(int) - ref.astype(int))
            assert d.max() <= 1, (t, l, h, w, s, d.max())


def test_decode_multicrop_matches_manual_views():
    rng = np.random.default_rng(5)
    arr = _rand_img(rng, 300, 400, smooth=True)
    data = _jpeg(arr)
    full = native.jpeg_decode(data)   # decode once, same bytes the views see
    boxes = np.array([[10, 20, 250, 330], [0, 0, 300, 400], [40, 60, 90, 90]],
                     np.float64)
    sizes = [224, 224, 96]
    views = native.decode_multicrop(data, boxes, sizes, allow_scaled=False)
    for (t, l, h, w), s, v in zip(boxes, sizes, views):
        ref = native.crop_resize(full, (t, l, t + h, l + w), (s, s))
        np.testing.assert_array_equal(v, ref)


def test_multicrop_batch_rows_and_status():
    rng = np.random.default_rng(6)
    imgs = [_rand_img(rng, 200, 260, smooth=True) for _ in range(4)]
    jpegs = [_jpeg(a) for a in imgs]
    jpegs[2] = b"corrupt"                      # must fail, others fine
    boxes = np.tile(np.array([[0, 0, 200, 260], [50, 60, 100, 120]],
                             np.float64), (4, 1, 1))
    sizes = [128, 64]
    outs = [np.zeros((4, s, s, 3), np.uint8) for s in sizes]
    status = native.multicrop_batch(jpegs, boxes, sizes, outs, [0, 1, 2, 3],
                                    allow_scaled=False, nthreads=3)
    assert status[2] != 0 and all(status[i] == 0 for i in (0, 1, 3))
    for i in (0, 1, 3):
        full = native.jpeg_decode(jpegs[i])
        for v, s in enumerate(sizes):
            t, l, h, w = boxes[i, v]
            ref = native.crop_resize(full, (t, l, t + h, l + w), (s, s))
            np.testing.assert_array_equal(outs[v][i], ref)
    assert not outs[0][2].any()                # failed row untouched


def test_scaled_decode_close_to_exact():
    """allow_scaled prescales via DCT when every view downscales >=2x after
    the prescale; result must stay visually identical (the bicubic
    antialias subsumes the DCT low-pass)."""
    rng = np.random.default_rng(7)
    arr = _rand_img(rng, 1024, 1280, smooth=True)
    data = _jpeg(arr)
    boxes = np.array([[0, 0, 1000, 1200], [100, 100, 900, 900]], np.float64)
    sizes = [224, 96]
    exact = native.decode_multicrop(data, boxes, sizes, allow_scaled=False)
    fast = native.decode_multicrop(data, boxes, sizes, allow_scaled=True)
    for e, f in zip(exact, fast):
        d = np.abs(e.astype(np.float64) - f.astype(np.float64))
        rms = float(np.sqrt((d ** 2).mean()))
        assert rms < 4.0, rms                  # ~36 dB PSNR
        assert float(d.mean()) < 2.5


def test_loader_native_path_matches_pil_path(tmp_path):
    """MultiCropIterator(native_decode=True) vs (False): identical geometry
    (same rng stream), pixels within the resample tolerance."""
    from esvit_tpu.config import CropConfig
    from esvit_tpu.data.datasets import ImageFolder
    from esvit_tpu.data.loader import MultiCropIterator

    rng = np.random.default_rng(8)
    for i in range(8):
        d = tmp_path / f"class_{i % 2}"
        d.mkdir(exist_ok=True)
        Image.fromarray(_rand_img(rng, 180, 220, smooth=True)).save(
            d / f"{i}.jpg", quality=92)
    ds = ImageFolder(str(tmp_path))
    crops = CropConfig(global_size=64, local_size=32, local_crops_number=3)

    def batches(nat):
        it = MultiCropIterator(ds, crops, 4, seed=3, host_aug=False,
                               num_threads=2, native_decode=nat)
        return list(it)

    a = batches(False)
    b = batches(True)
    assert len(a) == len(b) == 2
    for (g0, l0), (g1, l1) in zip(a, b):
        g0, l0, g1, l1 = map(np.asarray, (g0, l0, g1, l1))
        assert g0.shape == g1.shape and l0.shape == l1.shape
        # identical device-side photometrics on +/-1-LSB-inputs: small diff
        assert float(np.abs(g0 - g1).mean()) < 0.02
        assert float(np.abs(l0 - l1).mean()) < 0.02


def test_loader_native_falls_back_for_non_jpeg(tmp_path):
    from esvit_tpu.config import CropConfig
    from esvit_tpu.data.datasets import ImageFolder
    from esvit_tpu.data.loader import MultiCropIterator

    rng = np.random.default_rng(9)
    d = tmp_path / "class_0"
    d.mkdir()
    for i in range(4):
        Image.fromarray(_rand_img(rng, 100, 100)).save(d / f"{i}.png")
    ds = ImageFolder(str(tmp_path))
    crops = CropConfig(global_size=64, local_size=32, local_crops_number=2)
    a = list(MultiCropIterator(ds, crops, 4, seed=1, native_decode=True,
                               num_threads=1))
    b = list(MultiCropIterator(ds, crops, 4, seed=1, native_decode=False,
                               num_threads=1))
    for (g0, l0), (g1, l1) in zip(a, b):
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_eval_transform_bytes_matches_pil():
    """Resize(256)+CenterCrop folded into one native crop+resize must match
    eval_transform within the +/-1 LSB resample tolerance (amplified by the
    1/(255*std) normalization)."""
    from esvit_tpu.evals.knn import eval_transform, eval_transform_bytes

    rng = np.random.default_rng(11)
    for h, w in [(480, 640), (300, 280), (256, 256), (1024, 768)]:
        arr = _rand_img(rng, h, w, smooth=True)
        data = _jpeg(arr, quality=92)
        ref = eval_transform(Image.open(io.BytesIO(data)))
        ours = eval_transform_bytes(data)
        assert ours is not None and ours.shape == ref.shape == (224, 224, 3)
        lsb = 1.0 / (255.0 * 0.225)            # one uint8 LSB, normalized
        d = np.abs(ours - ref)
        assert float(d.max()) <= 3.2 * lsb, float(d.max()) / lsb
        assert float(d.mean()) <= 0.35 * lsb


def test_eval_transform_bytes_small_image_falls_back():
    from esvit_tpu.evals.knn import eval_transform_bytes

    # not a JPEG -> None (caller uses PIL)
    assert eval_transform_bytes(b"junk") is None


def test_extract_uses_native_bytes_path(tmp_path):
    """extract_dataset_features with transform_bytes matches the PIL-only
    path on an ImageFolder of JPEGs (identity fwd)."""
    from esvit_tpu.data.datasets import ImageFolder
    from esvit_tpu.evals.extract import extract_dataset_features
    from esvit_tpu.evals.knn import eval_transform, eval_transform_bytes

    rng = np.random.default_rng(12)
    for i in range(6):
        d = tmp_path / f"class_{i % 3}"
        d.mkdir(exist_ok=True)
        Image.fromarray(_rand_img(rng, 260, 300, smooth=True)).save(
            d / f"{i}.jpg", quality=92)
    ds = ImageFolder(str(tmp_path))
    fwd = lambda x: np.asarray(x).reshape(len(x), -1)[:, :16]
    fa, la = extract_dataset_features(fwd, ds, eval_transform, batch_size=4)
    fb, lb = extract_dataset_features(fwd, ds, eval_transform, batch_size=4,
                                      transform_bytes=eval_transform_bytes)
    np.testing.assert_array_equal(la, lb)
    assert float(np.abs(fa - fb).mean()) < 0.02


def test_tsv_native_lineidx_and_raw_bytes(tmp_path):
    from esvit_tpu.data.datasets import TSVDataset, TSVFile

    rng = np.random.default_rng(10)
    rows = []
    for i in range(5):
        data = _jpeg(_rand_img(rng, 60, 80, smooth=True))
        rows.append(f"k{i}\t{i % 3}\t{base64.b64encode(data).decode()}")
    tsv = tmp_path / "d.tsv"
    tsv.write_text("\n".join(rows) + "\n")
    ds = TSVDataset(str(tsv))
    # offsets parsed natively == regenerated by the Python scanner
    with open(str(tsv), "rb") as f:
        blob = f.read()
    pos, expect = 0, []
    for line in blob.splitlines(keepends=True):
        expect.append(pos)
        pos += len(line)
    assert list(ds.tsv.offsets) == expect
    data, label = ds.raw_bytes(3)
    assert label == 0
    img, label2 = ds[3]
    np.testing.assert_array_equal(native.jpeg_decode(data), np.asarray(img))
    assert label2 == label
