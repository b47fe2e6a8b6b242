"""Class-aware + repeated-augmentation samplers; Swin table adaptation."""

import numpy as np

from esvit_tpu.data import sampler


def test_class_aware_balances_classes(np_rng):
    # imbalanced: class 0 has 50, class 1 has 10, class 2 has 4
    labels = np.array([0] * 50 + [1] * 10 + [2] * 4)
    idx = sampler.class_aware_indices(labels, epoch=0, samples_per_class=12)
    drawn = labels[idx]
    counts = np.bincount(drawn, minlength=3)
    np.testing.assert_array_equal(counts, [12, 12, 12])
    # rare classes repeat samples (oversampling)
    assert len(np.unique(idx[drawn == 2])) == 4


def test_class_aware_deterministic_and_sharded():
    labels = np.array([0, 0, 1, 1, 2, 2] * 5)
    a = sampler.class_aware_indices(labels, epoch=3)
    b = sampler.class_aware_indices(labels, epoch=3)
    np.testing.assert_array_equal(a, b)
    p0 = sampler.class_aware_indices(labels, epoch=3, process_index=0,
                                     process_count=2)
    p1 = sampler.class_aware_indices(labels, epoch=3, process_index=1,
                                     process_count=2)
    np.testing.assert_array_equal(np.sort(np.concatenate([p0, p1])),
                                  np.sort(a))


def test_repeated_aug_indices():
    idx = sampler.repeated_aug_indices(10, epoch=0, num_repeats=3)
    vals, counts = np.unique(idx, return_counts=True)
    assert counts.max() == 3
    # sharding partitions the repeated stream
    p0 = sampler.repeated_aug_indices(10, epoch=0, num_repeats=3,
                                      process_index=0, process_count=2)
    p1 = sampler.repeated_aug_indices(10, epoch=0, num_repeats=3,
                                      process_index=1, process_count=2)
    assert len(p0) == len(p1) == 15


def test_adapt_swin_tables_resizes(np_rng):
    from esvit_tpu.io.torch_import import adapt_swin_tables

    imported = {"attn": {"relative_position_bias_table":
                         np_rng.normal(size=(13 * 13, 3)).astype(np.float32)}}
    target = {"attn": {"relative_position_bias_table":
                       np.zeros((27 * 27, 3), np.float32)}}
    out = adapt_swin_tables(imported, target)
    assert out["attn"]["relative_position_bias_table"].shape == (27 * 27, 3)
    # same-shape tables pass through untouched
    out2 = adapt_swin_tables(
        {"a": {"relative_position_bias_table": imported["attn"]
               ["relative_position_bias_table"]}},
        {"a": {"relative_position_bias_table": np.zeros((169, 3))}})
    np.testing.assert_array_equal(
        out2["a"]["relative_position_bias_table"],
        imported["attn"]["relative_position_bias_table"])
