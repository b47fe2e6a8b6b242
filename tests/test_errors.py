"""Negative paths: clear errors for bad configs and inputs."""

import numpy as np
import pytest

import jax

from esvit_tpu import config
from esvit_tpu.parallel import mesh as mesh_lib


def test_mesh_size_mismatch_errors():
    with pytest.raises(ValueError, match="devices"):
        mesh_lib.make_mesh(config.MeshConfig(data=3, model=2),
                           devices=jax.devices("cpu")[:4])


def test_unknown_model_preset_errors():
    with pytest.raises(ValueError, match="unknown model preset"):
        config.get_model_config("swin_enormous")


def test_unknown_dataset_kind_errors():
    from esvit_tpu.data.datasets import build_dataset

    with pytest.raises(ValueError, match="unknown dataset kind"):
        build_dataset("blobstore")


def test_registry_unknown_backbone_errors():
    from esvit_tpu.models.registry import build_backbone

    class Fake:
        name = "not_a_backbone"

    with pytest.raises(ValueError, match="no backbone registered"):
        build_backbone(Fake())


def test_loader_unknown_sampler_errors(np_rng):
    from esvit_tpu.data.datasets import SyntheticImages
    from esvit_tpu.data.loader import MultiCropIterator

    with pytest.raises(ValueError, match="sampler_kind"):
        MultiCropIterator(SyntheticImages(n=8), config.CropConfig(
            global_size=32, local_size=16, local_crops_number=2),
            batch_size=2, sampler_kind="bogus")


def test_slidingchunk_bad_exact_errors():
    from esvit_tpu.ops import slidingchunk as sc

    with pytest.raises(ValueError, match="exact"):
        sc.invalid_locations_mask(2, 2, 0, 0, 2, exact=7)
