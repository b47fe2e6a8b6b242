"""Test environment: force CPU with 8 virtual devices so multi-device
sharding paths run without TPU hardware (SURVEY.md §4).

Note: this image's sitecustomize registers a TPU ('axon') PJRT backend at
interpreter start and forces JAX_PLATFORMS=axon, so env vars alone don't
stick — ``jax.config.update('jax_platforms', 'cpu')`` after import does.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def np_rng():
    return np.random.default_rng(0)
