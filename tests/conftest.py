"""Test configuration: CPU backend with 8 virtual devices, float64 on.

Golden-agreement tests compare against the reference implementation
(float64 on host numpy), so tests run with x64 enabled on the CPU backend;
multi-device sharding tests use the virtual 8-device mesh.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# NOTE: this environment's jax build ignores the JAX_PLATFORMS env var;
# the config knob is the reliable way to pin the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from .fixtures import make_demo_dataset  # noqa: E402


@pytest.fixture(scope="session")
def demo():
    """The synthetic demo dataset (reference makedata.ipynb recipe) as a
    (cna_tpu.CellData, sample-metadata DataFrame) pair, with the
    connectivity graph built by cna_tpu.pp."""
    return make_demo_dataset(seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
