"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding is exercised the way the reference exercises MPI locally
(``mpirun -n 4`` on one machine, final/Makefile:11-12): a virtual 8-device CPU
mesh via ``--xla_force_host_platform_device_count``.  Must be set before the
first jax import anywhere in the test process.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"  # the env presets axon (TPU); tests force CPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's sitecustomize pre-registers the axon (TPU) backend before
# conftest runs, so the env var alone is not enough — force the config too.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from binary_spgemm_tpu import BCSR  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_pair(n, m, k, d, seed=0):
    """Random A (n×m) and B (m×k) with ~d nnz/row."""
    a = BCSR.random(n, m, d, seed=seed)
    b = BCSR.random(m, k, d, seed=seed + 1)
    return a, b
