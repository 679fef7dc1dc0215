"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py and __graft_entry__.py; the test
suite targets determinism and multi-device sharding semantics, which JAX
provides on CPU via ``--xla_force_host_platform_device_count`` (the standard
fake-backend trick, see SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the ambient env may pin a TPU
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The ambient environment may pre-import jax (sitecustomize registering a TPU
# plugin) before this conftest runs, so setting env vars alone is not enough.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0x5EED)
