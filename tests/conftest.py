"""Test config: force CPU with an 8-device virtual mesh (SURVEY.md §4).

The session environment pins JAX_PLATFORMS=axon (the real TPU chip behind a
tunnel); overriding the env var is NOT sufficient — the axon plugin still
wins platform selection. ``jax.config.update("jax_platforms", "cpu")`` before
first backend use is what actually forces CPU. 8 virtual CPU devices let the
sharding tests exercise a real Mesh without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

try:  # keep torch (golden-value oracle) from fighting XLA for cores
    import torch

    torch.set_num_threads(1)
except ImportError:
    pass


@pytest.fixture
def rng():
    return np.random.default_rng(0)
