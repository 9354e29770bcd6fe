"""Test config: CPU backend with 8 virtual devices.

The TPU analog of the reference's `trainer=ddp_sim` CPU-DDP simulation
(configs/trainer/ddp_sim.yaml): every test sees an 8-device mesh so
sharding paths are exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
