"""Test config: CPU backend with 8 virtual devices.

The TPU analog of the reference's `trainer=ddp_sim` CPU-DDP simulation
(configs/trainer/ddp_sim.yaml): every test sees an 8-device mesh so
sharding paths are exercised without TPU hardware — and the single real
TPU chip (exclusive-access) is never grabbed by the test suite.

NOTE: `import pytest` already imports jax (via the jaxtyping plugin), so
env vars set here are too late for JAX's import-time reads; jax.config
updates still apply because no backend has initialized yet.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# never share the persistent XLA cache with concurrently running
# benches/studies: racing writers have corrupted entries (SIGABRT on
# load). Tests are compile-cheap on CPU anyway.
os.environ.setdefault("MYGR_TPU_NO_XLA_CACHE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
