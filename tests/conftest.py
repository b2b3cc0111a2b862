"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

The reference could only test on real NPUs (SURVEY.md §4); on the JAX stack we run
every kernel in Pallas interpret mode and every multi-chip EP path on a virtual CPU
mesh, so the whole suite is hardware-free.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; the config knob wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="session")
def mesh8():
    devices = jax.devices()
    assert len(devices) >= 8, f"expected ≥8 virtual devices, got {len(devices)}"
    return jax.sharding.Mesh(np.array(devices[:8]), ("ep",))


@pytest.fixture(scope="session")
def mesh4():
    """Smaller EP mesh for the heavier interpret tests: the distributed
    simulator's cost grows superlinearly in rank count on the single-CPU CI
    box, and the EP machinery is rank-count-generic."""
    return jax.sharding.Mesh(np.array(jax.devices()[:4]), ("ep",))


@pytest.fixture(scope="session")
def mesh2():
    """Minimal cross-rank mesh: the distributed interpreter's cost grows
    superlinearly in rank count, so default-tier tests of rank-generic
    machinery use 2 ranks (R≥4 coverage lives in the slow tier)."""
    return jax.sharding.Mesh(np.array(jax.devices()[:2]), ("ep",))


@pytest.fixture
def rng():
    return np.random.default_rng(42)
