"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware (SURVEY §4 distributed-test strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env pins the TPU platform
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The TPU plugin's sitecustomize overrides jax_platforms via jax.config at
# interpreter start; override it back before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)


def assert_close(a, b, atol=1e-4, rtol=1e-4, msg=""):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol, err_msg=msg)
