"""Test configuration: run JAX on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (and tests stay deterministic/fast).

The session environment pins JAX_PLATFORMS=axon (one real TPU chip behind a
tunnel) via sitecustomize, and that registration ignores the env var — the
only reliable override is jax.config.  Tests must NOT touch the real chip:
it serializes processes (concurrent users hang) and is reserved for bench.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# exact f32 matmuls (NN distance matrices rely on it)
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def ref_dir():
    return REFERENCE
