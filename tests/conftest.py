"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding is validated on a virtual 8-device CPU mesh (no multi-chip
TPU hardware in CI), the TPU-native analog of the reference's single-rank MPI
smoke test (reference: test/test_MPI.cpp) but actually exercising an 8-way mesh.
"""

import os

# NB: a sitecustomize module may import jax (and latch JAX_PLATFORMS) before
# this conftest runs, so setting the env var here is too late — force the
# platform through the live config instead. XLA_FLAGS is read when the CPU
# client is first created, which hasn't happened yet.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_dna(rng, n: int) -> str:
    return "".join(rng.choice(list("ACGT"), size=n))


def random_protein(rng, n: int) -> str:
    return "".join(rng.choice(list("ARNDCQEGHILKMFPSTWYV"), size=n))

import os
import pytest

needs_reference_data = pytest.mark.skipif(
    not os.path.isdir("/root/reference/data"),
    reason="reference dataset not available",
)
