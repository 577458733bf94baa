"""Test configuration: force an 8-device virtual CPU platform.

Sharding/collective tests exercise pjit over a Mesh without TPU hardware
(SURVEY.md §4 "Distributed"). Must run before jax initialises its backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The environment's 'axon' plugin rewrites jax_platforms to "axon,cpu" at
# import, overriding the JAX_PLATFORMS env var — force cpu via config so
# tests never contend for the single real TPU chip.
jax.config.update("jax_platforms", "cpu")

# the CPU backend emulates TPU default (bf16) matmul precision; parity tests
# need exact fp32 accumulation
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
