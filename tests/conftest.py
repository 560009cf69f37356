"""Test configuration: force a virtual 8-device CPU mesh.

The environment pre-imports JAX with the tunneled single-chip TPU backend
(axon) pinned via sitecustomize, so env vars alone don't switch platforms —
we override at runtime before any backend is initialized.  The real TPU is
reserved for bench.py; tests exercise the same code paths (including
multi-chip sharding) on 8 virtual host CPU devices.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
