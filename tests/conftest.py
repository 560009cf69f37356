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
# Persistent compilation cache: per-air prover pipelines compile once ever,
# not once per test process (XLA CPU compiles of the round-4/5 graphs take
# minutes; cached reloads take milliseconds).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
